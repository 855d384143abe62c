"""Training-shard export — materialize a curated corpus as balanced,
deterministic parquet shards.

The last stage of the curation chain: after dedup / decontamination /
split / packing, a trainer wants the corpus on disk as N roughly-equal
shards whose membership is a pure function of the data (so a re-run, a
backfill, or a second cluster produces byte-identical shard membership),
with whole packs kept together (a pack is a training sequence — tearing
it across shards would split a sequence across data-loader workers).

Spark shape: one ``repartitionByRange`` on the salted shard key (range
partitioning samples the key distribution, so shards balance even when
pack sizes skew) + an in-partition sort for deterministic row order.
No driver-side loops; the manifest aggregation is one small collect of
``n_shards`` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.pipeline.curation import _hash60


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    n_shards: int,
    pack_cols: tuple[str, ...] = ("grp", "pack"),
    order_cols: tuple[str, ...] = ("doc_id",),
    salt: str = "shard-v1",
) -> list[dict]:
    """Write ``df`` as ``n_shards`` parquet shards; returns the manifest.

    Shard id = md5(salt : pack-key) mod n_shards — growth-stable and
    engine-independent like ``hash_split``; all rows of one pack land in
    one shard.  Rows inside a shard are sorted by the pack key then
    ``order_cols``, so shard CONTENT (not just membership) is
    deterministic.  Output layout: ``path/shard=<k>/part-*.parquet``
    with exactly one file per shard.

    Manifest: exactly ``n_shards`` dicts — ``{"shard", "n_rows",
    "n_packs"}`` — the index a data loader uses to assign shards to
    workers; shards that received no rows report zero counts (so a
    loader assigning ``n_shards`` workers never sees a missing id).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = "concat_ws(':', " + ", ".join(f"CAST({c} AS STRING)" for c in pack_cols) + ")"
    shard = F.expr(f"{_hash60(f'''concat('{salt}:', {key})''')} % {n_shards}").cast("int")
    out = df.withColumn("shard", shard)
    (
        out.repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", *pack_cols, *order_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    # Manifest from the WRITTEN output, not the input lineage: at 100 TB
    # a second evaluation of ``df`` would repeat the whole upstream chain;
    # reading back prunes to the pack-key columns + the shard partition
    # value, a sliver of the written bytes.
    manifest_rows = (
        df.sparkSession.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(*pack_cols).alias("n_packs"),
        )
        .collect()  # ≤ n_shards rows — bounded, corpus-size independent
    )
    got = {int(r["shard"]): r for r in manifest_rows}
    return [
        {
            "shard": k,
            "n_rows": got[k]["n_rows"] if k in got else 0,
            "n_packs": got[k]["n_packs"] if k in got else 0,
        }
        for k in range(n_shards)
    ]
