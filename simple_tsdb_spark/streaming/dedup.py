"""Streaming exact dedup — the ingest-dedup stage of a training-data
pipeline as a continuous query.

Batch twin: ``pipeline.exact_dedup`` (hash-groupBy on the content
digest).  Streaming keeps the FIRST-seen copy of each digest and drops
later duplicates, with state bounded by the watermark horizon
(``dropDuplicatesWithinWatermark``): at 100 TB/day ingest the dedup
state holds one digest per distinct document seen within the horizon,
not the corpus — cross-horizon dedup belongs to the batch operator over
the stored table.

The digest is md5 of the content (same as the batch operator), so a
document deduped on the stream hashes identically in later batch passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate-content documents within the watermark horizon.

    Adds ``content_md5``; exactly one copy per digest survives — the
    first-arriving micro-batch's copy (within one micro-batch the
    surviving row is engine-chosen).  The watermark bounds both state
    size and how late a duplicate can arrive and still be caught — the
    deliberate streaming trade documented above.
    """
    return (
        stream.withColumn("content_md5", F.md5(F.col(text_col)))
        .withWatermark(event_time_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )
