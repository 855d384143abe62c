"""Per-series mark sidecars (``time_last``, ``time_first``) with
hash-bucket sharding above a cardinality threshold.

The reference keeps one tiny metadata record per series (the
``time_first`` file per series, ``doc/LOCKING.txt:50-72``; the
in-memory ``time_last`` check, ``wal.cc:87-110``).  Our sidecar is a
single JSON snapshot of every series' mark — the right shape up to
~10^5 series, but each publish rewrites the WHOLE snapshot, so at 10^7
series every point-scale append would serialize ~300 MB.  Above
``SHARD_THRESHOLD`` marks the store migrates to ``SHARD_BUCKETS``
fixed hash buckets (one JSON per bucket + a ``_meta.json`` marker) and
each publish rewrites only the buckets the batch touched:
O(touched_series + marks/buckets) bytes per append instead of
O(marks).

Crash safety matches the single-file store.  Marks are advanced BEFORE
the data append publishes, so a crash between bucket writes leaves
some buckets "too high" — the safe direction (costs a future verify
scan, never skips one).  Migration writes every bucket first and
publishes the ``_meta.json`` marker LAST (atomic): until the marker
exists readers keep using the legacy single file, whose pre-batch
content is correct for all committed data.

The single-writer-per-measurement contract (DIVERGENCES #6) is
inherited unchanged — the wire server holds a per-measurement lock
around every write.
"""

from __future__ import annotations

import json
import os
import zlib

# Migrate to sharded storage above this many recorded series.  The
# default keeps the single file (human-inspectable, one read) for every
# realistic single-measurement cardinality below "ultra-high"; tests
# override via the environment to exercise migration cheaply.
SHARD_THRESHOLD = int(os.environ.get("SPARK_GRAFT_MARKS_SHARD_THRESHOLD", "200000"))
SHARD_BUCKETS = int(os.environ.get("SPARK_GRAFT_MARKS_SHARD_BUCKETS", "256"))


def _bucket_of(series: str, n_buckets: int) -> int:
    # crc32 is stable across processes/platforms (unlike hash()); the
    # bucket layout is internal to this sidecar, nothing else keys on it.
    return zlib.crc32(series.encode("utf-8")) % n_buckets


class _ShardView:
    """Read-only mapping facade over the per-bucket dicts so existing
    call sites (``s in marks._marks``, ``marks._marks.items()``,
    truthiness, ``len``) keep working after migration."""

    __slots__ = ("_shards", "_n")

    def __init__(self, shards: list[dict]):
        self._shards = shards
        self._n = sum(len(s) for s in shards)

    def __contains__(self, series: str) -> bool:
        return series in self._shards[_bucket_of(series, len(self._shards))]

    def __len__(self) -> int:
        return self._n

    def __bool__(self) -> bool:
        return self._n > 0

    def __iter__(self):
        for shard in self._shards:
            yield from shard

    def get(self, series: str, default=None):
        return self._shards[_bucket_of(series, len(self._shards))].get(series, default)

    def items(self):
        for shard in self._shards:
            yield from shard.items()

    def keys(self):
        return iter(self)

    def values(self):
        for shard in self._shards:
            yield from shard.values()


class MarkStore:
    """Monotone per-series integer marks with atomic publish.

    Storage is either one legacy JSON (``{name}.json``) or, once the
    series count crosses ``SHARD_THRESHOLD``, a sharded directory
    (``{name}_shards/b_NNNN.json`` + ``_meta.json``).  ``_marks`` is a
    plain dict while unsharded and a ``_ShardView`` after — both
    support the mapping operations call sites use.
    """

    def __init__(self, measurement_path: str, name: str):
        from simple_tsdb_spark.fs import get_fs

        base = f"{measurement_path}/_tsdb_meta"
        self.path = f"{base}/{name}.json"
        self._shard_dir = f"{base}/{name}_shards"
        self._meta_path = f"{self._shard_dir}/_meta.json"
        self._fs = get_fs(self.path)
        self._shards: list[dict] | None = None
        if self._fs.exists(self._meta_path):
            n = int(json.loads(self._fs.read_text(self._meta_path))["buckets"])
            self._shards = [{} for _ in range(n)]
            for b in range(n):
                p = self._bucket_path(b)
                if self._fs.exists(p):
                    self._shards[b] = {
                        k: int(v) for k, v in json.loads(self._fs.read_text(p)).items()
                    }
            self._marks = _ShardView(self._shards)
        elif self._fs.exists(self.path):
            self._marks = {
                k: int(v) for k, v in json.loads(self._fs.read_text(self.path)).items()
            }
        else:
            self._marks = {}

    # --- storage -----------------------------------------------------

    def _bucket_path(self, b: int) -> str:
        return f"{self._shard_dir}/b_{b:04d}.json"

    def _store_exists(self) -> bool:
        return self._fs.exists(self._meta_path) or self._fs.exists(self.path)

    def _migrate_to_shards(self) -> None:
        """Split the flat dict into buckets; marker published LAST so a
        crash mid-migration leaves the (still-correct) legacy file
        authoritative."""
        flat = self._marks
        self._shards = [{} for _ in range(SHARD_BUCKETS)]
        for s, t in flat.items():
            self._shards[_bucket_of(s, SHARD_BUCKETS)][s] = t
        for b, shard in enumerate(self._shards):
            if shard:
                self._fs.write_text_atomic(self._bucket_path(b), json.dumps(shard))
        self._fs.write_text_atomic(self._meta_path, json.dumps({"buckets": SHARD_BUCKETS}))
        self._marks = _ShardView(self._shards)

    def _advance(self, updates: dict[str, int], floor: int | None) -> None:
        """Apply monotone updates and publish.  ``floor`` seeds unknown
        series (0 keeps time_last's historical behavior; None means use
        the update value directly)."""
        if self._shards is None:
            for s, t in updates.items():
                cur = self._marks.get(s, floor)
                self._marks[s] = int(t) if cur is None else max(cur, int(t))
            if len(self._marks) <= SHARD_THRESHOLD:
                self._fs.write_text_atomic(self.path, json.dumps(self._marks))
            else:
                self._migrate_to_shards()
            return
        n = len(self._shards)
        touched = set()
        for s, t in updates.items():
            b = _bucket_of(s, n)
            shard = self._shards[b]
            cur = shard.get(s, floor)
            shard[s] = int(t) if cur is None else max(cur, int(t))
            touched.add(b)
        for b in touched:
            self._fs.write_text_atomic(self._bucket_path(b), json.dumps(self._shards[b]))
        # _ShardView caches len; refresh after mutation
        self._marks = _ShardView(self._shards)
