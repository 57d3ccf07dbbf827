"""Streaming cross-partition dedup index — the one component in this engine
that genuinely needs RAW Ray actors rather than a Dataset op: a SHARED
MUTABLE hash index that must observe inserts from earlier partitions while
later partitions stream through (incremental crawl ingestion: today's
partition must dedup against everything already accepted).

A Dataset ``groupby`` can dedup WITHIN one pass, but state across passes /
runs needs an index that outlives the pipeline. Design:

* the key space is SHARDED over N index actors (``key % N``) — memory and
  claim traffic scale horizontally, no single bottleneck actor; on a real
  cluster shards spread across nodes (Ray schedules them independently);
* ``claim(keys)`` is atomic per shard (Ray actors serialize method calls),
  so first-claimer-wins is race-free; a batch groups its keys by owning
  shard and issues ONE call per shard (not per key);
* claims are idempotent at the key level: re-claiming an accepted key
  returns False forever after — re-running a partition yields 0 survivors,
  which is exactly the resume semantic ``state/manifest.py`` needs for
  at-least-once ingestion.

Within a single pass, batches race benignly: WHICH duplicate row survives
is first-come, but the surviving key set (and so all counts) is
deterministic. Across sequentially ingested partitions the winner is
deterministic too (earlier partition always wins).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import ray
import ray.data as rd

DEFAULT_SHARDS = 8


@ray.remote
class DedupShard:
    """One slice of the shared hash index. Method calls are serialized by
    the actor model — ``claim`` is atomic without locks."""

    def __init__(self) -> None:
        self.seen: set[int] = set()

    def claim(self, keys: list[int]) -> list[bool]:
        out = []
        seen = self.seen
        for k in keys:
            if k in seen:
                out.append(False)
            else:
                seen.add(k)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self.seen)

    def dump(self) -> bytes:
        """Shard state as sorted int64 bytes (deterministic snapshot)."""
        return np.sort(np.fromiter(self.seen, dtype=np.int64, count=len(self.seen))).tobytes()

    def load(self, blob: bytes) -> int:
        self.seen.update(np.frombuffer(blob, dtype=np.int64).tolist())
        return len(self.seen)


class StreamingDeduper:
    """Sharded streaming exact-dedup over any dataset with a ``text``
    column. ``dedup(ds)`` returns the surviving rows of one partition;
    call it again (same instance) for the next partition and cross-partition
    duplicates are dropped."""

    def __init__(self, n_shards: int = DEFAULT_SHARDS) -> None:
        self.n_shards = n_shards
        self.shards = [DedupShard.remote() for _ in range(n_shards)]

    @staticmethod
    def key_of(text: str) -> int:
        return int.from_bytes(
            hashlib.md5(text.encode("utf-8")).digest()[8:16], "little"
        ) % (1 << 62)

    def dedup(self, ds: rd.Dataset, column: str = "text") -> rd.Dataset:
        """Returns the partition's surviving rows (first claimer of each
        distinct ``column`` value wins), MATERIALIZED: claim() has
        side effects, so the plan must run exactly once — a lazy return
        would re-claim (and emit zero rows) on every re-execution, and a
        task retry would silently drop its batch's survivors. Materializing
        pins the one true output; the cost is bounded by the partition, not
        the corpus (ingestion is per-partition by design)."""
        shards, n = self.shards, self.n_shards

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            keys = np.fromiter(
                (StreamingDeduper.key_of(t) for t in df[column].astype(str)),
                dtype=np.int64,
                count=len(df),
            )
            owner = keys % n
            new = np.zeros(len(df), dtype=bool)
            # one claim() round-trip per shard, all shards in flight at once
            calls, idxs = [], []
            for s in range(n):
                ix = np.nonzero(owner == s)[0]
                if len(ix):
                    calls.append(shards[s].claim.remote(keys[ix].tolist()))
                    idxs.append(ix)
            for ix, res in zip(idxs, ray.get(calls)):
                new[ix] = res
            # batch-local repeats of a key: claim() marks only the first True
            return df[new]

        return ds.map_batches(fn, batch_format="pandas").materialize()

    def index_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def checkpoint(self, out_dir: str) -> None:
        """Durable snapshot of the whole index (the JetStream-durability
        analog for actor state): every shard dumps its sorted key set into a
        temp dir, the previous snapshot is PARKED at ``<out_dir>.old`` while
        the new one renames into place, then the parked one is removed — a
        kill at ANY point leaves either the new or the parked snapshot on
        disk (``restore_available`` checks both), never zero snapshots
        (an earlier version rmtree'd the old snapshot before the rename,
        leaving a kill window with no snapshot at all). Snapshot size is
        8 bytes/key, sharded into one file per actor."""
        import json
        import shutil

        tmp = out_dir + f".tmp{os.getpid()}"
        old = out_dir + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        blobs = ray.get([s.dump.remote() for s in self.shards])
        for i, blob in enumerate(blobs):
            with open(os.path.join(tmp, f"shard_{i}.keys"), "wb") as f:
                f.write(blob)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump({"n_shards": self.n_shards}, f)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(out_dir):
            os.rename(out_dir, old)  # park, don't destroy
        os.rename(tmp, out_dir)
        shutil.rmtree(old, ignore_errors=True)

    @classmethod
    def restore_available(cls, snap_dir: str) -> "StreamingDeduper | None":
        """Restore the newest intact snapshot: the primary dir, else the
        parked ``.old`` one (kill mid-swap), else None. Claims recorded only
        in a lost newer snapshot are simply re-claimed when their partition
        reprocesses — never dropped."""
        if os.path.isdir(snap_dir):
            return cls.restore(snap_dir)
        old = snap_dir + ".old"
        if os.path.isdir(old):
            return cls.restore(old)
        return None

    @classmethod
    def restore(cls, snap_dir: str) -> "StreamingDeduper":
        """Rebuild the index from a checkpoint: fresh actors, each preloaded
        with its own shard file (the key→shard mapping depends on n_shards,
        which the snapshot pins). Re-ingesting an already-accepted partition
        after restore yields 0 survivors — the resume semantic."""
        import json

        with open(os.path.join(snap_dir, "meta.json")) as f:
            n_shards = int(json.load(f)["n_shards"])
        inst = cls(n_shards=n_shards)
        loads = []
        for i, shard in enumerate(inst.shards):
            with open(os.path.join(snap_dir, f"shard_{i}.keys"), "rb") as f:
                loads.append(shard.load.remote(f.read()))
        ray.get(loads)
        return inst


def streaming_dedup_stats(sf_dir: str, n_shards: int = DEFAULT_SHARDS) -> pd.DataFrame:
    """Driver-contract query: ingest the documents table as two sequential
    partitions (doc_id < N/2, then the rest) through ONE shared index and
    report per-partition input/survivor counts. Survivor COUNTS are
    deterministic (the key set accepted per partition does not depend on
    batch races), so the whole stateful-streaming behaviour is
    SQL-checkable: partition B's survivors are its distinct hashes minus
    those already seen in partition A."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.read_metadata(path).num_rows
    half = n_docs // 2
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    part_a = docs.filter(expr=f"doc_id < {half}")
    part_b = docs.filter(expr=f"doc_id >= {half}")

    dd = StreamingDeduper(n_shards=n_shards)
    rows = []
    for name, part in (("a", part_a), ("b", part_b)):
        kept = dd.dedup(part)
        # count n_in from the actual partition rows (not the doc_id
        # arithmetic — doc_ids need not be contiguous after a refresh),
        # matching the oracle's COUNT(*) exactly
        n_in = part.count()
        rows.append((name, n_in, kept.count()))
    out = pd.DataFrame(rows, columns=["partition", "n_in", "n_survived"])
    return out.astype({"n_in": "int64", "n_survived": "int64"})


_STREAMING_DEDUP_STATS_SQL = """
WITH half AS (SELECT COUNT(*) // 2 AS h FROM documents),
a AS (SELECT md5(text) AS k FROM documents WHERE doc_id < (SELECT h FROM half)),
b AS (SELECT md5(text) AS k FROM documents WHERE doc_id >= (SELECT h FROM half))
SELECT 'a' AS partition,
       (SELECT COUNT(*) FROM a) AS n_in,
       (SELECT COUNT(DISTINCT k) FROM a) AS n_survived
UNION ALL
SELECT 'b' AS partition,
       (SELECT COUNT(*) FROM b) AS n_in,
       (SELECT COUNT(DISTINCT k) FROM b WHERE k NOT IN (SELECT k FROM a))
         AS n_survived
"""


QUERIES = {"streaming_dedup_stats": streaming_dedup_stats}
ORACLES = {"streaming_dedup_stats": _STREAMING_DEDUP_STATS_SQL}
