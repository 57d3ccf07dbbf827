"""Round-granular checkpointing for ITERATIVE Dataset algorithms.

``state/manifest.py`` makes the one-pass extraction pipeline resumable at
partition granularity; this module extends the same discipline to the other
long-running shape a 100 TB corpus job has — iterative graph/fixpoint
computations (label propagation, peeling, PageRank-style loops), where a
crash in round 37 of 60 would otherwise restart from round 0 and the
partition manifest cannot help because every round touches every partition.

Mechanics (same atomic-publish rules as the partition manifest):

  * after each round the algorithm's STATE table (slim — labels, degrees,
    ranks; never payloads) is written DISTRIBUTED to
    ``<ckpt_dir>/round=<r>.tmp.<pid>/`` and published by directory rename to
    ``<ckpt_dir>/round=<r>/``, followed by a ``<ckpt_dir>/round=<r>.json``
    metadata row (round number, the algorithm's convergence witness, row
    count, wall time). The rename is the commit point; a crash mid-write
    leaves only an unpublished ``.tmp`` directory that the next run ignores
    and overwrites.
  * a resumed run loads the LATEST committed round's parquet as its state
    and continues from round r+1 — completed rounds are never re-executed
    (asserted by the kill/resume test, which counts executed rounds).
  * rounds are deterministic functions of (edges, state), so an
    interrupted-and-resumed run produces byte-identical final labels to an
    uninterrupted one (also asserted in tests).
  * superseded round directories are pruned (keep the last ``keep``), so
    checkpoint storage is O(state), not O(state × rounds).

``checkpointed_min_label_components`` wires this into the SAME round body as
``near_dup_components``'s large path (``corpus_ops._label_prop_round``), so
the checkpointed and plain variants cannot drift semantically.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pandas as pd
import ray.data as rd


class IterCheckpointer:
    """Atomic round-state store under one checkpoint directory."""

    def __init__(self, ckpt_dir: str, keep: int = 2) -> None:
        self.dir = ckpt_dir
        self.keep = keep
        os.makedirs(ckpt_dir, exist_ok=True)

    # -- read side ---------------------------------------------------------

    def committed_rounds(self) -> list[int]:
        out = []
        for f in os.listdir(self.dir):
            if f.startswith("round=") and f.endswith(".json"):
                try:
                    out.append(int(f[len("round="):-len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def latest(self) -> tuple[int, dict] | None:
        """(round, metadata) of the newest committed round, or None."""
        rounds = self.committed_rounds()
        while rounds:
            r = rounds.pop()
            data_dir = os.path.join(self.dir, f"round={r}")
            if os.path.isdir(data_dir):  # tolerate a pruned/partial pair
                with open(os.path.join(self.dir, f"round={r}.json")) as fh:
                    return r, json.load(fh)
        return None

    def load(self, r: int) -> rd.Dataset:
        return rd.read_parquet(os.path.join(self.dir, f"round={r}"))

    # -- write side ----------------------------------------------------------

    def save(self, r: int, state: rd.Dataset, meta: dict) -> None:
        """Distributed write → atomic rename → metadata commit → prune."""
        final = os.path.join(self.dir, f"round={r}")
        tmp = f"{final}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.time()
        state.write_parquet(tmp)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        row = dict(meta, round=r, wall_s=round(time.time() - t0, 3))
        mpath = os.path.join(self.dir, f"round={r}.json")
        with open(mpath + ".tmp", "w") as fh:
            json.dump(row, fh)
        os.replace(mpath + ".tmp", mpath)
        self._prune(r)

    def _prune(self, newest: int) -> None:
        for r in self.committed_rounds():
            if r <= newest - self.keep:
                shutil.rmtree(
                    os.path.join(self.dir, f"round={r}"), ignore_errors=True
                )
                try:
                    os.remove(os.path.join(self.dir, f"round={r}.json"))
                except OSError:
                    pass


class SimulatedCrash(RuntimeError):
    """Raised by the fault-injection hook in tests."""


def checkpointed_min_label_components(
    nodes: rd.Dataset,
    pairs: rd.Dataset | pd.DataFrame,
    ckpt_dir: str,
    num_partitions: int = 8,
    max_rounds: int = 64,
    die_after_rounds: int | None = None,
) -> tuple[rd.Dataset, int]:
    """Distributed min-label connected components with round-granular
    checkpoint/resume. Semantics identical to
    ``corpus_ops._components_label_propagation`` (same round body); returns
    ``(labels_dataset, rounds_executed_this_run)`` where labels has columns
    (node, label). ``die_after_rounds`` injects a crash AFTER that many
    committed rounds (tests only)."""
    from ..functions.corpus_ops import _label_prop_round, directed_edges

    ck = IterCheckpointer(ckpt_dir)
    edges = directed_edges(pairs)

    got = ck.latest()
    if got is not None:
        r0, meta = got
        # normalize to pandas blocks: parquet loads as Arrow, and a
        # block-type mix inside the round's union crashes downstream
        # batchers (scheduling-dependent)
        labels = (
            ck.load(r0)
            .map_batches(
                lambda d: d[["node", "label"]], batch_format="pandas"
            )
            .materialize()
        )
        prev_sum = meta.get("label_sum")
        if meta.get("converged"):
            return labels, 0
    else:
        r0 = 0
        labels = nodes.map_batches(
            lambda d: pd.DataFrame({"node": d["doc_id"], "label": d["doc_id"]}),
            batch_format="pandas",
        ).materialize()
        prev_sum = None

    executed = 0
    for r in range(r0 + 1, max_rounds + 1):
        labels, s = _label_prop_round(edges, labels, num_partitions)
        executed += 1
        converged = s == prev_sum
        ck.save(r, labels, {"label_sum": int(s), "converged": converged})
        if converged:
            break
        prev_sum = s
        if die_after_rounds is not None and executed >= die_after_rounds:
            raise SimulatedCrash(f"injected crash after round {r}")
    return labels, executed
