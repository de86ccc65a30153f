"""Streaming materialized-view maintenance: keep a standing rollup
table current from an event stream, one micro-batch at a time.

The streaming face of ``operators/incremental.py``: each micro-batch
is aggregated ALONE to a bounded partial (map-side combined, one hash
agg over just the batch), then merged into the standing rollup with
the algebraic merge functions — the rollup is |keys|-sized, so the
merge never touches history-sized data. This is what a 100 TB/day
"keep the daily dashboard current" job actually is: Spark's built-in
streaming aggregation holds state in the state store and emits
changed rows; this maintainer instead owns a QUERYABLE TABLE on
shared storage, survives checkpoint loss (the table IS the state),
and lets batch readers hit it mid-stream.

Commit protocol (the miniature of what Delta/Iceberg do with a
transaction log): each batch writes a NEW version directory
(distributed — no collect, no coalesce(1)) and then atomically swaps
a ``CURRENT`` pointer file (``os.replace``) to it. The pointer swap
is the single commit point:

- crash before the swap → pointer still names the last complete
  version; the checkpoint replays the batch and re-merges from it —
  the table is never absent and never half-written (the old
  move-directories-around design had a window where the table
  vanished mid-swap and a replay silently reinitialized it);
- replayed batch AFTER a successful swap → the pointer records the
  committed batch id, so the replay is skipped (idempotence ledger
  and commit are the same atomic write — no ledger-vs-data gap);
- failed/superseded version directories are swept opportunistically
  on the next batch (they are invisible — nothing points at them).

Equivalence (final streamed rollup == one-shot batch aggregate over
all input) is pinned in tests/test_streaming_mv.py.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental import merge_rollups, partial_rollup


class RollupMaintainer:
    """foreachBatch target maintaining a (group_cols -> partial state)
    rollup under ``path`` as pointer-committed version directories."""

    def __init__(self, path: str, group_cols: list[str]) -> None:
        self.path = path
        self.group_cols = group_cols

    # -- pointer (= commit record + idempotence ledger) ----------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _current(self) -> tuple[int, str] | None:
        """(last committed batch_id, version dir name) or None."""
        try:
            with open(self._pointer_path()) as f:
                batch_s, vdir = f.read().strip().split("\n")
                return int(batch_s), vdir
        except (FileNotFoundError, ValueError):
            return None

    # -- current table --------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        cur = self._current()
        if cur is None:
            return None
        return spark.read.parquet(os.path.join(self.path, cur[1]))

    # -- the foreachBatch body ------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        cur = self._current()
        if cur is not None and batch_id <= cur[0]:
            return  # replayed batch after its commit: skip
        spark = batch_df.sparkSession
        partial = partial_rollup(batch_df, self.group_cols)
        current = self.read(spark)
        merged = (
            partial
            if current is None
            else merge_rollups([current, partial], self.group_cols)
        )
        os.makedirs(self.path, exist_ok=True)
        vdir = f"v_{batch_id}_{uuid.uuid4().hex[:8]}"
        merged.write.parquet(os.path.join(self.path, vdir))
        # atomic commit: content written first, pointer swapped last
        tmp = os.path.join(self.path, f".ptr_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(f"{batch_id}\n{vdir}")
        os.replace(tmp, self._pointer_path())
        self._sweep(keep=vdir)

    def _sweep(self, keep: str) -> None:
        """Best-effort GC of superseded/failed version dirs and stale
        pointer temps — everything except the committed version."""
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            try:
                if name.startswith("v_") and name != keep:
                    shutil.rmtree(full, ignore_errors=True)
                elif name.startswith(".ptr_"):
                    os.remove(full)
            except OSError:
                pass  # a reader may hold it open; next batch retries
