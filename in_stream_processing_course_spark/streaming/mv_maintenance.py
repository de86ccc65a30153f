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

Write discipline: distributed staged write + rename swap (the
sinks/compaction.py / upsert.py pattern) — no collect, no
coalesce(1); a failed batch leaves the table untouched and the
checkpoint retries the merge. Re-delivered batches are the one
at-least-once hazard for ADDITIVE aggregates: a retry after a
completed swap would double-count, so the maintainer records the last
applied ``batch_id`` inside the table directory and skips batches it
has already merged — the standard transactional-sink idempotence
trick (the reference's DStream course does the same with Kafka
offsets committed alongside results).

Equivalence (final streamed rollup == one-shot batch aggregate over
all input) is pinned in tests/test_streaming_mv.py.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental import merge_rollups, partial_rollup


class RollupMaintainer:
    """foreachBatch target maintaining a (group_cols -> partial state)
    rollup parquet table at ``path``."""

    def __init__(self, path: str, group_cols: list[str]) -> None:
        self.path = path
        self.group_cols = group_cols

    # -- idempotence ledger ---------------------------------------------------

    def _ledger_path(self) -> str:
        return f"{self.path}._applied_batch"

    def _last_applied(self) -> int:
        try:
            with open(self._ledger_path()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    # -- current table --------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.path)
        except AnalysisException as exc:
            get_cond = getattr(exc, "getCondition", None) or exc.getErrorClass
            if (get_cond() or "") == "PATH_NOT_FOUND":
                return None
            raise

    # -- the foreachBatch body ------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_applied():
            return  # replayed batch after successful swap: skip
        spark = batch_df.sparkSession
        partial = partial_rollup(batch_df, self.group_cols)
        current = self.read(spark)
        merged = (
            partial
            if current is None
            else merge_rollups([current, partial], self.group_cols)
        )
        stage = f"{self.path}._stage_{batch_id}_{uuid.uuid4().hex[:8]}"
        merged.write.parquet(stage)
        if os.path.exists(self.path):
            old = f"{self.path}._old_{uuid.uuid4().hex[:8]}"
            shutil.move(self.path, old)
            shutil.move(stage, self.path)
            shutil.rmtree(old)
        else:
            shutil.move(stage, self.path)
        # ledger write AFTER the swap: a crash between swap and ledger
        # re-merges on retry — prevented by writing the ledger first?
        # No: ledger-first would SKIP a batch whose swap then failed
        # (data loss). Ledger-after means the crash window re-applies
        # one batch; the swap is the commit point, and the ledger file
        # is fsync'd tiny, so the window is a single rename wide. A
        # table format (Delta/Iceberg) closes it with txn metadata.
        tmp = f"{self._ledger_path()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._ledger_path())
