"""Keyed upsert sink with TTL / ifNotExists semantics (K1/K2).

The reference writes verdicts to Cassandra with primary key ``bot_ip``,
``ifNotExists=true`` (insert-only-when-absent) and a 10-minute row TTL
(ImplDStreams.scala:71-78; Common.scala:9; cassandra/init.cql:5) and
the structured path does per-row foreach INSERTs
(ImplStructured.scala:22-36). Spark-first equivalent: a
``foreachBatch`` MERGE into a keyed table —

- upsert: new batch rows replace same-key rows (last-writer-wins), or
  are discarded if the key exists and ``if_not_exists`` is set;
- TTL: retention filter on a ``detected_at`` column applied on every
  batch (row expiry without a TTL-capable store);
- idempotence: re-delivered batches converge (MERGE by key), which is
  what makes checkpoint recovery exactly-once end-to-end.

On a real cluster this foreachBatch body would target Delta/Iceberg
``MERGE INTO``; plain parquet overwrite keeps the container
dependency-free while exercising identical semantics. The table is
small by construction (one row per flagged key), so the batch-side
join broadcasts it.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KeyedUpsertSink:
    """foreachBatch target maintaining a keyed parquet table."""

    def __init__(
        self,
        path: str,
        key_cols: list[str],
        ttl_sec: int | None = None,
        if_not_exists: bool = False,
        now_fn: Callable[[], float] = time.time,
        n_partitions: int | None = None,
    ) -> None:
        self.path = path
        self.key_cols = key_cols
        self.ttl_sec = ttl_sec
        self.if_not_exists = if_not_exists
        self.now_fn = now_fn
        # When set, the table is laid out as n hash-of-key directory
        # partitions (`kpart=<k>/`) and a micro-batch rewrites ONLY the
        # partitions its keys hash into — per-trigger I/O becomes
        # O(touched keys' partitions), not O(table). A key's partition
        # is a pure function of the key, so merge semantics (upsert /
        # ifNotExists) are unchanged: colliding keys always land in the
        # same partition. TTL expiry stays a read-side filter for
        # untouched partitions (their expired rows compact away the
        # next time their partition is touched).
        self.n_partitions = n_partitions

    # -- helpers ------------------------------------------------------------

    def _read_current(self, spark: SparkSession) -> DataFrame | None:
        """Current table, or None only when the table doesn't exist yet.

        Only the path-not-found AnalysisException maps to "empty table";
        any other failure (corrupt footer, FS hiccup) must propagate so
        the micro-batch fails and is retried from the checkpoint instead
        of silently overwriting the table with just the incoming batch.
        """
        try:
            return spark.read.parquet(self.path)
        except AnalysisException as exc:
            get_cond = getattr(exc, "getCondition", None) or exc.getErrorClass
            if (get_cond() or "") == "PATH_NOT_FOUND":
                return None
            raise

    def _apply_ttl(self, df: DataFrame) -> DataFrame:
        if self.ttl_sec is None:
            return df
        cutoff = self.now_fn() - self.ttl_sec
        return df.where(F.col("detected_at") >= F.lit(cutoff))

    def _merge(self, current: DataFrame | None, incoming: DataFrame) -> DataFrame:
        """MERGE semantics shared by both layouts: last-writer-wins
        upsert, or insert-only-when-absent under ``if_not_exists``."""
        if current is None:
            return incoming
        current = self._apply_ttl(current)
        if self.if_not_exists:
            incoming = incoming.join(
                current.select(*self.key_cols), self.key_cols, "left_anti"
            )
            return current.unionByName(incoming)
        kept = current.join(
            incoming.select(*self.key_cols), self.key_cols, "left_anti"
        )
        return kept.unionByName(incoming)

    # -- the foreachBatch body ------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        now = self.now_fn()
        incoming = batch_df.dropDuplicates(self.key_cols).withColumn(
            "detected_at", F.lit(float(now))
        )
        if self.n_partitions is not None:
            self._partitioned_rewrite(spark, incoming, batch_id)
            return
        current = self._read_current(spark)
        merged = self._merge(current, incoming)
        # Stage the merged table to a sibling temp dir DISTRIBUTED (the
        # executors write parquet in parallel straight from the join
        # plan — nothing ever funnels through the driver), then
        # rename-swap it over the live path. Same discipline as
        # sinks/compaction.py and streaming.pipeline.expire_raw_events:
        # readers either see the old complete table or the new one, and
        # a failed batch leaves the live table untouched so checkpoint
        # retry re-runs the MERGE idempotently. On a real cluster this
        # body is a Delta/Iceberg MERGE INTO (metadata-only commit);
        # with millions of flagged keys this path scales with executor
        # count, not driver heap.
        stage = f"{self.path}._stage_{batch_id}_{uuid.uuid4().hex[:8]}"
        merged.write.parquet(stage)
        if os.path.exists(self.path):
            old = f"{self.path}._old_{uuid.uuid4().hex[:8]}"
            shutil.move(self.path, old)
            shutil.move(stage, self.path)
            shutil.rmtree(old)
        else:
            shutil.move(stage, self.path)

    def _partitioned_rewrite(
        self, spark: SparkSession, incoming: DataFrame, batch_id: int
    ) -> None:
        """Rewrite only the hash partitions the batch touches.

        The batch's distinct partition ids are at most ``n_partitions``
        integers (driver-side collect is bounded by the layout, not the
        data); current rows load with a partition filter on ``kpart`` —
        directory pruning, untouched partition files are never opened —
        and the merged result stages to a temp dir partitioned the same
        way before each touched ``kpart=<k>`` directory is swapped in.
        Untouched partitions stay byte-identical (pinned by test). A
        failed batch leaves every live partition untouched; checkpoint
        retry re-runs the MERGE idempotently, as in the whole-table
        path."""
        kp = F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_partitions)).cast(
            "int"
        )
        incoming = incoming.withColumn("kpart", kp)
        touched = sorted(
            r[0] for r in incoming.select("kpart").distinct().collect()
        )
        if not touched:
            return
        current = self._read_current(spark)
        if current is not None:
            current = current.where(F.col("kpart").isin([int(k) for k in touched]))
        merged = self._merge(current, incoming)
        stage = f"{self.path}._stage_{batch_id}_{uuid.uuid4().hex[:8]}"
        merged.write.partitionBy("kpart").parquet(stage)
        os.makedirs(self.path, exist_ok=True)
        for k in touched:
            src = os.path.join(stage, f"kpart={int(k)}")
            dst = os.path.join(self.path, f"kpart={int(k)}")
            if not os.path.exists(src):
                # merge emitted nothing for this partition (e.g. every
                # row TTL-expired and the batch's keys were all dropped
                # by ifNotExists): the partition is now empty
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                continue
            if os.path.exists(dst):
                old = f"{self.path}._old_{int(k)}_{uuid.uuid4().hex[:8]}"
                shutil.move(dst, old)
                shutil.move(src, dst)
                shutil.rmtree(old)
            else:
                shutil.move(src, dst)
        shutil.rmtree(stage, ignore_errors=True)

    def read(self, spark: SparkSession, apply_ttl: bool = True) -> DataFrame:
        df = self._read_current(spark)
        if df is None:
            return spark.createDataFrame([], "struct<>")
        if "kpart" in df.columns:
            df = df.drop("kpart")
        return self._apply_ttl(df) if apply_ttl else df


def console_sink(df: DataFrame, **options):
    """K5 — debug console sink (``botStream.print()`` analog)."""
    return df.writeStream.format("console").options(**options)
