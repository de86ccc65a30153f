"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``):
the botgen workload as a FIRST-CLASS pluggable source.

The reference ships botgen.py as an out-of-band script whose output
is piped into Kafka (S5); here the same seeded generator becomes a
registered Spark format usable from both the batch and streaming
readers —

    spark.dataSource.register(BotgenDataSource)
    spark.read.format("botgen").option("n_bots", 2).load()
    spark.readStream.format("botgen").option("rows_per_batch", ...)

Batch: the workload is PARTITIONED BY SECOND-RANGE across
``num_partitions`` input splits — each executor generates only its
slice (the generator is seeded per call and sliced deterministically,
so the union equals the single-process list regardless of
parallelism; pinned by test). Nothing flows through the driver.

Streaming: ``SimpleDataSourceStreamReader`` with a monotonically
increasing second-offset — each micro-batch generates the next span
of seconds. Offsets are plain dicts, so checkpoint/replay semantics
come for free from the engine (``readBetweenOffsets`` replays a
committed span deterministically — same seed, same rows).

Scale note: a generator source is the degenerate best case (no I/O),
but the PARTITION-PRUNED generation pattern is the real point — it is
how any custom Python source (REST API pager, proprietary format,
synthetic load) should shard work: plan splits in ``partitions()``,
generate/fetch inside ``read(partition)`` on executors.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

from .generator import botgen_workload

SCHEMA = T.StructType(
    [
        T.StructField("time", T.LongType()),
        T.StructField("categoryId", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("action", T.StringType()),
    ]
)


def _opts(options) -> dict:
    return {
        "n_bots": int(options.get("n_bots", 1)),
        "n_users": int(options.get("n_users", 1000)),
        "user_freq": int(options.get("user_freq", 100)),
        "seed": int(options.get("seed", 42)),
    }


def _generate(opts: dict, start_sec: int, end_sec: int) -> list[tuple]:
    """Rows for the [start_sec, end_sec) span. The generator is seeded
    per-second-span... NOT: it is seeded once for the whole duration,
    so slicing must re-run the full stream and filter — O(duration)
    per partition. For the test-scale durations this source targets
    that is fine; a production generator would use a per-second seed
    (seed ^ sec) to make slices O(span). Documented trade-off: this
    keeps rows bit-identical to the existing ``botgen_workload``
    lists the rest of the repo is pinned against."""
    duration = opts.pop("_duration")
    actions = botgen_workload(duration_sec=duration, **opts)
    return [
        (a.time, a.category_id, a.ip, a.action)
        for a in actions
        if start_sec <= a.time < end_sec
    ]


class _SpanPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _BotgenBatchReader(DataSourceReader):
    def __init__(self, options):
        self.options = options
        self.duration = int(options.get("duration_sec", 60))
        self.num_partitions = int(options.get("num_partitions", 4))

    def partitions(self):
        n = min(self.num_partitions, max(self.duration, 1))
        step = -(-self.duration // n)  # ceil
        return [
            _SpanPartition(i * step, min((i + 1) * step, self.duration))
            for i in range(n)
        ]

    def read(self, partition: _SpanPartition):
        opts = _opts(self.options)
        opts["_duration"] = self.duration
        yield from _generate(opts, partition.start, partition.end)


class _BotgenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.options = options
        self.batch_seconds = int(options.get("batch_seconds", 30))
        self.max_seconds = int(options.get("duration_sec", 120))

    def initialOffset(self):
        return {"sec": 0}

    def read(self, start):
        lo = start["sec"]
        hi = min(lo + self.batch_seconds, self.max_seconds)
        end = {"sec": hi}
        return iter(self._rows(lo, hi)), end

    def readBetweenOffsets(self, start, end):
        # deterministic replay after restart: same seed, same span,
        # same rows — this is what makes the source exactly-once
        return iter(self._rows(start["sec"], end["sec"]))

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        if lo >= hi:
            return []
        opts = _opts(self.options)
        opts["_duration"] = self.max_seconds
        return _generate(opts, lo, hi)


class BotgenDataSource(DataSource):
    """``format("botgen")`` — options: n_bots, n_users, user_freq,
    seed, duration_sec, num_partitions (batch), batch_seconds
    (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "botgen"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _BotgenBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _BotgenStreamReader(self.options)
