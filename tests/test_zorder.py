"""Z-order layout (sinks/zorder.py): the point is DATA SKIPPING on two
independent keys at once — verified directly against parquet footer
min/max statistics, the same stats a 1000-executor scan would prune
row groups with.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.projections import (
    ensure_timestamp,
)
from in_stream_processing_course_spark.sinks.zorder import (
    write_events_zordered,
)
from in_stream_processing_course_spark.sources.batch import load_table

N_FILES = 16


def _file_bounds(path_glob: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def _files_matching(bounds: list[tuple[int, int]], point) -> int:
    return sum(1 for lo, hi in bounds if lo <= point <= hi)


def test_zorder_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    ev = ensure_timestamp(load_table(spark, sf_dir, "events"), "ts")

    zdir = str(tmp_path / "zorder")
    write_events_zordered(ev, zdir, n_files=N_FILES)

    # baseline: linear time-sorted layout, same file count
    ldir = str(tmp_path / "linear")
    (
        ev.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    # written data is intact
    assert (
        spark.read.parquet(zdir).count()
        == spark.read.parquet(ldir).count()
        == ev.count()
    )

    zu = _file_bounds(f"{zdir}/*.parquet", "user_id")
    lu = _file_bounds(f"{ldir}/*.parquet", "user_id")
    assert len(zu) == len(lu) == N_FILES

    users = sorted(r.user_id for r in ev.select("user_id").distinct().collect())
    # a time-sorted layout cannot skip on user_id: every file spans
    # (nearly) the whole user domain, so a point-user predicate still
    # reads ~every file
    linear_avg = sum(_files_matching(lu, u) for u in users) / len(users)
    z_avg = sum(_files_matching(zu, u) for u in users) / len(users)
    assert linear_avg >= N_FILES - 1
    # z-order bounds each file to a user-range rectangle; averaged over
    # every user, a point predicate must skip a material share of files
    assert z_avg <= 0.67 * linear_avg, (z_avg, linear_avg, zu)

    # and the time dimension still prunes too (files cover bounded
    # time rectangles, not the full range)
    ev_days = ev.select(
        F.expr("unix_timestamp(ts) DIV 86400").alias("d")
    )
    d_lo = ev_days.agg(F.min("d")).collect()[0][0]
    span = ev_days.agg(F.max("d")).collect()[0][0] - d_lo + 1
    zd = []
    for f in sorted(glob.glob(f"{zdir}/*.parquet")):
        tbl = pq.read_table(f, columns=["ts"])
        import pandas as pd

        s = tbl.to_pandas()["ts"]
        days = s.astype("int64") // (86400 * 10**9)
        zd.append((int(days.min()), int(days.max())))
    probe_day = d_lo + span // 2
    day_hits = _files_matching(zd, probe_day)
    assert day_hits < N_FILES, "time dimension should also bound files"
