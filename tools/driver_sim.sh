#!/bin/bash
# driver-sim verify recipe (.claude/skills/verify) as a script
cd /root/repo
python - <<'PYEOF' 2>/dev/null | tail -3
import sys, decimal
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]")
         .appName("driver-sim").config("spark.ui.enabled","false")
         .config("spark.driver.memory", "8g")
         .config("spark.local.dir", "/root/.spark-local")
         .getOrCreate())
spark.sparkContext.setLogLevel("FATAL")
import __spark_entry__ as e
df = e.entry(spark); print("entry rows:", len(df.collect()))
sys.path.insert(0, "tests")
from oracle_compare import run_oracle, canonical_hash
qs, os_ = e.queries(), e.oracle_sql()
sf = "/root/testdata/sf0.01"
fails = []
for name in sorted(qs):
    try:
        sdf = qs[name](spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        decs = sorted({c for r in srows[:100] for c, v in zip(sdf.columns, r)
                       if isinstance(v, decimal.Decimal)})
        if decs: fails.append((name, f"decimal {decs}"))
        if name in os_:
            ocols, orows = run_oracle(os_[name], sf)
            ok = (sorted(sdf.columns)==sorted(ocols) and len(srows)==len(orows)
                  and canonical_hash(sdf.columns, srows)==canonical_hash(ocols, orows))
            if not ok: fails.append((name, "mismatch"))
    except Exception as ex:
        fails.append((name, f"ERROR {type(ex).__name__}: {str(ex)[:120]}"))
print("queries:", len(qs), "oracles:", len(os_), "FAILS:", fails if fails else "none")
PYEOF
