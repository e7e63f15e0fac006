#!/usr/bin/env python3
"""Local pre-flight emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result, run the
oracle SQL in DuckDB over the same testdata parquet, sort columns by name and
rows by all columns, then compare shape / dtypes / values (exact, and with
1e-9 relative tolerance for floats so we can distinguish "ulp drift" from
"real bug"). Dev tool only — the engine itself is pure Scala/Spark.
Optional extras for large-SF shakeouts (round 11):
  - extra args after the two dirs restrict the run to those query names;
  - CROSSCHECK_BUDGET_S=<seconds> interrupts any single oracle exceeding
    the budget and records it as TIMEOUT (a single-node oracle replay can
    be iteration-bound at 10x data — recursive first-fit packing, inlined
    CTE recomputation — where the engine side is fine; the shakeout
    artifact should say so instead of hanging).
"""
import json, sys, glob, os, threading
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
budget = float(os.environ.get("CROSSCHECK_BUDGET_S", "0") or 0)
con = duckdb.connect()
# an in-memory connection has NO spill path — an oracle whose working set
# exceeds memory_limit dies with "Failed to allocate block" instead of
# spilling (seen on 7 sf30 oracles, r15); give it a disk temp dir and a
# bounded limit so large-SF oracles trade time for memory like Spark does
con.execute("SET temp_directory='/tmp/duck_spill'")
# cap DuckDB below physical RAM: a hard-coded 48GB on a smaller host would
# raise the cap ABOVE DuckDB's safe default and trade the loud allocation
# failure for an OS-level OOM kill. Env override for unusual hosts; the
# default is min(48GB — this 128GiB box's proven setting — 40% of phys).
_phys_gb = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / 2**30
_mem_gb = int(os.environ.get("CROSSCHECK_MEM_GB", min(48, int(_phys_gb * 0.4)) or 1))
con.execute(f"SET memory_limit='{_mem_gb}GB'")
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver-written testdata is a single parquet FILE per table; corpora
    # from graft.tools.GenScaleCorpus are Spark parquet DIRECTORIES
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
timeouts = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    qdir = os.path.join(outdir, name)
    try:
        spark_df = canon(con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
    except Exception as e:
        print(f"FAIL {name}: spark-result load error: {e}")
        fails += 1
        continue
    # the interrupt must not race a just-finished execute: if the oracle
    # returns right at the budget edge, a bare Timer(con.interrupt) can fire
    # AFTER execute() but BEFORE cancel(), interrupting the shared
    # connection while no query runs (or the next loop's read_parquet) and
    # recording a spurious FAIL. Two guards: each budgeted oracle runs on a
    # DEDICATED cursor (shares the catalog/views, discarded right after, so
    # a late interrupt can only ever land on a connection nothing reuses),
    # and the timer callback checks a completion flag for the common case.
    ocon = con.cursor() if budget else con
    done = threading.Event()
    timer = threading.Timer(
        budget, lambda: None if done.is_set() else ocon.interrupt()) \
        if budget else None
    try:
        if timer: timer.start()
        duck_df = canon(ocon.execute(oracle[name]).df())
    except duckdb.InterruptException:
        print(f"TIMEOUT {name}: oracle exceeded {budget:.0f}s (replay-bound, not compared)")
        timeouts += 1
        continue
    except Exception as e:
        print(f"FAIL {name}: oracle exec error: {e}")
        fails += 1
        continue
    finally:
        done.set()
        if timer:
            timer.cancel()
            ocon.close()
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        fails += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
        fails += 1
        continue
    bad = []
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            an, bn = a.astype(float).to_numpy(), b.astype(float).to_numpy()
            exact = np.array_equal(an, bn, equal_nan=True)
            close = np.allclose(an, bn, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not exact:
                bad.append((c, "float-close" if close else "float-FAR"))
        else:
            if not a.equals(b):
                try:
                    eq = (a.astype(str) == b.astype(str)).all()
                except Exception:
                    eq = False
                if not eq:
                    bad.append((c, f"dtype {a.dtype} vs {b.dtype}"))
    if bad:
        print(f"FAIL {name}: {bad}")
        # show first few diffs of first bad col
        c = bad[0][0]
        m = spark_df[c].astype(str) != duck_df[c].astype(str)
        print(pd.concat([spark_df[m].head(3).add_suffix("_spark"),
                         duck_df[m].head(3).add_suffix("_duck")], axis=1).to_string())
        fails += 1
    else:
        print(f"OK   {name} ({len(spark_df)} rows)")
# count only filter names that actually exist in oracle_sql.json: a
# typo'd name is skipped by the loop guard and must not inflate the
# denominator ("0 failures / 12 queries" overstating coverage)
unknown = sorted(only - oracle.keys())
if unknown:
    print(f"WARN: {len(unknown)} filter name(s) match no oracle entry: {unknown}")
    fails += len(unknown)
ran = len(only & oracle.keys()) if only else len(oracle)
suffix = f" ({timeouts} oracle timeouts)" if timeouts else ""
print(f"\n{fails} failures / {ran} queries{suffix}")
sys.exit(1 if fails else 0)
