#!/usr/bin/env python3
"""Local dev harness (not part of the library): replicate the driver's
DuckDB-oracle compare against the Verify output dir.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [fromName] [timeoutSec]

The optional 3rd arg resumes a long run: only queries whose name sorts
>= fromName are checked (names run in sorted order). The optional 4th
arg interrupts any single oracle after timeoutSec seconds (recorded as
TIMEOUT, run continues) — for large derived scale steps where one
pathological replay must not stall the sweep.
"""
import sys, json, glob, threading
import duckdb
import pandas as pd

import os
sf, out = sys.argv[1], sys.argv[2]
# 3rd arg: "from" or "from:to" name range (sorted-order slice, for
# resuming long runs or sharding a sweep across processes)
rng = (sys.argv[3] if len(sys.argv) > 3 else "").split(":")
from_name = rng[0]
to_name = rng[1] if len(rng) > 1 and rng[1] else "￿"
timeout_sec = float(sys.argv[4]) if len(sys.argv) > 4 else None
con = duckdb.connect()
# sharded sweeps cap per-process threads so slices share the host
if os.environ.get("GRAFT_DUCKDB_THREADS"):
    con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver fixtures are bare files; derived scale steps (ScaleData)
    # are Spark-written directories — glob those
    p = f"{sf}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = {k: v for k, v in json.load(open(f"{out}/oracle_sql.json")).items()
          if from_name <= k < to_name}
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    timer = None
    timed_out = []
    if timeout_sec:
        timer = threading.Timer(timeout_sec,
                                lambda: (timed_out.append(1),
                                         con.interrupt()))
        timer.start()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        kind = "TIMEOUT" if timed_out else "oracle error"
        print(f"FAIL {name}: {kind} {e}"); fails += 1; continue
    finally:
        if timer:
            timer.cancel()
    # driver-style: sort columns by name
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)] if set(exp.columns) == set(got.columns) else exp
    exp = exp.reset_index(drop=True)
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    # driver hash is dtype-sensitive: DuckDB HUGEINT (uncast sum of BIGINT)
    # lands as float64 and mismatches Spark's int64 even when values agree
    dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
          if str(got[c].dtype) != str(exp[c].dtype)]
    if dt:
        print(f"FAIL {name}: dtype drift {dt}"); fails += 1; continue
    # exact value compare (hash analog), row order as produced
    bad = None
    for c in got.columns:
        gv, ev = got[c], exp[c]
        try:
            eq = (gv.astype(object).where(pd.notna(gv), None) ==
                  ev.astype(object).where(pd.notna(ev), None))
        except Exception:
            eq = gv.eq(ev)
        if not eq.all():
            i = int(eq.idxmin())
            bad = (c, i, gv.iloc[i], ev.iloc[i]); break
    if bad:
        print(f"FAIL {name}: col {bad[0]} row {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print("-----"); print(f"{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
