#!/usr/bin/env python3
"""Local dev harness (not part of the library): replicate the driver's
DuckDB-oracle compare against the Verify output dir.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [fromName] [timeoutSec]

The optional 3rd arg resumes a long run: only queries whose name sorts
>= fromName are checked (names run in sorted order; "from:to" slices).
The optional 4th arg interrupts any single oracle after timeoutSec
seconds (recorded as TIMEOUT, run continues) — for large derived scale
steps where one pathological replay must not stall the sweep.

Env knobs (sweep tuning at derived scale steps):
  GRAFT_DUCKDB_THREADS  — SET threads (sharded sweeps share the host)
  GRAFT_DUCKDB_MEMORY   — SET memory_limit (e.g. "24GB"; default DuckDB
                          80%-of-RAM heuristic OOMs the host on the
                          window-heavy tx_* replays at sf1)
  GRAFT_DUCKDB_TEMPDIR  — SET temp_directory (spill location; the sf1
                          gr_triangles replay spills tens of GB)
  GRAFT_ORACLE_JSON     — result file path (default:
                          <verifyOutDir>/oracle_check.json). Sweep
                          evidence is an ARTIFACT, not stdout: one JSON
                          object {sf, verify_dir, range, timeout_sec,
                          results:{name:{status, elapsed_sec, rows,
                          reason?}}, ok, fail, total}. Sharded/resumed
                          runs MERGE into an existing file (same sf +
                          verify_dir) so a sweep accumulates into one
                          record.
"""
import sys, json, glob, threading, time
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


def connect():
    con = duckdb.connect()
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    if os.environ.get("GRAFT_DUCKDB_MEMORY"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEMORY']}'")
    if os.environ.get("GRAFT_DUCKDB_TEMPDIR"):
        con.execute(
            f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TEMPDIR']}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver fixtures are bare files; derived scale steps (ScaleData)
        # are Spark-written directories — glob those. A derived SLICE
        # (e.g. scaledata/sf10: lineitem/embeddings/documents/events
        # only) legitimately lacks tables no sliced oracle reads — skip
        # the view; an oracle that DOES reference it fails loudly with
        # a missing-relation error, never silently.
        p = f"{sf}/{t}.parquet"
        if not os.path.exists(p):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


con = connect()

oracle = {k: v for k, v in json.load(open(f"{out}/oracle_sql.json")).items()
          if from_name <= k < to_name}
results = {}
fails = 0


def record(name, status, t0, rows=None, reason=None):
    global fails
    r = {"status": status, "elapsed_sec": round(time.time() - t0, 3)}
    if rows is not None:
        r["rows"] = int(rows)
    if reason is not None:
        r["reason"] = str(reason)[:500]
    results[name] = r
    if status != "OK":
        fails += 1


for name, sql in sorted(oracle.items()):
    t0 = time.time()
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        record(name, "FAIL", t0, reason="no spark output")
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    # Timer race guard: without the lock+flag, a timer that fires AFTER
    # the query finishes but BEFORE cancel() would interrupt() the NEXT
    # query — a spurious FAIL with no actual timeout. The flag is
    # flipped under the lock before any interrupt; the query path flips
    # it under the same lock before the timer can act.
    timer = None
    state = {"done": False, "timed_out": False}
    state_lock = threading.Lock()
    if timeout_sec:
        def fire():
            with state_lock:
                if state["done"]:
                    return
                state["timed_out"] = True
                con.interrupt()
        timer = threading.Timer(timeout_sec, fire)
        timer.start()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        with state_lock:
            state["done"] = True
        kind = "TIMEOUT" if state["timed_out"] else "oracle error"
        print(f"FAIL {name}: {kind} {e}")
        record(name, "TIMEOUT" if state["timed_out"] else "FAIL", t0,
               reason=f"{kind}: {e}")
        if state["timed_out"]:
            # an interrupted connection can be left mid-transaction;
            # rebuild it so the next oracle starts clean
            try:
                con.close()
            except Exception:
                pass
            con = connect()
        continue
    finally:
        # Close the remaining race window: if the timer fired between
        # execute() returning and this block (timed_out set, interrupt
        # delivered to an idle connection), the CURRENT query is fine
        # but the stray interrupt would surface as a spurious "oracle
        # error" on the NEXT one — so on that path rebuild the
        # connection here too, not only on the exception path.
        stray_interrupt = False
        with state_lock:
            stray_interrupt = state["timed_out"] and not state["done"]
            state["done"] = True
        if timer:
            timer.cancel()
        if stray_interrupt:
            try:
                con.close()
            except Exception:
                pass
            con = connect()
    # driver-style: sort columns by name
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)] if set(exp.columns) == set(got.columns) else exp
    exp = exp.reset_index(drop=True)
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        record(name, "FAIL", t0,
               reason=f"columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        record(name, "FAIL", t0, reason=f"rows {len(got)} vs {len(exp)}")
        continue
    # driver hash is dtype-sensitive: DuckDB HUGEINT (uncast sum of BIGINT)
    # lands as float64 and mismatches Spark's int64 even when values agree
    dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
          if str(got[c].dtype) != str(exp[c].dtype)]
    if dt:
        print(f"FAIL {name}: dtype drift {dt}")
        record(name, "FAIL", t0, reason=f"dtype drift {dt}")
        continue
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
            bad = (c, i, gv.iloc[i], ev.iloc[i])
            break
    if bad:
        print(f"FAIL {name}: col {bad[0]} row {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
        record(name, "FAIL", t0,
               reason=f"col {bad[0]} row {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
    else:
        print(f"OK   {name} ({len(got)} rows)")
        record(name, "OK", t0, rows=len(got))
print("-----")
print(f"{len(oracle)-fails}/{len(oracle)} queries match")

# ---- machine-readable record (merge-on-rerun so sharded sweeps build
# one artifact) ----
json_path = os.environ.get("GRAFT_ORACLE_JSON", f"{out}/oracle_check.json")
merged = {}
prev_ranges = []
if os.path.exists(json_path):
    try:
        prev = json.load(open(json_path))
        if prev.get("sf") == sf and prev.get("verify_dir") == out:
            merged = prev.get("results", {})
            # older records carried a single (last-shard) "range" string;
            # normalize both shapes into the accumulated list
            prev_ranges = prev.get("ranges") or (
                [prev["range"]] if prev.get("range") else [])
            # collapse consecutive duplicates already accumulated by
            # pre-fix reruns (the committed record carried five "(all)")
            prev_ranges = [r for i, r in enumerate(prev_ranges)
                           if i == 0 or prev_ranges[i - 1] != r]
    except Exception:
        pass
merged.update(results)
this_range = (sys.argv[3] if len(sys.argv) > 3 else "") or "(all)"
# resume re-runs of the same slice must not grow the list unboundedly —
# only append when this slice differs from the last recorded one
ranges = prev_ranges + ([this_range] if
                        (not prev_ranges or prev_ranges[-1] != this_range)
                        else [])
ok_n = sum(1 for r in merged.values() if r["status"] == "OK")
record_obj = {
    "sf": sf, "verify_dir": out,
    # every shard/resume slice that contributed to this merged record —
    # a single "range" string was a merge artifact (it only named the
    # LAST shard, e.g. "st_audio_ingest:st_audio_ingestz")
    "ranges": ranges,
    "timeout_sec": timeout_sec,
    "duckdb_memory": os.environ.get("GRAFT_DUCKDB_MEMORY"),
    "ok": ok_n, "fail": len(merged) - ok_n, "total": len(merged),
    "results": merged,
}
assert record_obj["ok"] + record_obj["fail"] == record_obj["total"], \
    "merge invariant violated: ok+fail != total"
with open(json_path, "w") as f:
    json.dump(record_obj, f, indent=1, sort_keys=True)
print(f"wrote {json_path} ({ok_n}/{len(merged)} OK)")
sys.exit(1 if fails else 0)
