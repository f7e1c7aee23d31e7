#!/usr/bin/env python3
"""Local dev harness (not part of the library): diff two bench records.

Usage: python3 tools/bench_diff.py <old> <new> [threshold]

Accepts any of the bench formats this repo produces:
  - driver BENCH_r{N}.json  (dict with a "tail" string of per-query
    JSON lines, possibly truncated at the head — whole lines survive)
  - a raw `sbt runMain graft.Bench` capture (lines with an optional
    "[info] " prefix; per-query lines plus the headline line)
  - a bare headline JSON with "queries"/"norm"/"spread" maps

Joins the two records on query name and compares CANARY-NORMALIZED
values (sec / canary_sec — the host-speed-corrected number; falls back
to raw sec when a side has no norm). Reports:
  - movers with |ratio| above the threshold (default 1.5x), flagged
    NOISE? when the delta is within the rep spread of either side
  - added / removed queries
  - headline totals and canaries when present
"""
import sys, json, re


def parse_lines(text):
    """Pull per-query dicts + headline dicts out of any line soup."""
    queries, heads = {}, []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("[info]"):
            line = line[len("[info]"):].strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue  # truncated fragment (bounded log capture)
        if "query" in d and "sec" in d:
            queries[d["query"]] = d
        elif d.get("metric") == "total":
            heads.append(d)
    return queries, heads


def load(path):
    raw = open(path).read()
    queries, heads = {}, []
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict):
        if "tail" in d:  # driver BENCH_r{N}.json
            queries, heads = parse_lines(d["tail"])
            if isinstance(d.get("parsed"), dict):
                heads.append(d["parsed"])
        elif d.get("metric") == "total":  # bare headline
            heads = [d]
    if not queries and not heads:  # raw capture / jsonl
        queries, heads = parse_lines(raw)
    # fold headline maps into per-query rows (headline wins only where
    # no per-query line survived truncation)
    head = next((h for h in heads if "queries" in h), None)
    if head:
        for name, sec in head.get("queries", {}).items():
            row = queries.setdefault(name, {"query": name, "sec": sec})
            row.setdefault("sec", sec)
            if name in head.get("norm", {}):
                row.setdefault("norm", head["norm"][name])
            if name in head.get("spread", {}):
                row.setdefault("spread", head["spread"][name])
    summary = next((h for h in heads if "value" in h), None)
    return queries, summary


def norm_of(row):
    v = row.get("norm")
    return float(v) if v is not None else None


SHUFFLE_HEAVY_MB = 1.0
SCAN_HEAVY_MB = 20.0
SCAN_HEAVY_ROWS = 200_000  # bytesRead is zero on some local-FS paths


def matched_norm(row_old, row_new):
    """Pick the profile-matched normalized pair for a query.

    Shuffle-heavy queries (>1 MB shuffle bytes on either side) are
    memory-bandwidth/scheduler-bound and normalize by the shuffle
    canary (norm_shuffle) when BOTH sides carry it. Otherwise,
    scan-heavy queries (>20 MB input bytes, little shuffle) are
    page-cache/IO-bound and normalize by the scan canary (norm_scan).
    Scalar queries (and records predating the extra canaries) fall back
    to the CPU-canary norm. Returns (old_val, new_val, which) or None
    when no normalized pair exists on both sides."""
    heavy = max(float(row_old.get("shuffle_mb", 0) or 0),
                float(row_new.get("shuffle_mb", 0) or 0)) > SHUFFLE_HEAVY_MB
    if heavy and row_old.get("norm_shuffle") is not None \
            and row_new.get("norm_shuffle") is not None:
        return (float(row_old["norm_shuffle"]),
                float(row_new["norm_shuffle"]), "shuffle")
    scanny = max(float(row_old.get("input_mb", 0) or 0),
                 float(row_new.get("input_mb", 0) or 0)) > SCAN_HEAVY_MB \
        or max(float(row_old.get("input_rows", 0) or 0),
               float(row_new.get("input_rows", 0) or 0)) > SCAN_HEAVY_ROWS
    if scanny and row_old.get("norm_scan") is not None \
            and row_new.get("norm_scan") is not None:
        return (float(row_old["norm_scan"]),
                float(row_new["norm_scan"]), "scan")
    if row_old.get("norm") is not None and row_new.get("norm") is not None:
        return (float(row_old["norm"]), float(row_new["norm"]), "cpu")
    return None


CANARY_FLAT = 1.15   # a canary moved less than this → "flat"
WORKLOAD_SHIFT = 1.25  # median raw ratio beyond this → "uniform shift"


def contention_check(old, new, old_head, new_head, both):
    """Auto-adjudicate the 'all canaries flat, workload uniformly slow'
    pattern (recorded three rounds running before round 18): if every
    canary present on both sides moved < CANARY_FLAT while the MEDIAN
    raw sec ratio over shared queries moved > WORKLOAD_SHIFT, the shift
    is host contention in a dimension no canary samples (or, with the
    scan canary now present, unattributable) — wall-times are
    host-hostage and shuffle bytes are the regression signal. Printed
    automatically so the cross-round diff needs no narrative."""
    if not (old_head and new_head and both):
        return
    ratios = sorted(float(new[q]["sec"]) / float(old[q]["sec"])
                    for q in both
                    if float(old[q].get("sec", 0) or 0) > 0
                    and float(new[q].get("sec", 0) or 0) > 0)
    if not ratios:
        return
    med = ratios[len(ratios) // 2]
    cans = []
    for k in ("canary_sec", "canary_shuffle_sec", "canary_scan_sec"):
        ov, nv = old_head.get(k), new_head.get(k)
        if ov and nv and float(ov) > 0:
            cans.append((k, float(nv) / float(ov)))
    print(f"\nhost check: median raw ratio {med:.2f}x over {len(ratios)} "
          "shared queries; canaries "
          + (", ".join(f"{k}={r:.2f}x" for k, r in cans) or "(none)"))
    if not cans:
        return
    flat = all(1 / CANARY_FLAT <= r <= CANARY_FLAT for _, r in cans)
    shifted = med >= WORKLOAD_SHIFT or med <= 1 / WORKLOAD_SHIFT
    if flat and shifted:
        print("  UNATTRIBUTABLE CONTENTION: every canary is flat but the "
              "workload shifted uniformly — treat wall-times as "
              "host-hostage; compare shuffle bytes, not seconds.")
        return
    if shifted:
        worst = max(cans, key=lambda c: abs(c[1] - med))
        print("  host drift: workload shift tracks the canaries — "
              "normalized comparison above already corrects it "
              f"(largest canary residual: {worst[0]})")
        return
    # INVERSE divergence: workload flat but a canary itself caught a
    # fast/slow window — every mover normalized by THAT canary above is
    # an artifact of the canary, not the query (round 18 sf1: shuffle
    # canary 0.71x, median 0.97x → 30 fake normalized movers, all with
    # byte-identical shuffle). Name the suspect canaries mechanically.
    suspects = [k for k, r in cans
                if r / med > CANARY_FLAT or r / med < 1 / CANARY_FLAT]
    if suspects:
        print("  CANARY ARTIFACT: workload median is flat but "
              f"{', '.join(suspects)} moved — movers normalized by "
              "these canaries are suspect; trust raw sec + shuffle "
              "bytes for them.")


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, old_head = load(old_path)
    new, new_head = load(new_path)
    if not old or not new:
        sys.exit(f"no per-query rows parsed: old={len(old)} new={len(new)}")

    for label, head, n in (("old", old_head, len(old)),
                           ("new", new_head, len(new))):
        if head:
            print(f"{label}: total={head.get('value')}s "
                  f"n={head.get('n_queries')} canary={head.get('canary_sec')}s "
                  f"sf={head.get('sf')} ({n} per-query rows parsed)")
        else:
            print(f"{label}: {n} per-query rows parsed (no headline)")

    both = sorted(set(old) & set(new))
    use_norm = all(norm_of(old[q]) and norm_of(new[q]) for q in both)
    unit = ("profile-matched norm (sec/matched canary)" if use_norm
            else "sec (no canary on a side)")
    print(f"\ncomparing {len(both)} shared queries on {unit}; "
          f"movers beyond {threshold}x:")

    movers = []
    for q in both:
        which = ""
        if use_norm:
            m = matched_norm(old[q], new[q])
            ov, nv, which = m
        else:
            ov, nv = float(old[q]["sec"]), float(new[q]["sec"])
        if ov <= 0 or nv <= 0:
            continue
        ratio = nv / ov
        if ratio >= threshold or ratio <= 1.0 / threshold:
            # a delta inside either side's rep spread is contention, not
            # a plan change — flag instead of suppressing
            spread = max(float(old[q].get("spread", 0)),
                         float(new[q].get("spread", 0)))
            dsec = abs(float(new[q]["sec"]) - float(old[q]["sec"]))
            movers.append((ratio, q, ov, nv, dsec <= spread, which))
    for ratio, q, ov, nv, noisy, which in sorted(movers, key=lambda m: -m[0]):
        tag = "  NOISE? (within rep spread)" if noisy else ""
        w = f" [{which}-canary]" if which else ""
        print(f"  {q}: {ov:.2f} -> {nv:.2f}  ({ratio:.2f}x){w}{tag}")
    if not movers:
        print("  (none)")

    contention_check(old, new, old_head, new_head, both)

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        secs = ", ".join(f"{q}={new[q]['sec']}s" for q in added)
        print(f"\nadded ({len(added)}): {secs}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")


if __name__ == "__main__":
    main()
