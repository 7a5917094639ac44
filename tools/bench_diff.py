#!/usr/bin/env python3
"""Cross-round bench regression diff.

Compares a current full bench line (BENCH_LAST.json) against a baseline
round's committed snapshot (tools/bench_history/rN.json) so a
"zero regressions" sentence can never again be written against a stale
snapshot — the gate prints the diff mechanically.

Usage:
    python3 tools/bench_diff.py [current] [baseline]
    # defaults: BENCH_LAST.json  vs  newest tools/bench_history/r*.json

Output: per-query ratio table for every row whose MINIMUM rep exceeds
THRESH (2x) of the baseline minimum, with both rounds' [min,max]
spreads alongside; like-for-like totals over the shared query set;
added and removed queries. Exit code 1 if any flagged row's CURRENT
MIN also exceeds THRESH x the BASELINE MAX — spreads disjoint at 2x is
a real regression signature, not one contended rep.

r16 estimator change: both sides compare MIN-of-reps, not medians. The
r15 postmortem proved medians publish phantom regressions — a
contention burst poisoned 2 of 3 pass-wise reps AND the heal rep of
six queries (d42 median 42.2 s vs min rep 2.61 s ~= its r14 value); a
query's work is deterministic, so everything above the min is host
interference. Current files carry the min directly in "queries"
(estimator:"min"); for pre-r16 baselines the min is recovered from the
recorded "spread" [min,max] so history stays comparable.
"""
import glob
import json
import os
import re
import signal
import sys

# piping into `head` closes stdout early — die quietly like a good
# filter instead of tracebacking with BrokenPipeError
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

THRESH = 2.0


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LAST.json"
    if len(sys.argv) > 2:
        base_path = sys.argv[2]
    else:
        hist = glob.glob(os.path.join(
            os.path.dirname(__file__), "bench_history", "r*.json"))
        if not hist:
            print("no baseline found under tools/bench_history/", file=sys.stderr)
            return 2
        # numeric round order: r10 is newer than r8 (lexicographic glob
        # order would pick r8_clean over r10); name tie-break keeps
        # rN_clean after rN so a clean re-baseline wins within a round
        def round_key(p):
            m = re.search(r"r(\d+)", os.path.basename(p))
            return (int(m.group(1)) if m else -1, os.path.basename(p))
        base_path = max(hist, key=round_key)
    cur, base = load(cur_path), load(base_path)
    if cur.get("sf") != base.get("sf"):
        print(f"WARNING: scale factors differ: current={cur.get('sf')} "
              f"baseline={base.get('sf')} — ratios are not comparable")
    cs, bs = cur.get("spread", {}), base.get("spread", {})

    def minima(run, spread):
        """Per-query min-of-reps. estimator:"min" files carry it in
        "queries"; older (median) files recover it from "spread"."""
        q = run["queries"]
        if run.get("estimator") == "min":
            return dict(q)
        return {k: (spread[k][0] if k in spread else v)
                for k, v in q.items()}

    cq, bq = minima(cur, cs), minima(base, bs)
    shared = sorted(set(cq) & set(bq))
    added = sorted(set(cq) - set(bq))
    removed = sorted(set(bq) - set(cq))

    cur_tot = sum(cq[q] for q in shared)
    base_tot = sum(bq[q] for q in shared)

    # Header totals are computed from minima(...) for BOTH sides so the
    # two numbers are always the same estimator; the file's recorded
    # "value" (sum-of-medians for pre-r16 history) is shown alongside
    # when it differs, annotated, instead of being printed bare.
    def header(tag, path, run, mins):
        tot = sum(mins.values())
        rec = run.get("value", 0.0)
        note = "" if abs(rec - tot) < 0.05 else (
            f"  (recorded {rec:.1f}s, estimator "
            f"{run.get('estimator', 'median')})")
        print(f"{tag} {path}  total={tot:.1f}s min-of-reps  "
              f"n={len(mins)}{note}")

    header("current: ", cur_path, cur, cq)
    header("baseline:", base_path, base, bq)
    uncorr = sorted(set(cur.get("uncorroborated", [])))
    if uncorr:
        print(f"UNCORROBORATED minima in current ({len(uncorr)}) — "
              f"single-sample floors, treat their ratios as noisy: "
              f"{', '.join(uncorr)}")
    print(f"like-for-like (min-of-reps) over {len(shared)} shared queries: "
          f"{cur_tot:.1f}s vs {base_tot:.1f}s "
          f"({(cur_tot / base_tot - 1) * 100:+.0f}%)")
    # Host-speed-shift indicator (the r16 lesson): two runs on the same
    # code can sit a uniform 1.1-1.2x apart because the HOST is slower,
    # and the total alone can't tell that from a real regression. The
    # per-query ratio DISTRIBUTION can: a uniform shift moves the
    # median and p90 together (every row, including improved ones,
    # rides the same factor); a genuine regression concentrates in a
    # few rows, leaving the median near 1.0 while p90/max blow out.
    ratios = sorted(cq[q] / bq[q] for q in shared if bq[q] > 0.05)
    if len(ratios) >= 10:
        med = ratios[len(ratios) // 2]
        p90 = ratios[int(len(ratios) * 0.9)]
        if med <= 1.05 and p90 <= 1.2:
            shape = "flat — same host speed"
        elif p90 < med * 1.5:
            shape = "uniform host shift"
        else:
            shape = "concentrated — inspect flagged rows"
        print(f"per-query ratio distribution: median {med:.2f}x, "
              f"p90 {p90:.2f}x ({shape})")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    hard = []
    flagged = [(cq[q] / bq[q], q) for q in shared
               if bq[q] > 0 and cq[q] / bq[q] > THRESH]
    if not flagged:
        print(f"no shared query's min above {THRESH}x its baseline min")
    cur_healed = set(cur.get("healed", []))
    cur_raw = cur.get("queries_raw", {})
    for ratio, q in sorted(flagged, reverse=True):
        c_sp = cs.get(q, [cq[q], cq[q]])
        b_sp = bs.get(q, [bq[q], bq[q]])
        # disjoint spreads at THRESH = regression; overlapping = noise
        disjoint = c_sp[0] > THRESH * b_sp[1]
        tag = "REGRESSION" if disjoint else "noisy"
        if disjoint:
            hard.append(q)
        # healed rows took extra reps — surface the pre-heal value so
        # the comparison is never silently apples-to-oranges
        if q in cur_healed:
            tag += f" [healed; pre-heal {cur_raw.get(q, cq[q]):.3f}s]"
        if q in uncorr:
            tag += " [min uncorroborated]"
        print(f"  {ratio:5.1f}x  {q:32s} {bq[q]:7.3f}s -> {cq[q]:7.3f}s  "
              f"base[{b_sp[0]:.3f},{b_sp[1]:.3f}] cur[{c_sp[0]:.3f},{c_sp[1]:.3f}]  {tag}")
    # healed rows that did NOT cross the ratio threshold still get a
    # one-line note so a healed median is always visible in the diff
    healed_quiet = sorted(q for q in cur_healed
                          if q in shared and not any(f[1] == q for f in flagged))
    if healed_quiet:
        notes = ", ".join(
            f"{q} (min {cq[q]:.3f}s, pre-heal {cur_raw.get(q, cq[q]):.3f}s)"
            for q in healed_quiet)
        print(f"healed below threshold ({len(healed_quiet)}): {notes}")
    # Bench now omits all-reps-failed queries from the medians and lists
    # them explicitly — a failed query outranks any timing regression.
    cur_failed = cur.get("failed", [])
    if cur_failed:
        print(f"FAIL: {len(cur_failed)} queries failed all bench reps: "
              f"{', '.join(cur_failed)}")
        return 1
    if hard:
        print(f"FAIL: {len(hard)} disjoint-spread regression(s): {', '.join(hard)}")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
