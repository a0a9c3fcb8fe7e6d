#!/usr/bin/env python3
"""Build BASELINE-bench.json: the per-query idle-floor — min over every
round's recorded per-query seconds (dev tool only, driver-side python).

Sources, in decreasing fidelity:
  - BENCH_DETAIL.json (full-precision reps of the latest full run; only
    load-gated reps are taken, "gated":false rows fall back to all reps)
  - bench-summary.json + each BENCH_r*.json tail's compact line (2dp
    mins; truncated maps contribute whatever queries they kept)

Future regressions should be judged against this floor rather than the
previous (possibly noise-inflated) round. Regenerate after any round
whose bench beats the floor: python3 tools/bench_floor.py
"""
import glob
import json
import os
import re

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

floor = {}
seen_rounds = []

PREV_FOLDED = []
if os.path.exists("BASELINE-bench.json"):
    try:
        prev = json.load(open("BASELINE-bench.json"))
        PREV_FOLDED = list(prev.get("queries", {}).items())
        seen_rounds.append("prev-floor")
    except (json.JSONDecodeError, OSError, KeyError):
        pass


# Queries whose DEFINITION changed, keyed to the last round whose
# recorded values belong to the old definition: folds from BENCH_r<=N
# (and the inherited prev-floor entry) are skipped so the floor
# re-baselines at the current definition instead of reading as a
# permanent regression.
REBASELINED = {
    # r11: dense groups x buckets JS spine (1280 output rows vs the
    # sparse 448) — the r01..r10 values measured the sparse definition
    "r101_drift_by": 10,
}


def take(name, sec, src):
    if sec <= 0:
        return
    cut = REBASELINED.get(name)
    if cut is not None:
        m = re.match(r"BENCH_r0*(\d+)$", src)
        # old-definition sources: the named rounds, or an inherited
        # floor entry whose provenance cannot prove it is post-cutoff
        if (m and int(m.group(1)) <= cut) or not m and src != "BENCH_DETAIL":
            return
    if name not in floor or sec < floor[name]["sec"]:
        floor[name] = {"sec": round(float(sec), 3), "src": src}


# Fold the previous floor file FIRST (through take(), so REBASELINED
# filtering applies to inherited entries too): BENCH_DETAIL.json is
# overwritten by every full run, so a floor recorded from a
# since-overwritten quiet run would otherwise be lost on regeneration.
for _name, _row in PREV_FOLDED:
    take(_name, _row["sec"], _row.get("src", "prev"))


def compact_lines(text):
    for m in re.finditer(r'\{"metric":"total".*?"queries":\{[^{}]*\}[^{}]*\}',
                         text):
        try:
            yield json.loads(m.group(0))
        except json.JSONDecodeError:
            continue


for path in sorted(glob.glob("BENCH_r*.json")):
    rnd = path.replace(".json", "")
    try:
        tail = json.load(open(path)).get("tail", "") or ""
    except (json.JSONDecodeError, OSError):
        continue
    got = False
    for obj in compact_lines(tail):
        qs = obj.get("queries", {})
        if isinstance(qs, dict):
            for name, sec in qs.items():
                if isinstance(sec, (int, float)):
                    take(name, sec, rnd)
                    got = True
    if got:
        seen_rounds.append(rnd)

def current_query_names():
    """Names declared in the source inventories RIGHT NOW. Floors are
    dropped for queries no longer declared (renamed/removed) — without
    this the fold-previous-floor-first rule makes every entry immortal,
    so a renamed query keeps a stale unreachable floor and reads as a
    regression forever (r10 advisor finding). A query whose DEFINITION
    legitimately got more expensive still keeps its old floor; delete
    its entry by hand and note why in the commit."""
    names = set()
    for path in glob.glob("src/main/scala/graft/queries/*.scala"):
        try:
            text = open(path).read()
        except OSError:
            continue
        names.update(re.findall(r'QueryDef\("([^"]+)"', text))
    return names


if os.path.exists("BENCH_DETAIL.json"):
    try:
        detail = json.load(open("BENCH_DETAIL.json"))
        for name, row in detail.get("queries", {}).items():
            reps = row.get("reps", [])
            loads = row.get("loads", [])
            gate = detail.get("load", {}).get("floor",
                detail.get("load", {}).get("gate", 1e9))
            quals = [r for r, l in zip(reps, map(float, loads))
                     if l <= float(gate)] or reps
            if quals:
                take(name, min(quals), "BENCH_DETAIL")
        seen_rounds.append("BENCH_DETAIL")
    except (json.JSONDecodeError, OSError, ValueError):
        pass

current = current_query_names()
if current:
    dropped = sorted(set(floor) - current)
    if dropped:
        print(f"dropping {len(dropped)} floors for queries no longer "
              f"declared: {', '.join(dropped[:10])}")
    floor = {k: v for k, v in floor.items() if k in current}

out = {
    "note": "per-query idle floor: min sec over all rounds' recorded "
            "bench values (load-gated where available); judge "
            "regressions against this, not the previous round; entries "
            "are dropped when the query is no longer declared in "
            "src/main/scala/graft/queries",
    "rounds": seen_rounds,
    "n_queries": len(floor),
    "total_floor_sec": round(sum(v["sec"] for v in floor.values()), 2),
    "queries": {k: floor[k] for k in sorted(floor)},
}
with open("BASELINE-bench.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote BASELINE-bench.json: {len(floor)} queries, "
      f"total floor {out['total_floor_sec']}s from {len(seen_rounds)} sources")
