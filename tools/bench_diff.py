#!/usr/bin/env python3
"""Noise-aware per-query comparison of two graft.Bench outputs.

The round-5 bench scare (range_join "18x slower", stratified_sample
"9x") was pure host noise and cost a manual judge rerun to adjudicate.
This tool encodes the adjudication: with min-of-3 runs on both sides, a
query is flagged as a REGRESSION only when the new MIN exceeds BOTH
  - 2x the old min (the ratio bar), AND
  - the old max + 0.25 s (outside the old run-to-run envelope),
so a loaded machine (which inflates all three runs of some queries but
rarely the min) does not masquerade as a code regression.

Usage:
  python3 tools/bench_diff.py OLD NEW
where OLD/NEW are either BENCH_RUNS.json files ({"runs": {q: [r1,r2,r3]}})
or driver BENCH_r{N}.json files whose tail holds the bench_runs line.

Exit 0 iff no regressions flagged.
"""
import json, re, sys
from pathlib import Path


def load_runs(path):
    text = Path(path).read_text()
    # direct bench_runs JSON line(s)
    for line in text.splitlines():
        line = line.strip()
        if line.startswith('{"metric":"bench_runs"') or line.startswith('{"metric": "bench_runs"'):
            return json.loads(line)["runs"]
    # driver BENCH_r{N}.json: JSON object with a raw tail field
    try:
        d = json.loads(text)
        if isinstance(d, dict):
            if "runs" in d:
                return d["runs"]
            for v in d.values():
                if isinstance(v, str) and '"bench_runs"' in v:
                    m = re.search(r'\{"metric":"bench_runs".*?\}(?=\s|$)', v)
                    if m:
                        return json.loads(m.group(0))["runs"]
    except json.JSONDecodeError:
        pass
    # fall back: per-query scalar map {"queries": {q: sec}} -> single-run
    try:
        d = json.loads(text)
        if "queries" in d:
            return {k: [v] for k, v in d["queries"].items()}
    except json.JSONDecodeError:
        pass
    raise SystemExit(f"could not find bench runs in {path}")


def main():
    old, new = load_runs(sys.argv[1]), load_runs(sys.argv[2])
    shared = sorted(set(old) & set(new))
    gone, added = sorted(set(old) - set(new)), sorted(set(new) - set(old))
    regressions, improvements = [], []
    for q in shared:
        omin, omax = min(old[q]), max(old[q])
        nmin = min(new[q])
        if nmin > 2 * omin and nmin > omax + 0.25:
            regressions.append((q, omin, omax, nmin))
        elif omin > 2 * nmin and omin > 0.25:
            improvements.append((q, omin, nmin))
    print(f"{len(shared)} shared queries; {len(added)} added, {len(gone)} removed")
    for q, omin, omax, nmin in regressions:
        print(f"REGRESSION {q}: old min {omin:.3f}s (max {omax:.3f}) -> new min {nmin:.3f}s")
    for q, omin, nmin in improvements:
        print(f"improved   {q}: {omin:.3f}s -> {nmin:.3f}s")
    if not regressions:
        print("no regressions outside the noise envelope")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
