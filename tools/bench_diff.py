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

Load awareness (the round-8 lesson: a 3.91 s "headline regression" was
captured at loadavg 4.8 and fully recovered on a quiet box): Bench
records /proc/loadavg both BEFORE its own run (loadavg_start — ambient
load, the signal that matters) and after (loadavg — inflated by ~2 of
the bench's own 32-thread self-load by the time it is read). This tool
prefers loadavg_start with the ambient limit; for older files that only
carry the end-of-run reading it falls back to LOAD_LIMIT_END. When the
NEW side is hot the verdict line says so and flagged regressions are
demoted to LOAD-SUSPECT — the run then exits 2 (see "Exit codes"
below), so a consumer must acknowledge the demotion instead of reading
a loaded box as a clean pass; rerun on a quiet box before believing
the demoted entries.

Host awareness (the round-11 lesson: 7 phantom regressions printed a
confident "LOAD VERDICT: ok" because BOTH boxes were quiet — they were
different boxes, and a same-box A/B of the two code versions showed the
entire delta was the host). Since round 12 Bench embeds a host
fingerprint in every snapshot: "host_cpu" (the /proc/cpuinfo model
string) and "calib_sec" (a fixed single-thread xorshift64 loop,
min-of-3 — a direct measure of the box's single-thread speed, the axis
that scales every per-query min). This tool compares the fingerprints:

  - SAME host (cpu strings match, calib ratio within CALIB_BAND):
    flags stand — a regression on a verified-same box is real.
  - DIFFERENT host (cpu mismatch or calib ratio outside the band):
    flags are demoted to HOST-SUSPECT and the run exits 3. When both
    calibrations are known, each demoted entry is additionally checked
    against a calibration-NORMALIZED bar (old thresholds scaled by
    new_calib/old_calib); entries that still flag after normalization
    are printed with "survives calib-normalized bar" — the ones worth
    a same-box rerun first. The demotion is DIRECTIONAL: when the NEW
    box is measurably FASTER (calib ratio < 1/CALIB_BAND), a faster
    host cannot explain a slower run, so regressions are NOT demoted —
    they stand as hard flags (exit 1) unless the load demotion applies.
  - UNVERIFIABLE (either side predates the fingerprint): cross-host
    delta cannot be ruled out, so flags are demoted to HOST-SUSPECT
    (exit 3) rather than asserted — exactly the failure mode that
    mis-flagged round 11.

Design changes: a query whose WORK changed on purpose (e.g. a drain
converted from one micro-batch to three) is not a regression however
slow it got. Pass --design-changed q1,q2 to annotate those queries as
DESIGN-CHANGED instead of flagging them.

Usage:
  python3 tools/bench_diff.py OLD NEW [--design-changed q1,q2]
where OLD/NEW are either BENCH_RUNS.json files ({"runs": {q: [r1,r2,r3]}})
or driver BENCH_r{N}.json files whose tail holds the bench_runs line.

Exit codes: 0 = clean (design-changed entries do not fail the gate);
1 = real regressions flagged on a verified-same quiet host;
2 = regressions were demoted to LOAD-SUSPECT (the NEW side was hot);
3 = regressions were demoted to HOST-SUSPECT (different or
unverifiable host identity). 3 outranks 2 when both apply — host
identity failing means the numbers are incomparable regardless of
load. A CI/driver consumer must acknowledge a demotion (2 or 3)
instead of a loaded or foreign box silently passing — or failing —
the regression gate. Since round 10 Bench also emits its own
"load_hot" verdict in the snapshot; when present it is trusted over
recomputing from the loadavg strings. Since round 11 the snapshot also
carries "load_limit" (the ambient limit Bench itself adjudicated
with); when present it is the single source of truth and the
LOAD_LIMIT constant below is only a fallback for older files.
"""
import json, re, sys
from pathlib import Path

LOAD_LIMIT = 2.0        # ambient fallback for pre-r11 files (see above)
LOAD_LIMIT_END = 4.0    # end-of-run fallback: bench self-load adds ~2
CALIB_BAND = 1.15       # calib ratio outside [1/band, band] = not the
                        # same-speed box (r11's host delta was ~1.4x)


def _load_verdict(d):
    """(1-min loadavg or None, is_ambient, self_verdict, limit) from a
    parsed bench dict. self_verdict is Bench's own "load_hot" boolean
    when the snapshot carries one (round 10+; null/absent means load was
    unknown at capture); limit is the snapshot's embedded "load_limit"
    (round 11+) or None."""
    hot = d.get("load_hot")
    self_verdict = hot if isinstance(hot, bool) else None
    limit = d.get("load_limit")
    limit = float(limit) if isinstance(limit, (int, float)) else None
    for key, ambient in (("loadavg_start", True), ("loadavg", False)):
        la = d.get(key, "")
        if isinstance(la, str) and la.split():
            try:
                return float(la.split()[0]), ambient, self_verdict, limit
            except ValueError:
                pass
    return None, False, self_verdict, limit


def _host_fingerprint(d):
    """(cpu model string or None, calib_sec or None) — round 12+."""
    cpu = d.get("host_cpu")
    cpu = cpu if isinstance(cpu, str) and cpu else None
    calib = d.get("calib_sec")
    calib = float(calib) if isinstance(calib, (int, float)) and calib > 0 \
        else None
    return cpu, calib


def load_runs(path):
    """Return (runs, load-verdict-tuple, host-fingerprint) from a bench
    output."""
    text = Path(path).read_text()

    def parse_line(line):
        d = json.loads(line)
        return d["runs"], _load_verdict(d), _host_fingerprint(d)

    # direct bench_runs JSON line(s)
    for line in text.splitlines():
        line = line.strip()
        if line.startswith('{"metric":"bench_runs"') or line.startswith('{"metric": "bench_runs"'):
            return parse_line(line)
    # driver BENCH_r{N}.json: JSON object with a raw tail field
    try:
        d = json.loads(text)
        if isinstance(d, dict):
            if "runs" in d:
                return d["runs"], _load_verdict(d), _host_fingerprint(d)
            for v in d.values():
                if isinstance(v, str) and '"bench_runs"' in v:
                    m = re.search(r'\{"metric":"bench_runs".*?\}(?=\s|$)', v)
                    if m:
                        return parse_line(m.group(0))
    except json.JSONDecodeError:
        pass
    # fall back: per-query scalar map {"queries": {q: sec}} -> single-run
    try:
        d = json.loads(text)
        if "queries" in d:
            return ({k: [v] for k, v in d["queries"].items()},
                    _load_verdict(d), _host_fingerprint(d))
    except json.JSONDecodeError:
        pass
    raise SystemExit(f"could not find bench runs in {path}")


def main():
    args = [a for a in sys.argv[1:]]
    design_changed = set()
    if "--design-changed" in args:
        i = args.index("--design-changed")
        if i + 1 >= len(args):
            raise SystemExit("usage: bench_diff.py OLD NEW [--design-changed q1,q2]")
        design_changed = set(args[i + 1].split(","))
        del args[i:i + 2]
    if len(args) != 2:
        raise SystemExit("usage: bench_diff.py OLD NEW [--design-changed q1,q2]")
    old, old_load, old_host = load_runs(args[0])
    new, new_load, new_host = load_runs(args[1])

    def describe(lv):
        load, ambient, self_verdict, embedded_limit = lv
        if load is None:
            return ("unknown", None) if self_verdict is None else (
                f"self-reported load_hot={self_verdict}", self_verdict)
        # the snapshot's own embedded limit (round 11+) is the single
        # source of truth; the constants are fallbacks for older files
        limit = embedded_limit if (ambient and embedded_limit is not None) \
            else (LOAD_LIMIT if ambient else LOAD_LIMIT_END)
        kind = "ambient" if ambient else "end-of-run"
        # Bench's own verdict (same limit) wins when present
        hot = self_verdict if self_verdict is not None else (load > limit)
        return f"{load:.2f} ({kind}, limit {limit})", hot

    old_desc, old_hot = describe(old_load)
    new_desc, new_hot = describe(new_load)
    # only a HOT NEW side demotes: load on the NEW side inflates new
    # mins into phantom regressions, whereas load on the OLD side only
    # RAISES the regression bar — a query that still flags against an
    # inflated baseline is more credible, not less
    loaded = bool(new_hot)
    if new_hot:
        print(f"LOAD VERDICT: NEW over the load limit — old {old_desc}, "
              f"new {new_desc}; measurements suspect, flagged regressions "
              "demoted to LOAD-SUSPECT, rerun on a quiet box before acting "
              "on them")
    elif old_hot:
        print(f"LOAD VERDICT: OLD side was hot (old {old_desc}, new "
              f"{new_desc}) — baseline inflated, so the regression bar is "
              "RAISED; anything flagged below is extra credible")
    else:
        print(f"LOAD VERDICT: ok (old {old_desc}, new {new_desc})")

    # ---- host adjudication (round 12+) ----
    (ocpu, ocal), (ncpu, ncal) = old_host, new_host
    calib_ratio = (ncal / ocal) if (ocal and ncal) else None
    if ocpu is None and ocal is None and ncpu is None and ncal is None:
        host_same, host_desc = None, (
            "unverifiable — neither snapshot carries a host fingerprint "
            "(pre-r12); cross-host delta cannot be ruled out")
    elif (ocpu is None or ocal is None) or (ncpu is None or ncal is None):
        host_same, host_desc = None, (
            "unverifiable — only one side carries a host fingerprint; "
            "cross-host delta cannot be ruled out")
    else:
        same_cpu = ocpu == ncpu
        in_band = 1.0 / CALIB_BAND <= calib_ratio <= CALIB_BAND
        host_same = same_cpu and in_band
        detail = (f"cpu {'match' if same_cpu else 'MISMATCH'} "
                  f"('{ocpu}' vs '{ncpu}'), single-thread calib "
                  f"{ocal:.3f}s -> {ncal:.3f}s (ratio {calib_ratio:.2f}, "
                  f"band {CALIB_BAND})")
        host_desc = ("same host/speed — " + detail) if host_same else (
            "DIFFERENT host or speed — " + detail)
    # directional demotion: a measurably FASTER new box (calib ratio
    # under 1/band) cannot explain a slower run, so the host mismatch
    # excuses nothing in the regression direction — flags stand
    faster_new = calib_ratio is not None and calib_ratio < 1.0 / CALIB_BAND
    if host_same is False and faster_new:
        print(f"HOST VERDICT: {host_desc}; NEW box is measurably FASTER — "
              "a faster host cannot explain a slower run, so flagged "
              "regressions STAND as hard flags (improvements below may be "
              "partly host speed)")
    elif host_same is False:
        print(f"HOST VERDICT: {host_desc}; flagged regressions demoted to "
              "HOST-SUSPECT — per-query deltas track the calib ratio, not "
              "the code; rerun both versions on ONE box before acting")
    elif host_same is None:
        print(f"HOST VERDICT: {host_desc}; flagged regressions (if any) "
              "demoted to HOST-SUSPECT")
    else:
        print(f"HOST VERDICT: {host_desc}")
    host_suspect_mode = host_same is not True and not faster_new

    def survives_normalized(omin, omax, nmin):
        """Still a regression after scaling the old bounds by the
        measured host-speed ratio? Only answerable with both calibs."""
        if calib_ratio is None:
            return False
        r = max(calib_ratio, 1.0)  # only a SLOWER new box excuses slowdowns
        return nmin > 2 * omin * r and nmin > omax * r + 0.25

    shared = sorted(set(old) & set(new))
    gone, added = sorted(set(old) - set(new)), sorted(set(new) - set(old))
    regressions, improvements, demoted = [], [], []
    for q in shared:
        omin, omax = min(old[q]), max(old[q])
        nmin = min(new[q])
        if nmin > 2 * omin and nmin > omax + 0.25:
            if q in design_changed:
                demoted.append(("DESIGN-CHANGED", q, omin, omax, nmin, ""))
            elif host_suspect_mode:
                note = (" [survives calib-normalized bar — rerun this one "
                        "first]" if survives_normalized(omin, omax, nmin)
                        else "")
                demoted.append(("HOST-SUSPECT", q, omin, omax, nmin, note))
            elif loaded:
                demoted.append(("LOAD-SUSPECT", q, omin, omax, nmin, ""))
            else:
                regressions.append((q, omin, omax, nmin))
        elif omin > 2 * nmin and omin > 0.25:
            improvements.append((q, omin, nmin))
    print(f"{len(shared)} shared queries; {len(added)} added, {len(gone)} removed")
    for q, omin, omax, nmin in regressions:
        print(f"REGRESSION {q}: old min {omin:.3f}s (max {omax:.3f}) -> new min {nmin:.3f}s")
    for tag, q, omin, omax, nmin, note in demoted:
        print(f"{tag} {q}: old min {omin:.3f}s (max {omax:.3f}) -> new min {nmin:.3f}s{note}")
    for q, omin, nmin in improvements:
        print(f"improved   {q}: {omin:.3f}s -> {nmin:.3f}s")
    if not regressions:
        print("no regressions outside the noise envelope")
    # exits 2/3: nothing hard-flagged, but flags were DEMOTED — a
    # consumer must acknowledge the demotion, not read it as clean.
    # HOST (3) outranks LOAD (2): incomparable hosts void the numbers
    # regardless of load.
    host_suspect = any(t == "HOST-SUSPECT" for t, *_ in demoted)
    load_suspect = any(t == "LOAD-SUSPECT" for t, *_ in demoted)
    sys.exit(1 if regressions else
             (3 if host_suspect else (2 if load_suspect else 0)))


if __name__ == "__main__":
    main()
