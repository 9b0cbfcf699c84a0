#!/usr/bin/env python3
"""Quiet-vs-driver bench delta guard (BENCH_NOTES §17/§19, executable form).

Driver bench numbers swing up to 4x with environment (§14), so a raw
driver-vs-quiet per-key delta is not evidence of a regression. This tool
compares a driver BENCH json against the matching quiet reference and,
for every key whose ratio leaves the noise band (default 1.5x either
way), re-runs that key single-key 3x in the CURRENT (presumed quiet)
session and judges on the MEDIAN: only a median still outside the band
counts as a regression; everything else is recorded as noise.

The reruns happen in THIS session, whose own load differs from the
quiet reference's era — so the guard also reruns a set of stable
CONTROL keys, takes the median of their current/quiet ratios as the
session DRIFT, and judges each flagged key's median against
quiet x drift: a key that inflated exactly like the controls is noise
however large its raw ratio.

Usage:
    tools/bench_guard.py <driver.json> <quiet.json> <sf_dir> [band]

The pinned reference for routine gating is BASELINE_KEYS.json (the
checked-in per-key quiet-min map): run
    tools/bench_guard.py BENCH_rN.json BASELINE_KEYS.json <sf_dir> 2
and the 2x gate is meaningful for ALL keys, not just the headliners —
exit code 1 iff any key's drift-corrected median exceeds the band.

Emits a markdown table (paste into BENCH_NOTES) followed by one JSON
line with the full result list. Exit code 1 iff any key's verdict is
"regression".
"""
import json
import os
import statistics
import subprocess
import sys


def bench_once(key, sf_dir):
    env = dict(os.environ, SPARK_GRAFT_KEYS=key, SPARK_GRAFT_SF_DIR=sf_dir)
    p = subprocess.run(
        [os.path.join(os.path.dirname(__file__), "run.sh"), "graft.Bench"],
        env=env, capture_output=True, text=True)
    full = [l for l in p.stdout.strip().splitlines()
            if l.startswith('{') and '"total_full"' in l]
    if not full:
        raise RuntimeError(f"no bench output for {key}:\n{p.stdout[-2000:]}")
    return json.loads(full[-1])["queries"][key]


def load_queries(path):
    """Per-key seconds from either a raw Bench output file (lines of
    {"metric": ...} JSON — total_full preferred) or the driver's wrapper
    format ({"n", "rc", ..., "tail": <front-truncated stdout>}): there the
    compact "total" line printed last is always complete, while the wide
    total_full line may be cut at its front."""
    text = open(path).read()
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "queries" in obj:
            return obj["queries"]
        if isinstance(obj, dict) and "min" in obj:
            return obj["min"]  # quiet two-window protocol output
        if isinstance(obj, dict) and "tail" in obj:
            text = obj["tail"]
    except json.JSONDecodeError:
        pass
    best = {}
    for line in text.splitlines():
        # sbt prefixes its echo with "[info] " — strip to the JSON start
        i = line.find('{"metric"')
        if i < 0:
            continue
        try:
            o = json.loads(line[i:])
        except json.JSONDecodeError:
            continue
        if isinstance(o, dict) and "queries" in o:
            # wider map wins (total_full ⊃ total's headline subset)
            if len(o["queries"]) >= len(best):
                best = o["queries"]
    if not best:
        raise RuntimeError(f"no bench query map found in {path}")
    return best


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    driver_f, quiet_f, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    band = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    dq = load_queries(driver_f)
    qq = load_queries(quiet_f)
    flagged = [k for k in sorted(set(dq) & set(qq))
               if qq[k] > 0 and not (1 / band <= dq[k] / qq[k] <= band)]
    if not flagged:
        print("no keys outside the band; nothing to rerun")
        print(json.dumps({"drift": None, "keys": []}))
        return
    controls = [c for c in
                os.environ.get("GUARD_CONTROLS",
                               "d_agg_basic,i_word_freq,i_bpe_encode").split(",")
                if c in qq and qq[c] > 0 and c not in flagged]
    drift = statistics.median(
        [bench_once(c, sf_dir) / qq[c] for c in controls]) if controls else 1.0
    rows = []
    for k in flagged:
        ratio = dq[k] / qq[k]
        reruns = [bench_once(k, sf_dir) for _ in range(3)]
        med = statistics.median(reruns)
        corrected = med / (qq[k] * drift)
        verdict = "regression" if corrected > band else "noise"
        rows.append({
            "key": k, "driver": round(dq[k], 2), "quiet": round(qq[k], 2),
            "ratio": round(ratio, 2),
            "reruns": [round(x, 2) for x in reruns],
            "median": round(med, 2),
            "median_vs_quiet_x_drift": round(corrected, 2),
            "verdict": verdict,
        })
    print(f"session drift vs quiet reference: {drift:.2f}x "
          f"(controls: {','.join(controls)})")
    print("| key | driver | quiet | ratio | reruns (3x) | median | "
          "med/(quiet·drift) | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| {key} | {driver} | {quiet} | {ratio} | {rr} | {median} | "
              "{mq} | {verdict} |".format(
                  rr=", ".join(str(x) for x in r["reruns"]),
                  mq=r["median_vs_quiet_x_drift"], **r))
    print(json.dumps({"drift": round(drift, 2), "keys": rows}))
    sys.exit(1 if any(r["verdict"] == "regression" for r in rows) else 0)


if __name__ == "__main__":
    main()
