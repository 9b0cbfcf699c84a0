#!/usr/bin/env python3
"""Two-window quiet bench: the round-final reference protocol (r13+).

Runs the FULL graft.Bench suite twice (two fresh JVMs, back to back) and
takes the PER-KEY MIN of the two windows as the quiet reference. Why the
min of two full windows, not one window or single-key reruns:

  - a single full window can land in a loud machine era (the r12 final
    window measured the identical-code control d_agg_basic at 2.34 s vs
    0.39 s mid-round) and then every per-key delta reads as a fake
    regression the judge has to re-adjudicate;
  - single-key reruns pay per-process fixture + JIT overhead the in-suite
    numbers amortize, so they OVERSTATE sub-second keys (BENCH_NOTES §24);
  - the per-key min of two windows keeps in-suite amortization AND bounds
    the damage of one loud window to keys unlucky in BOTH.

Usage:
    tools/bench_twowindow.py <sf_dir> <out.json>

Writes <out.json> with {"window1": {...}, "window2": {...}, "min": {...},
"total_min": N} and prints a short summary plus the keys whose two
windows disagree by more than 2x (machine-noise witnesses, not code
signals).
"""
import json
import os
import subprocess
import sys


def bench_full(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    env.pop("SPARK_GRAFT_KEYS", None)
    p = subprocess.run(
        [os.path.join(os.path.dirname(__file__), "run.sh"), "graft.Bench"],
        env=env, capture_output=True, text=True)
    for line in reversed(p.stdout.strip().splitlines()):
        i = line.find('{"metric"')
        if i >= 0:
            o = json.loads(line[i:])
            if o.get("metric") == "total_full":
                if o.get("failed"):
                    raise RuntimeError(f"bench failures: {o['failed']}")
                return o["queries"]
    raise RuntimeError(f"no total_full line:\n{p.stdout[-2000:]}")


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    sf_dir, out = sys.argv[1], sys.argv[2]
    w1 = bench_full(sf_dir)
    w2 = bench_full(sf_dir)
    keys = sorted(set(w1) & set(w2))
    mins = {k: min(w1[k], w2[k]) for k in keys}
    noisy = [(k, round(w1[k], 2), round(w2[k], 2)) for k in keys
             if min(w1[k], w2[k]) > 0 and
             max(w1[k], w2[k]) / min(w1[k], w2[k]) > 2.0]
    result = {
        "window1": w1, "window2": w2, "min": mins,
        "total_w1": round(sum(w1.values()), 1),
        "total_w2": round(sum(w2.values()), 1),
        "total_min": round(sum(mins.values()), 1),
        "sf": sf_dir,
    }
    with open(out, "w") as f:
        json.dump(result, f)
    print(f"window1 total {result['total_w1']} s, "
          f"window2 total {result['total_w2']} s, "
          f"per-key-min total {result['total_min']} s -> {out}")
    if noisy:
        print("keys whose windows disagree >2x (machine noise witnesses):")
        for k, a, b in noisy:
            print(f"  {k}: {a} vs {b}")


if __name__ == "__main__":
    main()
