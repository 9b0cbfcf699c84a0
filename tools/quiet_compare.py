#!/usr/bin/env python3
"""Compare two quiet-bench references per key (drift audit helper).

Usage: tools/quiet_compare.py <old.json> <new.json> [threshold]

Prints keys whose per-key-min moved more than `threshold` (default
1.2x) in either direction, plus the median ratio of "control" keys
(>0.5 s in the old reference) — the machine-era indicator BENCH_NOTES
uses to separate code drift from load smear.
"""
import json
import statistics
import sys


def mins(path):
    o = json.load(open(path))
    return o["min"] if "min" in o else o


def main():
    old, new = mins(sys.argv[1]), mins(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    common = sorted(set(old) & set(new))
    ctrl = [new[k] / old[k] for k in common if old[k] > 0.5]
    med = statistics.median(ctrl) if ctrl else float("nan")
    print(f"{len(common)} common keys; control-median ratio "
          f"(old>0.5s): {med:.3f}")
    movers = [(new[k] / old[k], k) for k in common
              if old[k] > 0.3 and (new[k] / old[k] > thr or
                                   new[k] / old[k] < 1 / thr)]
    for r, k in sorted(movers, reverse=True):
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f}  ({r:.2f}x)")
    only_new = set(new) - set(old)
    if only_new:
        print("new keys:", ", ".join(f"{k}={new[k]:.2f}" for k in sorted(only_new)))
    print(f"total old {sum(old.values()):.1f} s, new {sum(new.values()):.1f} s")


if __name__ == "__main__":
    main()
