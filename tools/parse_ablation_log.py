"""Parse a bench ablation sweep log into an attribution table.

Usage: python tools/parse_ablation_log.py runs/r2n/sweep.log [baseline_steps]

The log format is tools/run_update_attribution.sh's: `=== EKF_ABLATE=<stage>`
lines followed by bench.py's one-line JSON. Stage cost is estimated as the
per-step time delta vs the un-ablated baseline (docs/BENCH.md: ablation
through the REAL bench is the only trustworthy attribution on the tunneled
backend). Deltas are approximate — ablations change the trajectory, and
stages overlap in the schedule — they RANK, the bench DECIDES.
"""

import json
import re
import sys


def main():
    path = sys.argv[1]
    base = float(sys.argv[2]) if len(sys.argv) > 2 else None
    rows = []
    label = None
    for line in open(path):
        m = re.match(r"=== (\S.*)", line.strip())
        if m:
            label = m.group(1)
            continue
        if line.startswith("{"):
            try:
                v = json.loads(line)["value"]
            except Exception:
                continue
            rows.append((label or "baseline", v))
            label = None
    if base is None:
        for lbl, v in rows:
            if lbl in ("baseline", "EKF_ABLATE="):
                base = v
    if base is None:
        # no baseline: list raw values (e.g. a mixed A/B queue log)
        print(f"{'config':<56}{'steps/s':>10}{'µs/step':>10}")
        for lbl, v in rows:
            print(f"{lbl:<56}{v:>10.1f}{1e6 / v:>10.2f}")
        return
    t0 = 1e6 / base  # per-step µs
    print(f"baseline {base:.1f} steps/s = {t0:.2f} µs/step")
    print(f"{'config':<32}{'steps/s':>10}{'µs/step':>10}"
          f"{'delta µs':>10}{'share':>8}")
    for lbl, v in rows:
        t = 1e6 / v
        print(f"{lbl:<32}{v:>10.1f}{t:>10.2f}{t0 - t:>10.2f}"
              f"{(t0 - t) / t0:>8.1%}")


if __name__ == "__main__":
    main()
