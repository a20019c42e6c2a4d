"""Attribute a dumped optimized TPU HLO by the COMPILER'S OWN cost model.

tools/analyze_hlo.py ranks by padded buffer bytes, but it counts every
op line — including ops INSIDE fusion bodies, which never materialize
(the r2d dump's update tail looked like three unfused full-P f32 passes
when the whole chain — factor concat, correction conv, add, bf16 store —
is ONE kOutput fusion at its traffic floor). This tool instead parses
only TOP-LEVEL ops of non-fusion computations (entry, while bodies,
conditional branches) and aggregates the `estimated_cycles` field the
XLA:TPU backend writes into each emitted kernel's backend_config —
the scheduler's own per-kernel cost estimate:

  python tools/attribute_hlo.py /tmp/bench_step.hlo [--top 30] [--ghz 0.94]

Output: cycles (and ms at --ghz), kernel count, aggregated by the
source_file:source_line metadata of each kernel's root op. Kernels
without metadata aggregate under their op kind. The per-line numbers
are per EXECUTION of the enclosing computation (a while-body line runs
once per loop trip).
"""

import argparse
import re
from collections import defaultdict

CYC_RE = re.compile(r'"estimated_cycles":"(\d+)"')
META_RE = re.compile(
    r'source_file="([^"]+)".*?source_line=(\d+)')
OPKIND_RE = re.compile(r'= (?:\([^)]*\) )?[a-z0-9]+\[[^\]]*\][^ ]* ([a-z-]+)')


def computations(text):
    """Yield (header_line, [op_lines]) for each HLO computation."""
    cur_header, cur_ops = None, []
    for line in text.splitlines():
        if line and not line.startswith(" ") and "{" in line:
            if cur_header is not None:
                yield cur_header, cur_ops
            cur_header, cur_ops = line, []
        elif line.startswith("  %") or line.startswith("  ROOT"):
            cur_ops.append(line)
    if cur_header is not None:
        yield cur_header, cur_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--ghz", type=float, default=0.94)
    args = ap.parse_args()
    text = open(args.hlo).read()

    # Fusion bodies are computations referenced by calls=%name. Collect
    # every called-computation name; ops inside them are not emitted
    # kernels themselves.
    called = set(re.findall(r"calls=(%[\w.\-]+)", text))

    agg = defaultdict(lambda: [0, 0])       # key -> [cycles, count]
    total = 0
    for header, ops in computations(text):
        name = header.split(" ", 1)[0]
        if name in called or name.lstrip("%").startswith(
                ("fused_computation", "bitcast_fusion", "pad_maximum")):
            continue
        for line in ops:
            m = CYC_RE.search(line)
            if not m:
                continue
            cyc = int(m.group(1))
            meta = META_RE.search(line)
            if meta:
                src = meta.group(1).split("/")[-1]
                key = f"{src}:{meta.group(2)}"
            else:
                km = OPKIND_RE.search(line)
                key = f"<{km.group(1) if km else 'unknown'}>"
            agg[key][0] += cyc
            agg[key][1] += 1
            total += cyc

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"TOTAL estimated {total} cycles = "
          f"{total / args.ghz / 1e6:.2f} ms @ {args.ghz} GHz "
          f"(per execution of each computation; while-body ops run "
          f"once per trip)")
    print(f"{'cycles':>12} {'ms':>8} {'n':>4}  source")
    for key, (cyc, n) in rows[:args.top]:
        print(f"{cyc:>12} {cyc / args.ghz / 1e6:>8.3f} {n:>4}  {key}")


if __name__ == "__main__":
    main()
