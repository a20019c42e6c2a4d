"""Memory-roofline arithmetic from a compiled TPU HLO dump.

VERDICT-r3 #4: turn "how much perf is left" from ablation folklore into
arithmetic. The bench program is memory-bound (every measured win in
docs/BENCH.md came from removing padded-bytes traffic, not FLOPs), so the
ceiling is HBM bandwidth:

    steps/s ceiling = HBM_GB/s / (bytes moved per step)

This tool parses a `compiled.as_text()` dump (tools/dump_hlo.py), finds
the sequence-scan `while` loop (the per-frame step body — the bench
program is vmap(run_sequence) = one while over FRAMES), and sums HBM
traffic per iteration over the body's TOP-LEVEL instructions:

    traffic(instr) = padded bytes written (its result)
                   + padded bytes read   (its materialized operands)

Fusion-internal ops never materialize and are correctly excluded (unlike
analyze_hlo.py, which ranks ALL ops to find layout blowups). Aliasing ops
(tuple/get-tuple-element/bitcast/parameter) move no data and are skipped.
Double-counted re-reads of one buffer by several consumers are REAL
traffic on TPU (no general-purpose cache between HBM and VMEM).

    python tools/roofline.py runs/r4/hlo_f32.txt --batch 128 \
        --steps-per-sec 10827 [--hbm-gbps 819] [--top 15]

The achieved-GB/s statement assumes the while body dominates the program
(true for FRAMES>=16: entry-computation setup runs once per FRAMES
iterations) — the tool prints entry traffic too so you can check.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(__file__))
from analyze_hlo import BYTES, SHAPE_RE, padded_elems, parse_tile  # noqa: E402

# Ops that alias or allocate nothing on TPU (no HBM traffic of their own).
NO_TRAFFIC = {
    "tuple", "get-tuple-element", "bitcast", "parameter", "constant",
    "after-all", "partition-id", "replica-id", "custom-call",  # (most
    # custom-calls in this program are tiny host callbacks; real ones
    # would need a case-by-case look)
}
# Control-flow ops whose traffic lives in their bodies.
CONTROL = {"while", "conditional", "call", "fusion_call"}

INSTR_RE = re.compile(r"^\s+(ROOT\s+)?%?([\w.-]+)\s+=\s+(.*)$")
NAME_RE = re.compile(r"%([\w.-]+)")
BODY_RE = re.compile(r"body=%?([\w.-]+)")
_OPC_AFTER_TYPE = re.compile(r"\s*([\w-]+)\(")


def split_type_opcode(rhs):
    """(type_str, opcode) from an instruction RHS `TYPE opcode(args), ...`.

    Tuple types are parenthesized and contain nested parens (`T(8,128)`)
    and spaces, so a simple regex can't split them — scan to the balanced
    close paren instead. Non-tuple type tokens never contain spaces."""
    if rhs.startswith("("):
        depth = 0
        for i, c in enumerate(rhs):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    m = _OPC_AFTER_TYPE.match(rhs, i + 1)
                    return rhs[:i + 1], (m.group(1) if m else "unknown")
        return rhs, "unknown"
    parts = rhs.split(None, 1)
    if len(parts) == 2:
        m = _OPC_AFTER_TYPE.match(parts[1])
        if m:
            return parts[0], m.group(1)
    return rhs, "unknown"


def shape_bytes(type_str):
    """Padded HBM bytes of every shape literal in `type_str` (tuple types
    sum). Shapes placed in alternate memory space (`S(1)` in the layout =
    VMEM after memory-space assignment) move no HBM traffic and count 0."""
    total = 0
    for m in SHAPE_RE.finditer(type_str):
        if "S(1)" in m.group(0):
            continue
        dt, dims_s, mtm_s, tile_s = m.groups()
        dims = [int(x) for x in dims_s.split(",") if x] if dims_s else []
        mtm = [int(x) for x in mtm_s.split(",") if x] if mtm_s else None
        total += padded_elems(dims, mtm, parse_tile(tile_s)) * BYTES[dt]
    return total


def parse_computations(text):
    """{comp_name: [(instr_name, opcode, result_bytes, rhs), ...]}"""
    comps = {}
    cur = None
    for line in text.splitlines():
        if line and not line[0].isspace():
            # computation header: `%name (params) -> type {` or `ENTRY ...`
            m = re.match(r"(?:ENTRY\s+)?%?([\w.-]+)\s*\(", line)
            if m and "{" in line:
                cur = m.group(1)
                comps[cur] = []
                if line.startswith("ENTRY"):
                    comps["__entry__"] = comps[cur]
            continue
        if cur is None:
            continue
        im = INSTR_RE.match(line)
        if not im:
            continue
        is_root, name, rhs = bool(im.group(1)), im.group(2), im.group(3)
        type_part, opcode = split_type_opcode(rhs)
        comps[cur].append((name, opcode, shape_bytes(type_part), rhs,
                           is_root))
    return comps


CALLS_RE = re.compile(r"calls=%?([\w.-]+)")
# In-place / windowed ops: traffic is the slice region, not the full
# operand (XLA aliases DUS in place; slice/dynamic-slice/gather DMA the
# window only).
SLICED = {"dynamic-update-slice", "dynamic-slice", "gather", "scatter",
          "slice"}


def _fusion_root(rhs, comps):
    """(opcode, rhs) of the ROOT instruction of a fusion's called
    computation, or (None, None)."""
    cm = CALLS_RE.search(rhs)
    body = comps.get(cm.group(1)) if cm else None
    if not body:
        return None, None
    for name, opcode, out_b, brhs, is_root in body:
        if is_root:
            return opcode, brhs
    return body[-1][1], body[-1][3]


def _sliced_traffic(opcode, rhs, out_b, result_bytes_of):
    """Approximate traffic of an in-place/windowed op: 2x the moved
    region (read + write), not the full aliased buffer.

    dynamic-update-slice: region = update operand (2nd arg);
    dynamic-slice/gather: region = the (small) result;
    scatter: region = updates operand (3rd arg, approximated as result
    when lookup fails). Small index operands are ignored."""
    if opcode == "dynamic-update-slice":
        args = rhs.split("(", 1)[1] if "(" in rhs else ""
        names = NAME_RE.findall(args)
        if len(names) >= 2:
            upd = result_bytes_of.get(names[1], 0)
            if upd:
                return 2 * upd
    return 2 * out_b


def computation_traffic(instrs, result_bytes_of, comps):
    """(total_bytes, [(bytes, name, opcode)]) over top-level instructions."""
    rows = []
    for name, opcode, out_b, rhs, _root in instrs:
        if opcode in NO_TRAFFIC or opcode in CONTROL:
            continue
        if opcode in SLICED:
            rows.append((_sliced_traffic(opcode, rhs, out_b,
                                         result_bytes_of), name, opcode))
            continue
        if opcode == "fusion":
            ropc, rrhs = _fusion_root(rhs, comps)
            if ropc in SLICED:
                rows.append((_sliced_traffic(ropc, rrhs, out_b,
                                             result_bytes_of),
                             name, f"fusion:{ropc}"))
                continue
        # operand reads: names referenced in the argument list that are
        # materialized instructions of some computation
        args = rhs.split("(", 1)[1] if "(" in rhs else ""
        in_b = 0
        seen = set()
        for om in NAME_RE.finditer(args):
            on = om.group(1)
            if on in seen:
                continue
            seen.add(on)
            in_b += result_bytes_of.get(on, 0)
        rows.append((out_b + in_b, name, opcode))
    rows.sort(reverse=True)
    return sum(r[0] for r in rows), rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--batch", type=int, required=True,
                    help="filter instances per while iteration (BENCH_BATCH"
                         " / BENCH_PIXB)")
    ap.add_argument("--steps-per-sec", type=float, default=0.0,
                    help="measured bench steps/s for the achieved-BW line")
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="HBM bandwidth GB/s (v5e: 819)")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    text = open(args.dump).read()
    comps = parse_computations(text)
    entry = comps.get("__entry__", [])

    # instruction name -> result bytes, across all computations (names are
    # globally unique in HLO text; computation names never collide with
    # instruction names for lookups that matter).
    result_bytes = {}
    for instrs in comps.values():
        for name, opcode, out_b, _rhs, _root in instrs:
            result_bytes[name] = out_b

    # The sequence scan = the while in ENTRY with the biggest body traffic.
    bodies = []
    for name, opcode, out_b, rhs, _root in entry:
        if opcode == "while":
            bm = BODY_RE.search(rhs)
            if bm and bm.group(1) in comps:
                bodies.append(bm.group(1))
    if not bodies:
        sys.exit("no while loop found in ENTRY — is this a sequence dump?")
    body_rows = [(computation_traffic(comps[b], result_bytes, comps), b)
                 for b in bodies]
    (body_bytes, rows), body_name = max(body_rows)

    entry_bytes, _ = computation_traffic(entry, result_bytes, comps)
    per_step = body_bytes / args.batch

    print(f"while body: %{body_name} "
          f"({len(comps[body_name])} top-level instructions)")
    print(f"HBM traffic per while iteration: {body_bytes / 1e6:.1f} MB "
          f"(entry setup, once per program: {entry_bytes / 1e6:.1f} MB)")
    print(f"bytes per SLAM step (iteration / batch {args.batch}): "
          f"{per_step / 1e3:.1f} KB")
    ceiling = args.hbm_gbps * 1e9 / per_step
    print(f"memory-bound ceiling at {args.hbm_gbps:.0f} GB/s: "
          f"{ceiling:,.0f} steps/s")
    if args.steps_per_sec:
        bw = args.steps_per_sec * per_step / 1e9
        print(f"measured {args.steps_per_sec:,.0f} steps/s -> achieved "
              f"{bw:.0f} GB/s = {100 * bw / args.hbm_gbps:.0f}% of HBM "
              f"({100 * args.steps_per_sec / ceiling:.0f}% of the "
              f"memory-bound ceiling)")
    print(f"\ntop {args.top} traffic contributors per iteration "
          f"(read+write, padded):")
    for b, name, opcode in rows[:args.top]:
        print(f"  {b / 1e6:9.2f} MB  {opcode:<22} %{name}")


if __name__ == "__main__":
    main()
