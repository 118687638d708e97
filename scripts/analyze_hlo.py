"""Summarize big tile-padded buffers in a TPU HLO text dump.

Usage: python scripts/analyze_hlo.py /tmp/ba_hlo_pcg_550.txt [top_n]

Parses shapes with layouts like f32[560000,2,6]{2,1,0:T(8,128)} from
fusion/op result types, computes tile-padded byte sizes, and prints the
largest distinct buffers with a count of occurrences — the quickest way
to find which per-observation temporaries XLA materialized in padded
layouts (ROADMAP.md perf notes).
"""
import collections
import re
import sys

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f64": 8, "s8": 1, "u8": 1, "s64": 8, "u64": 8,
               "f16": 2, "s16": 2, "u16": 2}

SHAPE_RE = re.compile(
    r"\b(f32|bf16|f64|f16|s8|u8|s16|u16|s32|u32|s64|u64|pred)"
    r"\[([0-9,]*)\]"
    r"(?:\{([0-9,]+)(?::T\(([0-9,x()]+)\))?[^}]*\})?")


def padded_bytes(dtype, dims, minor_order, tile):
    if not dims:
        return DTYPE_BYTES[dtype]
    phys = [dims[i] for i in reversed(minor_order)] if minor_order \
        else list(dims)
    # tile like "8,128" applies to the last len(tile) physical dims
    if tile:
        tdims = [int(x) for x in
                 re.findall(r"\d+", tile.split(")(")[0])]
        for k, t in enumerate(tdims):
            i = len(phys) - len(tdims) + k
            if 0 <= i < len(phys):
                phys[i] = -(-phys[i] // t) * t
    n = 1
    for d in phys:
        n *= d
    return n * DTYPE_BYTES[dtype]


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    sizes = collections.Counter()
    counts = collections.Counter()
    with open(path) as f:
        for line in f:
            # only count buffer-defining lines (op results), not operand
            # mentions: look at the lhs "shape name = shape(...)" form
            m = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+ = (.*)", line)
            if not m:
                continue
            sm = SHAPE_RE.match(m.group(1).lstrip("("))
            if not sm:
                continue
            dtype, dims_s, order_s, tile_s = sm.groups()
            dims = [int(x) for x in dims_s.split(",") if x] \
                if dims_s else []
            order = [int(x) for x in order_s.split(",")] \
                if order_s else None
            b = padded_bytes(dtype, dims, order, tile_s)
            key = f"{dtype}[{dims_s}]{{{order_s or ''}:T({tile_s})}}" \
                if tile_s else f"{dtype}[{dims_s}]"
            logical = (DTYPE_BYTES[dtype] *
                       max(1, __import__('math').prod(dims or [1])))
            sizes[key] = max(sizes[key], b)
            counts[key] += 1
    rows = sorted(sizes.items(), key=lambda kv: -kv[1])[:top_n]
    print(f"{'bytes_padded':>14} {'count':>6}  shape")
    for k, b in rows:
        print(f"{b:>14,} {counts[k]:>6}  {k}")


if __name__ == "__main__":
    main()
