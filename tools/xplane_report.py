"""Self-contained xplane (.xplane.pb) device-op analyzer.

The tensorboard_plugin_profile converters in this image are broken two
ways (C-extension protobuf descriptor mismatch, and a missing
``xspace_to_tools_data`` pywrap symbol), so this parses the XSpace proto
directly and aggregates the "XLA Ops" device timeline: per-category time
shares (convolution / data formatting / elementwise / slice / collective)
and the top self-time ops with their HLO snippets.

Usage: python tools/xplane_report.py [trace_dir] [--top N]
The default trace_dir is /root/scratch/trace (what tools/op_profile.py
writes).  Importable: ``analyze(path) -> dict``.
"""

import glob
import json
import os
import re
import sys

# the C-extension protobuf refuses mismatched generated code; the pure
# python implementation parses it fine — must be set before import
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def _category(hlo: str) -> str:
    """Bucket one HLO op (full text from the xplane event name) the way
    the op-profile tool does: by the root operation."""
    m = re.match(r"%?([\w.\-]+) = ", hlo)
    name = m.group(1) if m else hlo
    opm = re.search(r"= \S+ ([\w\-]+)\(", hlo)
    op = opm.group(1) if opm else ""

    if op == "convolution" or "convolution" in name:
        return "convolution"
    if op == "fusion" and re.search(
        r"\[([1-7]),([1-7]),(?:([1-7]),)?\d{2,5},\d{2,5}\]", hlo
    ):
        # fusion with a conv-weight-shaped operand (small kz,ky[,kx] +
        # wide ci,co): XLA names conv fusions generically (%fusion.N)
        return "convolution"
    if op in ("copy", "transpose", "bitcast", "bitcast-convert", "reshape") or (
        op == "fusion" and re.match(r"(copy|transpose|bitcast)", name)
    ):
        return "data formatting"
    if op in ("slice", "dynamic-slice", "dynamic-update-slice") or (
        op == "fusion"
        and re.match(r"(slice|dynamic.slice|dynamic.update.slice|constant_dynamic)", name)
    ):
        return "slice"
    if op in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
              "all-to-all") or "collective" in name:
        return "collective"
    if op == "fusion":
        return "elementwise/other fusion"
    if op in ("parameter", "constant", "get-tuple-element", "tuple"):
        return "bookkeeping"
    return op or "other"


def analyze(trace_dir: str) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    devices = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not devices:  # CPU runs name the plane /host:CPU only
        raise RuntimeError(f"no TPU plane in {paths[-1]}")

    cats: dict = {}
    ops: dict = {}
    total_ps = 0
    for plane in devices:
        em = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                hlo = em.get(e.metadata_id, "?")
                dur = e.duration_ps
                total_ps += dur
                cat = _category(hlo)
                cats[cat] = cats.get(cat, 0) + dur
                key = hlo.split(" = ")[0]
                rec = ops.setdefault(key, {"ps": 0, "n": 0, "hlo": hlo[:200]})
                rec["ps"] += dur
                rec["n"] += 1

    return {
        "trace": paths[-1],
        "total_ms": total_ps / 1e9,
        "categories": {
            k: {"ms": v / 1e9, "share": v / total_ps}
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
        "top_ops": [
            {"op": k, "ms": r["ps"] / 1e9, "calls": r["n"],
             "share": r["ps"] / total_ps, "hlo": r["hlo"]}
            for k, r in sorted(ops.items(), key=lambda kv: -kv[1]["ps"])
        ],
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trace_dir = args[0] if args else "/root/scratch/trace"
    top = 15
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=")[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    rep = analyze(trace_dir)
    print(f"trace: {rep['trace']}  device total {rep['total_ms']:.1f} ms")
    print("\n-- categories --")
    for k, v in rep["categories"].items():
        print(f"  {v['share']*100:5.1f}%  {v['ms']:9.2f} ms  {k}")
    print(f"\n-- top {top} ops by self time --")
    for r in rep["top_ops"][:top]:
        print(f"  {r['share']*100:5.1f}%  {r['ms']:8.2f} ms  x{r['calls']:<3} {r['op'][:70]}")
    out = os.path.join(trace_dir, "xplane_report.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    print("\nwrote", out)


if __name__ == "__main__":
    main()
