"""Offline cost model over optimized TPU HLO text.

``jit(f).lower(...).compile().as_text()`` embeds XLA's own
``estimated_cycles`` per instruction in ``backend_config`` — summing
them per category gives a no-hardware objective for layout experiments:
compile a graph variant (remote compile, no chip execution), compare
copy/slice cycle totals against the baseline, and only benchmark the
winner on the real chip.

Usage: python tools/hlo_cost.py <hlo.txt> [hlo2.txt ...]
Importable: ``cost(path) -> dict``.
"""

import json
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xplane_report import _category  # noqa: E402


def cost(path: str) -> dict:
    cats: dict = {}
    ops: list = []
    total = 0
    for line in open(path):
        m = re.search(r'"estimated_cycles":"(\d+)"', line)
        if not m:
            continue
        cyc = int(m.group(1))
        hlo = line.strip()
        cat = _category(hlo.lstrip("ROOT %").lstrip())
        total += cyc
        cats[cat] = cats.get(cat, 0) + cyc
        name = hlo.split(" = ")[0].strip().lstrip("ROOT %")
        ops.append((cyc, name, cat))
    ops.sort(reverse=True)
    return {
        "file": path,
        "total_cycles": total,
        "categories": {
            k: {"cycles": v, "share": v / max(total, 1)}
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
        "top_ops": [
            {"cycles": c, "op": n, "cat": k} for c, n, k in ops[:25]
        ],
    }


def main():
    for path in sys.argv[1:]:
        rep = cost(path)
        ghz = 0.94  # v5e TensorCore clock, for a rough ms scale
        print(f"\n== {path}: total {rep['total_cycles']/1e6:.1f} Mcycles "
              f"(~{rep['total_cycles']/ghz/1e6:.1f} ms at {ghz} GHz) ==")
        for k, v in rep["categories"].items():
            print(f"  {v['share']*100:5.1f}%  {v['cycles']/1e6:9.1f} Mcyc  {k}")
        print("  -- top ops --")
        for r in rep["top_ops"][:12]:
            print(f"    {r['cycles']/1e6:8.1f} Mcyc  {r['cat'][:14]:14} {r['op'][:60]}")


if __name__ == "__main__":
    main()
