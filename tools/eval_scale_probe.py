"""Scale-probe the pure-Python skeleton/threshold evaluation path.

The reference evaluates thresholds with C++ ``funlib.evaluate`` +
graph-tool (``bootstrapper/eval/evaluate_thresholds.py:185-192``); our
ERL/edits/min-cut path is networkx + numpy + the native CC core.  Fine
at the scales tested so far (37.5 s at CREMI scale) — this tool probes
a skeleton-DENSE regime (>=10k skeleton nodes, ~8k fragments, ~23k RAG
edges) and records wall-clock per stage so the "pure Python is
acceptable" claim carries a number.

Usage: python tools/eval_scale_probe.py [--nodes 12000] [--out JSON]
Prints one JSON line with per-stage timings.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=12000)
    ap.add_argument("--shape", default="64,512,512")
    ap.add_argument("--sv", default="8,16,16", help="supervoxel size")
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--tmp", default="/tmp/eval_scale_probe")
    args = ap.parse_args()

    import networkx as nx
    import numpy as np

    from bootstrapper_tpu.core.arrays import prepare_ds
    from bootstrapper_tpu.eval.thresholds import evaluate_thresholds
    from bootstrapper_tpu.post.rag import RagDB

    shape = tuple(int(v) for v in args.shape.split(","))
    sv = tuple(int(v) for v in args.sv.split(","))
    grid = tuple(s // v for s, v in zip(shape, sv))
    n_frags = grid[0] * grid[1] * grid[2]
    os.makedirs(args.tmp, exist_ok=True)
    rng = np.random.default_rng(0)
    t_all = time.time()

    # ---- fragments: supervoxel bricks, ids 1..n -----------------------
    zz, yy, xx = np.meshgrid(
        np.arange(shape[0]) // sv[0],
        np.arange(shape[1]) // sv[1],
        np.arange(shape[2]) // sv[2],
        indexing="ij",
    )
    frags = (
        zz * grid[1] * grid[2] + yy * grid[2] + xx + 1
    ).astype(np.uint64)
    fd = prepare_ds(
        os.path.join(args.tmp, "probe.zarr/frags"), shape, (0, 0, 0),
        (1, 1, 1), np.uint64,
    )
    fd[fd.roi] = frags

    # ---- ground-truth labels: columns of supervoxels are one neuron ---
    gt = (yy * grid[2] + xx + 1).astype(np.uint64)
    gd = prepare_ds(
        os.path.join(args.tmp, "probe.zarr/gt"), shape, (0, 0, 0),
        (1, 1, 1), np.uint64,
    )
    gd[gd.roi] = gt

    # ---- RAG: 6-adjacency edges; low scores along z within a column
    # (true merges), high across columns ---------------------------------
    ids = np.arange(1, n_frags + 1, dtype=np.uint64)
    centers = np.stack([
        (ids - 1) // (grid[1] * grid[2]) * sv[0] + sv[0] / 2,
        (ids - 1) // grid[2] % grid[1] * sv[1] + sv[1] / 2,
        (ids - 1) % grid[2] * sv[2] + sv[2] / 2,
    ], axis=1).astype(np.float64)
    rag = RagDB(os.path.join(args.tmp, "rag.db"), mode="w")
    rag.write_nodes(ids, centers)
    gidx = np.arange(n_frags).reshape(grid)
    eu, ev, es = [], [], []
    for axis in range(3):
        a = gidx.take(np.arange(grid[axis] - 1), axis=axis).ravel()
        b = gidx.take(np.arange(1, grid[axis]), axis=axis).ravel()
        eu.append(a + 1)
        ev.append(b + 1)
        if axis == 0:  # same column: mergeable
            es.append(rng.uniform(0.05, 0.3, a.size))
        else:  # cross-column: mostly high, some ambiguous
            es.append(rng.uniform(0.4, 1.0, a.size))
    eu = np.concatenate(eu); ev = np.concatenate(ev)
    es = np.concatenate(es)
    rag.write_edges(eu.tolist(), ev.tolist(), es.tolist())

    # ---- skeletons: one per GT column-neuron, nodes every few voxels
    # along z with xy jitter inside the column --------------------------
    n_skels = grid[1] * grid[2]
    per = max(2, args.nodes // n_skels)
    g = nx.Graph()
    total_nodes = 0
    for s in range(n_skels):
        cy = (s // grid[2]) * sv[1] + sv[1] // 2
        cx = (s % grid[2]) * sv[2] + sv[2] // 2
        prev = None
        for i in range(per):
            z = (i + 0.5) * (shape[0] - 1) / per
            name = f"s{s}_{i}"
            g.add_node(
                name,
                position_z=float(z),
                position_y=float(cy + rng.integers(-2, 3)),
                position_x=float(cx + rng.integers(-2, 3)),
                skeleton_id=f"n{s}",
            )
            if prev is not None:
                g.add_edge(prev, name)
            prev = name
            total_nodes += 1
    skel_path = os.path.join(args.tmp, "skels.graphml")
    nx.write_graphml(g, skel_path)
    setup_s = round(time.time() - t_all, 1)

    thresholds = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7]
    result = {
        "n_fragments": int(n_frags),
        "n_rag_edges": int(eu.size),
        "n_skeleton_nodes": int(total_nodes),
        "n_skeletons": int(n_skels),
        "n_thresholds": len(thresholds),
        "setup_s": setup_s,
    }

    print("PARTIAL " + json.dumps(result), flush=True)

    t0 = time.time()
    out = evaluate_thresholds(
        fd, rag, thresholds, gt_skeletons=skel_path,
        num_workers=args.workers,
    )
    result["skeleton_sweep_s"] = round(time.time() - t0, 1)
    result["best_nerl"] = round(out["best_nerl"]["nerl"], 4)
    print("PARTIAL " + json.dumps(result), flush=True)

    t0 = time.time()
    out = evaluate_thresholds(
        fd, rag, thresholds, gt_labels=gd, num_workers=args.workers,
    )
    result["voi_sweep_s"] = round(time.time() - t0, 1)
    result["best_voi_sum"] = round(out["best_voi"]["voi_sum"], 4)
    print("PARTIAL " + json.dumps(result), flush=True)

    t0 = time.time()
    out = evaluate_thresholds(
        fd, rag, thresholds, gt_labels=gd, gt_skeletons=skel_path,
        num_workers=args.workers,
    )
    result["combined_sweep_s"] = round(time.time() - t0, 1)
    result["total_s"] = round(time.time() - t_all, 1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
