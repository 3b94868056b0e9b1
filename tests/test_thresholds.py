import networkx as nx
import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import prepare_ds
from bootstrapper_tpu.eval.thresholds import evaluate_thresholds
from bootstrapper_tpu.post.rag import RagDB


@pytest.fixture
def setup(tmp_path):
    """Fragments volume: 4 fragments in a row; RAG merges 1-2 at 0.1,
    3-4 at 0.2, 2-3 at 0.8. GT: fragments {1,2} and {3,4} are objects."""
    frags = np.zeros((2, 4, 8), np.uint64)
    frags[:, :, :2] = 1
    frags[:, :, 2:4] = 2
    frags[:, :, 4:6] = 3
    frags[:, :, 6:] = 4
    fd = prepare_ds(str(tmp_path / "t.zarr/frags"), frags.shape, (0, 0, 0), (1, 1, 1), np.uint64)
    fd[fd.roi] = frags

    gt = np.zeros_like(frags)
    gt[:, :, :4] = 10
    gt[:, :, 4:] = 20
    gd = prepare_ds(str(tmp_path / "t.zarr/gt"), gt.shape, (0, 0, 0), (1, 1, 1), np.uint64)
    gd[gd.roi] = gt

    rag = RagDB(str(tmp_path / "rag.db"), mode="w")
    rag.write_nodes([1, 2, 3, 4], np.array(
        [[1, 2, 1], [1, 2, 3], [1, 2, 5], [1, 2, 7.0]]
    ))
    rag.write_edges([1, 3, 2], [2, 4, 3], [0.1, 0.2, 0.8])

    g = nx.Graph()
    for i, x in enumerate([0.5, 2.5, 3.5]):  # skeleton inside object 10
        g.add_node(f"a{i}", position_z=0.0, position_y=2.0, position_x=x,
                   skeleton_id="a")
    g.add_edge("a0", "a1")
    g.add_edge("a1", "a2")
    for i, x in enumerate([4.5, 6.5]):
        g.add_node(f"b{i}", position_z=0.0, position_y=2.0, position_x=x,
                   skeleton_id="b")
    g.add_edge("b0", "b1")
    skel_path = str(tmp_path / "skels.graphml")
    nx.write_graphml(g, skel_path)
    return {"frags": fd, "gt": gd, "rag": rag, "skels": skel_path}


def test_voi_sweep_best_threshold(setup):
    out = evaluate_thresholds(
        setup["frags"], setup["rag"], [0.05, 0.5, 0.9],
        gt_labels=setup["gt"],
    )
    # at 0.5: merges 1-2 and 3-4 only -> perfect
    assert out["best_voi"]["threshold"] == 0.5
    assert out["thresholds"][0.5]["voi"]["voi_sum"] == pytest.approx(0, abs=1e-9)
    # at 0.05 nothing merged -> split error; at 0.9 all merged -> merge error
    assert out["thresholds"][0.05]["voi"]["voi_split"] > 0
    assert out["thresholds"][0.9]["voi"]["voi_merge"] > 0


def test_skeleton_sweep(setup):
    out = evaluate_thresholds(
        setup["frags"], setup["rag"], [0.05, 0.5, 0.9],
        gt_skeletons=setup["skels"],
    )
    assert out["best_nerl"]["threshold"] == 0.5
    assert out["thresholds"][0.5]["skeletons"]["nerl"] == pytest.approx(1.0)
    # at 0.9 both skeletons share one segment -> merge detected
    assert out["thresholds"][0.9]["skeletons"]["merge_count"] >= 1
    assert out["thresholds"][0.9]["edits"]["splits_needed"] >= 1
    # at 0.05 skeleton a spans fragments 1,2 -> split
    assert out["thresholds"][0.05]["skeletons"]["split_count"] >= 1


def test_threshold_sweep_via_evaluate_workflow(setup, tmp_path):
    """The evaluate workflow's threshold_sweep config path."""
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.evaluate import run_evaluation

    frags = setup["frags"]
    cfg = {
        "evaluate": {
            "vol": {
                "out_result_dir": str(tmp_path / "eval"),
                "seg_datasets_prefix": str(tmp_path / "none"),
                "threshold_sweep": {
                    "fragments_dataset": frags.path,
                    "rag_db": setup["rag"].path,
                    "thresholds": [0.05, 0.5, 0.9],
                },
                "gt": {"labels_dataset": setup["gt"].path},
            }
        }
    }
    p = str(tmp_path / "eval.toml")
    tomlio.dump(cfg, p)
    out = run_evaluation(p)
    sweep = out["vol"]["threshold_sweep"]
    assert sweep["best_voi"]["threshold"] == 0.5
    assert "0.9" in sweep["thresholds"]


def test_threaded_sweep_matches_serial(setup):
    serial = evaluate_thresholds(
        setup["frags"], setup["rag"], [0.15, 0.5, 0.9],
        gt_labels=setup["gt"], gt_skeletons=setup["skels"],
    )
    threaded = evaluate_thresholds(
        setup["frags"], setup["rag"], [0.15, 0.5, 0.9],
        gt_labels=setup["gt"], gt_skeletons=setup["skels"], num_workers=3,
    )
    assert serial == threaded


def test_sweep_10k_sites_batched_lookup(tmp_path):
    """Site lookups are one TensorStore read per touched chunk: a
    10k-node skeleton sweep completes in seconds, not minutes."""
    import time

    import networkx as nx

    shape = (64, 256, 256)
    frags = np.random.default_rng(0).integers(
        1, 5, shape, dtype=np.uint64
    )
    fd = prepare_ds(
        str(tmp_path / "big.zarr/frags"), shape, (0, 0, 0), (1, 1, 1),
        np.uint64, chunk_shape=(32, 64, 64),
    )
    fd[fd.roi] = frags

    rag = RagDB(str(tmp_path / "rag_big.db"), mode="w")
    rag.write_nodes([1, 2, 3, 4], np.zeros((4, 3)))
    rag.write_edges([1, 3], [2, 4], [0.1, 0.2])

    rng = np.random.default_rng(1)
    g = nx.Graph()
    n_skel, per = 500, 20  # 10k nodes
    for s in range(n_skel):
        base = rng.integers(0, np.array(shape) - per)
        prev = None
        for i in range(per):
            nid = f"s{s}_{i}"
            g.add_node(
                nid,
                position_z=float(base[0]),
                position_y=float(base[1]),
                position_x=float(base[2] + i),
                skeleton_id=f"s{s}",
            )
            if prev:
                g.add_edge(prev, nid)
            prev = nid
    skel_path = str(tmp_path / "big_skels.graphml")
    nx.write_graphml(g, skel_path)

    t0 = time.perf_counter()
    out = evaluate_thresholds(fd, rag, [0.15], gt_skeletons=skel_path)
    dt = time.perf_counter() - t0
    assert "skeletons" in out["thresholds"][0.15]
    assert dt < 10, f"sweep took {dt:.1f}s"
