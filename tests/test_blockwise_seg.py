import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
from bootstrapper_tpu.eval.voi import rand_voi
from bootstrapper_tpu.ops.affinities import seg_to_affs
from bootstrapper_tpu.post.blockwise_seg import (
    mws_pipeline_blockwise,
    waterz_pipeline_blockwise,
)
from bootstrapper_tpu.post.rag import RagDB
from bootstrapper_tpu.post.segment import METHOD_DEFAULTS


def _gt_volume(shape=(8, 48, 48)):
    """Three objects: two y-halves, the right half split in x."""
    seg = np.zeros(shape, np.uint64)
    seg[:, : shape[1] // 2, :] = 1
    seg[:, shape[1] // 2 :, : shape[2] // 2] = 2
    seg[:, shape[1] // 2 :, shape[2] // 2 :] = 3
    return seg


def _write_affs(tmp_path, seg, vs=(1, 1, 1)):
    nbhd = [[-1, 0, 0], [0, -1, 0], [0, 0, -1]]
    affs = (np.asarray(seg_to_affs(seg, nbhd)) * 255).astype(np.uint8)
    ds = prepare_ds(
        str(tmp_path / "v.zarr/affs"), affs.shape, (0, 0, 0), vs, np.uint8
    )
    ds[ds.roi] = affs
    return str(tmp_path / "v.zarr/affs")


def test_rag_db_roundtrip(tmp_path):
    db = RagDB(str(tmp_path / "rag.db"), mode="w")
    db.write_nodes([1, 2, 3], np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2.0]]))
    db.write_edges([1, 2], [2, 3], [0.1, 0.9])
    ids, centers = db.read_nodes()
    assert set(ids.tolist()) == {1, 2, 3}
    u, v, s = db.read_edges()
    assert len(u) == 2
    # duplicate edge keeps the min score
    db.write_edges([2], [1], [0.5])
    u, v, s = db.read_edges()
    assert len(u) == 2
    assert s[(u == 1) & (v == 2)][0] == pytest.approx(0.1)


def test_find_segments_drops_dangling_edges(tmp_path):
    """Regression: edges whose endpoints are missing from the node table
    (partially written RAG after a crash) must be DROPPED, not mapped to
    a neighbouring fragment id by the unguarded searchsorted (silent
    wrong merges / IndexError for ids past the table)."""
    from bootstrapper_tpu.post.blockwise_seg import find_segments

    db = RagDB(str(tmp_path / "rag.db"), mode="w")
    db.write_nodes([10, 20, 30], np.zeros((3, 3)))
    # edge (10,20) valid and mergeable; (15,*) and (99,*) dangle —
    # 15 would previously map to insertion-point neighbour 20, 99 past
    # the end of the table
    db.write_edges([10, 15, 99], [20, 30, 30], [0.1, 0.1, 0.1])
    luts = find_segments(db, str(tmp_path / "luts"), [0.5])
    lut = np.load(luts[0.5])["fragment_segment_lut"]
    frags, segs = lut[0], lut[1]
    m = dict(zip(frags.tolist(), segs.tolist()))
    assert m[10] == m[20]  # the valid low-score edge merged
    assert m[30] not in (m[10],)  # the dangling edges did NOT merge 30


def test_waterz_blockwise_segments_objects(tmp_path):
    gt = _gt_volume()
    affs_path = _write_affs(tmp_path, gt)
    segs = waterz_pipeline_blockwise(
        affs_path,
        str(tmp_path / "v.zarr"),
        block_shape=(8, 24, 24),
        context_voxels=(2, 6, 6),
        thresholds=[0.5],
        filter_fragments=0.0,
        num_workers=4,
    )
    out = open_ds(segs[0.5]).to_ndarray()
    # compare partitions away from boundaries
    interior = np.zeros(gt.shape, bool)
    interior[:, 2:22, 2:46] = True
    interior[:, 26:46, 2:22] = True
    interior[:, 26:46, 26:46] = True
    scores = rand_voi(gt[interior], out[interior], ignore_gt_zero=True)
    assert scores["voi_split"] + scores["voi_merge"] < 0.1


def test_waterz_blockwise_cross_block_consistency(tmp_path):
    """One object spanning multiple blocks must map to one segment id."""
    gt = np.ones((8, 48, 48), np.uint64)
    affs_path = _write_affs(tmp_path, gt)
    segs = waterz_pipeline_blockwise(
        affs_path,
        str(tmp_path / "v.zarr"),
        block_shape=(4, 16, 16),
        context_voxels=(1, 4, 4),
        thresholds=[0.5],
        filter_fragments=0.0,
        num_workers=4,
    )
    out = open_ds(segs[0.5]).to_ndarray()
    # first y/x planes carry the seg_to_affs border artifact (affinity 0
    # toward out-of-bounds) and may fall out of the boundary mask; the
    # interior must be a single id across all blocks
    interior = out[:, 1:, 1:]
    assert len(np.unique(interior)) == 1 and interior[0, 0, 0] != 0


def test_mws_blockwise(tmp_path):
    gt = _gt_volume()
    nbhd = [[-1, 0, 0], [0, -1, 0], [0, 0, -1]]
    affs_path = _write_affs(tmp_path, gt)
    segs = mws_pipeline_blockwise(
        affs_path,
        str(tmp_path / "v.zarr"),
        neighborhood=nbhd,
        bias=[-0.4, -0.4, -0.4],
        block_shape=(8, 24, 24),
        context_voxels=(1, 4, 4),
        filter_fragments=0.0,
        noise_eps=None,
        sigma=None,
        num_workers=2,
    )
    out = open_ds(segs["mws"]).to_ndarray()
    interior = np.zeros(gt.shape, bool)
    interior[:, 2:22, 2:46] = True
    interior[:, 26:46, 2:22] = True
    interior[:, 26:46, 26:46] = True
    scores = rand_voi(gt[interior], out[interior])
    assert scores["voi_split"] + scores["voi_merge"] < 0.25


def test_mws_blockwise_global_bias_sweep(tmp_path):
    """global_bias_sweep: several (adj, lr) operating points over ONE
    fragments+RAG run, one param-encoded dataset each (the mws analog of
    the ws threshold sweep); a sweep point at the default biases must
    reproduce the single-point segmentation."""
    gt = _gt_volume()
    nbhd = [[-1, 0, 0], [0, -1, 0], [0, 0, -1]]
    affs_path = _write_affs(tmp_path, gt)
    common = dict(
        neighborhood=nbhd,
        bias=[-0.4, -0.4, -0.4],
        block_shape=(8, 24, 24),
        context_voxels=(1, 4, 4),
        filter_fragments=0.0,
        noise_eps=None,
        sigma=None,
        num_workers=2,
    )
    single = mws_pipeline_blockwise(
        affs_path, str(tmp_path / "single.zarr"), **common
    )
    sweep = mws_pipeline_blockwise(
        affs_path, str(tmp_path / "sweep.zarr"),
        global_bias_sweep=[[-0.4, -0.7], [-0.8, -0.95]],
        **common,
    )
    assert set(sweep) == {"mws--a-0.4_l-0.7", "mws--a-0.8_l-0.95"}
    a = open_ds(single["mws"]).to_ndarray()
    b = open_ds(sweep["mws--a-0.4_l-0.7"]).to_ndarray()
    # same partition (ids may differ)
    from bootstrapper_tpu.eval.voi import rand_voi

    s = rand_voi(a, b, ignore_gt_zero=False)
    assert s["voi_split"] + s["voi_merge"] < 1e-6
    # the other operating point exists and covers the volume
    c = open_ds(sweep["mws--a-0.8_l-0.95"]).to_ndarray()
    assert c.shape == a.shape


def test_mws_inmemory_bias_sweep(tmp_path):
    """run_segmentation -p bias_sweep: one full in-memory mws run per
    (short, long) pair, one dataset per point."""
    import numpy as np

    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.segment import run_segmentation

    gt = _gt_volume()
    affs_path = _write_affs(tmp_path, gt)
    cfg = {
        "v": {
            "affs_dataset": affs_path,
            "seg_dataset_prefix": str(tmp_path / "v.zarr/segs"),
            "blockwise": False,
        }
    }
    p = str(tmp_path / "seg.toml")
    tomlio.dump({"segment": cfg}, p)
    res = run_segmentation(
        p, mode="mws",
        param_overrides=(
            "neighborhood=[[-1,0,0],[0,-1,0],[0,0,-1]]",
            "bias=[-0.4,-0.4,-0.4]",
            "bias_sweep=[[-0.4,-0.4],[-0.6,-0.6]]",
            "sigma=None", "noise_eps=None",
        ),
    )
    out = res["v"]
    assert set(out) == {"mws--a-0.4_l-0.4", "mws--a-0.6_l-0.6"}
    for name in out.values():
        seg = open_ds(name).to_ndarray()
        assert seg.shape == gt.shape


def test_epsilon_agglomerate_and_replace_sections(tmp_path):
    gt = _gt_volume()
    affs_path = _write_affs(tmp_path, gt)
    segs = waterz_pipeline_blockwise(
        affs_path,
        str(tmp_path / "v.zarr"),
        block_shape=(8, 48, 48),
        context_voxels=(0, 0, 0),
        thresholds=[0.5],
        filter_fragments=0.0,
        epsilon_agglomerate=0.1,
        replace_sections=[3],
        num_workers=1,
    )
    frags = open_ds(str(tmp_path / "v.zarr/fragments_ws")).to_ndarray()
    assert (frags[3] == 0).all()  # defective section zeroed
    assert frags[2].max() > 0


def test_fragments_with_audit(tmp_path):
    """Fragment extraction passes the runtime race audit."""
    gt = _gt_volume()
    affs_path = _write_affs(tmp_path, gt)
    from bootstrapper_tpu.core.arrays import open_ds as _o, prepare_ds as _p
    from bootstrapper_tpu.post.blockwise_seg import extract_fragments_blockwise
    from bootstrapper_tpu.post.rag import RagDB
    import numpy as _np

    affs = _o(affs_path)
    frags = _p(str(tmp_path / "v.zarr/frags_a"), gt.shape, (0, 0, 0), (1, 1, 1), _np.uint64)
    rag = RagDB(str(tmp_path / "rag_a.db"), mode="w")
    res = extract_fragments_blockwise(
        affs, frags, rag, (8, 24, 24), (0, 4, 4),
        filter_fragments=0.0, num_workers=4, audit=True,
    )
    assert res.ok


def test_open_rag_dispatch(tmp_path):
    """db_file -> SQLite; db_host/db_name -> PgSQL (import-gated)."""
    import pytest

    from bootstrapper_tpu.post.rag import PgRagDB, RagDB, open_rag

    rag = open_rag({"db_file": str(tmp_path / "r.db")}, mode="w")
    assert isinstance(rag, RagDB)
    rag.write_nodes([1, 2], np.zeros((2, 3)))
    assert rag.counts() == (2, 0)

    try:
        import psycopg2  # noqa: F401

        have_pg = True
    except ImportError:
        try:
            import psycopg  # noqa: F401

            have_pg = True
        except ImportError:
            have_pg = False
    if not have_pg:
        with pytest.raises(ImportError, match="psycopg"):
            open_rag({"db_name": "x", "db_host": "localhost"})
    # signed/unsigned BIGINT roundtrip used by the Pg backend
    for v in (0, 1, 2**63 - 1, 2**63, 2**64 - 1):
        assert PgRagDB._unsigned(PgRagDB._signed(v)) == v


def _install_fake_pg(monkeypatch, tmp_path):
    import sys

    import fake_psycopg2

    monkeypatch.setattr(fake_psycopg2, "BASE_DIR", str(tmp_path))
    monkeypatch.setitem(sys.modules, "psycopg2", fake_psycopg2)
    return fake_psycopg2


def test_pg_rag_db_full_flow(monkeypatch, tmp_path):
    """PgRagDB's complete SQL surface (DDL, upserts with EXCLUDED/LEAST,
    reads, signed/unsigned uint64 folding) exercised through a
    psycopg2-shaped DB-API shim (tests/fake_psycopg2.py): everything but
    the PostgreSQL wire engine is the production code path."""
    _install_fake_pg(monkeypatch, tmp_path)
    from bootstrapper_tpu.post.rag import PgRagDB

    big = np.uint64(2**63 + 17)  # exceeds BIGINT range unsigned
    db = PgRagDB({"dbname": "ragtest", "host": "localhost"}, mode="w")
    db.write_nodes(
        [1, 2, big], np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2.0]])
    )
    db.write_edges([1, 2], [2, big], [0.4, 0.9])
    # upsert: re-writing node 2 moves its center, edge keeps min score
    db.write_nodes([2], np.array([[5, 5, 5.0]]))
    db.write_edges([2], [1], [0.1])
    ids, centers = db.read_nodes()
    assert set(ids.tolist()) == {1, 2, int(big)}
    assert centers[list(ids).index(2)].tolist() == [5, 5, 5]
    u, v, s = db.read_edges()
    assert db.counts() == (3, 2)
    assert s[(u == 1) & (v == 2)][0] == pytest.approx(0.1)
    assert int(big) in set(u.tolist()) | set(v.tolist())
    # reopening in r+ keeps rows; w drops them
    assert PgRagDB({"dbname": "ragtest"}, mode="r+").counts() == (3, 2)
    assert PgRagDB({"dbname": "ragtest"}, mode="w").counts() == (0, 0)


def test_waterz_blockwise_with_pg_rag(monkeypatch, tmp_path):
    """The full 4-stage blockwise pipeline with its RAG routed to the
    PostgreSQL backend (db config with db_name/db_host -> open_rag ->
    PgRagDB) produces the same segmentation as the SQLite path."""
    _install_fake_pg(monkeypatch, tmp_path)
    gt = _gt_volume()
    affs_path = _write_affs(tmp_path, gt)
    kw = dict(
        block_shape=(8, 24, 24),
        context_voxels=(2, 6, 6),
        thresholds=[0.5],
        filter_fragments=0.0,
        num_workers=2,
    )
    segs_pg = waterz_pipeline_blockwise(
        affs_path, str(tmp_path / "pg.zarr"),
        db={"db_name": "blockwise", "db_host": "localhost"}, **kw,
    )
    segs_sq = waterz_pipeline_blockwise(
        affs_path, str(tmp_path / "sq.zarr"), **kw,
    )
    out_pg = open_ds(segs_pg[0.5]).to_ndarray()
    out_sq = open_ds(segs_sq[0.5]).to_ndarray()
    # identical partitions (ids may differ)
    scores = rand_voi(out_sq, out_pg)
    assert scores["voi_split"] + scores["voi_merge"] == pytest.approx(0.0)


def test_segment_cli_method_autodetect(tmp_path):
    """With no -m, `bs segment` runs every method that has a
    {method}_params table in the config (reference segment.py:199-213);
    -m is repeatable for explicit multi-method runs."""
    from click.testing import CliRunner

    from bootstrapper_tpu.cli.main import cli
    from bootstrapper_tpu.utils import tomlio

    gt = _gt_volume()
    affs_path = _write_affs(tmp_path, gt)
    tomlio.dump(
        {"segment": {"vol": {
            "affs_dataset": affs_path,
            "seg_dataset_prefix": str(tmp_path / "v.zarr/segmentations"),
            "ws_params": {"thresholds": [0.5]},
            "mws_params": {
                "neighborhood": [[-1, 0, 0], [0, -1, 0], [0, 0, -1]],
                "bias": [-0.5, -0.5, -0.5],
            },
        }}},
        str(tmp_path / "seg.toml"),
    )
    r = CliRunner().invoke(cli, ["segment", str(tmp_path / "seg.toml")])
    assert r.exit_code == 0, r.output
    assert "[ws" in r.output or "mean--" in r.output
    assert "mws" in r.output
    # explicit single method runs only that one
    r = CliRunner().invoke(
        cli, ["segment", str(tmp_path / "seg.toml"), "-m", "ws"]
    )
    assert r.exit_code == 0, r.output
    assert "mws" not in r.output


def test_cc_blockwise_matches_in_memory(tmp_path):
    """Blockwise cc (beyond reference: theirs raises NotImplementedError)
    reproduces the in-memory cc partition exactly, including components
    that span many blocks."""
    from bootstrapper_tpu.post.blockwise_seg import cc_pipeline_blockwise
    from bootstrapper_tpu.post.segment import cc_segmentation

    rng = np.random.default_rng(3)
    affs = rng.random((3, 10, 40, 40)).astype(np.float32)
    affs[:, :, :, 19:21] *= 0.4  # a soft wall to vary component shapes
    ds = prepare_ds(
        str(tmp_path / "v.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1),
        np.float32,
    )
    ds[ds.roi] = affs

    ref = cc_segmentation(affs, threshold=0.6)
    segs = cc_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "v.zarr"),
        threshold=0.6, block_shape=(4, 16, 16), context_voxels=(1, 2, 2),
        num_workers=2,
    )
    out = open_ds(segs["cc"]).to_ndarray()
    # identical partitions AND identical background
    assert ((out == 0) == (ref == 0)).all()
    from bootstrapper_tpu.eval.voi import rand_voi

    scores = rand_voi(ref[ref > 0], out[ref > 0])
    assert scores["voi_split"] + scores["voi_merge"] == pytest.approx(0.0)


def test_cc_blockwise_sharded_workers(tmp_path):
    """The cc pipeline under crash-isolated stride shards equals the
    single-process result."""
    from bootstrapper_tpu.post.blockwise_seg import cc_pipeline_blockwise

    rng = np.random.default_rng(5)
    affs = rng.random((3, 8, 24, 24)).astype(np.float32)
    ds = prepare_ds(
        str(tmp_path / "v.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1),
        np.float32,
    )
    ds[ds.roi] = affs
    one = cc_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "one.zarr"),
        threshold=0.5, block_shape=(4, 12, 12), context_voxels=(1, 2, 2),
        num_workers=2,
    )
    two = cc_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "two.zarr"),
        threshold=0.5, block_shape=(4, 12, 12), context_voxels=(1, 2, 2),
        num_workers=1, workers=2,
    )
    a = open_ds(one["cc"]).to_ndarray()
    b = open_ds(two["cc"]).to_ndarray()
    assert ((a == 0) == (b == 0)).all()
    if (a > 0).any():
        from bootstrapper_tpu.eval.voi import rand_voi

        scores = rand_voi(a[a > 0], b[a > 0])
        assert scores["voi_split"] + scores["voi_merge"] == pytest.approx(0)


def test_cc_blockwise_remove_debris(tmp_path):
    """Blockwise remove_debris matches in-memory remove_small_segments."""
    from bootstrapper_tpu.post.blockwise_seg import cc_pipeline_blockwise
    from bootstrapper_tpu.post.segment import cc_segmentation

    rng = np.random.default_rng(7)
    affs = rng.random((3, 8, 24, 24)).astype(np.float32)
    ds = prepare_ds(
        str(tmp_path / "v.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1),
        np.float32,
    )
    ds[ds.roi] = affs
    ref = cc_segmentation(affs, threshold=0.7, remove_debris=20)
    segs = cc_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "v.zarr"),
        threshold=0.7, remove_debris=20,
        block_shape=(4, 12, 12), context_voxels=(1, 2, 2), num_workers=2,
    )
    out = open_ds(segs["cc"]).to_ndarray()
    assert ((out == 0) == (ref == 0)).all()
    if (ref > 0).any():
        from bootstrapper_tpu.eval.voi import rand_voi

        scores = rand_voi(ref[ref > 0], out[ref > 0])
        assert scores["voi_split"] + scores["voi_merge"] == pytest.approx(0)


def test_cc_blockwise_uint8_low_valued_block(tmp_path):
    """Normalization is dtype-keyed, not per-block max: a uint8 block
    whose max stored value is 1 (p~0.004) must stay background, not be
    misread as already-normalized affinity 1.0."""
    from bootstrapper_tpu.post.blockwise_seg import cc_pipeline_blockwise
    from bootstrapper_tpu.post.segment import cc_segmentation

    affs = np.zeros((3, 4, 16, 16), np.uint8)
    affs[:, :, :8, :8] = 255          # one solid object
    affs[:, :, 12:, 12:] = 1          # near-background corner, p~0.004
    ds = prepare_ds(
        str(tmp_path / "v.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1),
        np.uint8,
    )
    ds[ds.roi] = affs
    ref = cc_segmentation(affs, threshold=0.5)
    segs = cc_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "v.zarr"),
        threshold=0.5, block_shape=(4, 8, 8), context_voxels=(1, 2, 2),
        num_workers=2,
    )
    out = open_ds(segs["cc"]).to_ndarray()
    assert ((out == 0) == (ref == 0)).all()
    assert (out[:, 12:, 12:] == 0).all()


def test_cc_blockwise_roi_restricted_matches_in_memory(tmp_path):
    """A processed-ROI boundary behaves like a volume boundary: blockwise
    cc on a sub-ROI equals in-memory cc of that sub-ROI's affinities."""
    from bootstrapper_tpu.core.geometry import Roi
    from bootstrapper_tpu.post.blockwise_seg import cc_pipeline_blockwise
    from bootstrapper_tpu.post.segment import cc_segmentation

    rng = np.random.default_rng(11)
    affs = rng.random((3, 10, 32, 32)).astype(np.float32)
    ds = prepare_ds(
        str(tmp_path / "v.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1),
        np.float32,
    )
    ds[ds.roi] = affs
    roi = Roi((2, 4, 4), (6, 24, 24))
    ref = cc_segmentation(affs[:, 2:8, 4:28, 4:28], threshold=0.6)
    segs = cc_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "v.zarr"),
        threshold=0.6, block_shape=(3, 12, 12), context_voxels=(1, 2, 2),
        num_workers=2, roi=roi,
    )
    out = open_ds(segs["cc"]).to_ndarray()
    assert out.shape == ref.shape
    assert ((out == 0) == (ref == 0)).all()
    if (ref > 0).any():
        from bootstrapper_tpu.eval.voi import rand_voi

        scores = rand_voi(ref[ref > 0], out[ref > 0])
        assert scores["voi_split"] + scores["voi_merge"] == pytest.approx(0)


def test_pg_rag_per_method_table_prefix(monkeypatch, tmp_path):
    """ws and cc against ONE PostgreSQL database keep separate tables:
    the second method's setup must not drop the first's RAG."""
    from bootstrapper_tpu.post.blockwise_seg import (
        cc_pipeline_blockwise,
        waterz_pipeline_blockwise,
    )
    from bootstrapper_tpu.post.rag import PgRagDB

    _install_fake_pg(monkeypatch, tmp_path)
    gt = _gt_volume()
    affs_path = _write_affs(tmp_path, gt)
    db = {"db_name": "shared", "db_host": "x"}
    waterz_pipeline_blockwise(
        affs_path, str(tmp_path / "ws.zarr"),
        block_shape=(8, 24, 24), context_voxels=(2, 6, 6),
        thresholds=[0.5], filter_fragments=0.0, num_workers=2, db=db,
    )
    ws_counts = PgRagDB(
        {"dbname": "shared"}, mode="r+", table_prefix="rag_ws"
    ).counts()
    assert ws_counts[0] > 0
    cc_pipeline_blockwise(
        affs_path, str(tmp_path / "cc.zarr"),
        threshold=0.5, block_shape=(8, 24, 24),
        context_voxels=(2, 6, 6), num_workers=2, db=db,
    )
    # ws RAG untouched by cc's mode='w' setup
    assert PgRagDB(
        {"dbname": "shared"}, mode="r+", table_prefix="rag_ws"
    ).counts() == ws_counts


def test_segment_autodetect_is_per_volume(tmp_path):
    """Auto-detected methods run only on the volumes that configure
    them; -v restricts detection to that volume."""
    from click.testing import CliRunner

    from bootstrapper_tpu.cli.main import cli
    from bootstrapper_tpu.utils import tomlio

    gt = _gt_volume()
    affs_path = _write_affs(tmp_path, gt)
    tomlio.dump(
        {"segment": {
            "vol_a": {
                "affs_dataset": affs_path,
                "seg_dataset_prefix": str(tmp_path / "a.zarr/segmentations"),
                "ws_params": {"thresholds": [0.5]},
            },
            "vol_b": {
                "affs_dataset": affs_path,
                "seg_dataset_prefix": str(tmp_path / "b.zarr/segmentations"),
                "mws_params": {
                    "neighborhood": [[-1, 0, 0], [0, -1, 0], [0, 0, -1]],
                    "bias": [-0.5, -0.5, -0.5],
                },
            },
        }},
        str(tmp_path / "seg.toml"),
    )
    r = CliRunner().invoke(cli, ["segment", str(tmp_path / "seg.toml")])
    assert r.exit_code == 0, r.output
    # vol_a ran ws only, vol_b ran mws only
    assert "vol_a [0.5]" in r.output or "vol_a" in r.output
    import glob as _glob

    # in-memory outputs live under the per-volume seg prefix
    a_out = _glob.glob(str(tmp_path / "a.zarr/segmentations/*"))
    b_out = _glob.glob(str(tmp_path / "b.zarr/segmentations/*"))
    assert a_out and all("mws" not in p for p in a_out), a_out
    assert b_out and all("mws" in p for p in b_out), b_out
    # -v vol_a: only ws detected, mws never runs anywhere
    r = CliRunner().invoke(
        cli, ["segment", str(tmp_path / "seg.toml"), "-v", "vol_a"]
    )
    assert r.exit_code == 0, r.output
    assert "mws" not in r.output


def test_multi_volume_blockwise_not_shadowed(tmp_path):
    """Volume N's resolved blockwise value must not leak into volume
    N+1: vol_1 in-memory, vol_2 blockwise=true in one config."""
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.segment import run_segmentation

    gt = _gt_volume()
    affs_path = _write_affs(tmp_path, gt)
    tomlio.dump(
        {"segment": {
            "vol_1": {
                "affs_dataset": affs_path,
                "seg_dataset_prefix": str(tmp_path / "m1.zarr/segmentations"),
                "ws_params": {"thresholds": [0.5]},
            },
            "vol_2": {
                "affs_dataset": affs_path,
                "seg_dataset_prefix": str(tmp_path / "m2.zarr/segmentations"),
                "blockwise": True,
                "block_shape": [8, 24, 24],
                "context": [2, 6, 6],
                "ws_params": {"thresholds": [0.5], "filter_fragments": 0.0},
            },
        }},
        str(tmp_path / "seg.toml"),
    )
    run_segmentation(str(tmp_path / "seg.toml"), mode="ws")
    import os as _os

    # vol_2 really went blockwise (fragments dataset is blockwise-only)
    assert _os.path.exists(str(tmp_path / "m2.zarr/fragments_ws"))
    assert not _os.path.exists(str(tmp_path / "m1.zarr/fragments_ws"))


def test_mws_blockwise_soft_affinities_no_overmerge(tmp_path):
    """Regression for the round-3 scale-run over-merge (voi_merge 15.7
    on a 125x1250x1250 volume): refiner-chain outputs have SOFT
    boundaries (mean short-range affinity > 0.5), which the old
    single-population global step scored as globally attractive — the
    long-range repulsive population is what stops them. Blockwise mws
    must stay close to the in-memory result on such affinities."""
    from bootstrapper_tpu.post.segment import (
        MWS_DEFAULT_BIAS,
        MWS_DEFAULT_NEIGHBORHOOD,
        mws_segmentation,
    )

    gt = _gt_volume(shape=(8, 48, 48))
    nbhd = MWS_DEFAULT_NEIGHBORHOOD
    rng = np.random.default_rng(3)
    affs = np.zeros((len(nbhd), *gt.shape), np.float32)
    for ci, off in enumerate(nbhd):
        src = tuple(
            slice(max(0, -o), s - max(0, o)) for o, s in zip(off, gt.shape)
        )
        dst = tuple(
            slice(max(0, o), s - max(0, -o)) for o, s in zip(off, gt.shape)
        )
        same = gt[src] == gt[dst]
        long_range = max(abs(o) for o in off) > 1
        # soft boundaries: short-range cross-object affinity ABOVE 0.5
        hi, lo = (0.85, 0.55) if not long_range else (0.75, 0.15)
        affs[ci][src] = np.where(same, hi, lo)
    affs += rng.normal(0, 0.02, affs.shape).astype(np.float32)
    affs = np.clip(affs, 0, 1)

    ref = mws_segmentation(
        affs, nbhd, MWS_DEFAULT_BIAS, sigma=None, noise_eps=None,
        strides=None, randomized_strides=False,
    )
    ref_voi = rand_voi(gt, ref)
    assert ref_voi["voi_split"] + ref_voi["voi_merge"] < 0.2

    ds = prepare_ds(
        str(tmp_path / "v.zarr/soft_affs"), affs.shape, (0, 0, 0),
        (1, 1, 1), np.uint8,
    )
    ds[ds.roi] = (affs * 255).astype(np.uint8)
    segs = mws_pipeline_blockwise(
        str(tmp_path / "v.zarr/soft_affs"),
        str(tmp_path / "v.zarr"),
        neighborhood=nbhd,
        bias=MWS_DEFAULT_BIAS,
        block_shape=(8, 24, 24),
        context_voxels=(1, 6, 6),
        filter_fragments=0.0,
        noise_eps=None,
        sigma=None,
        num_workers=2,
    )
    out = open_ds(segs["mws"]).to_ndarray()
    scores = rand_voi(gt, out)
    # the old single-population global step merges the three objects
    # into one here (voi_merge ~1.5, voi_split ~0)
    assert scores["voi_merge"] < 0.3, scores
    assert scores["voi_split"] + scores["voi_merge"] < 0.5, scores


def test_mws_blockwise_sqlite_db_config_separates_edge_populations(tmp_path):
    """configs.py-generated blockwise configs carry db={'db_file': ...}.
    open_rag must namespace the adjacent and long-range mutex edge
    populations into DISTINCT SQLite stores (table_prefix -> sibling
    file) — a shared file merges the two populations under one
    PK(u,v) table and corrupts the global mutex graph. The db-config
    run must reproduce the db=None run exactly."""
    from bootstrapper_tpu.post.segment import (
        MWS_DEFAULT_BIAS,
        MWS_DEFAULT_NEIGHBORHOOD,
    )

    gt = _gt_volume(shape=(8, 48, 48))
    nbhd = MWS_DEFAULT_NEIGHBORHOOD
    rng = np.random.default_rng(5)
    affs = np.zeros((len(nbhd), *gt.shape), np.float32)
    for ci, off in enumerate(nbhd):
        src = tuple(
            slice(max(0, -o), s - max(0, o)) for o, s in zip(off, gt.shape)
        )
        dst = tuple(
            slice(max(0, o), s - max(0, -o)) for o, s in zip(off, gt.shape)
        )
        same = gt[src] == gt[dst]
        long_range = max(abs(o) for o in off) > 1
        hi, lo = (0.85, 0.55) if not long_range else (0.75, 0.15)
        affs[ci][src] = np.where(same, hi, lo)
    affs += rng.normal(0, 0.02, affs.shape).astype(np.float32)
    affs = np.clip(affs, 0, 1)
    ds = prepare_ds(
        str(tmp_path / "v.zarr/affs"), affs.shape, (0, 0, 0),
        (1, 1, 1), np.uint8,
    )
    ds[ds.roi] = (affs * 255).astype(np.uint8)

    common = dict(
        neighborhood=nbhd,
        bias=MWS_DEFAULT_BIAS,
        block_shape=(8, 24, 24),
        context_voxels=(1, 6, 6),
        filter_fragments=0.0,
        noise_eps=None,
        sigma=None,
        num_workers=2,
    )
    plain = mws_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "plain.zarr"),
        **common,
    )
    db_file = str(tmp_path / "cfg.zarr/my_rag.db")
    with_db = mws_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "cfg.zarr"),
        db={"db_file": db_file},
        **common,
    )

    # two distinct sibling stores, one per edge population
    import os

    assert os.path.exists(str(tmp_path / "cfg.zarr/my_rag.rag_mws.db"))
    assert os.path.exists(str(tmp_path / "cfg.zarr/my_rag.rag_mws_lr.db"))

    a = open_ds(plain["mws"]).to_ndarray()
    b = open_ds(with_db["mws"]).to_ndarray()
    s = rand_voi(a, b, ignore_gt_zero=False)
    assert s["voi_split"] + s["voi_merge"] < 1e-6, s
