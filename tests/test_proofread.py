import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
from bootstrapper_tpu.ops.affinities import seg_to_affs
from bootstrapper_tpu.proofread import ProofreadSession


@pytest.fixture
def session(tmp_path):
    shape = (4, 64, 64)
    gt = np.zeros(shape, np.int64)
    gt[:, :32, :] = 1
    gt[:, 32:, :] = 2
    raw = prepare_ds(str(tmp_path / "p.zarr/raw"), shape, (0, 0, 0), (1, 1, 1), np.uint8)
    raw[raw.roi] = np.full(shape, 128, np.uint8)
    affs = (np.asarray(seg_to_affs(gt, [[-1, 0, 0], [0, -1, 0], [0, 0, -1]])) * 255).astype(np.uint8)
    ads = prepare_ds(str(tmp_path / "p.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1), np.uint8)
    ads[ads.roi] = affs
    return ProofreadSession(raw, ads), tmp_path


def test_segment_from_point_respects_boundaries(session):
    s, _ = session
    sid = s.segment_from_point((2, 10, 30))
    assert sid > 0
    grown = s.labels == sid
    assert grown[2, 10, 30]
    assert grown.sum() > 100
    # nothing grows into the second object
    assert not grown[:, 34:, :].any()


def test_merge_and_unmerge(session):
    s, _ = session
    a = s.segment_from_point((1, 10, 10))
    b = s.segment_from_point((1, 50, 50))
    assert a != b and a > 0 and b > 0
    keep = s.merge([a, b])
    assert set(np.unique(s.labels)) <= {0, keep}
    parts = s.unmerge(keep)
    assert len(parts) == 2  # two spatially disconnected components


def test_omit_excluded_from_mask(session):
    s, tmp = session
    a = s.segment_from_point((1, 10, 10))
    b = s.segment_from_point((1, 50, 50))
    s.omit(b)
    out = s.write(str(tmp / "p.zarr"))
    labels = open_ds(out["labels"]).to_ndarray()
    mask = open_ds(out["mask"]).to_ndarray()
    assert (mask[labels == a] == 1).all()
    assert (mask[labels == b] == 0).all()


def test_filter_small(session):
    s, _ = session
    a = s.segment_from_point((1, 10, 10))
    s.labels[0, 0, 0] = 999  # speck
    s.next_id = 1000
    removed = s.filter_small(5)
    assert removed == 1
    assert 999 not in s.labels


class TestProofreadUI:
    """Headless parity with the reference's neuroglancer session
    (``ng_interactive_sam.py:133-214``): layer plan, key bindings, and
    annotation parsing, without the package."""

    def test_layer_specs(self):
        from bootstrapper_tpu.proofread_ui import (
            ANNOTATION_COLOR,
            proofread_layer_specs,
        )

        specs = {s.name: s for s in proofread_layer_specs()}
        assert specs["image"].kind == "image"
        assert specs["labels"].kind == "segmentation"
        ms = specs["merge_split"]
        assert ms.kind == "annotation"
        assert ms.linked_segmentation == "labels"
        assert ms.color == ANNOTATION_COLOR

    def test_keybindings(self):
        from bootstrapper_tpu.proofread_ui import PROOFREAD_KEYBINDINGS

        assert PROOFREAD_KEYBINDINGS == {
            "s": "segment", "m": "merge_labels", "u": "unmerge_labels",
            "f": "filter_labels", "o": "omit_labels", "w": "write_data",
        }

    def test_selected_ids_flattens_segment_lists(self):
        from bootstrapper_tpu.proofread_ui import selected_ids

        class A:
            def __init__(self, segments):
                self.segments = segments

        annos = [A([[1, 2], [3]]), A(None), A([np.array([4, 2])])]
        assert selected_ids(annos) == {1, 2, 3, 4}

    def test_spatial_mask_from_bbox(self):
        from bootstrapper_tpu.proofread_ui import spatial_mask

        class Box:
            def __init__(self, a, b):
                self.point_a, self.point_b = a, b

        # crop at world offset (0, 40, 40), voxel size (10, 4, 4)
        m = spatial_mask(
            [Box((0, 40, 40), (20, 48, 56))],
            shape=(4, 8, 8), crop_offset=(0, 40, 40), voxel_size=(10, 4, 4),
        )
        assert m is not None
        assert m[:2, :2, :4].all()
        assert not m[2:].any() and not m[:, 2:].any()
        # no boxes -> None (fall back to whole-crop behaviour)
        assert spatial_mask([], (4, 8, 8), (0, 0, 0), (1, 1, 1)) is None

    def test_patch_bounds_clamped(self):
        from bootstrapper_tpu.proofread_ui import patch_bounds

        spos, epos = patch_bounds((1, 100, 3900), (50, 4000, 4000),
                                  patch_shape=(3, 512, 512))
        assert list(spos) == [0, 0, 3644]  # clamped at the origin
        assert list(epos) == [3, 512, 4000]  # clamped at the far edge

    def test_start_position_center(self):
        from bootstrapper_tpu.proofread_ui import start_position

        assert start_position((10, 20, 31)) == [5, 10, 15]


def test_cli_proofread_scripted_session(tmp_path):
    """`bs proofread --script` drives a full session through the CLI:
    prompt, merge, filter, write — the terminal-native counterpart of
    the reference's interactive tool."""
    from click.testing import CliRunner

    from bootstrapper_tpu.cli.main import cli
    from bootstrapper_tpu.core.arrays import open_ds, prepare_ds

    raw = prepare_ds(
        str(tmp_path / "v.zarr/raw"), (4, 32, 32), (0, 0, 0),
        (40, 4, 4), np.uint8,
    )
    rng = np.random.default_rng(0)
    img = np.full((4, 32, 32), 200, np.uint8)
    img[:, 16, :] = 10  # a dark boundary splitting y
    raw[raw.roi] = img

    script = tmp_path / "cmds.txt"
    script.write_text(
        "point 40 32 64\n"
        "point 40 96 64\n"
        "merge 1 2\n"
        "filter 1\n"
        f"write {tmp_path}/out.zarr\n"
        "quit\n"
    )
    res = CliRunner().invoke(
        cli,
        ["proofread", str(tmp_path / "v.zarr/raw"),
         "--script", str(script)],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert "segment 1" in res.output and "segment 2" in res.output
    assert "merged into 1" in res.output
    labels = open_ds(str(tmp_path / "out.zarr/proofread/labels"))
    arr = labels.to_ndarray()
    assert (arr == 1).any()
    assert (arr == 2).sum() == 0  # merged away
