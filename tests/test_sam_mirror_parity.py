"""SAM port verification without weights: forward equality against an
independent torch mirror of the official modules.

``tests/_sam_torch_mirror.py`` re-implements the official
``segment_anything`` architecture in torch (official state-dict key
schema); these tests export its real ``state_dict()`` through
``import_torch_sam`` and assert per-module and end-to-end forward
equality with the JAX port (fp32, CPU).  This converts "weights-ready"
into verified: a transposed rel-pos table, a wrong window-unpartition
order, an eps/GELU-variant mismatch, or an import-layout bug would all
break equality here long before real weights appear.

Stands in for the reference's checkpoint-loaded component
(``/root/reference/ng_interactive_sam.py:85-118``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from bootstrapper_tpu.models.sam import (
    SamConfig,
    SamPredictor,
    image_encoder_apply,
    image_pe,
    import_torch_sam,
    mask_decoder_apply,
    prompt_encoder_apply,
)

from _sam_torch_mirror import SamMirror, get_rel_pos

CFG = SamConfig(
    encoder_dim=32, encoder_depth=3, encoder_heads=2,
    global_attn_indexes=(2,), img_size=64, patch_size=16,
    window_size=3, prompt_dim=16, decoder_heads=2,
)


@pytest.fixture(scope="module")
def pair():
    mirror = SamMirror(
        img_size=CFG.img_size, patch_size=CFG.patch_size,
        encoder_dim=CFG.encoder_dim, depth=CFG.encoder_depth,
        encoder_heads=CFG.encoder_heads,
        global_attn_indexes=CFG.global_attn_indexes,
        window_size=CFG.window_size, prompt_dim=CFG.prompt_dim,
        decoder_heads=CFG.decoder_heads,
    ).randomize(seed=7).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params, cfg = import_torch_sam(sd, cfg=CFG)
    return mirror, params, cfg


def _close(ours, theirs, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), rtol=1e-4, atol=atol
    )


def test_rel_pos_interpolation_matches_torch():
    """The table-resize path (used when window/global table lengths
    differ from the evaluated size) must match the official
    F.interpolate(mode='linear') half-pixel convention."""
    from bootstrapper_tpu.models.sam import _get_rel_pos

    rng = np.random.default_rng(0)
    table = rng.normal(size=(9, 5)).astype(np.float32)  # needs 13
    ref = get_rel_pos(7, 7, torch.tensor(table))
    got = _get_rel_pos(7, 7, jnp.asarray(table))
    _close(got, ref)


def test_image_encoder_parity(pair):
    """ViT encoder: windowed attention (with padding: grid 4, win 3),
    one global block, decomposed rel-pos, abs pos-embed, LN2d neck."""
    mirror, params, cfg = pair
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, cfg.img_size, cfg.img_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = mirror.image_encoder(torch.tensor(np.moveaxis(x, -1, 1)))
    got = image_encoder_apply(params, jnp.asarray(x), cfg)
    _close(np.moveaxis(np.asarray(got), -1, 1), ref)


def test_prompt_encoder_point_parity(pair):
    mirror, params, cfg = pair
    pts = np.array([[[10.0, 20.0], [40.0, 5.0]]], np.float32)
    lab = np.array([[1, 0]], np.int32)
    with torch.no_grad():
        ref_sparse, ref_dense = mirror.prompt_encoder(
            points=(torch.tensor(pts), torch.tensor(lab)), boxes=None
        )
    sparse, dense = prompt_encoder_apply(
        params, jnp.asarray(pts), jnp.asarray(lab), cfg
    )
    _close(sparse, ref_sparse)
    _close(np.moveaxis(np.asarray(dense), -1, 1), ref_dense)


def test_prompt_encoder_box_parity(pair):
    """Point + box: official concatenates [points(no pad), corners]."""
    mirror, params, cfg = pair
    pts = np.array([[[10.0, 20.0]]], np.float32)
    lab = np.array([[1]], np.int32)
    box = np.array([[8.0, 6.0, 50.0, 44.0]], np.float32)
    with torch.no_grad():
        ref_sparse, _ = mirror.prompt_encoder(
            points=(torch.tensor(pts), torch.tensor(lab)),
            boxes=torch.tensor(box),
        )
    sparse, _ = prompt_encoder_apply(
        params, jnp.asarray(pts), jnp.asarray(lab), cfg,
        box=jnp.asarray(box),
    )
    _close(sparse, ref_sparse)


def test_dense_pe_parity(pair):
    mirror, params, cfg = pair
    grid = cfg.img_size // cfg.patch_size
    with torch.no_grad():
        ref = mirror.prompt_encoder.get_dense_pe()  # [1, C, g, g]
    got = image_pe(params, grid)  # [g, g, C]
    _close(np.moveaxis(np.asarray(got), -1, 0)[None], ref)


def test_mask_decoder_parity(pair):
    """TwoWayTransformer + upscaling + hypernetwork heads on a shared
    random image embedding and real prompt-encoder outputs."""
    mirror, params, cfg = pair
    grid = cfg.img_size // cfg.patch_size
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(1, grid, grid, cfg.prompt_dim)).astype(
        np.float32
    )
    pts = np.array([[[33.0, 12.0]]], np.float32)
    lab = np.array([[1]], np.int32)

    with torch.no_grad():
        sparse_t, dense_t = mirror.prompt_encoder(
            points=(torch.tensor(pts), torch.tensor(lab)), boxes=None
        )
        ref_masks, ref_iou = mirror.mask_decoder.predict_masks(
            torch.tensor(np.moveaxis(emb, -1, 1)),
            mirror.prompt_encoder.get_dense_pe(),
            sparse_t, dense_t,
        )
    sparse, dense = prompt_encoder_apply(
        params, jnp.asarray(pts), jnp.asarray(lab), cfg
    )
    masks, iou = mask_decoder_apply(
        params, jnp.asarray(emb), image_pe(params, grid), sparse, dense,
        cfg,
    )
    _close(masks, ref_masks, atol=2e-5)
    _close(iou, ref_iou, atol=2e-5)


def test_end_to_end_predictor_parity(pair):
    """Full pipeline on an img_size-sized grayscale section (identity
    resize): SamPredictor masks/IOU vs the torch chain."""
    mirror, params, cfg = pair
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (cfg.img_size, cfg.img_size)).astype(
        np.uint8
    )

    # torch side: official preprocessing + the three modules
    from bootstrapper_tpu.models.sam import PIXEL_MEAN, PIXEL_STD

    x = np.stack([img] * 3, -1).astype(np.float32)
    x = (x - PIXEL_MEAN) / PIXEL_STD
    pts = np.array([[[20.0, 31.0]]], np.float32)
    lab = np.array([[1]], np.int32)
    with torch.no_grad():
        emb = mirror.image_encoder(
            torch.tensor(np.moveaxis(x, -1, 0)[None])
        )
        sparse_t, dense_t = mirror.prompt_encoder(
            points=(torch.tensor(pts), torch.tensor(lab)), boxes=None
        )
        masks_t, iou_t = mirror.mask_decoder.predict_masks(
            emb, mirror.prompt_encoder.get_dense_pe(), sparse_t, dense_t
        )
        up_t = torch.nn.functional.interpolate(
            masks_t, (cfg.img_size, cfg.img_size), mode="bilinear",
            align_corners=False,
        )

    pred = SamPredictor(params, cfg).set_image(img)
    got_masks, got_iou = pred.predict([[20.0, 31.0]], [1])

    np.testing.assert_allclose(
        got_iou, iou_t[0].numpy(), rtol=1e-4, atol=2e-5
    )
    ref_bool = (up_t[0].numpy() > 0.0)
    agree = (got_masks == ref_bool).mean()
    assert agree > 0.999, f"mask agreement {agree}"
