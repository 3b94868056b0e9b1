"""JAX SAM port: import-schema parity + end-to-end predictor.

The official weights are egress-blocked in this environment, so these
tests pin everything EXCEPT the numbers in the checkpoint: the torch
state-dict key schema (built synthetically with the official key
names), the layout conversions (incl. ConvTranspose2d parity against
torch), and the full predictor flow on a tiny config.  With a real
``sam_vit_*.pth`` present, ``load_sam`` is the only extra step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bootstrapper_tpu.models.sam import (
    SamConfig,
    SamPredictor,
    import_torch_sam,
)

TINY = SamConfig(
    encoder_dim=8,
    encoder_depth=2,
    encoder_heads=2,
    global_attn_indexes=(1,),
    img_size=64,
    patch_size=16,
    window_size=2,
    prompt_dim=8,
    decoder_heads=2,
)


def _tiny_state_dict(seed=0):
    """Synthetic state dict with the OFFICIAL segment_anything key
    names/shapes, scaled down (dim 8, depth 2, grid 4)."""
    rng = np.random.default_rng(seed)

    def t(*shape):
        # 0.5-scale: small enough for stable softmax/LN numerics, big
        # enough that prompt perturbations survive the deep decoder
        # path (0.1-scale weights attenuated them to ~1e-7)
        return (rng.standard_normal(shape) * 0.5).astype(np.float32)

    sd = {
        "image_encoder.patch_embed.proj.weight": t(8, 3, 16, 16),
        "image_encoder.patch_embed.proj.bias": t(8),
        "image_encoder.pos_embed": t(1, 4, 4, 8),
        "image_encoder.neck.0.weight": t(8, 8, 1, 1),
        "image_encoder.neck.1.weight": t(8),
        "image_encoder.neck.1.bias": t(8),
        "image_encoder.neck.2.weight": t(8, 8, 3, 3),
        "image_encoder.neck.3.weight": t(8),
        "image_encoder.neck.3.bias": t(8),
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
            t(2, 4),
        "prompt_encoder.not_a_point_embed.weight": t(1, 8),
        "prompt_encoder.no_mask_embed.weight": t(1, 8),
        "mask_decoder.iou_token.weight": t(1, 8),
        "mask_decoder.mask_tokens.weight": t(4, 8),
        "mask_decoder.transformer.norm_final_attn.weight": t(8),
        "mask_decoder.transformer.norm_final_attn.bias": t(8),
        "mask_decoder.output_upscaling.0.weight": t(8, 4, 2, 2),
        "mask_decoder.output_upscaling.0.bias": t(4),
        "mask_decoder.output_upscaling.1.weight": t(4),
        "mask_decoder.output_upscaling.1.bias": t(4),
        "mask_decoder.output_upscaling.3.weight": t(4, 2, 2, 2),
        "mask_decoder.output_upscaling.3.bias": t(2),
    }
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = t(1, 8)
    for i, (win, grid) in enumerate([(2, None), (None, 4)]):
        b = f"image_encoder.blocks.{i}"
        rel = 2 * (win or grid) - 1
        sd.update({
            f"{b}.norm1.weight": t(8), f"{b}.norm1.bias": t(8),
            f"{b}.norm2.weight": t(8), f"{b}.norm2.bias": t(8),
            f"{b}.attn.qkv.weight": t(24, 8),
            f"{b}.attn.qkv.bias": t(24),
            f"{b}.attn.proj.weight": t(8, 8),
            f"{b}.attn.proj.bias": t(8),
            f"{b}.attn.rel_pos_h": t(rel, 4),
            f"{b}.attn.rel_pos_w": t(rel, 4),
            f"{b}.mlp.lin1.weight": t(32, 8),
            f"{b}.mlp.lin1.bias": t(32),
            f"{b}.mlp.lin2.weight": t(8, 32),
            f"{b}.mlp.lin2.bias": t(8),
        })
    for i in range(2):
        L = f"mask_decoder.transformer.layers.{i}"
        for name, dim in [
            ("self_attn", 8),
            ("cross_attn_token_to_image", 4),
            ("cross_attn_image_to_token", 4),
        ]:
            for proj in ("q_proj", "k_proj", "v_proj"):
                sd[f"{L}.{name}.{proj}.weight"] = t(dim, 8)
                sd[f"{L}.{name}.{proj}.bias"] = t(dim)
            sd[f"{L}.{name}.out_proj.weight"] = t(8, dim)
            sd[f"{L}.{name}.out_proj.bias"] = t(8)
        sd[f"{L}.mlp.lin1.weight"] = t(16, 8)
        sd[f"{L}.mlp.lin1.bias"] = t(16)
        sd[f"{L}.mlp.lin2.weight"] = t(8, 16)
        sd[f"{L}.mlp.lin2.bias"] = t(8)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            sd[f"{L}.{n}.weight"] = t(8)
            sd[f"{L}.{n}.bias"] = t(8)
    F = "mask_decoder.transformer.final_attn_token_to_image"
    for proj in ("q_proj", "k_proj", "v_proj"):
        sd[f"{F}.{proj}.weight"] = t(4, 8)
        sd[f"{F}.{proj}.bias"] = t(4)
    sd[f"{F}.out_proj.weight"] = t(8, 4)
    sd[f"{F}.out_proj.bias"] = t(8)
    for i in range(4):
        M = f"mask_decoder.output_hypernetworks_mlps.{i}"
        sd[f"{M}.layers.0.weight"] = t(8, 8)
        sd[f"{M}.layers.0.bias"] = t(8)
        sd[f"{M}.layers.1.weight"] = t(8, 8)
        sd[f"{M}.layers.1.bias"] = t(8)
        sd[f"{M}.layers.2.weight"] = t(2, 8)
        sd[f"{M}.layers.2.bias"] = t(2)
    H = "mask_decoder.iou_prediction_head"
    sd[f"{H}.layers.0.weight"] = t(8, 8)
    sd[f"{H}.layers.0.bias"] = t(8)
    sd[f"{H}.layers.1.weight"] = t(8, 8)
    sd[f"{H}.layers.1.bias"] = t(8)
    sd[f"{H}.layers.2.weight"] = t(4, 8)
    sd[f"{H}.layers.2.bias"] = t(4)
    return sd


def test_import_and_end_to_end_predict():
    params, cfg = import_torch_sam(_tiny_state_dict(), cfg=TINY)
    assert len(params["image_encoder"]["blocks"]) == 2
    assert len(params["mask_decoder"]["layers"]) == 2
    pred = SamPredictor(params, cfg)
    img = np.random.default_rng(1).integers(
        0, 255, (48, 40), dtype=np.uint8
    )
    pred.set_image(img)
    masks, iou = pred.predict([[20, 10], [5, 30]], [1, 0])
    assert masks.shape == (4, 48, 40) and masks.dtype == bool
    assert iou.shape == (4,)
    # deterministic
    m2, i2 = pred.predict([[20, 10], [5, 30]], [1, 0])
    np.testing.assert_array_equal(masks, m2)
    np.testing.assert_allclose(iou, i2)
    # prompts matter: a different click changes the decoder outputs
    # (compare the continuous iou head — random weights can threshold
    # to identical boolean masks)
    _, i3 = pred.predict([[35, 40]], [1])
    assert np.abs(iou - i3).max() > 1e-4
    # box prompts: corner embeddings replace the padding point and
    # change the outputs
    m4, i4 = pred.predict([[20, 10]], [1], box=(5, 5, 35, 40))
    assert m4.shape == masks.shape
    _, i5 = pred.predict([[20, 10]], [1])
    assert np.abs(i4 - i5).max() > 1e-4


def test_conv_transpose_matches_torch():
    """The importer's ConvTranspose2d layout (transpose_kernel=True,
    [kh, kw, out, in]) is bit-compatible with torch."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 5, 4, 4)).astype(np.float32)
    w = rng.standard_normal((5, 3, 2, 2)).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2
    ).numpy()
    y = jax.lax.conv_transpose(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_proofread_session_uses_sam_when_checkpoint_present(
    tmp_path, monkeypatch
):
    """With BS_SAM_CHECKPOINT set, point prompts run the real SAM
    mask-from-point (reference ng_interactive_sam.py flow) instead of
    the affinity-grown analog; the section embedding is cached across
    clicks."""
    import bootstrapper_tpu.models.sam as sam_mod
    from bootstrapper_tpu.core.arrays import prepare_ds
    from bootstrapper_tpu.proofread import ProofreadSession

    params, cfg = import_torch_sam(_tiny_state_dict(), cfg=TINY)
    monkeypatch.setattr(
        sam_mod, "load_sam", lambda path: (params, cfg)
    )
    ckpt = tmp_path / "sam_tiny.pth"
    ckpt.write_bytes(b"placeholder")  # existence gates the SAM path
    monkeypatch.setenv("BS_SAM_CHECKPOINT", str(ckpt))

    raw = prepare_ds(
        str(tmp_path / "v.zarr/raw"), (3, 40, 48), (0, 0, 0),
        (40, 4, 4), np.uint8,
    )
    raw[raw.roi] = np.random.default_rng(2).integers(
        0, 255, (3, 40, 48), dtype=np.uint8
    )
    sess = ProofreadSession(raw)
    assert sess._sam is not None
    n_enc = {"n": 0}
    orig = sess._sam.set_image

    def counting(img):
        n_enc["n"] += 1
        return orig(img)

    sess._sam.set_image = counting
    sid = sess.segment_from_point((40, 80, 100))  # world units, z=1
    assert sid == 1
    sess.segment_from_point((40, 40, 60))  # same section: cached embed
    assert n_enc["n"] == 1
    sess.segment_from_point((80, 40, 60))  # new section: re-embed
    assert n_enc["n"] == 2
    assert (sess.labels[0] == 0).all()  # other sections untouched


def test_variant_inference_from_width():
    """Real checkpoints carry no config: the importer infers the
    vit_b/l/h preset from the encoder width."""
    from bootstrapper_tpu.models.sam import PRESETS

    assert PRESETS["vit_b"].encoder_dim == 768
    assert PRESETS["vit_h"].global_attn_indexes == (7, 15, 23, 31)
    sd = _tiny_state_dict()
    with pytest.raises(StopIteration):
        import_torch_sam(sd)  # width 8 matches no official preset
