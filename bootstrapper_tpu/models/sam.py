"""Segment Anything (SAM) in JAX — weights-ready TPU port.

The reference's interactive proofreading drives SAM masks from clicked
points (``/root/reference/ng_interactive_sam.py:85-474``, loading a
``segment_anything`` torch checkpoint).  This environment has no
egress, so the official weights cannot be fetched — but nothing else
about the component needs to be missing: this module implements the
full SAM architecture (ViT image encoder with windowed + global
attention and decomposed relative positions, prompt encoder, two-way
transformer mask decoder) as functional channels-last JAX, plus a
torch-state-dict importer keyed to the official checkpoint schema
(``image_encoder.* / prompt_encoder.* / mask_decoder.*``).  Point a
``sam_vit_{b,l,h}*.pth`` file at :func:`load_sam` and
:class:`SamPredictor` runs end-to-end; until then the proofreader's
affinity-prompted analog remains the default
(``bootstrapper_tpu/proofread.py``).

Shapes follow the official implementation: 1024x1024x3 input, 16x16
patches -> 64x64 tokens, prompt/decoder width 256, 4 mask tokens,
low-res masks 256x256.  Import-schema parity is pinned by
``tests/test_sam.py`` against a synthetic state dict with the official
key names.

Scope: point and box prompts + the automatic no-mask dense embedding —
the prompt surface the reference tool uses.  The ``mask_downscaling``
mask-prompt tower is not imported or wired.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamConfig:
    encoder_dim: int = 768
    encoder_depth: int = 12
    encoder_heads: int = 12
    global_attn_indexes: tuple = (2, 5, 8, 11)
    img_size: int = 1024
    patch_size: int = 16
    window_size: int = 14
    prompt_dim: int = 256
    decoder_heads: int = 8
    num_mask_tokens: int = 4  # 1 "whole" + 3 multimask outputs


PRESETS = {
    "vit_b": SamConfig(),
    "vit_l": SamConfig(
        encoder_dim=1024, encoder_depth=24, encoder_heads=16,
        global_attn_indexes=(5, 11, 17, 23),
    ),
    "vit_h": SamConfig(
        encoder_dim=1280, encoder_depth=32, encoder_heads=16,
        global_attn_indexes=(7, 15, 23, 31),
    ),
}

#: official preprocessing constants (segment_anything/modeling/sam.py)
PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _ln(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["w"] + p["b"]


def _gelu(x):
    # torch nn.GELU defaults to the exact erf form; jax.nn.gelu
    # defaults to the tanh approximation — use exact for parity
    return jax.nn.gelu(x, approximate=False)


def _mlp_block(p, x, act=_gelu):
    # encoder MLPBlocks use GELU; the decoder's TwoWayTransformer
    # constructs its MLPBlocks with ReLU (official transformer.py)
    return _linear(p["lin2"], act(_linear(p["lin1"], x)))


def _get_rel_pos(q_size: int, k_size: int, rel_pos):
    """Relative position table slice (official ``get_rel_pos``); the
    table covers 2*max(q,k)-1 offsets, linearly interpolated when its
    length differs."""
    max_rel = 2 * max(q_size, k_size) - 1
    n, dim = rel_pos.shape
    if n != max_rel:  # interpolate the table to the needed length;
        # half-pixel sampling to match torch F.interpolate(mode=
        # "linear", align_corners=False) in the official get_rel_pos
        pos = (jnp.arange(max_rel) + 0.5) * (n / max_rel) - 0.5
        pos = jnp.clip(pos, 0, n - 1)
        lo = jnp.clip(jnp.floor(pos).astype(int), 0, n - 1)
        hi = jnp.clip(lo + 1, 0, n - 1)
        t = (pos - lo)[:, None]
        rel_pos = rel_pos[lo] * (1 - t) + rel_pos[hi] * t
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(int)]  # [q, k, dim]


def _attention(p, x, heads: int, rel_pos_hw=None):
    """Multi-head self-attention over [B, H, W, C] tokens with optional
    decomposed relative positions (official ``Attention`` in
    ``image_encoder.py``)."""
    B, H, W, C = x.shape
    hd = C // heads
    qkv = _linear(p["qkv"], x).reshape(B, H * W, 3, heads, hd)
    q, k, v = (
        qkv[:, :, 0].transpose(0, 2, 1, 3),
        qkv[:, :, 1].transpose(0, 2, 1, 3),
        qkv[:, :, 2].transpose(0, 2, 1, 3),
    )  # [B, heads, HW, hd]
    attn = (q * (hd ** -0.5)) @ k.transpose(0, 1, 3, 2)
    if rel_pos_hw is not None:
        Rh = _get_rel_pos(H, H, rel_pos_hw[0])
        Rw = _get_rel_pos(W, W, rel_pos_hw[1])
        r_q = q.reshape(B, heads, H, W, hd)
        rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
        rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
        attn = (
            attn.reshape(B, heads, H, W, H, W)
            + rel_h[..., :, None]
            + rel_w[..., None, :]
        ).reshape(B, heads, H * W, H * W)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, C)
    return _linear(p["proj"], out)


def _window_partition(x, win: int):
    B, H, W, C = x.shape
    ph, pw = (-H) % win, (-W) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // win, win, Wp // win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, C)
    return x, (Hp, Wp)


def _window_unpartition(x, win: int, hw_pad, hw):
    Hp, Wp = hw_pad
    H, W = hw
    B = x.shape[0] // (Hp // win * (Wp // win))
    x = x.reshape(B, Hp // win, Wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------


def image_encoder_apply(params, x, cfg: SamConfig):
    """[B, img, img, 3] (preprocessed) -> [B, 64, 64, 256] embeddings."""
    p = params["image_encoder"]
    x = jax.lax.conv_general_dilated(
        x, p["patch_embed"]["w"],
        (cfg.patch_size,) * 2, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["patch_embed"]["b"]
    if "pos_embed" in p:
        x = x + p["pos_embed"]
    for i, blk in enumerate(p["blocks"]):
        shortcut = x
        xn = _ln(blk["norm1"], x)
        if i in cfg.global_attn_indexes or cfg.window_size == 0:
            xn = _attention(
                blk["attn"], xn, cfg.encoder_heads,
                rel_pos_hw=(blk["attn"]["rel_pos_h"],
                            blk["attn"]["rel_pos_w"]),
            )
        else:
            hw = xn.shape[1:3]
            xw, hw_pad = _window_partition(xn, cfg.window_size)
            xw = _attention(
                blk["attn"], xw, cfg.encoder_heads,
                rel_pos_hw=(blk["attn"]["rel_pos_h"],
                            blk["attn"]["rel_pos_w"]),
            )
            xn = _window_unpartition(xw, cfg.window_size, hw_pad, hw)
        x = shortcut + xn
        x = x + _mlp_block(blk["mlp"], _ln(blk["norm2"], x))
    # neck: 1x1 conv -> LN -> 3x3 conv (same) -> LN, all channels-last
    x = jnp.einsum("bhwc,co->bhwo", x, p["neck0"]["w"])
    x = _ln(p["neck1"], x)
    x = jax.lax.conv_general_dilated(
        x, p["neck2"]["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _ln(p["neck3"], x)


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------


def _pe_encode(gauss, coords01):
    """Random-fourier positional encoding of [..., 2] coords in [0,1]."""
    c = (2.0 * coords01 - 1.0) @ gauss  # [..., num_feats]
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def image_pe(params, grid: int):
    """Positional encoding of the embedding grid, [grid, grid, 256]."""
    g = params["prompt_encoder"]["pe_gauss"]
    ys = (jnp.arange(grid) + 0.5) / grid
    xs = (jnp.arange(grid) + 0.5) / grid
    coords = jnp.stack(
        jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
    )  # [g, g, 2] as (x, y)
    return _pe_encode(g, coords)


def prompt_encoder_apply(params, points, labels, cfg: SamConfig, box=None):
    """Prompts -> (sparse [B, N(+1|+2), 256], dense [B, 64, 64, 256]).

    ``points``: [B, N, 2] pixel (x, y) in input-image coordinates;
    ``labels``: [B, N] with 1=foreground, 0=background.  ``box``:
    optional [B, 4] (x0, y0, x1, y1) — encoded as the two corner
    embeddings (``point_embeddings.{2,3}``).  Matching the official
    encoder, a padding point is appended only when no box is given."""
    p = params["prompt_encoder"]
    B, N = points.shape[:2]
    pts = (points + 0.5) / cfg.img_size
    if box is None:
        pts = jnp.concatenate([pts, jnp.zeros((B, 1, 2))], axis=1)
        lab = jnp.concatenate(
            [labels, -jnp.ones((B, 1), labels.dtype)], axis=1
        )
    else:
        corners = (
            jnp.asarray(box, jnp.float32).reshape(B, 2, 2) + 0.5
        ) / cfg.img_size
        pts = jnp.concatenate([pts, corners], axis=1)
        lab = jnp.concatenate(
            [
                labels,
                jnp.full((B, 1), 2, labels.dtype),
                jnp.full((B, 1), 3, labels.dtype),
            ],
            axis=1,
        )
    emb = _pe_encode(p["pe_gauss"], pts)
    emb = jnp.where((lab == -1)[..., None], 0.0, emb)
    point_table = jnp.stack(
        [p["point_embed"][i] for i in range(4)]
    )  # [4, 256]: bg, fg, box corner 1, box corner 2
    emb = emb + jnp.where(
        (lab == -1)[..., None],
        p["not_a_point"][None, None],
        point_table[jnp.clip(lab, 0, 3)],
    )
    grid = cfg.img_size // cfg.patch_size
    dense = jnp.broadcast_to(
        p["no_mask"][None, None, None, :],
        (B, grid, grid, cfg.prompt_dim),
    )
    return emb, dense


# ---------------------------------------------------------------------------
# mask decoder (TwoWayTransformer)
# ---------------------------------------------------------------------------


def _attn_qkv(p, q, k, v, heads: int):
    """Decoder attention with separate q/k/v projections and internal
    downsampling (official ``mask_decoder.Attention``)."""
    q = _linear(p["q"], q)
    k = _linear(p["k"], k)
    v = _linear(p["v"], v)
    B, Nq, C = q.shape
    hd = C // heads

    def split(t):
        return t.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    attn = jax.nn.softmax(
        (qh * (hd ** -0.5)) @ kh.transpose(0, 1, 3, 2), axis=-1
    )
    out = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, Nq, C)
    return _linear(p["out"], out)


#: the decoder transformer's LayerNorms are plain ``nn.LayerNorm``
#: (torch default eps 1e-5), unlike the encoder's eps=1e-6 norms
_DEC_EPS = 1e-5


def _two_way_layer(p, queries, keys, query_pe, key_pe, heads, first):
    q = queries if first else queries + query_pe
    queries = _ln(
        p["norm1"],
        queries + _attn_qkv(p["self_attn"], q, q, queries, heads),
        eps=_DEC_EPS,
    ) if not first else _ln(
        p["norm1"],
        _attn_qkv(p["self_attn"], queries, queries, queries, heads),
        eps=_DEC_EPS,
    )
    q, k = queries + query_pe, keys + key_pe
    queries = _ln(
        p["norm2"],
        queries + _attn_qkv(p["cross_t2i"], q, k, keys, heads),
        eps=_DEC_EPS,
    )
    queries = _ln(
        p["norm3"],
        queries + _mlp_block(p["mlp"], queries, act=jax.nn.relu),
        eps=_DEC_EPS,
    )
    q, k = queries + query_pe, keys + key_pe
    keys = _ln(
        p["norm4"], keys + _attn_qkv(p["cross_i2t"], k, q, queries, heads),
        eps=_DEC_EPS,
    )
    return queries, keys


def mask_decoder_apply(params, image_emb, img_pe, sparse, dense, cfg):
    """-> (masks [B, 4, 4*grid, 4*grid], iou_pred [B, 4])."""
    p = params["mask_decoder"]
    B = sparse.shape[0]
    grid = image_emb.shape[1]
    tokens = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.concatenate([p["iou_token"], p["mask_tokens"]], 0)[
                    None
                ],
                (B, 1 + cfg.num_mask_tokens, cfg.prompt_dim),
            ),
            sparse,
        ],
        axis=1,
    )
    keys = (image_emb + dense).reshape(B, grid * grid, cfg.prompt_dim)
    key_pe = jnp.broadcast_to(
        img_pe.reshape(1, grid * grid, cfg.prompt_dim), keys.shape
    )
    queries = tokens
    for i, layer in enumerate(p["layers"]):
        queries, keys = _two_way_layer(
            layer, queries, keys, tokens, key_pe,
            cfg.decoder_heads, first=(i == 0),
        )
    q = queries + tokens
    k = keys + key_pe
    queries = _ln(
        p["norm_final"],
        queries + _attn_qkv(p["final_t2i"], q, k, keys, cfg.decoder_heads),
        eps=_DEC_EPS,
    )
    iou_tok = queries[:, 0]
    mask_toks = queries[:, 1 : 1 + cfg.num_mask_tokens]

    # upscale image embedding 4x: convT(2,2) -> LN -> GELU -> convT -> GELU
    x = keys.reshape(B, grid, grid, cfg.prompt_dim)
    # transpose_kernel=True + [kh, kw, out, in] kernels match torch
    # ConvTranspose2d exactly (numerically verified in tests/test_sam.py)
    x = jax.lax.conv_transpose(
        x, p["up0"]["w"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    ) + p["up0"]["b"]
    x = _gelu(_ln(p["up1"], x))
    x = jax.lax.conv_transpose(
        x, p["up2"]["w"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    ) + p["up2"]["b"]
    up = _gelu(x)  # [B, 4g, 4g, 32]

    hyper = jnp.stack(
        [
            _hyper_mlp(p["hyper"][i], mask_toks[:, i])
            for i in range(cfg.num_mask_tokens)
        ],
        axis=1,
    )  # [B, 4, 32]
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)
    iou = _hyper_mlp(p["iou_head"], iou_tok, sigmoid_last=False)
    return masks, iou


def _hyper_mlp(p, x, sigmoid_last=False):
    n = len(p)
    for i, layer in enumerate(p):
        x = _linear(layer, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    return jax.nn.sigmoid(x) if sigmoid_last else x


# ---------------------------------------------------------------------------
# torch checkpoint import (official segment_anything key schema)
# ---------------------------------------------------------------------------


def _lin(sd, key):
    return {
        "w": jnp.asarray(np.asarray(sd[f"{key}.weight"]).T),
        "b": jnp.asarray(np.asarray(sd[f"{key}.bias"])),
    }


def _norm(sd, key):
    return {
        "w": jnp.asarray(np.asarray(sd[f"{key}.weight"])),
        "b": jnp.asarray(np.asarray(sd[f"{key}.bias"])),
    }


def import_torch_sam(state_dict, cfg: Optional[SamConfig] = None):
    """Official ``sam_vit_*.pth`` state dict -> (params, SamConfig).

    Accepts a path, a file object, or an already-loaded mapping of
    tensors/ndarrays.  The variant is inferred from the encoder width
    unless ``cfg`` is given (tiny test configs)."""
    if isinstance(state_dict, (str, bytes)):
        import torch

        state_dict = torch.load(
            state_dict, map_location="cpu", weights_only=True
        )
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    dim = sd["image_encoder.patch_embed.proj.weight"].shape[0]
    if cfg is None:
        cfg = next(
            c for c in PRESETS.values() if c.encoder_dim == dim
        )
    depth = cfg.encoder_depth

    enc = {
        "patch_embed": {
            # torch conv [out, in, kh, kw] -> HWIO
            "w": jnp.asarray(
                sd["image_encoder.patch_embed.proj.weight"].transpose(
                    2, 3, 1, 0
                )
            ),
            "b": jnp.asarray(sd["image_encoder.patch_embed.proj.bias"]),
        },
        "blocks": [],
        "neck0": {
            "w": jnp.asarray(
                sd["image_encoder.neck.0.weight"][:, :, 0, 0].T
            )
        },
        "neck1": _norm(sd, "image_encoder.neck.1"),
        "neck2": {
            "w": jnp.asarray(
                sd["image_encoder.neck.2.weight"].transpose(2, 3, 1, 0)
            )
        },
        "neck3": _norm(sd, "image_encoder.neck.3"),
    }
    if "image_encoder.pos_embed" in sd:
        enc["pos_embed"] = jnp.asarray(sd["image_encoder.pos_embed"])
    for i in range(depth):
        b = f"image_encoder.blocks.{i}"
        enc["blocks"].append({
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "attn": {
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
                "rel_pos_h": jnp.asarray(sd[f"{b}.attn.rel_pos_h"]),
                "rel_pos_w": jnp.asarray(sd[f"{b}.attn.rel_pos_w"]),
            },
            "mlp": {
                "lin1": _lin(sd, f"{b}.mlp.lin1"),
                "lin2": _lin(sd, f"{b}.mlp.lin2"),
            },
        })

    pe = {
        "pe_gauss": jnp.asarray(
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
        ),
        "point_embed": [
            jnp.asarray(sd[f"prompt_encoder.point_embeddings.{i}.weight"][0])
            for i in range(4)
        ],
        "not_a_point": jnp.asarray(
            sd["prompt_encoder.not_a_point_embed.weight"][0]
        ),
        "no_mask": jnp.asarray(sd["prompt_encoder.no_mask_embed.weight"][0]),
    }

    def dec_attn(key):
        return {
            "q": _lin(sd, f"{key}.q_proj"),
            "k": _lin(sd, f"{key}.k_proj"),
            "v": _lin(sd, f"{key}.v_proj"),
            "out": _lin(sd, f"{key}.out_proj"),
        }

    layers = []
    i = 0
    while f"mask_decoder.transformer.layers.{i}.norm1.weight" in sd:
        L = f"mask_decoder.transformer.layers.{i}"
        layers.append({
            "self_attn": dec_attn(f"{L}.self_attn"),
            "cross_t2i": dec_attn(f"{L}.cross_attn_token_to_image"),
            "cross_i2t": dec_attn(f"{L}.cross_attn_image_to_token"),
            "mlp": {
                "lin1": _lin(sd, f"{L}.mlp.lin1"),
                "lin2": _lin(sd, f"{L}.mlp.lin2"),
            },
            "norm1": _norm(sd, f"{L}.norm1"),
            "norm2": _norm(sd, f"{L}.norm2"),
            "norm3": _norm(sd, f"{L}.norm3"),
            "norm4": _norm(sd, f"{L}.norm4"),
        })
        i += 1

    def mlp_layers(prefix):
        out, j = [], 0
        while f"{prefix}.layers.{j}.weight" in sd:
            out.append(_lin(sd, f"{prefix}.layers.{j}"))
            j += 1
        return out

    n_mask = sd["mask_decoder.mask_tokens.weight"].shape[0]
    dec = {
        "iou_token": jnp.asarray(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": jnp.asarray(sd["mask_decoder.mask_tokens.weight"]),
        "layers": layers,
        "final_t2i": dec_attn(
            "mask_decoder.transformer.final_attn_token_to_image"
        ),
        "norm_final": _norm(
            sd, "mask_decoder.transformer.norm_final_attn"
        ),
        "up0": {
            # torch convT [in, out, kh, kw] -> [kh, kw, out, in] for
            # jax conv_transpose(transpose_kernel=True)
            "w": jnp.asarray(
                sd["mask_decoder.output_upscaling.0.weight"].transpose(
                    2, 3, 1, 0
                )
            ),
            "b": jnp.asarray(sd["mask_decoder.output_upscaling.0.bias"]),
        },
        "up1": _norm(sd, "mask_decoder.output_upscaling.1"),
        "up2": {
            "w": jnp.asarray(
                sd["mask_decoder.output_upscaling.3.weight"].transpose(
                    2, 3, 1, 0
                )
            ),
            "b": jnp.asarray(sd["mask_decoder.output_upscaling.3.bias"]),
        },
        "hyper": [
            mlp_layers(f"mask_decoder.output_hypernetworks_mlps.{i}")
            for i in range(n_mask)
        ],
        "iou_head": mlp_layers("mask_decoder.iou_prediction_head"),
    }
    cfg = dataclasses.replace(cfg, num_mask_tokens=n_mask)
    return (
        {"image_encoder": enc, "prompt_encoder": pe, "mask_decoder": dec},
        cfg,
    )


def load_sam(checkpoint_path: str):
    """(params, cfg) from an official SAM ``.pth`` checkpoint."""
    return import_torch_sam(checkpoint_path)


# ---------------------------------------------------------------------------
# predictor
# ---------------------------------------------------------------------------


class SamPredictor:
    """Minimal official-predictor analog: embed once, prompt many.

    EM sections are grayscale; they are replicated to RGB and resized
    so the long side is ``cfg.img_size``, matching the official
    ``ResizeLongestSide`` transform.
    """

    def __init__(self, params, cfg: SamConfig):
        self.params = params
        self.cfg = cfg
        self._encode = jax.jit(
            lambda p, x: image_encoder_apply(p, x, cfg)
        )
        self._embedding = None
        self._scale = 1.0
        self._orig_hw = None

    def set_image(self, image: np.ndarray):
        """image: [H, W] uint8/float grayscale or [H, W, 3]."""
        img = np.asarray(image)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        self._orig_hw = img.shape[:2]
        scale = self.cfg.img_size / max(img.shape[:2])
        self._scale = scale
        new_hw = (
            max(1, round(img.shape[0] * scale)),
            max(1, round(img.shape[1] * scale)),
        )
        img = jax.image.resize(
            jnp.asarray(img, jnp.float32), (*new_hw, 3), "linear"
        )
        img = (img - PIXEL_MEAN) / PIXEL_STD
        pad_h = self.cfg.img_size - new_hw[0]
        pad_w = self.cfg.img_size - new_hw[1]
        img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
        self._embedding = self._encode(self.params, img[None])
        return self

    def predict(self, points, labels, box=None):
        """points: [N, 2] (x, y) in ORIGINAL image pixels; labels [N]
        (1 fg / 0 bg); box: optional (x0, y0, x1, y1) in original
        pixels -> (masks [n_masks, H, W] bool, iou [n_masks])."""
        if self._embedding is None:
            raise RuntimeError("call set_image first")
        cfg = self.cfg
        pts = jnp.asarray(points, jnp.float32)[None] * self._scale
        lab = jnp.asarray(labels, jnp.int32)[None]
        if box is not None:
            box = jnp.asarray(box, jnp.float32)[None] * self._scale
        sparse, dense = prompt_encoder_apply(
            self.params, pts, lab, cfg, box=box
        )
        pe = image_pe(self.params, cfg.img_size // cfg.patch_size)
        masks, iou = mask_decoder_apply(
            self.params, self._embedding, pe, sparse, dense, cfg
        )
        masks = jax.image.resize(
            masks, (1, masks.shape[1], cfg.img_size, cfg.img_size),
            "linear",
        )
        h, w = self._orig_hw
        sh = max(1, round(h * self._scale))
        sw = max(1, round(w * self._scale))
        masks = masks[:, :, :sh, :sw]
        masks = jax.image.resize(
            masks, (1, masks.shape[1], h, w), "linear"
        )
        return np.asarray(masks[0] > 0.0), np.asarray(iou[0])
