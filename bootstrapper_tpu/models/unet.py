"""TPU-native residual valid-convolution U-Net (2D & 3D, multi-head).

Functional JAX implementation with the same *shape semantics* as the
reference PyTorch U-Net (reference ``bootstrapper/models/3d_affs/unet.py``):

- residual ConvPass: N valid convs with activations between, plus a 1x1
  projection of the input, centre-cropped and added, final activation;
- max-pool downsampling with divisibility checks;
- upsampling (resize or transposed conv) followed by ``crop_to_factor``
  so valid convs stay translation-equivariant at the upsample stride;
- one shared encoder, ``num_heads`` decoders for multi-task setups.

TPU-first design choices (deliberately different from the reference):

- **channels-last layout** (``N, *spatial, C``): feature dims map onto
  the 128-wide vector lanes / MXU columns, which is what XLA:TPU tiles
  best;
- **mixed precision**: parameters are fp32, convolutions run in
  bfloat16 with fp32 accumulation (``preferred_element_type``) — the
  MXU's native mode;
- pure functions over parameter pytrees: ``init`` / ``apply`` compose
  with ``jit`` / ``pjit`` / ``grad`` / ``shard_map`` with no framework
  state.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int
    num_fmaps: int
    fmap_inc_factor: int
    downsample_factors: tuple  # ((z,y,x), ...)
    kernel_size_down: tuple  # per level: (kernel, ...)
    kernel_size_up: tuple  # per level below top: (kernel, ...)
    activation: str = "relu"
    num_heads: int = 1
    num_fmaps_out: Optional[int] = None
    constant_upsample: bool = True
    padding: str = "valid"
    # TPU perf: re-express the full-resolution level as a 2x2 xy
    # space-to-depth fold (exact; see fold.py). Auto-disabled when the
    # config or input shape is ineligible.
    fold_xy: bool = True

    def __post_init__(self):
        object.__setattr__(
            self,
            "downsample_factors",
            tuple(tuple(f) for f in self.downsample_factors),
        )
        object.__setattr__(
            self,
            "kernel_size_down",
            tuple(tuple(tuple(k) for k in lvl) for lvl in self.kernel_size_down),
        )
        object.__setattr__(
            self,
            "kernel_size_up",
            tuple(tuple(tuple(k) for k in lvl) for lvl in self.kernel_size_up),
        )

    @property
    def num_levels(self) -> int:
        return len(self.downsample_factors) + 1

    @property
    def dims(self) -> int:
        return len(self.kernel_size_down[0][0])

    @property
    def out_channels(self) -> int:
        return self.num_fmaps_out or self.num_fmaps

    @property
    def crop_factors(self) -> tuple:
        """Cumulative downsample products, bottom-up, per decoder level."""
        factors = []
        product = None
        for f in self.downsample_factors[::-1]:
            product = (
                list(f)
                if product is None
                else [a * b for a, b in zip(f, product)]
            )
            factors.append(tuple(product))
        return tuple(factors[::-1])


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "leaky_relu": jax.nn.leaky_relu,
    None: lambda x: x,
    "none": lambda x: x,
}


def _dim_numbers(dims: int):
    if dims == 2:
        return ("NHWC", "HWIO", "NHWC")
    if dims == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"{dims}D convolution not supported")


def _conv(x, w, b, *, compute_dtype=jnp.bfloat16):
    # bf16 in / bf16 out: the TPU MXU accumulates bf16 convolutions in
    # fp32 internally, so no explicit preferred_element_type is needed
    # (and JAX's conv grad rule rejects dtype-upcasting convs).
    from ..ops import quant

    if quant.int8_enabled():
        return quant.qconv(x, w, out_dtype=compute_dtype) + b.astype(
            compute_dtype
        )
    dims = w.ndim - 2
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(1,) * dims,
        padding="VALID",
        dimension_numbers=_dim_numbers(dims),
    )
    return y + b.astype(compute_dtype)


def _center_crop(x, target_spatial: Sequence[int]):
    """Centre-crop the spatial dims (all but first/last axes) of x."""
    dims = len(target_spatial)
    spatial = x.shape[1 : 1 + dims]
    offsets = [(s - t) // 2 for s, t in zip(spatial, target_spatial)]
    slices = (
        (slice(None),)
        + tuple(slice(o, o + t) for o, t in zip(offsets, target_spatial))
        + (slice(None),)
    )
    return x[slices]


def _conv_init(key, kernel, in_ch, out_ch, dtype=jnp.float32):
    """He-uniform initialisation (fan_in from kernel volume)."""
    fan_in = in_ch * math.prod(kernel)
    bound = math.sqrt(1.0 / fan_in)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(
        wkey, (*kernel, in_ch, out_ch), dtype, -bound, bound
    ) * math.sqrt(3.0)
    b = jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound)
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# ConvPass
# ---------------------------------------------------------------------------


def conv_pass_init(key, in_ch, out_ch, kernel_sizes, dtype=jnp.float32):
    keys = jax.random.split(key, len(kernel_sizes) + 1)
    layers = []
    ch = in_ch
    for i, k in enumerate(kernel_sizes):
        layers.append(_conv_init(keys[i], tuple(k), ch, out_ch, dtype))
        ch = out_ch
    dims = len(kernel_sizes[0])
    residual = _conv_init(keys[-1], (1,) * dims, in_ch, out_ch, dtype)
    return {"layers": layers, "residual": residual}


def _conv_split(xs, w, b, compute_dtype=jnp.bfloat16):
    """Conv over an *implicit* channel concat: sum of convs with
    channel-split weights.  Equivalent to ``_conv(concat(xs), w, b)`` but
    never materialises the wide concatenated tensor (the skip concat at
    the deep levels is the HBM peak for large tiles)."""
    from ..ops import quant

    q8 = quant.int8_enabled()
    off = 0
    y = None
    for x in xs:
        c = x.shape[-1]
        if q8:
            part = quant.qconv(
                x, w[..., off : off + c, :], out_dtype=compute_dtype
            )
        else:
            part = jax.lax.conv_general_dilated(
                x.astype(compute_dtype),
                w[..., off : off + c, :].astype(compute_dtype),
                window_strides=(1,) * (w.ndim - 2),
                padding="VALID",
                dimension_numbers=_dim_numbers(w.ndim - 2),
            )
        y = part if y is None else y + part
        off += c
    return y + b.astype(compute_dtype)


def conv_pass_apply(
    params, x, kernel_sizes, activation="relu", compute_dtype=jnp.bfloat16
):
    """x may be a single array or a list of arrays treated as an implicit
    channel concatenation (see ``_conv_split``)."""
    act = _ACTIVATIONS[activation]
    xs = x if isinstance(x, (list, tuple)) else [x]
    n = len(params["layers"])
    out = None
    for i, layer in enumerate(params["layers"]):
        if i == 0:
            out = _conv_split(xs, layer["w"], layer["b"], compute_dtype)
        else:
            out = _conv(
                out, layer["w"], layer["b"], compute_dtype=compute_dtype
            )
        if i < n - 1:
            out = act(out)
    res = _conv_split(
        xs, params["residual"]["w"], params["residual"]["b"], compute_dtype
    )
    dims = res.ndim - 2
    res = _center_crop(res, out.shape[1 : 1 + dims])
    return act(out + res)


# ---------------------------------------------------------------------------
# Down / Up
# ---------------------------------------------------------------------------


def max_pool(x, factors: Sequence[int]):
    dims = len(factors)
    for d in range(dims):
        if x.shape[1 + d] % factors[d] != 0:
            raise ValueError(
                f"cannot downsample spatial shape {x.shape[1:1+dims]} "
                f"by {tuple(factors)}: dim {d} not divisible"
            )
    window = (1, *factors, 1)
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, window, window, "VALID"
    )


def upsample_resize(x, factors: Sequence[int]):
    """Linear-interpolation upsampling (matches constant_upsample=True).

    Large (1,2,2) upsamples never reach this path: the decoder switches
    to the upsample-fused lazy form first (see ``_try_lazy_decode``)."""
    dims = len(factors)
    new_spatial = tuple(s * f for s, f in zip(x.shape[1 : 1 + dims], factors))
    return jax.image.resize(
        x, (x.shape[0], *new_spatial, x.shape[-1]), method="linear"
    ).astype(x.dtype)


def upsample_transposed(x, w, b, factors, compute_dtype=jnp.bfloat16):
    dims = len(factors)
    y = jax.lax.conv_transpose(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        strides=tuple(factors),
        padding="VALID",
        dimension_numbers=_dim_numbers(dims),
    )
    return y + b.astype(compute_dtype)


def crop_to_factor(x, factor, kernel_sizes):
    """Crop so (spatial - conv_crop) is a multiple of ``factor``.

    Keeps valid convs downstream translation-equivariant at the upsample
    stride (same shape rule as the reference Upsample.crop_to_factor).
    """
    dims = len(factor)
    spatial = x.shape[1 : 1 + dims]
    conv_crop = tuple(
        sum(k[d] - 1 for k in kernel_sizes) for d in range(dims)
    )
    ns = tuple(
        (s - c) // f for s, c, f in zip(spatial, conv_crop, factor)
    )
    target = tuple(n * f + c for n, c, f in zip(ns, conv_crop, factor))
    if target != spatial:
        if not all(t > c for t, c in zip(target, conv_crop)):
            raise ValueError(
                f"feature map {spatial} too small for factor {factor} "
                f"and convs {kernel_sizes}"
            )
        return _center_crop(x, target)
    return x


# ---------------------------------------------------------------------------
# U-Net
# ---------------------------------------------------------------------------


def unet_init(key, cfg: UNetConfig, dtype=jnp.float32):
    nf, inc = cfg.num_fmaps, cfg.fmap_inc_factor
    n = cfg.num_levels
    keys = iter(jax.random.split(key, n + 2 * cfg.num_heads * (n - 1) + 1))

    l_conv = []
    for level in range(n):
        in_ch = cfg.in_channels if level == 0 else nf * inc ** (level - 1)
        l_conv.append(
            conv_pass_init(
                next(keys), in_ch, nf * inc**level, cfg.kernel_size_down[level], dtype
            )
        )

    r_up, r_conv = [], []
    for _ in range(cfg.num_heads):
        ups, convs = [], []
        for level in range(n - 1):
            ch = nf * inc ** (level + 1)
            if cfg.constant_upsample:
                ups.append({})
            else:
                ups.append(
                    _conv_init(
                        next(keys),
                        tuple(cfg.downsample_factors[level]),
                        ch,
                        ch,
                        dtype,
                    )
                )
            out_ch = (
                cfg.num_fmaps_out
                if cfg.num_fmaps_out is not None and level == 0
                else nf * inc**level
            )
            convs.append(
                conv_pass_init(
                    next(keys),
                    nf * inc**level + ch,
                    out_ch,
                    cfg.kernel_size_up[level],
                    dtype,
                )
            )
        r_up.append(ups)
        r_conv.append(convs)

    return {"l_conv": l_conv, "r_up": r_up, "r_conv": r_conv}


def _lift_2d_config(cfg: UNetConfig) -> UNetConfig:
    """A 2D net as a 3D net with a unit z-axis: kernels (k1,k2) ->
    (1,k1,k2), factors (a,b) -> (1,a,b).  Convolutions are identical;
    the whole 3D fold/lazy-decoder machinery then applies to the 2D
    nets' equally lane-starved first level."""
    return UNetConfig(
        in_channels=cfg.in_channels,
        num_fmaps=cfg.num_fmaps,
        fmap_inc_factor=cfg.fmap_inc_factor,
        downsample_factors=[(1, *f) for f in cfg.downsample_factors],
        kernel_size_down=[
            [(1, *k) for k in lvl] for lvl in cfg.kernel_size_down
        ],
        kernel_size_up=[
            [(1, *k) for k in lvl] for lvl in cfg.kernel_size_up
        ],
        activation=cfg.activation,
        num_heads=cfg.num_heads,
        num_fmaps_out=cfg.num_fmaps_out,
        constant_upsample=cfg.constant_upsample,
        padding=cfg.padding,
        fold_xy=cfg.fold_xy,
    )


def _lift_2d_params(params):
    """Insert the unit z-axis into every conv weight (biases unchanged)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            leaf[None]
            if leaf.ndim == 4 and path and getattr(path[-1], "key", None) == "w"
            else leaf
        ),
        params,
    )


def prefold_unet_params(params, cfg: UNetConfig):
    """Add prefolded weight entries (``fold.prefold_conv_pass``) for
    every level that can run in the folded layout.

    Eligibility mirrors ``_fold_depth`` minus its input-shape checks
    (prefolding a level the runtime shape later disqualifies is
    harmless — the plain path ignores the extra pytree entries), so one
    prefolded params pytree serves every tile geometry.  3D configs
    only; inference-time use (the training graph never folds)."""
    if not cfg.fold_xy or cfg.dims != 3 or not cfg.constant_upsample:
        return params
    if cfg.padding != "valid":
        return params
    import os

    from . import fold as F

    max_ch = int(os.environ.get("BS_FOLD_MAX_CH", 128))
    nf, inc = cfg.num_fmaps, cfg.fmap_inc_factor
    new = dict(params)
    l_conv = list(new["l_conv"])
    r_conv = [list(head) for head in new["r_conv"]]
    for i in range(cfg.num_levels - 1):
        if tuple(cfg.downsample_factors[i]) != (1, 2, 2):
            break
        if nf * inc**i > max_ch:
            break
        kernels = [tuple(k) for k in cfg.kernel_size_down[i]] + [
            tuple(k) for k in cfg.kernel_size_up[i]
        ]
        if not all(F.can_fold_kernel(k) for k in kernels):
            break
        l_conv[i] = F.prefold_conv_pass(l_conv[i])
        for h in range(cfg.num_heads):
            r_conv[h][i] = F.prefold_conv_pass(
                r_conv[h][i], split=nf * inc**i, up_phases=True
            )
    new["l_conv"] = l_conv
    new["r_conv"] = r_conv
    return new


def _fold_eligible(cfg: UNetConfig, x) -> bool:
    """Level-0 xy fold applies: 3D net, (1,2,2) first downsample, odd xy
    kernels at level 0, even xy input extents."""
    if not cfg.fold_xy or cfg.dims != 3 or cfg.num_levels < 2:
        return False
    if tuple(cfg.downsample_factors[0]) != (1, 2, 2):
        return False
    from .fold import can_fold_kernel

    kernels = list(cfg.kernel_size_down[0]) + list(cfg.kernel_size_up[0])
    if not all(can_fold_kernel(k) for k in kernels):
        return False
    return x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0


def _fold_depth(cfg: UNetConfig, x) -> int:
    """How many leading levels run folded: the contiguous run of (1,2,2)
    levels with foldable kernels, even xy extents at each level, and
    lane-starved channel counts.

    A folded conv trades 16/9 more MACs for 4x wider channels, so it
    wins only where plain convs can't fill the MXU — level channel
    counts up to ``$BS_FOLD_MAX_CH`` (default 128; the flagship nets'
    12- and 60-channel levels fold, the 300-channel level does not)."""
    import os

    if not _fold_eligible(cfg, x):
        return 0
    from .fold import can_fold_kernel

    max_ch = int(os.environ.get("BS_FOLD_MAX_CH", 128))
    nf, inc = cfg.num_fmaps, cfg.fmap_inc_factor
    h, w = x.shape[2], x.shape[3]
    m = 0
    for i in range(cfg.num_levels - 1):
        if tuple(cfg.downsample_factors[i]) != (1, 2, 2):
            break
        kernels = list(cfg.kernel_size_down[i]) + list(cfg.kernel_size_up[i])
        if not all(can_fold_kernel(k) for k in kernels):
            break
        if h % 2 or w % 2:
            break
        if nf * inc**i > max_ch:
            break
        h = (h - sum(k[1] - 1 for k in cfg.kernel_size_down[i])) // 2
        w = (w - sum(k[2] - 1 for k in cfg.kernel_size_down[i])) // 2
        m += 1
    return m


def _z_slab_decode(f_left, g, i, cfg, crop_factors, decode_fn):
    """Decode level ``i`` in ``$BS_DECODE_Z_SLABS`` independent z slabs.

    Valid convolutions make every output z-slab a pure function of a
    contiguous halo'd input range, so slab-by-slab decoding is exact
    (bit-identical concat) while dividing the level's temporary working
    set by the slab count — the lever that fits tiles past the
    single-shot HBM wall (BASELINE.md).  Cost: the z conv halo (4 rows
    per level) is recomputed per slab, ~13% extra level FLOPs at 4
    slabs on a 124-deep output.  Only (1,2,2) levels with no z crop
    (flagship nets never downsample z) are eligible; anything else
    returns None and the caller decodes single-shot.

    ``decode_fn(f_slab, g_slab)`` runs one slab through the caller's
    decode strategy (folded / lazy / plain — under slab-sized inputs
    the memory-adaptive threshold usually picks the materialised form,
    the best-MXU variant) and must not return None.

    Default ("auto"): slabs engage exactly where the lazy decode used
    to — materialised upsample past $BS_LAZY_UP_BYTES — with the count
    chosen so each slab's upsample stays near $BS_Z_SLAB_TARGET_BYTES
    (1.4G: fewer, bigger slabs pay less halo recompute; the v5e
    (152,540,540) A/B under the 32 MiB scoped-vmem default measured
    3 slabs 12.85 Mvox/s at a 13.45 G arena vs 4 slabs 12.74 @ 12.2 G
    and 6 slabs 12.64 — raise the target only while the arena keeps
    >=1 G headroom).  Measured earlier on the same tile: 12.64 Mvox/s
    for 4 slabs vs 12.27 single-shot lazy (BASELINE.md round-3 A/B).
    BS_DECODE_Z_SLABS=0 disables, an integer forces that count."""
    import math
    import os

    raw = os.environ.get("BS_DECODE_Z_SLABS", "auto")
    if raw == "auto":
        up_bytes = 2 * g.shape[-1] * g.shape[1] * (g.shape[2] * g.shape[3] * 4)
        if up_bytes <= float(os.environ.get("BS_LAZY_UP_BYTES", 3e9)):
            return None
        target = float(os.environ.get("BS_Z_SLAB_TARGET_BYTES", 1.4e9))
        n = min(16, math.ceil(up_bytes / max(target, 1.0)))
    else:
        n = int(raw)
    if n <= 1:
        return None
    if tuple(cfg.downsample_factors[i]) != (1, 2, 2):
        return None
    if crop_factors[i][0] != 1:
        return None
    from . import fold as F

    ks = cfg.kernel_size_up[i]
    dz = sum(k[0] - 1 for k in ks)
    up_spatial = (g.shape[1], g.shape[2] * 2, g.shape[3] * 2)
    try:
        geom = F.up_crop_geometry(up_spatial, ks, crop_factors[i])
    except ValueError:
        return None
    if geom is None:
        return None
    target, offsets = geom
    if offsets[0] != 0 or target[0] != up_spatial[0]:
        return None
    out_z = target[0] - dz
    if out_z < 2 * n:
        return None
    f_zoff = (f_left.shape[1] - target[0]) // 2
    # XLA's layout assignment hoists the slab-shared skip crop + conv
    # relayout copy above the per-slab z slices (one full-tensor copy is
    # cheaper to COMPUTE than n overlapping slab copies), recreating the
    # whole-tensor working set the slabs exist to avoid — the 2x2.43G
    # level-2 buffers in the (152,668,668) OOM dump.  An
    # optimization_barrier on each slab's inputs pins the slice below
    # the copy so the relayout happens per slab.  Costs halo-sized
    # recompute of the copies — measured -0.5% throughput at the
    # (152,540,540) tile for a 16.29->12.23 GB temp-arena drop.  Slabs
    # only engage when memory binds, so the barrier defaults ON (the
    # unpinned graph's 0.5% is not worth flaky OOM near the ceiling);
    # $BS_SLAB_BARRIER=0 restores the unpinned graph.
    barrier = os.environ.get("BS_SLAB_BARRIER", "1") == "1"
    bounds = [round(s * out_z / n) for s in range(n + 1)]
    outs = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        g_slab = g[:, a : b + dz]
        f_slab = f_left[:, f_zoff + a : f_zoff + b + dz]
        if barrier:
            f_slab, g_slab = jax.lax.optimization_barrier((f_slab, g_slab))
        out = decode_fn(f_slab, g_slab)
        if out is None:
            return None
        outs.append(out)
    import jax.numpy as jnp

    return jnp.concatenate(outs, axis=1)


def _try_lazy_decode(
    params, f_left, g, i, h, cfg, crop_factors, compute_dtype,
    f_left_folded, return_folded,
):
    """Pick the decode strategy for level ``i``; None -> caller runs the
    plain unfolded path.

    - level 0 with a folded skip: materialised folded blends + one
      folded conv pass (narrow channels — a single wide conv beats four
      per-phase ones);
    - deeper levels: the upsample-fused lazy path ONLY when the
      materialised upsample would be large (it trades per-conv MXU
      occupancy for never building the wide upsample temporaries that
      OOM large tiles; threshold via $BS_LAZY_UP_BYTES)."""
    if not cfg.fold_xy or cfg.dims != 3 or not cfg.constant_upsample:
        return None
    if cfg.padding != "valid":
        return None
    if tuple(cfg.downsample_factors[i]) != (1, 2, 2):
        return None
    import os

    from . import fold as F

    up_bytes = 2 * g.shape[-1] * g.shape[1] * (g.shape[2] * g.shape[3] * 4)
    threshold = float(os.environ.get("BS_LAZY_UP_BYTES", 3e9))
    if f_left_folded:
        # level 0 always takes the materialised folded blend (one wide
        # conv beats four per-phase ones at its narrow channel counts);
        # deeper folded levels only while the blend temporaries are
        # small — past the threshold the upsample-fused lazy form keeps
        # big tiles inside HBM
        if i == 0 or up_bytes < threshold:
            out = F.folded_decode_level(
                params["r_conv"][h][i],
                f_left,
                g,
                cfg.kernel_size_up[i],
                crop_factors[i],
                cfg.activation,
                compute_dtype,
                return_folded=return_folded,
            )
            if out is not None:
                return out
        return F.lazy_decode_level(
            params["r_conv"][h][i],
            f_left,
            g,
            cfg.kernel_size_up[i],
            crop_factors[i],
            cfg.activation,
            compute_dtype,
            f_left_folded=True,
            return_folded=return_folded,
        )
    if up_bytes < threshold:
        return None
    return F.lazy_decode_level(
        params["r_conv"][h][i],
        f_left,
        g,
        cfg.kernel_size_up[i],
        crop_factors[i],
        cfg.activation,
        compute_dtype,
        f_left_folded=f_left_folded,
        return_folded=return_folded,
    )


def unet_apply(
    params, x, cfg: UNetConfig, compute_dtype=jnp.bfloat16, return_folded=False
):
    """Run the U-Net. x: (N, *spatial, C). Returns list of per-head outputs.

    With ``return_folded=True`` and an eligible 3D config, per-head
    outputs stay in the 2x2-xy-folded layout (N, D, H/2, W/2, 4*C) so
    callers can run 1x1 heads folded; detect by channel count."""
    if (
        cfg.dims == 2
        and cfg.fold_xy
        and tuple(cfg.downsample_factors[0]) == (2, 2)
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
    ):
        # run the 2D net as unit-z 3D so the fold applies (lane-starved
        # first level is the same problem in both)
        outs = unet_apply(
            _lift_2d_params(params),
            x[:, None],
            _lift_2d_config(cfg),
            compute_dtype,
            return_folded=False,
        )
        return [o[:, 0] for o in outs]
    crop_factors = cfg.crop_factors
    dims = cfg.dims

    def decode_plain(f_left, g, i, h):
        """One plain decoder level: upsample + crop + skip concat +
        conv pass."""
        if cfg.constant_upsample:
            g_up = upsample_resize(g, cfg.downsample_factors[i])
        else:
            up = params["r_up"][h][i]
            g_up = upsample_transposed(
                g,
                up["w"],
                up["b"],
                cfg.downsample_factors[i],
                compute_dtype,
            )
        if cfg.padding == "valid":
            g_up = crop_to_factor(
                g_up, crop_factors[i], cfg.kernel_size_up[i]
            )
        f_crop = _center_crop(f_left, g_up.shape[1 : 1 + dims])
        if cfg.fold_xy:
            # implicit concat (see _conv_split); its gradient graph
            # trips an XLA:TPU space-to-batch compiler bug, so the
            # unfolded (training) configuration concatenates plainly
            x_in = [f_crop, g_up]
        else:
            x_in = jnp.concatenate([f_crop, g_up], axis=-1)
        return conv_pass_apply(
            params["r_conv"][h][i],
            x_in,
            cfg.kernel_size_up[i],
            cfg.activation,
            compute_dtype,
        )

    def rec(level, f_in):
        i = cfg.num_levels - level - 1
        f_left = conv_pass_apply(
            params["l_conv"][i],
            f_in,
            cfg.kernel_size_down[i],
            cfg.activation,
            compute_dtype,
        )
        if level == 0:
            return [f_left] * cfg.num_heads
        g_in = max_pool(f_left, cfg.downsample_factors[i])
        gs_out = rec(level - 1, g_in)
        fs_out = []
        for h in range(cfg.num_heads):
            def dfn(f, g, h=h, i=i):
                lazy = _try_lazy_decode(
                    params, f, g, i, h, cfg, crop_factors,
                    compute_dtype, f_left_folded=False, return_folded=False,
                )
                return lazy if lazy is not None else decode_plain(f, g, i, h)

            out = _z_slab_decode(f_left, gs_out[h], i, cfg, crop_factors, dfn)
            fs_out.append(out if out is not None else dfn(f_left, gs_out[h]))
        return fs_out

    m = _fold_depth(cfg, x)
    if m == 0:
        return rec(cfg.num_levels - 1, x.astype(compute_dtype))

    # -- folded levels 0..m-1: space-to-depth over 2x2 xy (exact rewrite).
    # The whole leading run of lane-starved (1,2,2) levels stays in the
    # folded layout: encoder convs are 4x wider, pools are phase maxes,
    # and skips never round-trip through a full-resolution unfold (the
    # data-formatting cost diagnosed in BASELINE.md).
    from . import fold as F

    xf = F.fold(x.astype(compute_dtype))
    skips_f = []
    for i in range(m):
        f_left_f = F.folded_conv_pass(
            params["l_conv"][i], xf, cfg.kernel_size_down[i],
            cfg.activation, compute_dtype,
        )
        skips_f.append(f_left_f)
        if i + 1 < m:
            xf = F.folded_pool_122(f_left_f)  # stays folded
        else:
            g_in = F.folded_phase_max(f_left_f)  # unfolded for plain levels

    gs_out = rec(cfg.num_levels - 1 - m, g_in)

    for i in range(m - 1, -1, -1):
        rf = return_folded if i == 0 else False
        fs_out = []
        for h in range(cfg.num_heads):
            def dfn(f_f, g, h=h, i=i, rf=rf):
                out = _try_lazy_decode(
                    params, f_f, g, i, h, cfg, crop_factors,
                    compute_dtype, f_left_folded=True, return_folded=rf,
                )
                if out is None:
                    # geometry fell outside the folded forms: unfold the
                    # skip and run the plain level
                    out = decode_plain(F.unfold(f_f), g, i, h)
                return out

            out = _z_slab_decode(
                skips_f[i], gs_out[h], i, cfg, crop_factors, dfn
            )
            fs_out.append(out if out is not None else dfn(skips_f[i], gs_out[h]))
        gs_out = fs_out
    return gs_out


# ---------------------------------------------------------------------------
# static shape algebra (for ROI bookkeeping without tracing)
# ---------------------------------------------------------------------------


def compute_output_shape(cfg: UNetConfig, input_shape: Sequence[int]) -> tuple:
    """Spatial output shape of the U-Net for a spatial input shape."""

    def conv_crop(shape, kernels):
        for k in kernels:
            shape = [s - (kk - 1) for s, kk in zip(shape, k)]
            if any(s <= 0 for s in shape):
                raise ValueError("input too small")
        return shape

    def down(shape, f):
        if any(s % ff for s, ff in zip(shape, f)):
            raise ValueError(
                f"shape {shape} not divisible by {f} at downsample"
            )
        return [s // ff for s, ff in zip(shape, f)]

    def rec(level, shape):
        i = cfg.num_levels - level - 1
        shape = conv_crop(shape, cfg.kernel_size_down[i])
        if level == 0:
            return shape
        inner = rec(level - 1, down(shape, cfg.downsample_factors[i]))
        up = [s * f for s, f in zip(inner, cfg.downsample_factors[i])]
        if cfg.padding == "valid":
            cf = cfg.crop_factors[i]
            cc = [
                sum(k[d] - 1 for k in cfg.kernel_size_up[i])
                for d in range(len(up))
            ]
            up = [((s - c) // f) * f + c for s, c, f in zip(up, cc, cf)]
        return conv_crop(up, cfg.kernel_size_up[i])

    return tuple(rec(cfg.num_levels - 1, list(input_shape)))


def min_input_shape(cfg: UNetConfig, start: Optional[Sequence[int]] = None):
    """Smallest valid input shape >= start (elementwise search)."""
    dims = cfg.dims
    shape = list(start) if start is not None else [1] * dims
    for _ in range(4096):
        try:
            compute_output_shape(cfg, shape)
            return tuple(shape)
        except ValueError:
            shape = [s + 1 for s in shape]
    raise RuntimeError("no valid input shape found")
