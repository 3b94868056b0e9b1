"""Device-side augmentations: the gunpowder augment stack as jittable ops.

The reference builds per-batch CPU augment graphs (gunpowder nodes used
at reference ``bootstrapper/models/3d_affs/train.py:102-127`` and custom
nodes in ``bootstrapper/gp/``).  Here the same transforms are pure JAX
functions over a keyed PRNG, so the whole augment chain for a batch
fuses into one XLA program and runs on TPU next to the train step —
the host only does Zarr crops and rejection sampling.

Conventions: arrays are unbatched (*spatial,) float32 raw in [0,1] or
int32 labels; every op takes a PRNG key first and is vmap-able over a
batch of keys.  Randomness is structural-shape-free: probabilities gate
via ``jnp.where``, never Python branches, so everything stays traceable.

Covered (reference node in parens):

- mirror/transpose        (SimpleAugment)
- elastic deform + rotate + scale (DeformAugment)
- per-section shift/slip  (ShiftAugment)
- intensity scale/shift   (IntensityAugment, slab-wise)
- gaussian noise          (NoiseAugment)
- gamma                   (GammaAugment, symmetric log-uniform)
- impulse noise           (ImpulseNoiseAugment)
- per-slab gaussian blur  (SmoothAugment)
- section defects: zero-out / low contrast / artifact blend
                          (DefectAugment, ``gp/defect_augment.py:18-348``)
- random-step boundary growth (CustomGrowBoundary,
                          ``gp/custom_grow_boundary.py:7-110``)
- on-the-fly unlabelled mask (CreateMask)
- per-z nearest-label expansion (ExpandLabels)
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops.affinities import _shifted, grow_boundary


# ---------------------------------------------------------------------------
# geometric
# ---------------------------------------------------------------------------


def simple_augment(key, arrays: dict, mirror_axes=None, transpose_axes=(-2, -1)):
    """Random mirrors along each axis + random transpose of the given
    (equal-sized) axes; identical transform applied to every array."""
    sample = next(iter(arrays.values()))
    dims = sample.ndim
    mirror_axes = tuple(range(dims)) if mirror_axes is None else mirror_axes
    km, kt = jax.random.split(key)
    flips = jax.random.bernoulli(km, 0.5, (len(mirror_axes),))
    do_t = jax.random.bernoulli(kt, 0.5)

    def apply(x):
        for i, ax in enumerate(mirror_axes):
            x = jnp.where(flips[i], jnp.flip(x, axis=ax), x)
        a, b = [ax % dims for ax in transpose_axes]
        x = jnp.where(do_t, jnp.swapaxes(x, a, b), x)
        return x

    return {k: apply(v) for k, v in arrays.items()}


def _sample_flow(key, shape, control_spacing, jitter_sigma, rotation_max,
                 scale_range):
    """Dense (dims, *shape) displacement field: smooth random jitter from a
    coarse control grid + in-plane rotation + isotropic scale."""
    dims = len(shape)
    kj, kr, ks = jax.random.split(key, 3)
    # coarse control grid
    cshape = tuple(max(2, -(-s // c)) + 1 for s, c in zip(shape, control_spacing))
    coarse = (
        jax.random.normal(kj, (dims, *cshape))
        * jnp.asarray(jitter_sigma).reshape((dims,) + (1,) * dims)
    )
    flow = jax.image.resize(coarse, (dims, *shape), method="cubic")

    # rotation in the last two axes around the centre + scale
    angle = jax.random.uniform(kr, (), minval=-rotation_max, maxval=rotation_max)
    scale = jax.random.uniform(
        ks, (), minval=scale_range[0], maxval=scale_range[1]
    )
    grids = jnp.stack(
        jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in shape],
                     indexing="ij")
    )
    cy = (shape[-2] - 1) / 2.0
    cx = (shape[-1] - 1) / 2.0
    y = grids[-2] - cy
    x = grids[-1] - cx
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # source position for rotation-by-angle and scale (inverse map)
    src_y = (cos * y + sin * x) / scale + cy
    src_x = (-sin * y + cos * x) / scale + cx
    rot_flow = jnp.zeros_like(grids)
    rot_flow = rot_flow.at[-2].set(src_y - grids[-2])
    rot_flow = rot_flow.at[-1].set(src_x - grids[-1])
    return flow + rot_flow


def elastic_deform(
    key,
    arrays: dict,
    interp: dict,
    control_spacing=(8, 32, 32),
    jitter_sigma=(0.0, 2.0, 2.0),
    rotation_max=np.pi / 2,
    scale_range=(0.9, 1.1),
):
    """Elastic deformation + rotation + scale (DeformAugment capability).

    interp[name]: 1 for linear (raw/float), 0 for nearest (labels).
    """
    sample = next(iter(arrays.values()))
    shape = sample.shape
    dims = sample.ndim
    cs = tuple(control_spacing[-dims:])
    js = tuple(jitter_sigma[-dims:])
    flow = _sample_flow(key, shape, cs, js, rotation_max, scale_range)
    grids = jnp.stack(
        jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in shape],
                     indexing="ij")
    )
    coords = grids + flow

    out = {}
    for name, x in arrays.items():
        order = interp.get(name, 1)
        if order == 0:
            ci = [jnp.clip(jnp.round(c).astype(jnp.int32), 0, s - 1)
                  for c, s in zip(coords, shape)]
            out[name] = x[tuple(ci)]
        else:
            out[name] = jax.scipy.ndimage.map_coordinates(
                x.astype(jnp.float32), list(coords), order=1, mode="nearest"
            )
    return out


def shift_augment(key, arrays: dict, interp: dict, max_shift: int = 4,
                  prob: float = 0.05):
    """Per-z-section random xy shifts ("slip"): each section independently
    shifts with probability ``prob`` (ShiftAugment capability)."""
    sample = next(iter(arrays.values()))
    Z = sample.shape[0]
    kp, ks = jax.random.split(key)
    do = jax.random.bernoulli(kp, prob, (Z,))
    shifts = jax.random.randint(ks, (Z, 2), -max_shift, max_shift + 1)
    shifts = jnp.where(do[:, None], shifts, 0)

    def apply(x, order):
        def shift_section(sec, sh):
            return jnp.roll(sec, (sh[0], sh[1]), axis=(0, 1))

        return jax.vmap(shift_section)(x, shifts)

    return {k: apply(v, interp.get(k, 1)) for k, v in arrays.items()}


# ---------------------------------------------------------------------------
# intensity
# ---------------------------------------------------------------------------


def _per_slab(key, x, fn, slab_axis):
    """Apply fn(key, slab) independently per index along slab_axis (or to
    the whole array when slab_axis is None)."""
    if slab_axis is None:
        return fn(key, x)
    xs = jnp.moveaxis(x, slab_axis, 0)
    keys = jax.random.split(key, xs.shape[0])
    out = jax.vmap(fn)(keys, xs)
    return jnp.moveaxis(out, 0, slab_axis)


def intensity_augment(key, raw, scale_range=(0.9, 1.1), shift_range=(-0.1, 0.1),
                      slab_axis=0):
    """raw -> mean + (raw-mean)*scale + shift, per slab (IntensityAugment)."""

    def fn(k, x):
        k1, k2 = jax.random.split(k)
        s = jax.random.uniform(k1, (), minval=scale_range[0], maxval=scale_range[1])
        t = jax.random.uniform(k2, (), minval=shift_range[0], maxval=shift_range[1])
        mean = jnp.mean(x)
        return jnp.clip(mean + (x - mean) * s + t, 0.0, 1.0)

    return _per_slab(key, raw, fn, slab_axis)


def noise_augment(key, raw, sigma_max=0.05):
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (), maxval=sigma_max)
    return jnp.clip(raw + sigma * jax.random.normal(k2, raw.shape), 0.0, 1.0)


def gamma_augment(key, raw, gamma_range=(0.8, 1.25), slab_axis=None):
    """Symmetric log-uniform gamma (GammaAugment, corditea-style)."""

    def fn(k, x):
        lg = jax.random.uniform(
            k, (), minval=np.log(gamma_range[0]), maxval=np.log(gamma_range[1])
        )
        # clip the result too: fp pow can exceed 1 by ~1e-7
        return jnp.clip(jnp.power(jnp.clip(x, 1e-6, 1.0), jnp.exp(lg)), 0.0, 1.0)

    return _per_slab(key, raw, fn, slab_axis)


def impulse_noise_augment(key, raw, prob=0.01):
    k1, k2 = jax.random.split(key)
    hit = jax.random.bernoulli(k1, prob, raw.shape)
    vals = jax.random.uniform(k2, raw.shape)
    return jnp.where(hit, vals, raw)


def _gaussian_blur_fixed_radius(x, sigma, radius: int):
    """Separable blur with traced sigma but static radius."""
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-3)) ** 2)
    g = g / g.sum()
    for ax in range(x.ndim):
        moved = jnp.moveaxis(x, ax, -1)
        shape = moved.shape
        flat = moved.reshape(-1, shape[-1], 1)
        out = jax.lax.conv_general_dilated(
            flat, g.reshape(-1, 1, 1), (1,), [(radius, radius)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        x = jnp.moveaxis(out.reshape(shape), -1, ax)
    return x


def smooth_augment(key, raw, sigma_range=(0.0, 1.5), slab_axis=0, radius=4):
    """Per-slab random-sigma gaussian blur (SmoothAugment)."""

    def fn(k, x):
        sigma = jax.random.uniform(
            k, (), minval=sigma_range[0], maxval=sigma_range[1]
        )
        blurred = _gaussian_blur_fixed_radius(x, sigma, radius)
        return jnp.where(sigma > 0.05, blurred, x)

    return _per_slab(key, raw, fn, slab_axis)


def defect_augment(
    key,
    raw,
    prob_missing=0.05,
    prob_low_contrast=0.05,
    prob_artifact=0.0,
    contrast_scale=0.1,
    artifact=None,
    artifact_mask=None,
    missing_fill=0.0,
):
    """Per-z-section defects: zero/fill-out, low contrast, artifact blend
    (DefectAugment capability, ``gp/defect_augment.py:204-296``).

    ``artifact`` is intensity data shaped like ``raw`` (a crop from a
    real-artifact volume); ``artifact_mask`` is its alpha mask — when
    given, affected sections blend per voxel
    ``raw * (1 - alpha) + artifact * alpha`` exactly like the
    reference's ``artifacts_mask`` path (``gp/defect_augment.py:44-53``).
    Without a mask, a random scalar alpha per section is used."""
    Z = raw.shape[0]
    kd, kc, ka, kb = jax.random.split(key, 4)
    u = jax.random.uniform(kd, (Z,))
    missing = u < prob_missing
    low_c = (u >= prob_missing) & (u < prob_missing + prob_low_contrast)
    art = (u >= prob_missing + prob_low_contrast) & (
        u < prob_missing + prob_low_contrast + prob_artifact
    )

    out = raw
    out = jnp.where(missing[:, None, None], missing_fill, out)
    mean = jnp.mean(raw, axis=(1, 2), keepdims=True)
    out = jnp.where(
        low_c[:, None, None], mean + (raw - mean) * contrast_scale, out
    )
    if artifact is not None and prob_artifact > 0:
        if artifact_mask is not None:
            alpha = artifact_mask.astype(raw.dtype)
        else:
            alpha = jax.random.uniform(kb, (Z, 1, 1), minval=0.3, maxval=0.9)
        out = jnp.where(
            art[:, None, None], out * (1 - alpha) + artifact * alpha, out
        )
    return out


# ---------------------------------------------------------------------------
# label-side
# ---------------------------------------------------------------------------


def create_mask(labels, dtype=jnp.uint8):
    """labels>0 -> uint8 mask (CreateMask, ``gp/create_mask.py:5-60``)."""
    return (jnp.asarray(labels) > 0).astype(dtype)


def _mix_u32(x):
    """Cheap elementwise integer hash (finalizer-style avalanche): maps
    uint32 ids to well-scrambled uint32s on the VPU."""
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def random_grow_boundary(key, labels, max_steps=3, only_xy=True):
    """Boundary growth with a random per-label number of erosion steps
    (CustomGrowBoundary capability; reference
    ``gp/custom_grow_boundary.py:60-75`` draws per-label steps
    unboundedly).

    Instead of a gather through a fixed-size step table (which clipped
    ids >= its size to one shared entry, silently correlating erosion
    across labels in dense crops), each label's step count is an
    elementwise hash of (label id, per-call seed) — independent uniform
    draws for any number of labels, with no table and no clip."""
    seed = jax.random.randint(
        key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
    ).astype(jnp.uint32)
    steps = _mix_u32(labels.astype(jnp.uint32) ^ seed) % jnp.uint32(
        max_steps + 1
    )
    out = labels
    for i in range(max_steps):
        eroded = grow_boundary(out, steps=1, only_xy=only_xy)
        out = jnp.where((steps > i) & (labels > 0), eroded, out)
    return out


def expand_labels(labels, expansion_voxels: int = 1):
    """Per-z nearest-label dilation into background by N voxels
    (ExpandLabels capability, ``gp/expand_labels.py:6-32``): iterative
    4-neighbour label propagation (EDT-nearest within a small radius)."""
    lab = jnp.asarray(labels)
    dims = lab.ndim
    offsets = []
    start = 1 if dims == 3 else 0
    for d in range(start, dims):
        for s in (-1, 1):
            o = [0] * dims
            o[d] = s
            offsets.append(o)
    out = lab
    for _ in range(int(expansion_voxels)):
        filled = out
        for o in offsets:
            n = _shifted(out, o, fill=0)
            filled = jnp.where((filled == 0) & (n > 0), n, filled)
        out = filled
    return out


def fold_augment(key, raw, prob=0.03, max_strength=6.0, width=8.0):
    """Per-section fold-line deformation (DefectAugment's deform mode,
    ``gp/defect_augment.py:297-348`` capability): pixels are pulled
    toward a random line, simulating a physical fold in the section."""
    Z, H, W = raw.shape
    kz, ka, kp, ks = jax.random.split(key, 4)
    do = jax.random.bernoulli(kz, prob, (Z,))
    angle = jax.random.uniform(ka, (Z,), maxval=np.pi)
    offset = jax.random.uniform(kp, (Z,), minval=0.25, maxval=0.75)
    strength = jax.random.uniform(ks, (Z,), minval=1.0, maxval=max_strength)

    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )

    def deform_section(sec, a, off, s, active):
        # signed distance to the fold line through (off*H, off*W)
        n_y, n_x = jnp.sin(a), jnp.cos(a)
        d = (yy - off * H) * n_y + (xx - off * W) * n_x
        # displacement toward the line, decaying with distance
        disp = s * jnp.sign(d) * jnp.exp(-jnp.abs(d) / width)
        src_y = yy + disp * n_y
        src_x = xx + disp * n_x
        warped = jax.scipy.ndimage.map_coordinates(
            sec, [src_y, src_x], order=1, mode="nearest"
        )
        return jnp.where(active, warped, sec)

    return jax.vmap(deform_section)(raw, angle, offset, strength, do)


def clahe_augment(key, raw, clip_range=(0.6, 1.0), nbins=128,
                  signal_min=0.05):
    """Per-section clipped histogram equalisation with a random clip
    limit (ClaheAugment capability, ``gp/clahe_augment.py:8-61``).

    Device-side simplification: the equalisation is per-section global
    (not tiled); sections with almost no signal are left untouched.
    """
    Z = raw.shape[0]
    keys = jax.random.split(key, Z)
    edges = jnp.linspace(0.0, 1.0, nbins + 1)

    def eq_section(k, sec):
        clip = jax.random.uniform(
            k, (), minval=clip_range[0], maxval=clip_range[1]
        )
        hist = jnp.histogram(sec, bins=edges)[0].astype(jnp.float32)
        hist = hist / jnp.maximum(hist.sum(), 1.0)
        limit = clip * hist.max()
        excess = jnp.sum(jnp.clip(hist - limit, 0, None))
        hist = jnp.minimum(hist, limit) + excess / nbins
        cdf = jnp.cumsum(hist)
        cdf = cdf / jnp.maximum(cdf[-1], 1e-6)
        bins = jnp.clip((sec * (nbins - 1)).astype(jnp.int32), 0, nbins - 1)
        out = cdf[bins]
        return jnp.where(jnp.mean(sec) > signal_min, out, sec)

    return jax.vmap(eq_section)(keys, raw)
