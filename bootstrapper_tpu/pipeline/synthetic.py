"""Synthetic training pipeline for the ``3d_affs_from_*`` refiner setups.

Capability parity with the reference's Lightning synthetic trainers
(reference ``bootstrapper/models/3d_affs_from_2d_mtlsd/train.py:30-147``):
no data on disk — each draw generates a random label volume
(CreateLabels), simulates 2D prediction errors on a copy
(ObfuscateLabels), derives the *inputs* (2D LSDs / 2D affs / 3D LSDs of
the obfuscated copy) and the *target* (3D affs of the clean labels),
and corrupts the inputs with the intensity augment chain (the reference
applies noise/intensity/smooth/defect to the simulated predictions).

Host does the label-topology generation (numpy/scipy); one jitted
device program does targets, inputs and augments per batch.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops.affinities import (
    affs_mask,
    balance_weights,
    grow_boundary,
    seg_to_affs,
)
from ..ops.lsd import lsd_descriptors_2d_stack, lsd_descriptors_downsampled
from ..train.sampler import BatchLoader, fold_ids_u32
from ..train.synth import synthetic_pair
from .augment import (
    defect_augment,
    gamma_augment,
    intensity_augment,
    noise_augment,
    simple_augment,
    smooth_augment,
)
from .training import _gate

MAX_LABELS = 96


def make_synth_device_transform(net_config: dict, voxel_size):
    """(key, clean, obfuscated) -> (input, targets, weights)."""
    nc = net_config
    out_tile = tuple(nc["output_shape"])
    vs = tuple(voxel_size)

    def crop_out(x):
        slices = []
        for s, t in zip(x.shape, out_tile):
            o = (s - t) // 2
            slices.append(slice(o, o + t))
        return x[tuple(slices)]

    def transform(key, clean, obf):
        from .training import device_renumber

        keys = jax.random.split(key, 10)
        clean = device_renumber(clean, MAX_LABELS)
        # obfuscation splits add ids; renumber independently
        obf = device_renumber(obf, MAX_LABELS)

        arrays = simple_augment(
            keys[0], {"clean": clean, "obf": obf},
            mirror_axes=(0, 1, 2), transpose_axes=(1, 2),
        )
        clean, obf = arrays["clean"], arrays["obf"]

        # ---- inputs from the obfuscated copy ----
        chans = []
        for name, icfg in nc["inputs"].items():
            src = obf
            if icfg.get("grow_boundary", 0):
                src = grow_boundary(
                    src, steps=icfg["grow_boundary"], only_xy=True
                )
            if "sigma" in icfg:
                if name.startswith("2d"):
                    t = lsd_descriptors_2d_stack(
                        src, sigma=icfg["sigma"], voxel_size_yx=vs[1:],
                        max_labels=MAX_LABELS,
                    )
                else:
                    t = lsd_descriptors_downsampled(
                        src, sigma=icfg["sigma"], voxel_size=vs,
                        downsample=icfg.get("downsample", 1),
                        max_labels=MAX_LABELS,
                    )
            else:
                nbhd = icfg["neighborhood"]
                if len(nbhd[0]) == 2:
                    nbhd = [[0, *o] for o in nbhd]
                t = seg_to_affs(src, nbhd)
            chans.append(t)
        x = jnp.concatenate(chans, axis=0)  # (C, *spatial)

        # corrupt the simulated predictions. x is (C, z, y, x): the
        # reference applies intensity PER CHANNEL (slab (1,-1,-1,-1))
        # and PER Z-SECTION (slab (-1,1,-1,-1)), and smooths per
        # z-section only (``3d_affs_from_2d_mtlsd/train.py:116-128``) —
        # per-section 2D predictions never smear across z at inference,
        # so slab_axis=1 here; slab_axis=0 would blur each channel
        # volume through z, a corruption mode the refiner never sees.
        x = _gate(keys[1], 0.5, noise_augment(keys[1], x, 0.05), x)
        x = _gate(
            keys[2], 0.5, intensity_augment(keys[2], x, slab_axis=0), x
        )
        x = _gate(
            keys[6], 0.5, intensity_augment(keys[6], x, slab_axis=1), x
        )
        x = _gate(keys[3], 0.5, gamma_augment(keys[3], x, slab_axis=1), x)
        x = _gate(keys[4], 0.5, smooth_augment(keys[4], x, slab_axis=1), x)
        # per-section defects across all channels identically
        kd = keys[5]
        x = jax.vmap(
            lambda xc: defect_augment(
                kd, xc, prob_missing=0.05, prob_low_contrast=0.05
            )
        )(x)
        x = jnp.clip(x, 0.0, 1.0)  # fp guard: blurs/pows can exceed by ~1e-7

        # ---- target from the clean labels ----
        labels_out = crop_out(clean)
        mask_out = (labels_out >= 0).astype(jnp.float32)  # fully labelled
        targets, weights = {}, {}
        for name, ocfg in nc["outputs"].items():
            lab = labels_out
            if ocfg.get("grow_boundary", 0):
                lab = grow_boundary(
                    lab, steps=ocfg["grow_boundary"], only_xy=True
                )
            t = seg_to_affs(lab, ocfg["neighborhood"])
            m = affs_mask(mask_out, ocfg["neighborhood"])
            w = balance_weights(t, m, slab_axis=0)
            targets[name] = jnp.moveaxis(t, 0, -1).astype(jnp.float32)
            weights[name] = jnp.moveaxis(w, 0, -1).astype(jnp.float32)

        net_in = jnp.moveaxis(x, 0, -1)  # channels last, stays [0,1]
        return net_in, targets, weights

    return transform


class SyntheticTrainingPipeline:
    def __init__(
        self,
        net_config: dict,
        voxel_size=(1, 1, 1),
        batch_size: int = 1,
        seed: int = 0,
        prefetch: int = 6,
        num_threads: int = 4,
    ):
        self.net_config = net_config
        self.input_tile = tuple(net_config["input_shape"])
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self._rng_lock = __import__("threading").Lock()
        single = make_synth_device_transform(net_config, voxel_size)

        @jax.jit
        def batched(key, clean, obf):
            keys = jax.random.split(key, clean.shape[0])
            net_in, targets, weights = jax.vmap(single)(keys, clean, obf)
            return {"input": net_in, "targets": targets, "weights": weights}

        self.transform = batched
        self.key = jax.random.PRNGKey(seed)
        self.loader = BatchLoader(
            self._draw, batch_size, prefetch, num_threads
        )

    def _draw(self):
        with self._rng_lock:
            seed = int(self.rng.integers(0, 2**31))
        rng = np.random.default_rng(seed)
        clean, obf = synthetic_pair(rng, shape=self.input_tile)
        # dense renumbering runs on device (device_renumber) -- the host
        # np.unique sorts were a per-draw bottleneck on the 1-core host
        return {"clean": fold_ids_u32(clean), "obf": fold_ids_u32(obf)}

    def next_batch(self):
        batch = next(self.loader)
        self.key, sub = jax.random.split(self.key)
        return self.transform(sub, batch["clean"], batch["obf"])

    def stop(self):
        self.loader.stop()
