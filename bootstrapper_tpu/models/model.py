"""Setup models: parametric U-Net + sigmoid heads, instantiated from a
net config dict (the contents of a ``net_config.json``).

Mirrors the behaviour of the reference per-setup ``model.py`` files
(reference ``bootstrapper/models/3d_affs/model.py:28-64``,
``2d_mtlsd/model.py:28-81``): a single-decoder U-Net whose final
features feed one 1x1-conv sigmoid head per output dataset.  2D setups
consume ``adj_slices`` neighbouring sections as channels and can
re-insert a z-axis at inference (``stack_infer``).

Functional API: ``Model.init(key) -> params``, ``Model.apply(params, x)
-> dict[name, array]``.  Arrays are channels-last (N, *spatial, C).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .unet import (
    UNetConfig,
    compute_output_shape,
    conv_pass_apply,
    conv_pass_init,
    unet_apply,
    unet_init,
)
from .zoo import get_net_config


def head_dims(output_cfg: dict) -> int:
    """Channel count of an output head; neighborhood wins over 'dims'."""
    if "neighborhood" in output_cfg:
        return len(output_cfg["neighborhood"])
    return output_cfg["dims"]


@dataclasses.dataclass(frozen=True)
class Model:
    net_config: dict
    stack_infer: bool = False
    compute_dtype: object = jnp.bfloat16

    @classmethod
    def from_setup(cls, name_or_path: str, **kw) -> "Model":
        return cls(get_net_config(name_or_path), **kw)

    # -- derived configuration --------------------------------------------

    @property
    def unet_config(self) -> UNetConfig:
        nc = self.net_config
        in_channels = nc.get("in_channels")
        if in_channels is None:
            # 'from' models: inputs are prediction channels, concatenated
            in_channels = sum(i["dims"] for i in nc["inputs"].values())
        elif "adj_slices" in nc:
            in_channels = in_channels * nc["adj_slices"]
        return UNetConfig(
            in_channels=in_channels,
            num_fmaps=nc["num_fmaps"],
            fmap_inc_factor=nc["fmap_inc_factor"],
            downsample_factors=nc["downsample_factors"],
            kernel_size_down=nc["kernel_size_down"],
            kernel_size_up=nc["kernel_size_up"],
            num_fmaps_out=nc.get("num_fmaps_out"),
            # shipped setups use constant (resize) upsampling like the
            # reference's model.py:50; transposed-conv upsampling is a
            # UNet capability selectable per-config (unet.py:241)
            constant_upsample=nc.get("constant_upsample", True),
            padding="valid",
            fold_xy=nc.get("fold_xy", True),
        )

    @property
    def dims(self) -> int:
        return len(self.net_config["input_shape"])

    @property
    def input_shape(self) -> tuple:
        return tuple(self.net_config["input_shape"])

    @property
    def output_shape(self) -> tuple:
        return tuple(self.net_config["output_shape"])

    @property
    def output_names(self) -> list:
        return list(self.net_config["outputs"])

    def validate_shapes(self):
        got = compute_output_shape(self.unet_config, self.input_shape)
        want = self.output_shape
        if tuple(got) != tuple(want):
            raise ValueError(
                f"net config inconsistent: input {self.input_shape} -> "
                f"{got}, expected {want}"
            )

    # -- params ------------------------------------------------------------

    def init(self, key) -> dict:
        cfg = self.unet_config
        keys = jax.random.split(key, 1 + len(self.net_config["outputs"]))
        params = {"unet": unet_init(keys[0], cfg)}
        ch = cfg.out_channels
        for i, (name, out) in enumerate(self.net_config["outputs"].items()):
            params[f"head_{name}"] = conv_pass_init(
                keys[1 + i], ch, head_dims(out), [(1,) * cfg.dims]
            )
        return params

    def prefold(self, params) -> dict:
        """Precompute every folded-weight transform the inference graph
        would otherwise rebuild per call (``fold.prefold_conv_pass``):
        returns params with ``_pf:*`` entries added for the foldable
        U-Net levels and the 1x1 output heads.  Exact — ``apply`` output
        is bit-identical with or without.  2D setups cache the lifted
        unit-z transforms; their (unfolded) heads need no entries."""
        cfg = self.unet_config
        from . import fold as F
        from .unet import prefold_unet_params

        new = dict(params)
        if cfg.dims == 2:
            # 2D setups run their folded levels through the lifted
            # unit-z 3D machinery (unet_apply's 2D branch): compute the
            # transforms in lifted space and merge the _pf:* arrays back
            # into the 2D pytree — _lift_2d_params passes them through
            # untouched at apply time (they are already 5-D).
            from .unet import _lift_2d_config, _lift_2d_params

            lifted = prefold_unet_params(
                _lift_2d_params(params["unet"]), _lift_2d_config(cfg)
            )
            new["unet"] = _merge_pf_entries(params["unet"], lifted)
            return new
        new["unet"] = prefold_unet_params(params["unet"], cfg)
        for name in self.net_config["outputs"]:
            new[f"head_{name}"] = F.prefold_conv_pass(new[f"head_{name}"])
        return new

    # -- forward -----------------------------------------------------------

    def apply(self, params, x) -> dict:
        """x: (N, *spatial, C) or, for 2D setups fed 3D tiles,
        (N, adj, H, W, C) which is folded into channels."""
        cfg = self.unet_config
        if self.dims == 2 and x.ndim == 5:
            # (n, d, h, w, c) -> (n, h, w, d*c)
            n, d, h, w, c = x.shape
            x = jnp.moveaxis(x, 1, 3).reshape(n, h, w, d * c)
        spatial = tuple(x.shape[1 : 1 + cfg.dims])
        try:
            compute_output_shape(cfg, spatial)
        except ValueError as e:
            # fail here with geometry context instead of deep inside the
            # fold/decode graph with an empty-tensor slice error
            raise ValueError(
                f"input spatial shape {spatial} is invalid for this "
                f"setup ({e}); the standard tile is {self.input_shape}"
            ) from None
        z = unet_apply(
            params["unet"], x, cfg, self.compute_dtype, return_folded=True
        )[0]
        return self._heads(params, z)

    def _heads(self, params, z) -> dict:
        """Apply the per-output 1x1 sigmoid heads to the final U-Net
        features (possibly still in the 2x2-xy-folded layout)."""
        cfg = self.unet_config
        folded = self.dims == 3 and z.shape[-1] == 4 * cfg.out_channels
        outs = {}
        for name in self.net_config["outputs"]:
            if folded:
                from . import fold as F

                y = F.unfold(
                    F.folded_conv_pass(
                        params[f"head_{name}"],
                        z,
                        [(1, 1, 1)],
                        activation="sigmoid",
                        compute_dtype=self.compute_dtype,
                    )
                ).astype(jnp.float32)
            else:
                y = conv_pass_apply(
                    params[f"head_{name}"],
                    z,
                    [(1,) * cfg.dims],
                    activation="sigmoid",
                    compute_dtype=self.compute_dtype,
                ).astype(jnp.float32)
            if self.stack_infer and self.dims == 2:
                y = y[:, None]  # re-insert z axis: (n, 1, h, w, c)
            outs[name] = y
        return outs

    def apply_stream(self, params, x, state):
        """One overlap-save z-streaming step (see ``models/zstream.py``):
        returns (outputs dict, new stream state).  ``state=None`` is the
        warmup step (``x`` carries the full z context); later steps feed
        ``s`` new z slices and emit ``s`` output slices with zero
        redundant context compute.  3D setups only."""
        from .zstream import unet_stream_step

        z, new_state = unet_stream_step(
            params["unet"], x, state, self.unet_config,
            self.compute_dtype, return_folded=True,
        )
        return self._heads(params, z[0]), new_state


def _merge_pf_entries(orig, lifted):
    """Copy ``_pf*`` cache entries from a lifted params tree back into
    the parallel-structured original tree (2D prefold support)."""
    if isinstance(orig, dict):
        out = {
            k: _merge_pf_entries(v, lifted[k]) if k in lifted else v
            for k, v in orig.items()
        }
        for k, v in lifted.items():
            if k.startswith("_pf") and k not in out:
                out[k] = v
        return out
    if isinstance(orig, (list, tuple)):
        return type(orig)(
            _merge_pf_entries(o, l) for o, l in zip(orig, lifted)
        )
    return orig


def weighted_mse_loss(pred, target, weights):
    """Masked MSE: mean over elements where weights > 0 (reference
    ``models/3d_affs/model.py:67-91`` semantics, jit-friendly)."""
    scale = weights * (pred - target) ** 2
    count = jnp.count_nonzero(weights > 0)
    return jnp.sum(scale) / jnp.maximum(count, 1).astype(scale.dtype)


def multi_output_loss(preds: dict, targets: dict, weights: dict):
    """Sum of weighted-MSE losses over all outputs (dual-head setups sum
    their per-head losses, reference ``2d_mtlsd/model.py:102-115``)."""
    return sum(
        weighted_mse_loss(preds[k], targets[k], weights[k]) for k in preds
    )
