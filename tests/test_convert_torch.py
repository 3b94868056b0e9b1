import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from bootstrapper_tpu.models import Model
from bootstrapper_tpu.models.convert_torch import (
    load_torch_state_dict,
    torch_to_params,
)


def _tiny_model():
    nc = dict(Model.from_setup("3d_affs").net_config)
    nc.update(
        num_fmaps=2,
        fmap_inc_factor=2,
        input_shape=[12, 48, 48],
        output_shape=[4, 8, 8],
        downsample_factors=[[1, 2, 2]] * 2,
        kernel_size_down=[[[1, 3, 3], [1, 3, 3]], [[3, 3, 3], [3, 3, 3]],
                          [[3, 3, 3], [3, 3, 3]]],
        kernel_size_up=[[[1, 3, 3], [1, 3, 3]], [[1, 3, 3], [1, 3, 3]]],
    )
    nc["outputs"] = {
        "3d_affs": {"dtype": "uint8", "dims": 3,
                    "neighborhood": [[-1, 0, 0], [0, -1, 0], [0, 0, -1]]}
    }
    return Model(nc)


def _fake_reference_state(model):
    """Build a torch-style state dict shaped like the reference module
    tree for this architecture."""
    cfg = model.unet_config
    rng = np.random.default_rng(0)
    state = {}

    def add_conv(prefix, idx, in_ch, out_ch, kernel):
        w = rng.normal(0, 0.1, (out_ch, in_ch, *kernel)).astype(np.float32)
        b = rng.normal(0, 0.1, (out_ch,)).astype(np.float32)
        state[f"{prefix}.{idx}.weight"] = torch.tensor(w)
        state[f"{prefix}.{idx}.bias"] = torch.tensor(b)

    nf, inc = cfg.num_fmaps, cfg.fmap_inc_factor
    for level in range(cfg.num_levels):
        in_ch = cfg.in_channels if level == 0 else nf * inc ** (level - 1)
        out_ch = nf * inc**level
        ch = in_ch
        for j, k in enumerate(cfg.kernel_size_down[level]):
            add_conv(f"unet.l_conv.{level}.conv_pass", 2 * j, ch, out_ch, k)
            ch = out_ch
        add_conv(
            f"unet.l_conv.{level}.residual", 0, in_ch, out_ch,
            (1,) * cfg.dims,
        )
    for level in range(cfg.num_levels - 1):
        in_ch = nf * inc**level + nf * inc ** (level + 1)
        out_ch = nf * inc**level
        ch = in_ch
        for j, k in enumerate(cfg.kernel_size_up[level]):
            add_conv(f"unet.r_conv.0.{level}.conv_pass", 2 * j, ch, out_ch, k)
            ch = out_ch
        add_conv(
            f"unet.r_conv.0.{level}.residual", 0, in_ch, out_ch,
            (1,) * cfg.dims,
        )
    add_conv("affs_head.conv_pass", 0, nf, 3, (1,) * cfg.dims)
    add_conv("affs_head.residual", 0, nf, 3, (1,) * cfg.dims)
    return state


def test_torch_roundtrip_shapes_and_forward(tmp_path):
    model = _tiny_model()
    state = _fake_reference_state(model)
    path = str(tmp_path / "model_checkpoint_100")
    torch.save(state, path)

    loaded = load_torch_state_dict(path)
    params = torch_to_params(loaded, model)

    # shapes must match a natively-initialised tree exactly
    ref = model.init(jax.random.PRNGKey(0))
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes

    # and the model must run with converted params
    out = jax.jit(model.apply)(params, jnp.zeros((1, 12, 48, 48, 1)))
    assert out["3d_affs"].shape == (1, 4, 8, 8, 3)
    assert np.isfinite(np.asarray(out["3d_affs"])).all()


def test_lightning_prefix_stripped(tmp_path):
    model = _tiny_model()
    state = {f"model.{k}": v for k, v in _fake_reference_state(model).items()}
    path = str(tmp_path / "model_1000.ckpt")
    torch.save({"state_dict": state}, path)
    loaded = load_torch_state_dict(path)
    params = torch_to_params(loaded, model)
    assert "head_3d_affs" in params


def test_wrong_checkpoint_raises(tmp_path):
    model = _tiny_model()
    path = str(tmp_path / "bad")
    torch.save({"unrelated.weight": torch.zeros(3)}, path)
    with pytest.raises(KeyError):
        torch_to_params(load_torch_state_dict(path), model)


def test_missing_bias_treated_as_zero(tmp_path):
    """A bias=False conv (weight present, bias absent) converts with a
    zero bias instead of a raw KeyError."""
    model = _tiny_model()
    state = _fake_reference_state(model)
    del state["unet.l_conv.0.conv_pass.0.bias"]
    params = torch_to_params(
        {k: v.numpy() for k, v in state.items()}, model
    )
    b = params["unet"]["l_conv"][0]["layers"][0]["b"]
    assert (b == 0).all()


def test_transposed_upsample_parity():
    """constant_upsample=False: converted ConvTranspose weights must
    reproduce torch's transposed-conv output exactly."""
    from bootstrapper_tpu.models.convert_torch import _to_jax_conv_transpose
    from bootstrapper_tpu.models.unet import upsample_transposed

    torch.manual_seed(0)
    m = torch.nn.ConvTranspose3d(3, 5, kernel_size=(1, 2, 2),
                                 stride=(1, 2, 2))
    x = torch.randn(1, 3, 4, 6, 6)
    ref = m(x).detach().numpy()
    wj = _to_jax_conv_transpose(m.weight.detach().numpy())
    y = upsample_transposed(
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1))),
        jnp.asarray(wj), jnp.asarray(m.bias.detach().numpy()),
        (1, 2, 2), compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 4, 1, 2, 3)), ref,
        rtol=1e-5, atol=1e-5,
    )


def test_transposed_upsample_keys_resolve():
    """constant_upsample=False checkpoints map unet.r_up.{h}.{lvl}.up.*
    (regression: the key was malformed and the branch unusable)."""
    model = _tiny_model()
    nc = dict(model.net_config)
    nc["constant_upsample"] = False
    model = Model(nc)
    state = _fake_reference_state(model)
    cfg = model.unet_config
    rng = np.random.default_rng(1)
    nf, inc = cfg.num_fmaps, cfg.fmap_inc_factor
    for level in range(cfg.num_levels - 1):
        ch = nf * inc ** (level + 1)
        k = tuple(cfg.downsample_factors[level])
        state[f"unet.r_up.0.{level}.up.weight"] = torch.tensor(
            rng.normal(0, 0.1, (ch, ch, *k)).astype(np.float32)
        )
        state[f"unet.r_up.0.{level}.up.bias"] = torch.tensor(
            rng.normal(0, 0.1, (ch,)).astype(np.float32)
        )
    params = torch_to_params(
        {k: v.numpy() for k, v in state.items()}, model
    )
    up = params["unet"]["r_up"][0][0]
    assert up is not None and up["w"].shape == (1, 2, 2, 4, 4)
