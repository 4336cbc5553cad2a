"""Tests for the torch checkpoint EXPORTER (utils/torch_export.py) — the
inverse of the importer: train here, serve on the reference.

The definitive check loads an exported state dict into the live reference
model (strict=True) and compares full forward outputs on matched inputs.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.models import SuperResModel
from ddpm3d_tpu.utils.torch_export import (
    flax_path_to_torch_key,
    params_to_torch_state_dict,
)
from ddpm3d_tpu.utils.torch_import import (
    torch_key_to_flax_path,
    torch_state_dict_to_params,
)

TINY_TORCH = dict(
    model_channels=32,
    out_channels=2,
    num_res_blocks=1,
    attention_resolutions=(),
    channel_mult=(1, 2),
    dims=3,
    use_scale_shift_norm=True,
    resblock_updown=True,
)
TINY = dict(TINY_TORCH, middle_attention=False)


def test_path_mapping_roundtrip():
    """flax->torch->flax name mapping is the identity on representative
    keys from every module family."""
    keys = [
        "time_embed.0.weight",
        "time_embed.2.bias",
        "input_blocks.0.0.weight",
        "input_blocks.1.0.in_layers.0.weight",
        "input_blocks.1.0.in_layers.2.weight",
        "input_blocks.2.1.emb_layers.1.bias",
        "input_blocks.3.0.skip_connection.weight",
        "middle_block.0.out_layers.3.weight",
        "output_blocks.4.1.conv.weight",
        "output_blocks.0.0.out_layers.0.bias",
        "out.0.weight",
        "out.2.bias",
        "encoder.input_blocks.1.0.in_layers.0.weight",
        "conv_down.3.weight",
    ]
    for key in keys:
        flax_path = torch_key_to_flax_path(key)
        # apply the importer's leaf renaming the same way the importer does
        from ddpm3d_tpu.utils.torch_import import _leaf_name

        flax_path = flax_path[:-1] + (_leaf_name(flax_path, flax_path[-1]),)
        assert flax_path_to_torch_key(flax_path) == key, key


def test_state_dict_roundtrip_exact():
    """import(export(import(sd))) == import(sd) array-for-array, and the
    exported key set equals the reference's."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from guided_diffusion.unet import SuperResModel_noatt

    tm = SuperResModel_noatt(
        image_size=8, in_channels=1, **TINY_TORCH,
    )
    sd = tm.state_dict()
    params = torch_state_dict_to_params(sd, wrap_superres=True)
    sd2 = params_to_torch_state_dict({"params": params})
    assert set(sd2.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(
            sd2[k], sd[k].detach().cpu().numpy(), err_msg=k
        )


def test_exported_checkpoint_serves_on_reference():
    """Export a flax-initialized model and run it under the LIVE reference
    with strict state-dict loading: outputs must match our forward."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from guided_diffusion.unet import SuperResModel_noatt

    rng = np.random.default_rng(11)
    jm = SuperResModel(in_channels=1, **TINY)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 1)), jnp.float32)
    params = jm.init(
        jax.random.key(2), x0, jnp.zeros((1,), jnp.int32), low_res=x0
    )["params"]
    # the head conv is zero-initialized on both sides (reference zero_module)
    # — perturb every leaf so the forward comparison is nontrivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )

    sd = params_to_torch_state_dict({"params": params})
    tm = SuperResModel_noatt(image_size=8, in_channels=1, **TINY_TORCH)
    tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    tm.eval()

    x = rng.normal(size=(2, 1, 4, 8, 8)).astype(np.float32)  # NCDHW
    low = rng.normal(size=(2, 1, 4, 8, 8)).astype(np.float32)
    t = np.array([3, 11], dtype=np.int64)

    with torch.no_grad():
        ref_out = tm(
            torch.from_numpy(x), torch.from_numpy(t),
            low_res=torch.from_numpy(low),
        ).numpy()
    ours = jm.apply(
        {"params": params},
        jnp.moveaxis(jnp.asarray(x), 1, -1),
        jnp.asarray(t),
        low_res=jnp.moveaxis(jnp.asarray(low), 1, -1),
    )
    ours_nchw = np.moveaxis(np.asarray(ours), -1, 1)
    assert np.abs(ref_out).max() > 1e-3
    np.testing.assert_allclose(ours_nchw, ref_out, rtol=1e-4, atol=1e-5)


def test_save_torch_checkpoint(tmp_path):
    """save_torch_checkpoint writes a .pt that torch.load round-trips."""
    torch = pytest.importorskip("torch")
    from ddpm3d_tpu.utils.torch_export import save_torch_checkpoint

    rng = np.random.default_rng(5)
    jm = SuperResModel(in_channels=1, **TINY)
    x0 = jnp.zeros((1, 2, 8, 8, 1), jnp.float32)
    params = jm.init(
        jax.random.key(0), x0, jnp.zeros((1,), jnp.int32), low_res=x0
    )["params"]
    path = str(tmp_path / "model000000.pt")
    save_torch_checkpoint({"params": params}, path)
    sd = torch.load(path, map_location="cpu")
    assert "out.2.weight" in sd and "time_embed.0.weight" in sd
    # and the importer closes the loop
    back = torch_state_dict_to_params(sd, wrap_superres=True)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back["unet"])
    assert len(flat_a) == len(flat_b)
