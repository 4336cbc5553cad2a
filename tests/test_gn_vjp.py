"""Custom GroupNorm VJP (models/nn.py:_make_gn_custom) vs jax autodiff.

The custom backward restructures the GN(+FiLM+SiLU) gradient into one
reduction pass + one elementwise pass (the autodiff lowering is ~20x off
HBM bandwidth on TPU, tools/profile_train.py). These tests pin exactness:
forward bit-identical, gradients equal to the autodiff reference within
f32 roundoff, for every (fold, film, silu, dtype) combination the UNet
uses.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddpm3d_tpu.models import nn as M


def _run(mode, monkeypatch, *, dtype, fold, film, silu, seed=0):
    monkeypatch.setenv("DDPM3D_GN_VJP", mode)
    rng = np.random.RandomState(seed)
    B, D, H, W, C = 2, 4, 6, 6, 64
    if fold:
        x = jnp.asarray(rng.randn(B * D, H, W, C), dtype)
        fold_batch = B
    else:
        x = jnp.asarray(rng.randn(B, D, H, W, C), dtype)
        fold_batch = None
    scale = jnp.asarray(rng.randn(C), jnp.float32)
    bias = jnp.asarray(rng.randn(C), jnp.float32)
    fs = jnp.asarray(rng.randn(B, C) * 0.1, jnp.float32) if film else None
    fh = jnp.asarray(rng.randn(B, C) * 0.1, jnp.float32) if film else None
    ct = jnp.asarray(rng.randn(*x.shape), dtype)  # fixed cotangent

    args = (x, scale, bias) + ((fs, fh) if film else ())

    def f(*a):
        x_, s_, b_ = a[:3]
        fs_, fh_ = (a[3], a[4]) if film else (None, None)
        return M.group_norm_f32(
            x_, s_, b_, film_scale=fs_, film_shift=fh_,
            apply_silu=silu, fold_batch=fold_batch,
        )

    out, vjp = jax.vjp(f, *args)
    grads = vjp(ct)
    return np.asarray(out, np.float32), [np.asarray(g, np.float32) for g in grads]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("fold", [True, False])
@pytest.mark.parametrize("film", [True, False])
@pytest.mark.parametrize("silu", [True, False])
def test_custom_vjp_matches_autodiff(monkeypatch, dtype, fold, film, silu):
    out_a, g_a = _run("auto", monkeypatch, dtype=dtype, fold=fold,
                      film=film, silu=silu)
    out_c, g_c = _run("custom", monkeypatch, dtype=dtype, fold=fold,
                      film=film, silu=silu)
    np.testing.assert_array_equal(out_a, out_c)  # identical forward
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    assert len(g_a) == len(g_c)
    for i, (ga, gc) in enumerate(zip(g_a, g_c)):
        scale_ref = max(1.0, float(np.abs(ga).max()))
        np.testing.assert_allclose(
            gc, ga, atol=tol * scale_ref, rtol=tol,
            err_msg=f"grad arg {i} (fold={fold} film={film} silu={silu})",
        )


def test_custom_vjp_under_remat(monkeypatch):
    """The train path wraps GN sites in jax.checkpoint with a
    save_only_these_names('gn_stats') policy — the custom VJP must compose
    with it (checkpoint replays the custom fwd, then calls the custom bwd)."""
    monkeypatch.setenv("DDPM3D_GN_VJP", "custom")
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 6, 6, 64), jnp.float32)
    scale = jnp.asarray(rng.randn(64), jnp.float32)

    def loss(x, scale):
        f = lambda x_: M.group_norm_f32(
            x_, scale, jnp.zeros(64), apply_silu=True, fold_batch=2
        )
        f = jax.checkpoint(
            f,
            policy=jax.checkpoint_policies.save_only_these_names("gn_stats"),
        )
        return jnp.sum(f(x) ** 2)

    g_c = jax.grad(loss)(x, scale)
    monkeypatch.setenv("DDPM3D_GN_VJP", "auto")
    g_a = jax.grad(loss)(x, scale)
    np.testing.assert_allclose(
        np.asarray(g_c), np.asarray(g_a), atol=1e-4, rtol=1e-5
    )
