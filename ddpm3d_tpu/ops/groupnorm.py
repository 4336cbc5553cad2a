"""Pallas TPU kernels: fused GroupNorm(+affine)(+FiLM)(+SiLU).

The UNet's per-block chain GN -> affine -> (1+scale)*h + shift -> SiLU
(reference unet.py:248-252) is HBM-bandwidth-bound at 96^3 resolution. This
kernel computes it in exactly two streaming passes over the activation
(one stats pass, one fused apply pass), with the FiLM conditioning and SiLU
folded into the apply pass so no intermediate tensor round-trips HBM.

Measured on v5e at 96^3 x 128ch (in-scan, bf16): XLA's own fusion of the
reference chain runs at 4.07 ms/op; this two-pallas-call version at
5.39 ms/op — XLA already emits a well-fused two-pass program, so the model
path keeps the XLA implementation and this kernel stays as an ops-library
capability (a single-pass revisit/conv-epilogue fusion is the remaining
headroom; both are future work).

Layout: x is [N, C] rows-by-channels (callers flatten [B, D, H, W, C] to
[B, DHW, C] and vmap over B, or pass the flattened view with per-batch
stats). Groups split the channel axis contiguously, matching torch
GroupNorm semantics (nn.py:17-19 / models/nn.py:group_norm_f32).

Use :func:`fused_group_norm_silu` — it dispatches to the Pallas path on TPU
and to the pure-JAX reference implementation elsewhere (or when shapes
don't tile cleanly).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas import is TPU/CPU-safe; kernels only run on TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

NORM_GROUPS = 32


def reference_group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    film_scale: Optional[jnp.ndarray] = None,
    film_shift: Optional[jnp.ndarray] = None,
    num_groups: int = NORM_GROUPS,
    eps: float = 1e-5,
    apply_silu: bool = True,
) -> jnp.ndarray:
    """Pure-JAX reference: GN (f32 stats) -> affine -> FiLM -> SiLU.

    x: [B, N, C]; scale/bias: [C]; film_*: [B, C] broadcast over N.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    B, N, C = xf.shape
    G = num_groups
    xg = xf.reshape(B, N, G, C // G)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    h = xg.reshape(B, N, C) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if film_scale is not None:
        h = h * (1.0 + film_scale.astype(jnp.float32)[:, None, :])
    if film_shift is not None:
        h = h + film_shift.astype(jnp.float32)[:, None, :]
    if apply_silu:
        h = h * jax.nn.sigmoid(h)
    return h.astype(orig_dtype)


def _stats_kernel(x_ref, sum_ref, sq_ref, *, n_blocks):
    """Accumulate per-channel sums over row blocks (grid dim 1 sequential)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    xb = x_ref[:].astype(jnp.float32)
    sum_ref[:] += jnp.sum(xb, axis=0, keepdims=True)
    sq_ref[:] += jnp.sum(xb * xb, axis=0, keepdims=True)


def _apply_kernel(
    x_ref, mean_ref, rstd_ref, gamma_ref, beta_ref, film_s_ref, film_b_ref,
    out_ref, *, apply_silu, has_film,
):
    x = x_ref[:].astype(jnp.float32)
    h = (x - mean_ref[:]) * rstd_ref[:]
    h = h * gamma_ref[:] + beta_ref[:]
    if has_film:
        h = h * (1.0 + film_s_ref[:]) + film_b_ref[:]
    if apply_silu:
        h = h * jax.nn.sigmoid(h)
    out_ref[:] = h.astype(out_ref.dtype)


def _pallas_gn_silu_one(
    x, scale, bias, film_scale, film_shift, num_groups, eps, apply_silu,
    block_rows,
):
    """One batch element: x [N, C]."""
    N, C = x.shape
    G = num_groups
    Cg = C // G
    n_blocks = N // block_rows

    # pass 1: per-channel sums
    sums, sqs = pl.pallas_call(
        functools.partial(_stats_kernel, n_blocks=n_blocks),
        grid=(1, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (block_rows, C), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
    )(x)

    # group-reduce the channel sums on the host graph (tiny)
    gsum = sums.reshape(G, Cg).sum(axis=1)
    gsq = sqs.reshape(G, Cg).sum(axis=1)
    cnt = N * Cg
    mean_g = gsum / cnt
    var_g = gsq / cnt - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, Cg).reshape(1, C)
    rstd_c = jnp.repeat(rstd_g, Cg).reshape(1, C)

    has_film = film_scale is not None
    fs = (film_scale if has_film else jnp.zeros((C,))).astype(jnp.float32)
    fb = (film_shift if has_film else jnp.zeros((C,))).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _apply_kernel, apply_silu=apply_silu, has_film=has_film
        ),
        grid=(1, n_blocks),
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, C), lambda i, j: (j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, C), x.dtype),
    )(
        x, mean_c, rstd_c,
        scale.astype(jnp.float32).reshape(1, C),
        bias.astype(jnp.float32).reshape(1, C),
        fs.reshape(1, C), fb.reshape(1, C),
    )
    return out


def fused_group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    film_scale: Optional[jnp.ndarray] = None,
    film_shift: Optional[jnp.ndarray] = None,
    num_groups: int = NORM_GROUPS,
    eps: float = 1e-5,
    apply_silu: bool = True,
    block_rows: int = 512,
) -> jnp.ndarray:
    """Fused GN(+FiLM)(+SiLU) over x [B, N, C]; Pallas on TPU when shapes
    tile, pure JAX otherwise. Differentiable only on the fallback path —
    use inside inference/sampling or wrap with custom_vjp before training
    use."""
    B, N, C = x.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    tiles = (
        _HAS_PALLAS
        and on_tpu
        and C % num_groups == 0
        and C % 128 == 0
        and N % block_rows == 0
    )
    if not tiles:
        return reference_group_norm_silu(
            x, scale, bias, film_scale, film_shift, num_groups, eps, apply_silu
        )
    fn = functools.partial(
        _pallas_gn_silu_one,
        num_groups=num_groups, eps=eps, apply_silu=apply_silu,
        block_rows=block_rows,
    )
    if film_scale is None:
        return jax.vmap(lambda xx: fn(xx, scale, bias, None, None))(x)
    return jax.vmap(
        lambda xx, fs, fb: fn(xx, scale, bias, fs, fb)
    )(x, film_scale, film_shift)
