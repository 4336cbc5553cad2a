"""NN primitives for the 3D diffusion UNet, NDHWC/TPU-native.

Clean-room equivalents of reference guided_diffusion/nn.py:
- sinusoidal timestep embedding (nn.py:103-121; cos-first ordering)
- GroupNorm(32) computed in float32 regardless of activation dtype
  (nn.py:17-19) — the fp32-islands-in-bf16 policy
- zero-initialised output convolutions (nn.py:68-74)
- conv/avg-pool dispatch for 1/2/3-D (nn.py:22-52)

Layout convention: channels-last ([B, spatial..., C]); the reference is
channels-first. All convolutions therefore use DHWIO kernels, which is the
layout XLA:TPU tiles directly onto the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

# Number of groups used by every normalization layer (reference nn.py:93-100).
NORM_GROUPS = 32


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal embeddings, [N] -> [N, dim]; cos first then sin
    (reference nn.py:103-121). Computed in float32."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def _gn_stats_mode() -> str:
    """GN stats algorithm: 'chanwise' (default) reduces over the spatial
    axes per channel, keeping C=128 on the VPU lanes; 'classic' is the
    two-pass E[(x-mu)^2] over the (..., G, Cg) view, which XLA lowers to a
    minor-axis (Cg=4) reduction running at ~1/6 of HBM bandwidth. Measured
    on v5e at the flagship 96^3 model: chanwise saves 22 ms/step
    (171.7 -> 149.7 ms). (Round 1 recorded the opposite ordering; that
    measurement was contaminated by ~26 ms/dispatch relay overhead.)"""
    import os

    return os.environ.get("DDPM3D_GN_STATS", "chanwise").lower()


def _group_stats(xf: jnp.ndarray, num_groups: int, eps: float = 1e-5):
    """Per-(batch, group) mean/var via per-CHANNEL reductions.

    Reducing (B, ..., G, Cg) over the minor Cg=4 axis wastes the VPU's 128
    lanes; reducing over the spatial axes per channel keeps C minor (measured
    3.59 vs 3.99 ms/op at 96^3x128 on v5e), then the (G, Cg) combine is on a
    tiny array. Variance via E[x^2]-mean^2, clamped at 0 against f32
    cancellation.
    Returns (mean_c, rstd_c) broadcast back to per-channel [B, C] arrays.
    """
    B = xf.shape[0]
    C = xf.shape[-1]
    Cg = C // num_groups
    spatial_axes = tuple(range(1, xf.ndim - 1))
    n = math.prod(xf.shape[1:-1]) * Cg
    s1 = jnp.sum(xf, axis=spatial_axes)        # [B, C]
    s2 = jnp.sum(xf * xf, axis=spatial_axes)   # [B, C]
    gs1 = s1.reshape(B, num_groups, Cg).sum(-1)
    gs2 = s2.reshape(B, num_groups, Cg).sum(-1)
    mean = gs1 / n
    var = jnp.maximum(gs2 / n - mean * mean, 0.0)
    mean_c = jnp.repeat(mean, Cg, axis=-1)
    rstd_c = jnp.repeat(jax.lax.rsqrt(var + eps), Cg, axis=-1)
    return mean_c, rstd_c


def channel_stats(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel (sum, sum-of-squares) over all spatial axes: [B, 2, C]
    f32. The quantity the fused conv kernel emits (ops/conv3d_fused.py) and
    :func:`fold_gn_affine` consumes."""
    xf = x.astype(jnp.float32)
    spatial_axes = tuple(range(1, xf.ndim - 1))
    s1 = jnp.sum(xf, axis=spatial_axes)
    s2 = jnp.sum(xf * xf, axis=spatial_axes)
    return jnp.stack([s1, s2], axis=1)


def fold_gn_affine(
    stats: jnp.ndarray,
    n_spatial: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = NORM_GROUPS,
    eps: float = 1e-5,
    film_scale: Optional[jnp.ndarray] = None,
    film_shift: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold GroupNorm (+ optional FiLM) into one per-channel affine (g, b)
    [B, C] f32, given per-channel stats [B, 2, C] and the spatial voxel
    count. ``y = x * g + b`` then equals :func:`group_norm_f32` — this is
    how consecutive fused convs chain normalization without re-reading
    activations."""
    B, _, C = stats.shape
    Cg = C // num_groups
    n = n_spatial * Cg
    s1 = stats[:, 0].reshape(B, num_groups, Cg).sum(-1)
    s2 = stats[:, 1].reshape(B, num_groups, Cg).sum(-1)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    mean_c = jnp.repeat(mean, Cg, axis=-1)
    rstd_c = jnp.repeat(jax.lax.rsqrt(var + eps), Cg, axis=-1)
    g = scale.astype(jnp.float32)[None] * rstd_c
    b = bias.astype(jnp.float32)[None] - mean_c * g
    if film_scale is not None:
        fs = 1.0 + film_scale.astype(jnp.float32)
        g = g * fs
        b = b * fs
    if film_shift is not None:
        b = b + film_shift.astype(jnp.float32)
    return g, b


def _gn_vjp_mode() -> str:
    """GN backward: 'auto' (default) is jax autodiff; 'custom' switches to
    the hand-derived VJP below ('custom-nobar' drops its optimization
    barrier). Measured verdict (v5e, flagship 96^3 train step): autodiff
    WINS — 479.7 ms/step vs 486.1 for either custom variant. The autodiff
    backward's scary-looking multi-output fusions are in fact near the
    VPU/bandwidth floor, and XLA additionally fuses the elementwise
    backward into conv fusions (the custom VJP forfeits ~26 ms of that,
    fusion(elementwise) 26.5 -> 0.4 but conv 364 -> 394). Isolated-site
    bench agrees: tools/gn_vjp_bench.py, auto 2.0 ms vs custom 2.7 ms for
    a 96^3x128 film+silu site. Kept as correctness-tested infrastructure
    (tests/test_gn_vjp.py) in case a future XLA regresses the fusion."""
    import os

    return os.environ.get("DDPM3D_GN_VJP", "auto").lower()


def _gn_affine(mean_c, rstd_c, scale, bias, film_scale, film_shift):
    """Per-(batch, channel) f32 affine (g, b) with y = xf*g + b equal to
    FiLM(GroupNorm(x)) — shared by the autodiff and custom-VJP paths."""
    g = scale.astype(jnp.float32)[None] * rstd_c
    b = bias.astype(jnp.float32)[None] - mean_c * g
    if film_scale is not None:
        fs = 1.0 + film_scale.astype(jnp.float32)
        g = g * fs
        b = b * fs
    if film_shift is not None:
        b = b + film_shift.astype(jnp.float32)
    return g, b


def _make_gn_custom(
    num_groups, eps, apply_silu, fold_batch, has_fs, has_fh, barrier=True
):
    """Build the custom-VJP GroupNorm(+FiLM+SiLU) for one static config.

    Residuals are the bf16 input plus the [B, C] stats — the backward
    recomputes y elementwise instead of saving it. Backward structure:
      pass 1 (reduction): P_c = sum(dy), Q_c = sum(dy * xf) per channel;
      pass 2 (elementwise): d_x = dy*g + c1 + 2*xf*c2 with per-group
      scalars c1/c2 derived from P, Q and the saved stats.
    An optimization_barrier between the passes stops XLA re-merging them
    into the pathological single fusion autodiff produces.
    """

    def stats(xf):
        B = fold_batch if fold_batch is not None else xf.shape[0]
        reps = xf.shape[0] // B
        C = xf.shape[-1]
        Cg = C // num_groups
        spatial_axes = tuple(range(1, xf.ndim - 1))
        n = math.prod(xf.shape[1:-1]) * Cg * reps
        s1 = jnp.sum(xf, axis=spatial_axes).reshape(B, reps, C).sum(1)
        s2 = jnp.sum(xf * xf, axis=spatial_axes).reshape(B, reps, C).sum(1)
        gs1 = s1.reshape(B, num_groups, Cg).sum(-1)
        gs2 = s2.reshape(B, num_groups, Cg).sum(-1)
        mean = gs1 / n
        var = jnp.maximum(gs2 / n - mean * mean, 0.0)
        mean_c = jnp.repeat(mean, Cg, axis=-1)
        rstd_c = jnp.repeat(jax.lax.rsqrt(var + eps), Cg, axis=-1)
        return mean_c, rstd_c, n

    def apply_out(xf, g, b, reps):
        gr = jnp.repeat(g, reps, axis=0) if reps > 1 else g
        br = jnp.repeat(b, reps, axis=0) if reps > 1 else b
        bshape = (gr.shape[0],) + (1,) * (xf.ndim - 2) + (xf.shape[-1],)
        y = xf * gr.reshape(bshape) + br.reshape(bshape)
        return y * jax.nn.sigmoid(y) if apply_silu else y

    def fwd_only(x, scale, bias, film_scale, film_shift):
        xf = x.astype(jnp.float32)
        mean_c, rstd_c, _ = stats(xf)
        g, b = _gn_affine(mean_c, rstd_c, scale, bias, film_scale, film_shift)
        reps = xf.shape[0] // mean_c.shape[0]
        return apply_out(xf, g, b, reps).astype(x.dtype)

    def fwd(x, scale, bias, film_scale, film_shift):
        xf = x.astype(jnp.float32)
        mean_c, rstd_c, _ = stats(xf)
        from jax.ad_checkpoint import checkpoint_name

        mean_c = checkpoint_name(mean_c, "gn_stats")
        rstd_c = checkpoint_name(rstd_c, "gn_stats")
        g, b = _gn_affine(mean_c, rstd_c, scale, bias, film_scale, film_shift)
        reps = xf.shape[0] // mean_c.shape[0]
        out = apply_out(xf, g, b, reps).astype(x.dtype)
        return out, (x, scale, bias, film_scale, film_shift, mean_c, rstd_c)

    def bwd(res, do):
        x, scale, bias, film_scale, film_shift, mean_c, rstd_c = res
        B, C = mean_c.shape
        reps = x.shape[0] // B
        Cg = C // num_groups
        spatial_axes = tuple(range(1, x.ndim - 1))
        n = math.prod(x.shape[1:-1]) * Cg * reps

        f = (
            1.0 + film_scale.astype(jnp.float32)
            if has_fs
            else jnp.ones((B, C), jnp.float32)
        )
        A = scale.astype(jnp.float32)[None] * f          # [B, C]
        gg = A * rstd_c                                  # [B, C]

        def dy_of(xf, dof, gg_r, bb_r):
            if not apply_silu:
                return dof
            bshape = (xf.shape[0],) + (1,) * (xf.ndim - 2) + (C,)
            y = xf * gg_r.reshape(bshape) + bb_r.reshape(bshape)
            sig = jax.nn.sigmoid(y)
            return dof * (sig * (1.0 + y * (1.0 - sig)))

        # bb only needed to recompute y for the SiLU derivative
        if apply_silu:
            bb = bias.astype(jnp.float32)[None] * f - mean_c * gg
            if has_fh:
                bb = bb + film_shift.astype(jnp.float32)
        else:
            bb = jnp.zeros((B, C), jnp.float32)
        gg_r = jnp.repeat(gg, reps, axis=0) if reps > 1 else gg
        bb_r = jnp.repeat(bb, reps, axis=0) if reps > 1 else bb

        xf = x.astype(jnp.float32)
        dof = do.astype(jnp.float32)
        dy = dy_of(xf, dof, gg_r, bb_r)

        # pass 1: the only two spatial reductions the math needs
        P_r = jnp.sum(dy, axis=spatial_axes)             # [rows, C]
        Q_r = jnp.sum(dy * xf, axis=spatial_axes)        # [rows, C]
        P = P_r.reshape(B, reps, C).sum(1)
        Q = Q_r.reshape(B, reps, C).sum(1)
        if barrier:
            P, Q = jax.lax.optimization_barrier((P, Q))

        # per-group scalars
        R_c = rstd_c * (Q - mean_c * P)                  # sum(dy * xhat)
        SA = (A * P).reshape(B, num_groups, Cg).sum(-1)
        SB = (A * Q).reshape(B, num_groups, Cg).sum(-1)
        mean_g = mean_c[:, ::Cg]
        rstd_g = rstd_c[:, ::Cg]
        d_rstd = SB - mean_g * SA
        d_var = -0.5 * rstd_g**3 * d_rstd
        d_mean = -rstd_g * SA - 2.0 * mean_g * d_var
        c1 = jnp.repeat(d_mean / n, Cg, axis=-1)         # [B, C]
        c2 = jnp.repeat(d_var / n, Cg, axis=-1)
        c1_r = jnp.repeat(c1, reps, axis=0) if reps > 1 else c1
        c2_r = jnp.repeat(c2, reps, axis=0) if reps > 1 else c2

        # pass 2: pure elementwise over (do, x)
        bshape = (xf.shape[0],) + (1,) * (xf.ndim - 2) + (C,)
        d_x = (
            dy * gg_r.reshape(bshape)
            + c1_r.reshape(bshape)
            + 2.0 * xf * c2_r.reshape(bshape)
        ).astype(x.dtype)

        d_scale = jnp.sum(f * R_c, axis=0).astype(scale.dtype)
        d_bias = jnp.sum(f * P, axis=0).astype(bias.dtype)
        d_fs = (
            (scale.astype(jnp.float32)[None] * R_c
             + bias.astype(jnp.float32)[None] * P).astype(film_scale.dtype)
            if has_fs
            else None
        )
        d_fh = P.astype(film_shift.dtype) if has_fh else None
        return d_x, d_scale, d_bias, d_fs, d_fh

    gn = jax.custom_vjp(fwd_only)
    gn.defvjp(fwd, bwd)
    return gn


_GN_CUSTOM_CACHE: dict = {}


def _gn_custom(
    num_groups, eps, apply_silu, fold_batch, has_fs, has_fh, barrier=True
):
    key = (num_groups, eps, apply_silu, fold_batch, has_fs, has_fh, barrier)
    if key not in _GN_CUSTOM_CACHE:
        _GN_CUSTOM_CACHE[key] = _make_gn_custom(*key)
    return _GN_CUSTOM_CACHE[key]


def fold_bd(x: jnp.ndarray) -> jnp.ndarray:
    """[B, D, H, W, C] -> [(B*D), H, W, C] (free reshape, row-major)."""
    B, D = x.shape[:2]
    return x.reshape((B * D,) + x.shape[2:])


def unfold_bd(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """[(B*D), H, W, C] -> [B, D, H, W, C]."""
    BD = x.shape[0]
    return x.reshape((batch, BD // batch) + x.shape[1:])


def group_norm_f32(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = NORM_GROUPS,
    eps: float = 1e-5,
    film_scale: Optional[jnp.ndarray] = None,
    film_shift: Optional[jnp.ndarray] = None,
    apply_silu: bool = False,
    fold_batch: Optional[int] = None,
) -> jnp.ndarray:
    """GroupNorm over the trailing channel axis, computed in float32 and cast
    back to the input dtype (reference GroupNorm32, nn.py:17-19).

    x is [B, ..., C]. Statistics reduce over all non-batch spatial axes and
    the within-group channel slice, matching torch GroupNorm semantics.

    The optional FiLM conditioning (film_*: [B, C]) and SiLU fold into the
    single per-channel affine applied in the normalize pass — the fused form
    of the reference's scale-shift-norm chain (unet.py:248-252), saving full
    HBM round-trips at 96^3 resolution.

    ``fold_batch=B`` declares x as a B*D-FOLDED volume [(B*D), H, W, C]
    (the network-wide 4-D layout, ops/conv3d.py:conv3d_folded): statistics
    additionally aggregate over each batch's D rows and the affine repeats
    back to the folded axis — numerically identical to the 5-D form.
    """
    orig_dtype = x.dtype
    C = x.shape[-1]
    assert C % num_groups == 0, f"channels {C} not divisible by {num_groups}"
    if _gn_vjp_mode().startswith("custom") and (
        fold_batch is not None or _gn_stats_mode() == "chanwise"
    ):
        # identical forward; hand-derived backward (see _make_gn_custom)
        gn = _gn_custom(
            num_groups, eps, apply_silu, fold_batch,
            film_scale is not None, film_shift is not None,
            barrier=_gn_vjp_mode() != "custom-nobar",
        )
        return gn(x, scale, bias, film_scale, film_shift)
    xf = x.astype(jnp.float32)
    if fold_batch is not None:
        reps = xf.shape[0] // fold_batch
        spatial_axes = tuple(range(1, xf.ndim - 1))
        Cg = C // num_groups
        n = math.prod(xf.shape[1:-1]) * Cg * reps
        s1 = jnp.sum(xf, axis=spatial_axes).reshape(fold_batch, reps, C).sum(1)
        s2 = jnp.sum(xf * xf, axis=spatial_axes).reshape(
            fold_batch, reps, C
        ).sum(1)
        gs1 = s1.reshape(fold_batch, num_groups, Cg).sum(-1)
        gs2 = s2.reshape(fold_batch, num_groups, Cg).sum(-1)
        mean = gs1 / n
        var = jnp.maximum(gs2 / n - mean * mean, 0.0)
        mean_c = jnp.repeat(mean, Cg, axis=-1)
        rstd_c = jnp.repeat(jax.lax.rsqrt(var + eps), Cg, axis=-1)
        from jax.ad_checkpoint import checkpoint_name

        mean_c = checkpoint_name(mean_c, "gn_stats")
        rstd_c = checkpoint_name(rstd_c, "gn_stats")
    elif _gn_stats_mode() == "chanwise":
        mean_c, rstd_c = _group_stats(xf, num_groups, eps)
        # Named so the remat policy can SAVE these [B,C] scalars instead of
        # re-running the full spatial reduction in the backward pass
        # (save_only_these_names("gn_stats") in models/unet.py:_cfg).
        from jax.ad_checkpoint import checkpoint_name

        mean_c = checkpoint_name(mean_c, "gn_stats")
        rstd_c = checkpoint_name(rstd_c, "gn_stats")
    else:
        # classic two-pass E[(x-mu)^2] over the (..., G, Cg) view; kept as a
        # fallback (DDPM3D_GN_STATS=classic). Slower on TPU: XLA lowers the
        # minor-axis Cg reduction far below HBM bandwidth (see
        # _gn_stats_mode).
        gshape = xf.shape[:-1] + (num_groups, C // num_groups)
        xg = xf.reshape(gshape)
        red = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean = xg.mean(axis=red, keepdims=True)
        var = ((xg - mean) ** 2).mean(axis=red, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        B = xf.shape[0]
        Cg = C // num_groups
        mean_c = jnp.repeat(mean.reshape(B, num_groups), Cg, axis=-1)
        rstd_c = jnp.repeat(rstd.reshape(B, num_groups), Cg, axis=-1)
    # fold GN affine (+ optional FiLM) into one per-channel g,b
    g = scale.astype(jnp.float32)[None] * rstd_c              # [B, C]
    b = bias.astype(jnp.float32)[None] - mean_c * g
    if film_scale is not None:
        fs = 1.0 + film_scale.astype(jnp.float32)
        g = g * fs
        b = b * fs
    if film_shift is not None:
        b = b + film_shift.astype(jnp.float32)
    if fold_batch is not None:
        # broadcast the per-batch affine back over each batch's D rows
        reps = xf.shape[0] // fold_batch
        g = jnp.repeat(g, reps, axis=0)
        b = jnp.repeat(b, reps, axis=0)
    bshape = (g.shape[0],) + (1,) * (xf.ndim - 2) + (C,)
    out = xf * g.reshape(bshape) + b.reshape(bshape)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(orig_dtype)


class GroupNorm32(fnn.Module):
    """Param-holding wrapper over :func:`group_norm_f32`. The optional FiLM
    args fuse the reference's scale-shift-norm (+SiLU) chain into the
    normalize pass; param names stay scale/bias so checkpoints are identical
    either way.

    With ``fold_only=True`` (fused-conv path) the call returns the folded
    per-channel affine (g, b) from ``stats`` instead of applying it — the
    normalize then happens inside the consumer conv kernel's prologue."""

    num_groups: int = NORM_GROUPS
    eps: float = 1e-5

    @fnn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        film_scale: Optional[jnp.ndarray] = None,
        film_shift: Optional[jnp.ndarray] = None,
        apply_silu: bool = False,
        stats: Optional[jnp.ndarray] = None,
        fold_only: bool = False,
        fold_batch: Optional[int] = None,
    ):
        C = x.shape[-1]
        scale = self.param("scale", fnn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (C,), jnp.float32)
        if fold_only:
            if stats is None:
                stats = channel_stats(x)
            return fold_gn_affine(
                stats, math.prod(x.shape[1:-1]), scale, bias,
                self.num_groups, self.eps,
                film_scale=film_scale, film_shift=film_shift,
            )
        return group_norm_f32(
            x, scale, bias, self.num_groups, self.eps,
            film_scale=film_scale, film_shift=film_shift,
            apply_silu=apply_silu, fold_batch=fold_batch,
        )


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def conv_nd(
    dims: int,
    features: int,
    kernel_size: int,
    stride=1,
    padding=None,
    use_bias: bool = True,
    zero_init: bool = False,
    dtype=None,
    name: Optional[str] = None,
    fold_batch: Optional[int] = None,
    upsample: bool = False,
) -> fnn.Conv:
    """N-D convolution (channels-last). ``zero_init`` gives the reference's
    zero_module behavior for output heads (nn.py:68-74).

    Padding defaults to explicit symmetric k//2 per spatial dim — torch's
    ``padding=k//2`` semantics. This matters for strided convs: XLA "SAME"
    pads (0,1) for stride 2 on even extents, shifting the sampling grid off
    the reference's (unet.py:129-133 uses padding=1).

    ``fold_batch=B`` (dims==3 only) builds the module for B*D-folded 4-D
    activations (ops/conv3d.py:Conv3DFolded); params stay identical."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * dims
    if isinstance(stride, int):
        stride = (stride,) * dims
    if padding is None:
        padding = tuple((k // 2, k // 2) for k in kernel_size)
    kernel_init = (
        fnn.initializers.zeros if zero_init else default_conv_init()
    )
    bias_init = fnn.initializers.zeros
    if dims == 3 and fold_batch is not None:
        from ..ops.conv3d import Conv3DFolded

        return Conv3DFolded(
            features=features,
            batch=fold_batch,
            kernel_size=tuple(kernel_size),
            strides=tuple(stride),
            padding=tuple(padding),
            use_bias=use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=dtype,
            param_dtype=jnp.float32,
            name=name,
            upsample=upsample,
        )
    assert not upsample, "upsample-conv fusion is folded-layout only"
    if (
        dims == 3
        and max(kernel_size) > 1
        and stride[0] == 1
        and _conv3d_decomposed_enabled()
    ):
        # Depth-decomposed lowering: ~1.3x faster on the TPU MXU than the
        # native 3-D conv at this model's shapes (see ops/conv3d.py).
        from ..ops.conv3d import Conv3D

        return Conv3D(
            features=features,
            kernel_size=tuple(kernel_size),
            strides=tuple(stride),
            padding=tuple(padding),
            use_bias=use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=dtype,
            param_dtype=jnp.float32,
            name=name,
        )
    return fnn.Conv(
        features=features,
        kernel_size=tuple(kernel_size),
        strides=tuple(stride),
        padding=padding,
        use_bias=use_bias,
        kernel_init=kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _conv3d_decomposed_enabled() -> bool:
    """Conv3D lowering policy: env DDPM3D_CONV3D in {auto, decomposed,
    native}; auto enables the decomposed path on TPU backends."""
    import os

    mode = os.environ.get("DDPM3D_CONV3D", "auto").lower()
    if mode == "decomposed":
        return True
    if mode == "native":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class ConvParams(fnn.Module):
    """Declares a conv's kernel/bias params WITHOUT applying the op, with
    exactly :func:`conv_nd`'s names, shapes and initializers — so the fused
    Pallas conv path (ops/conv3d_fused.py) shares checkpoints bit-for-bit
    with the XLA modules. ``__call__(in_ch)`` returns (kernel, bias)."""

    features: int
    kernel_size: Tuple[int, ...] = (3, 3, 3)
    use_bias: bool = True
    zero_init: bool = False

    @fnn.compact
    def __call__(self, in_ch: int):
        kernel_init = (
            fnn.initializers.zeros if self.zero_init else default_conv_init()
        )
        kernel = self.param(
            "kernel", kernel_init,
            tuple(self.kernel_size) + (in_ch, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", fnn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        return kernel, bias


def default_conv_init() -> Callable:
    """Kaiming-uniform fan-in (torch Conv default), so fresh trainings start
    in the same regime as the reference."""

    def init(key, shape, dtype=jnp.float32):
        # shape is (*kernel, in, out) in flax; fan_in = prod(kernel) * in
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense(
    features: int, zero_init: bool = False, dtype=None, name=None
) -> fnn.Dense:
    kernel_init = (
        fnn.initializers.zeros
        if zero_init
        else fnn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    )
    return fnn.Dense(
        features=features,
        kernel_init=kernel_init,
        bias_init=fnn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def avg_pool_nd(x: jnp.ndarray, window: Sequence[int]) -> jnp.ndarray:
    """Average pooling with window == stride (reference nn.py:42-52 usage)."""
    window = tuple(window)
    dims = (1,) + window + (1,)
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, dims, dims, "VALID"
    ) * (1.0 / math.prod(window))


def upsample_nearest_hw(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest ×2 upsampling on the *trailing two spatial* axes only.

    For 3-D volumes [B, D, H, W, C] this doubles H and W and preserves D —
    the reference's anisotropic upsample (unet.py:102-105). For 2-D
    [B, H, W, C] it doubles both (matching F.interpolate scale_factor=2).
    """
    if x.ndim == 5:
        x = jnp.repeat(x, 2, axis=2)
        x = jnp.repeat(x, 2, axis=3)
        return x
    if x.ndim == 4:
        x = jnp.repeat(x, 2, axis=1)
        x = jnp.repeat(x, 2, axis=2)
        return x
    if x.ndim == 3:  # 1-D [B, L, C]
        return jnp.repeat(x, 2, axis=1)
    raise ValueError(f"unsupported rank {x.ndim}")


def downsample_stride(ndim_spatial: int) -> Tuple[int, ...]:
    """The anisotropic stride: (1, 2, 2) for 3-D — the leading spatial axis
    (depth/Z) is never downsampled (reference unet.py:129)."""
    if ndim_spatial == 3:
        return (1, 2, 2)
    return (2,) * ndim_spatial


def update_ema(ema_params, new_params, rate: float):
    """EMA pytree update: ema = rate*ema + (1-rate)*new (reference nn.py:55-65)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + p.astype(e.dtype) * (1.0 - rate),
        ema_params,
        new_params,
    )


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.mean(axis=tuple(range(1, x.ndim)))
