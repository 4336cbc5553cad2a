"""3-D diffusion UNet in Flax, NDHWC, with the reference's exact topology.

Clean-room TPU-first rebuild of guided_diffusion/unet.py. Key reproduced
behaviors (each load-bearing for checkpoint/output compatibility):

- **Anisotropic pyramid**: Downsample uses stride (1,2,2) and Upsample
  doubles only H,W for 3-D inputs — depth/Z is never resampled
  (reference unet.py:102-105, 129). A 96^3 patch flows as 96x96^2,
  96x48^2, 96x24^2, 96x12^2, 96x6^2.
- **Pair-pop decoder** wiring, computed by :mod:`ddpm3d_tpu.models.plan`
  (reference unet.py:618-663).
- FiLM scale-shift norm with (1+scale) gain, zero-init output convs,
  fp32 GroupNorm islands, fp32 attention softmax (unet.py:236-256, 352).
- Model families: UNetModel (optional middle attention — ``_noatt`` is
  ``middle_attention=False``, unet.py:720-1044), SuperResModel wrappers
  concatenating the conditioner (unet.py:1655-1694), EncoderUNetModel
  classifier with pool heads (unet.py:1984-2176).

Layout: activations are [B, D, H, W, C]; the reference uses [B, C, D, H, W].
Compute dtype is configurable (bf16 torso on TPU replaces the reference's
fp16+loss-scaling, fp16_util.py); params are always fp32.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from . import nn as prim
from .plan import (
    AttnSpec,
    ConvSpec,
    DownSpec,
    ResSpec,
    UNetPlan,
    UpSpec,
    plan_unet,
)


def _fold_enabled() -> bool:
    """Network-wide B*D-folded activation layout (ops/conv3d.py:
    conv3d_folded): every interior activation is 4-D [(B*D), H, W, C], so
    XLA's layout assignment never sees 5-D tensors (measured round 2: 5-D
    batch>1 activations flip between (2,128)/(8,128) tilings, inserting
    copies worth ~3x the step). DDPM3D_FOLD in {auto (default, on), 1, 0}."""
    import os

    return os.environ.get("DDPM3D_FOLD", "auto").lower() in ("auto", "1")


def _phase_up_enabled() -> bool:
    """Phase-decomposed upsample-conv on the folded layout (ops/phase_up.py):
    conv(nearest_up2(x)) as four 2x2 phase convs on the LOW-RES input —
    exact algebra, 2.25x fewer MACs, no materialised 4x activation.
    Measured 2.2x faster per up conv on v5e. DDPM3D_PHASE_UP in
    {auto (default, on), 1, 0}."""
    import os

    return os.environ.get("DDPM3D_PHASE_UP", "auto").lower() in ("auto", "1")


def _remat_max_ds() -> int:
    """With ``use_checkpoint``, only ResBlocks at downsample rate
    <= this value rematerialize; deeper (smaller) blocks save their
    activations. Default 2 covers the 96^2 and 48^2 levels whose
    activations (226/57 MB each) cannot all be saved in 16 GB HBM;
    the ds>=4 levels cost ~1.5 GB saved and ~46 ms/step recomputed.
    DDPM3D_REMAT_DS=huge value restores uniform remat."""
    import os

    try:
        return int(os.environ.get("DDPM3D_REMAT_DS", "2"))
    except ValueError:
        return 2


def _fused_mode() -> str:
    """Fused ResBlock conv path (ops/conv3d_fused.py): DDPM3D_FUSED=1
    enables it on TPU (compiled Pallas); DDPM3D_FUSED=interpret runs the
    kernel in interpret mode on any backend (tests). Returns
    'off' | 'on' | 'interpret'."""
    import os

    v = os.environ.get("DDPM3D_FUSED", "0").lower()
    if v == "interpret":
        return "interpret"
    if v != "1":
        return "off"
    try:
        if jax.default_backend() != "tpu":
            return "off"
        dev = jax.config.jax_default_device
        if dev is not None and getattr(dev, "platform", "tpu") != "tpu":
            return "off"
    except Exception:  # pragma: no cover
        return "off"
    return "on"


class ResBlock(fnn.Module):
    """Residual block with FiLM timestep conditioning and optional in-block
    up/down resampling (reference unet.py:143-256).

    With ``fused=True`` (inference, TPU) both convs run through the fused
    Pallas kernel: the GroupNorm/FiLM/SiLU prologue and the skip add happen
    inside the conv, and each conv emits per-channel stats that fold the
    NEXT GroupNorm into a [C]-sized coefficient computation. ``x_stats``
    carries those stats in; the call then returns ``(out, out_stats)``."""

    out_ch: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: Any = jnp.float32
    fused: bool = False
    # B*D-folded 4-D activations: the true batch size (None = unfolded 5-D)
    fold_batch: Optional[int] = None

    def _fusable(self, x, train) -> bool:
        from ..ops.conv3d_fused import conv3d_fused_applicable

        in_ch = x.shape[-1]
        return (
            self.fused
            and not train
            and not self.up
            and not self.down
            and self.use_scale_shift_norm
            and self.dropout == 0.0
            and x.ndim == 5
            and conv3d_fused_applicable(
                x.shape, (3, 3, 3, in_ch, self.out_ch), x.dtype)
            and conv3d_fused_applicable(
                x.shape[:-1] + (self.out_ch,),
                (3, 3, 3, self.out_ch, self.out_ch), x.dtype)
        )

    @fnn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        emb: jnp.ndarray,
        train: bool = False,
        x_stats: Optional[jnp.ndarray] = None,
    ):
        in_ch = x.shape[-1]
        folded = self.fold_batch is not None
        sdims = 3 if folded else x.ndim - 2

        if self._fusable(x, train):
            import functools

            from ..ops.conv3d_fused import conv3d_fused as _cf

            conv3d_fused = functools.partial(
                _cf, interpret=_fused_mode() == "interpret")
            dt = self.dtype
            g1, b1 = prim.GroupNorm32(name="in_norm")(
                x, stats=x_stats, fold_only=True)
            kin, bin_ = prim.ConvParams(self.out_ch, name="in_conv")(in_ch)
            h, h_stats = conv3d_fused(
                x, kin.astype(dt), bin_, prologue_g=g1, prologue_b=b1,
                prologue_silu=True, want_stats=True,
            )
            emb_out = prim.dense(
                2 * self.out_ch, dtype=dt, name="emb")(prim.silu(emb))
            scale, shift = jnp.split(
                emb_out.astype(jnp.float32), 2, axis=-1)
            g2, b2 = prim.GroupNorm32(name="out_norm")(
                h, stats=h_stats, film_scale=scale, film_shift=shift,
                fold_only=True,
            )
            kout, bout = prim.ConvParams(
                self.out_ch, zero_init=True, name="out_conv")(self.out_ch)
            if in_ch == self.out_ch:
                skip = x
            elif self.use_conv_skip:
                skip = prim.conv_nd(
                    sdims, self.out_ch, 3, dtype=dt, name="skip")(x)
            else:
                skip = prim.conv_nd(
                    sdims, self.out_ch, 1, dtype=dt, name="skip")(x)
            out, out_stats = conv3d_fused(
                h, kout.astype(dt), bout, prologue_g=g2, prologue_b=b2,
                prologue_silu=True, skip=skip.astype(dt), want_stats=True,
            )
            return out, out_stats

        fb = self.fold_batch
        phase_up = self.up and folded and _phase_up_enabled()
        h = prim.GroupNorm32(name="in_norm")(x, apply_silu=True, fold_batch=fb)
        if self.up and not phase_up:
            h = prim.upsample_nearest_hw(h)
            x = prim.upsample_nearest_hw(x)
        elif self.down:
            # folded volumes are 4-D with H,W on axes 1,2 — the (1,2,2)
            # anisotropic stride reduces to a plain (2,2) window
            stride = (2, 2) if folded else prim.downsample_stride(sdims)
            h = prim.avg_pool_nd(h, stride)
            x = prim.avg_pool_nd(x, stride)
        h = prim.conv_nd(
            sdims, self.out_ch, 3, dtype=self.dtype, name="in_conv",
            fold_batch=fb, upsample=phase_up,
        )(h)

        emb_out = prim.dense(
            2 * self.out_ch if self.use_scale_shift_norm else self.out_ch,
            dtype=self.dtype,
            name="emb",
        )(prim.silu(emb))

        if self.use_scale_shift_norm:
            # FiLM + SiLU fused into the GroupNorm affine (one HBM pass
            # instead of three; reference chain at unet.py:248-252)
            scale, shift = jnp.split(emb_out.astype(jnp.float32), 2, axis=-1)
            h = prim.GroupNorm32(name="out_norm")(
                h, film_scale=scale, film_shift=shift, apply_silu=True,
                fold_batch=fb,
            )
        else:
            if folded:
                reps = h.shape[0] // emb_out.shape[0]
                emb_b = jnp.repeat(emb_out, reps, axis=0).reshape(
                    (h.shape[0],) + (1,) * (h.ndim - 2) + (emb_out.shape[-1],)
                ).astype(h.dtype)
            else:
                emb_b = emb_out.reshape(
                    (emb_out.shape[0],) + (1,) * sdims + (emb_out.shape[-1],)
                ).astype(h.dtype)
            h = h + emb_b
            h = prim.GroupNorm32(name="out_norm")(
                h, apply_silu=True, fold_batch=fb
            )
        h = fnn.Dropout(self.dropout, name="drop")(h, deterministic=not train)
        h = prim.conv_nd(
            sdims, self.out_ch, 3, zero_init=True, dtype=self.dtype,
            name="out_conv", fold_batch=fb,
        )(h)

        if in_ch == self.out_ch:
            skip = prim.upsample_nearest_hw(x) if phase_up else x
        elif self.use_conv_skip:
            # 3x3 skip after upsample: same phase decomposition as in_conv
            skip = prim.conv_nd(
                sdims, self.out_ch, 3, dtype=self.dtype, name="skip",
                fold_batch=fb, upsample=phase_up,
            )(x)
        else:
            skip = prim.conv_nd(
                sdims, self.out_ch, 1, dtype=self.dtype, name="skip",
                fold_batch=fb,
            )(x)
            if phase_up:
                # 1x1 conv commutes with nearest upsampling: conv at LOW
                # resolution (4x fewer MACs/reads), then upsample
                skip = prim.upsample_nearest_hw(skip)
        return skip + h


class AttentionBlock(fnn.Module):
    """Spatial self-attention over all flattened voxels, fp32 softmax
    (reference unet.py:259-393). ``use_new_attention_order`` selects the
    qkv weight layout of QKVAttention vs QKVAttentionLegacy."""

    num_heads: int = 1
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32
    fold_batch: Optional[int] = None

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # under the folded layout D is just another flattened token axis —
        # attention flattens all spatial dims anyway (reference unet.py:344)
        B = self.fold_batch if self.fold_batch is not None else x.shape[0]
        C = x.shape[-1]
        T = int(math.prod(x.shape[:-1])) // B
        H = self.num_heads
        ch = C // H
        assert C % H == 0

        xt = x.reshape(B, T, C)
        qkv = prim.conv_nd(1, 3 * C, 1, dtype=self.dtype, name="qkv")(
            prim.GroupNorm32(name="norm")(xt)
        )  # [B, T, 3C]

        if self.use_new_attention_order:
            # layout: [q_allheads | k_allheads | v_allheads] (unet.py:361-389)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, T, H, ch)
            k = k.reshape(B, T, H, ch)
            v = v.reshape(B, T, H, ch)
        else:
            # legacy layout: per-head [q|k|v] triples (unet.py:328-354)
            qkv = qkv.reshape(B, T, H, 3 * ch)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        scale = 1.0 / math.sqrt(math.sqrt(ch))
        logits = jnp.einsum(
            "bthc,bshc->bhts", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        a = jnp.einsum("bhts,bshc->bthc", weights, v)
        a = a.reshape(B, T, C)
        a = prim.conv_nd(1, C, 1, zero_init=True, dtype=self.dtype, name="proj")(a)
        return (xt + a).reshape(x.shape)


class Downsample(fnn.Module):
    """Anisotropic downsample: (1,2,2) for 3-D (reference unet.py:113-140)."""

    out_ch: int
    use_conv: bool = True
    dtype: Any = jnp.float32
    fold_batch: Optional[int] = None

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        folded = self.fold_batch is not None
        sdims = 3 if folded else x.ndim - 2
        stride = prim.downsample_stride(sdims)
        if self.use_conv:
            return prim.conv_nd(
                sdims, self.out_ch, 3, stride=stride, dtype=self.dtype,
                name="op", fold_batch=self.fold_batch,
            )(x)
        assert x.shape[-1] == self.out_ch
        return prim.avg_pool_nd(x, stride[1:] if folded else stride)


class Upsample(fnn.Module):
    """H,W-only nearest x2 upsample for 3-D (reference unet.py:81-110)."""

    out_ch: int
    use_conv: bool = True
    dtype: Any = jnp.float32
    fold_batch: Optional[int] = None

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        folded = self.fold_batch is not None
        sdims = 3 if folded else x.ndim - 2
        if self.use_conv and folded and _phase_up_enabled():
            return prim.conv_nd(
                sdims, self.out_ch, 3, dtype=self.dtype, name="conv",
                fold_batch=self.fold_batch, upsample=True,
            )(x)
        x = prim.upsample_nearest_hw(x)
        if self.use_conv:
            x = prim.conv_nd(
                sdims, self.out_ch, 3, dtype=self.dtype, name="conv",
                fold_batch=self.fold_batch,
            )(x)
        return x


def _build_stage(parent: fnn.Module, prefix: str, stage, cfg) -> list:
    """Instantiate the modules for one plan stage with stable names.

    Returns (spec, module) pairs so application dispatches on the *spec*
    type — robust to transformed (remat'd) module classes."""
    mods = []
    fb = cfg.get("fold_batch")
    for j, spec in enumerate(stage):
        name = f"{prefix}_{j}"
        if isinstance(spec, ConvSpec):
            m = prim.conv_nd(
                cfg["sdims"], spec.out_ch, 3, dtype=cfg["dtype"], name=name,
                fold_batch=fb,
            )
        elif isinstance(spec, ResSpec):
            m = cfg["res_cls"](
                out_ch=spec.out_ch,
                dropout=cfg["dropout"],
                use_scale_shift_norm=cfg["use_scale_shift_norm"],
                up=spec.up,
                down=spec.down,
                dtype=cfg["dtype"],
                fused=cfg.get("fused", False),
                fold_batch=fb,
                name=name,
            )
        elif isinstance(spec, AttnSpec):
            m = cfg.get("attn_cls", AttentionBlock)(
                num_heads=spec.num_heads,
                use_new_attention_order=cfg["use_new_attention_order"],
                dtype=cfg["dtype"],
                fold_batch=fb,
                name=name,
            )
        elif isinstance(spec, DownSpec):
            m = Downsample(
                spec.out_ch, spec.use_conv, dtype=cfg["dtype"],
                fold_batch=fb, name=name,
            )
        elif isinstance(spec, UpSpec):
            m = Upsample(
                spec.out_ch, spec.use_conv, dtype=cfg["dtype"],
                fold_batch=fb, name=name,
            )
        else:
            raise TypeError(spec)
        mods.append((spec, m))
    return mods


def _apply_stage(mods, h, emb, train, stats=None):
    """The reference's TimestepEmbedSequential dispatch (unet.py:66-78):
    only ResBlocks receive the timestep embedding.

    ``stats`` threads the fused path's per-channel activation stats from
    block to block; any non-ResBlock op invalidates them (its output
    distribution differs), after which the next fused block recomputes them
    with one cheap reduce."""
    for spec, m in mods:
        if isinstance(spec, ResSpec):
            out = m(h, emb, train, stats)
            h, stats = out if isinstance(out, tuple) else (out, None)
        else:
            h = m(h)
            stats = None
    return h, stats


class UNetModel(fnn.Module):
    """Full UNet with timestep (and optional class) conditioning
    (reference unet.py:396-716; ``middle_attention=False`` reproduces
    UNetModel_noatt, unet.py:720-1044)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...] = ()
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 3
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    middle_attention: bool = True
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    def plan(self) -> UNetPlan:
        return plan_unet(
            in_channels=self.in_channels,
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            channel_mult=self.channel_mult,
            conv_resample=self.conv_resample,
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            num_heads_upsample=self.num_heads_upsample,
            resblock_updown=self.resblock_updown,
            middle_attention=self.middle_attention,
        )

    def _cfg(self):
        res_cls = ResBlock
        if self.use_checkpoint:
            # Rematerialize ResBlocks in the backward pass (the reference's
            # gradient checkpointing, nn.py:124-170 + unet.py:232-234).
            # The [B,C]-sized GroupNorm stats are saved (memory-free) so
            # the backward does not repeat their full spatial reductions —
            # measured: stats-reduce time 74.3 -> 61.0 ms/train-step, net
            # -4 ms at the flagship config (fusion boundaries shift some
            # cost into convs).
            res_cls = fnn.remat(
                ResBlock, static_argnums=(3,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "gn_stats"),
            )
        return dict(
            sdims=self.dims,
            dtype=self.dtype,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            use_new_attention_order=self.use_new_attention_order,
            res_cls=res_cls,
            # resolution-aware remat (see __call__): blocks at downsample
            # rate > DDPM3D_REMAT_DS keep their (small) activations and
            # skip the backward recompute; only the high-res blocks whose
            # activations are HBM-infeasible rematerialize. Measured at
            # the flagship config: ds<=2 remat saves the ~46 ms/step of
            # low-res forward recompute with ~1.5 GB extra activations.
            res_cls_plain=ResBlock,
            remat_max_ds=_remat_max_ds(),
            fused=_fused_mode() != "off" and not self.use_checkpoint,
            # the reference checkpoints attention unconditionally
            # (unet.py:297) — its O(T^2) weights dominate activation memory
            attn_cls=fnn.remat(AttentionBlock),
        )

    @fnn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        assert (y is not None) == (self.num_classes is not None), (
            "must specify y iff the model is class-conditional"
        )
        plan = self.plan()
        cfg = self._cfg()
        # network-wide B*D folding: every interior activation is 4-D
        # [(B*D), H, W, C] (see _fold_enabled). Off under the (5-D-only)
        # fused-Pallas path.
        fold_batch = None
        if (
            self.dims == 3
            and x.ndim == 5
            and _fold_enabled()
            and not cfg.get("fused", False)
        ):
            fold_batch = x.shape[0]
        cfg["fold_batch"] = fold_batch

        emb = prim.timestep_embedding(timesteps, self.model_channels)
        emb = prim.dense(4 * self.model_channels, name="time_embed_0")(emb)
        emb = prim.silu(emb)
        emb = prim.dense(4 * self.model_channels, name="time_embed_2")(emb)
        if self.num_classes is not None:
            emb = emb + fnn.Embed(
                self.num_classes, 4 * self.model_channels,
                param_dtype=jnp.float32, name="label_emb",
            )(y)

        h = x.astype(self.dtype)
        if fold_batch is not None:
            h = prim.fold_bd(h)
        stats = None
        hs = []

        remat_cls, plain_cls = cfg["res_cls"], cfg.get("res_cls_plain")
        max_ds = cfg.get("remat_max_ds", 1 << 30)

        def stage_cfg(ds):
            # resolution-aware remat: swap in the plain ResBlock for deep
            # (small-activation) stages; names are unchanged so params are
            # identical either way
            if plain_cls is None or not self.use_checkpoint:
                return cfg
            return {**cfg, "res_cls": remat_cls if ds <= max_ds else plain_cls}

        def stage_downs(stage):
            return any(
                isinstance(s, DownSpec) or (isinstance(s, ResSpec) and s.down)
                for s in stage
            )

        def stage_ups(stage):
            return any(
                isinstance(s, UpSpec) or (isinstance(s, ResSpec) and s.up)
                for s in stage
            )

        ds = 1
        for i, stage in enumerate(plan.input_blocks):
            mods = _build_stage(self, f"in{i}", stage, stage_cfg(ds))
            h, stats = _apply_stage(mods, h, emb, train, stats)
            hs.append((h, stats))
            if stage_downs(stage):
                ds *= 2
        h, stats = _apply_stage(
            _build_stage(self, "mid", plan.middle_block, stage_cfg(ds)),
            h, emb, train, stats,
        )
        for i, stage in enumerate(plan.output_blocks):
            h_skip, skip_stats = hs.pop()
            h = jnp.concatenate([h, h_skip], axis=-1)
            # per-channel stats concatenate exactly like the activations
            stats = (
                jnp.concatenate([stats, skip_stats], axis=-1)
                if stats is not None and skip_stats is not None
                else None
            )
            mods = _build_stage(self, f"out{i}", stage, stage_cfg(ds))
            h, stats = _apply_stage(mods, h, emb, train, stats)
            if stage_ups(stage):
                ds //= 2

        h = h.astype(x.dtype)
        h = prim.GroupNorm32(name="head_norm")(h, fold_batch=fold_batch)
        h = prim.silu(h)
        h = prim.conv_nd(
            self.dims, plan.out_channels, 3, zero_init=True, name="head_conv",
            fold_batch=fold_batch,
        )(h)
        if fold_batch is not None:
            h = prim.unfold_bd(h, fold_batch)
        return h


class SuperResModel(fnn.Module):
    """Conditional denoiser: concatenates the low-dose conditioner onto x
    channel-wise — no interpolation, the conditioner is already full-res
    (reference unet.py:1655-1694; ``upsampled = low_res.clone()``).

    ``middle_attention=False`` gives SuperResModel_noatt, the shipped
    production model (script_util.py:432-450).
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...] = ()
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 1, 2, 3, 4)
    conv_resample: bool = True
    dims: int = 3
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    middle_attention: bool = True
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.unet = UNetModel(
            in_channels=int(self.in_channels * 2),
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            dropout=self.dropout,
            channel_mult=self.channel_mult,
            conv_resample=self.conv_resample,
            dims=self.dims,
            num_classes=self.num_classes,
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            num_heads_upsample=self.num_heads_upsample,
            use_scale_shift_norm=self.use_scale_shift_norm,
            resblock_updown=self.resblock_updown,
            use_new_attention_order=self.use_new_attention_order,
            middle_attention=self.middle_attention,
            use_checkpoint=self.use_checkpoint,
            dtype=self.dtype,
        )

    def __call__(self, x, timesteps, low_res=None, y=None, train: bool = False):
        assert low_res is not None, "SuperResModel requires low_res conditioner"
        x = jnp.concatenate([x, low_res.astype(x.dtype)], axis=-1)
        return self.unet(x, timesteps, y=y, train=train)


class AttentionPool(fnn.Module):
    """Attention pooling head for the classifier (reference unet.py:22-51):
    prepend the mean token as the query's target, attend, take token 0."""

    num_head_channels: int
    out_ch: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        C = x.shape[-1]
        xt = x.reshape(B, -1, C)  # [B, T, C]
        xt = jnp.concatenate([xt.mean(axis=1, keepdims=True), xt], axis=1)
        # learned positional embedding over T+1 tokens
        pos = self.param(
            "pos", fnn.initializers.normal(1.0 / math.sqrt(C)),
            (xt.shape[1], C), jnp.float32,
        )
        xt = xt + pos[None].astype(xt.dtype)
        H = C // self.num_head_channels
        qkv = prim.conv_nd(1, 3 * C, 1, dtype=self.dtype, name="qkv")(xt)
        qkv = qkv.reshape(B, xt.shape[1], H, 3 * self.num_head_channels)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(self.num_head_channels))
        logits = jnp.einsum(
            "bthc,bshc->bhts", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(xt.dtype)
        a = jnp.einsum("bhts,bshc->bthc", w, v).reshape(B, xt.shape[1], C)
        a = prim.conv_nd(1, self.out_ch, 1, dtype=self.dtype, name="proj")(a)
        return a[:, 0]


class EncoderUNetModel(fnn.Module):
    """Half-UNet encoder with a pooling head; the classifier for guidance
    (reference unet.py:1984-2176; created by script_util.py:228-266).
    ``include_middle=False`` reproduces EncoderUNetModelv2 (unet.py:2199+),
    whose per-stage features the Seg* models fuse."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...] = ()
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 3
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    pool: str = "adaptive"
    include_middle: bool = True
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    def plan(self) -> UNetPlan:
        return plan_unet(
            in_channels=self.in_channels,
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            channel_mult=self.channel_mult,
            conv_resample=self.conv_resample,
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            resblock_updown=self.resblock_updown,
            middle_attention=True,
        )

    def _cfg(self):
        res_cls = ResBlock
        if self.use_checkpoint:
            res_cls = fnn.remat(ResBlock, static_argnums=(3,))
        return dict(
            sdims=self.dims,
            dtype=self.dtype,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            use_new_attention_order=self.use_new_attention_order,
            res_cls=res_cls,
            attn_cls=fnn.remat(AttentionBlock),  # hardwired, unet.py:297
        )

    @fnn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        train: bool = False,
        return_features: bool = False,
    ):
        plan = self.plan()
        cfg = self._cfg()
        # network-wide B*D folding, same entry as UNetModel.__call__: the
        # whole encoder torso runs on 4-D [(B*D), H, W, C] activations
        # (depth is never downsampled — the (1,2,2) pyramid — so
        # fold_batch is constant through every stage). This is also what
        # routes the encoder's convs through Conv3DFolded and therefore
        # the int8 serving path; the unfolded 5-D convs have no int8 gate.
        fold_batch = None
        if self.dims == 3 and x.ndim == 5 and _fold_enabled():
            fold_batch = x.shape[0]
        cfg["fold_batch"] = fold_batch

        emb = prim.timestep_embedding(timesteps, self.model_channels)
        emb = prim.dense(4 * self.model_channels, name="time_embed_0")(emb)
        emb = prim.silu(emb)
        emb = prim.dense(4 * self.model_channels, name="time_embed_2")(emb)

        spatial_axes = tuple(range(1, self.dims + 1))

        def _spatial_mean(t):
            # mean over (D,)H,W — on the folded layout: H,W first, then the
            # depth rows (exact: every voxel weighted equally)
            if fold_batch is None:
                return t.astype(x.dtype).mean(axis=spatial_axes)
            tm = t.astype(x.dtype).mean(axis=(1, 2))  # [(B*D), C]
            return tm.reshape(fold_batch, -1, tm.shape[-1]).mean(axis=1)

        h = x.astype(self.dtype)
        if fold_batch is not None:
            h = prim.fold_bd(h)
        results = []
        features = []
        for i, stage in enumerate(plan.input_blocks):
            mods = _build_stage(self, f"in{i}", stage, cfg)
            h, _ = _apply_stage(mods, h, emb, train)
            features.append(h)
            if self.pool.startswith("spatial"):
                results.append(_spatial_mean(h))
        if self.include_middle:
            h, _ = _apply_stage(
                _build_stage(self, "mid", plan.middle_block, cfg), h, emb, train
            )
            if self.pool.startswith("spatial"):
                results.append(_spatial_mean(h))
        if return_features:
            # public layout is 5-D regardless of the internal fold (the
            # unfold is a free reshape; folded consumers — SegUNetModel —
            # refold, also free)
            if fold_batch is not None:
                features = [prim.unfold_bd(f, fold_batch) for f in features]
                h = prim.unfold_bd(h, fold_batch)
            return features, h

        if self.pool.startswith("spatial"):
            h = jnp.concatenate(results, axis=-1)
            h = prim.dense(2048, name="sp_fc1")(h)
            if self.pool == "spatial_v2":
                h = prim.GroupNorm32(name="sp_norm")(h)
                h = prim.silu(h)
            else:
                h = jax.nn.relu(h)
            return prim.dense(self.out_channels, name="sp_fc2")(h)
        h = h.astype(x.dtype)
        h = prim.GroupNorm32(name="head_norm")(h, fold_batch=fold_batch)
        h = prim.silu(h)
        if fold_batch is not None:
            # pooling heads reduce over depth too — back to 5-D (free)
            h = prim.unfold_bd(h, fold_batch)
        if self.pool == "adaptive":
            h = h.mean(axis=spatial_axes, keepdims=True)
            h = prim.conv_nd(
                self.dims, self.out_channels, 1, zero_init=True, name="head_conv"
            )(h)
            return h.reshape(h.shape[0], -1)
        if self.pool == "attention":
            assert self.num_head_channels != -1
            return AttentionPool(
                self.num_head_channels, self.out_channels, dtype=self.dtype,
                name="head_pool",
            )(h)
        raise NotImplementedError(f"unexpected pool {self.pool}")
