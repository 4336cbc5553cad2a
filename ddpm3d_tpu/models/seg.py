"""Dual-branch conditional UNets — the reference's Seg* experiment zoo.

Clean-room equivalents of reference unet.py:1698-1981 (+ the midcat base
class UNetModel_noatt_midcat, unet.py:1048-1323): a second half-UNet encoder
consumes the conditioner and its per-stage features are fused into the main
encoder. Three fusion modes cover the whole family:

- ``add``:      h = h + enc_feat per stage (SegModelv2 / SegModelv2_6c /
                SegModelv2_3d_noatt, unet.py:1736-1740, 1846-1850)
- ``cat_conv``: h = conv1x1(cat(h, enc_feat)) per stage (SegModelv3_6c,
                unet.py:1971-1975, conv_down list built at unet.py:1940-1952)
- ``midcat``:   only the encoder's FINAL feature is fused, concatenated
                before the middle block whose first ResBlock takes 2x
                channels (SegModel_3d_noatt_midcat + UNetModel_noatt_midcat,
                unet.py:1890-1907, 1195-1220)

The conditioner entering the *main* branch follows the reference's concat
rule (in_channels doubled, unet.py:1706 / +aux channels, unet.py:1758);
the encoder branch sees the raw conditioner.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as fnn

from . import nn as prim
from .plan import ResSpec, plan_unet
from .unet import (
    EncoderUNetModel, ResBlock, _apply_stage, _build_stage, _fold_enabled,
)


class SegUNetModel(fnn.Module):
    """Main denoising UNet + conditioner encoder with feature fusion."""

    in_channels: int            # channels of x_t entering the main branch
    cond_channels: int          # channels of the conditioner volume
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...] = ()
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 1, 2, 3, 4)
    conv_resample: bool = True
    dims: int = 3
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    middle_attention: bool = False
    fusion: str = "add"  # add | cat_conv | midcat
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, timesteps, low_res=None, train: bool = False):
        assert low_res is not None, "SegUNetModel requires low_res conditioner"
        assert self.fusion in ("add", "cat_conv", "midcat"), self.fusion

        plan = plan_unet(
            in_channels=self.in_channels + self.cond_channels,
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
        cfg = dict(
            sdims=self.dims,
            dtype=self.dtype,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            use_new_attention_order=self.use_new_attention_order,
            res_cls=(
                fnn.remat(ResBlock, static_argnums=(3,))
                if self.use_checkpoint
                else ResBlock
            ),
        )
        # network-wide B*D folding (unet.py:_fold_enabled): both branches
        # run 4-D [(B*D), H, W, C] — the encoder folds internally and
        # returns public 5-D features, which we refold (free reshapes).
        # Folding is what routes every conv through Conv3DFolded and hence
        # the int8 serving path; the 5-D convs have no int8 gate.
        fold_batch = None
        if self.dims == 3 and x.ndim == 5 and _fold_enabled():
            fold_batch = x.shape[0]
        cfg["fold_batch"] = fold_batch

        def _refold(t):
            return prim.fold_bd(t) if fold_batch is not None else t

        encoder = EncoderUNetModel(
            in_channels=self.cond_channels,
            model_channels=self.model_channels,
            out_channels=3,  # unused head (reference passes out_channels=3)
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            dropout=self.dropout,
            channel_mult=self.channel_mult,
            conv_resample=self.conv_resample,
            dims=self.dims,
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            use_scale_shift_norm=self.use_scale_shift_norm,
            resblock_updown=self.resblock_updown,
            include_middle=False,  # EncoderUNetModelv2/v3 drop the middle
            use_checkpoint=self.use_checkpoint,
            dtype=self.dtype,
            name="encoder",
        )
        enc_feats, enc_final = encoder(
            low_res, timesteps, train=train, return_features=True
        )

        emb = prim.timestep_embedding(timesteps, self.model_channels)
        emb = prim.dense(4 * self.model_channels, name="time_embed_0")(emb)
        emb = prim.silu(emb)
        emb = prim.dense(4 * self.model_channels, name="time_embed_2")(emb)

        h = jnp.concatenate([x, low_res.astype(x.dtype)], axis=-1).astype(
            self.dtype
        )
        h = _refold(h)
        hs = []
        for i, stage in enumerate(plan.input_blocks):
            mods = _build_stage(self, f"in{i}", stage, cfg)
            h, _ = _apply_stage(mods, h, emb, train)
            if self.fusion == "add":
                h = h + _refold(enc_feats[i]).astype(h.dtype)
            elif self.fusion == "cat_conv":
                fused = jnp.concatenate(
                    [h, _refold(enc_feats[i]).astype(h.dtype)], axis=-1
                )
                h = prim.conv_nd(
                    self.dims, h.shape[-1], 1, dtype=self.dtype,
                    name=f"fuse{i}", fold_batch=fold_batch,
                )(fused)
            hs.append(h)

        if self.fusion == "midcat":
            # concat the encoder's final feature; the first middle ResBlock
            # therefore takes 2x channels (unet.py:1195-1220, 1902-1903)
            h = jnp.concatenate([h, _refold(enc_final).astype(h.dtype)], axis=-1)
            ch = plan.middle_block[0].out_ch
            mid_plan = (ResSpec(2 * ch, ch),) + plan.middle_block[1:]
        else:
            mid_plan = plan.middle_block
        h, _ = _apply_stage(_build_stage(self, "mid", mid_plan, cfg), h, emb, train)

        for i, stage in enumerate(plan.output_blocks):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            mods = _build_stage(self, f"out{i}", stage, cfg)
            h, _ = _apply_stage(mods, h, emb, train)

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


def SegModelv2(**kw):
    """Additive fusion, conditioner concat (reference unet.py:1698-1745)."""
    return SegUNetModel(fusion="add", **kw)


def SegModelv2_3d_noatt(**kw):
    """3-D additive fusion without middle attention (unet.py:1806-1856)."""
    kw.setdefault("dims", 3)
    kw.setdefault("middle_attention", False)
    return SegUNetModel(fusion="add", **kw)


def SegModelv3(**kw):
    """Concat + 1x1-conv fusion (reference SegModelv3_6c, unet.py:1913-1981)."""
    return SegUNetModel(fusion="cat_conv", **kw)


def SegModel_3d_noatt_midcat(**kw):
    """Middle-concat fusion of the encoder's final feature
    (reference unet.py:1859-1910 + UNetModel_noatt_midcat)."""
    kw.setdefault("dims", 3)
    kw.setdefault("middle_attention", False)
    return SegUNetModel(fusion="midcat", **kw)
