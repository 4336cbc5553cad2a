"""Analytic FLOP/bandwidth accounting for the UNet forward pass.

Walks the UNet plan and sums conv MACs per stage at the anisotropic
pyramid's resolutions, giving the roofline context for bench numbers.

Run: python tools/flops.py [size]
"""

import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ddpm3d_tpu.models.plan import (
    AttnSpec, ConvSpec, DownSpec, ResSpec, UpSpec, plan_unet,
)

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def conv_flops(vox, cin, cout, k=27):
    return 2 * vox * cin * cout * k


def res_block_flops(vox_in, vox_out, cin, cout):
    # in_conv (at vox_out for down blocks), out_conv, optional 1x1 skip
    f = conv_flops(vox_out, cin, cout) + conv_flops(vox_out, cout, cout)
    if cin != cout:
        f += conv_flops(vox_out, cin, cout, k=1)
    return f


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    plan = plan_unet(
        in_channels=2, model_channels=128, out_channels=2, num_res_blocks=2,
        attention_resolutions=(0,), channel_mult=(1, 1, 2, 3, 4),
        resblock_updown=True, middle_attention=False,
    )
    D = size
    hw = size
    total = 0.0
    bytes_rw = 0.0

    def vox(hw):
        return D * hw * hw

    def account(stage, hw):
        nonlocal total, bytes_rw
        for spec in stage:
            if isinstance(spec, ConvSpec):
                total += conv_flops(vox(hw), spec.in_ch, spec.out_ch)
            elif isinstance(spec, ResSpec):
                v_out = vox(hw // 2) if spec.down else vox(hw)
                total += res_block_flops(vox(hw), v_out, spec.in_ch, spec.out_ch)
                bytes_rw += 2 * v_out * spec.out_ch * 2 * 4  # GN f32 traffic
            elif isinstance(spec, (DownSpec, UpSpec)):
                total += conv_flops(vox(hw), spec.in_ch, spec.out_ch)

    # encoder
    level_hw = hw
    n_levels = 5
    down_at = {3, 6, 9, 12}
    for i, stage in enumerate(plan.input_blocks):
        account(stage, level_hw)
        if i in down_at:
            level_hw //= 2
    # middle at bottom res
    account(plan.middle_block, level_hw)
    # decoder (reverse; upsample at stage ends)
    up_at = {2, 5, 8, 11}
    for i, stage in enumerate(plan.output_blocks):
        account(stage, level_hw)
        if i in up_at:
            level_hw *= 2
    # head conv
    total += conv_flops(vox(hw), 128, 2)

    tf = total / 1e12
    print(f"UNet fwd @ {size}^3: {tf:.2f} TFLOP")
    print(f"v5e speed-of-light: {tf / V5E_BF16_TFLOPS * 1000:.1f} ms/fwd")
    print(
        f"1000-step chain at SoL: {tf / V5E_BF16_TFLOPS * 1000:.1f} s/patch; "
        f"rate {size**3 / (tf / V5E_BF16_TFLOPS * 1000):.0f} vox/s/chip"
    )


if __name__ == "__main__":
    main()
