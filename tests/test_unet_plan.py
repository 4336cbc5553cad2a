"""Tests for the UNet wiring plan — especially the pair-pop decoder.

Expected sequences derived by hand-simulating the reference constructor
(unet.py:480-663) for the shipped production config."""

from ddpm3d_tpu.models.plan import (
    AttnSpec,
    ConvSpec,
    DownSpec,
    ResSpec,
    UpSpec,
    attention_ds_from_resolutions,
    plan_unet,
)


def production_plan():
    # SuperResModel_noatt production config (script_util.py:432-450,
    # test_DDPM_3d_mpi.sh): 128ch, (1,1,2,3,4), 2 res blocks, resblock
    # up/down, attention disabled (ds=0 matches nothing).
    return plan_unet(
        in_channels=2,
        model_channels=128,
        out_channels=2,
        num_res_blocks=2,
        attention_resolutions=(0,),
        channel_mult=(1, 1, 2, 3, 4),
        resblock_updown=True,
        num_head_channels=64,
        middle_attention=False,
    )


def test_production_encoder_structure():
    p = production_plan()
    assert len(p.input_blocks) == 15
    # skip channel stack after the encoder
    assert p.skip_chs == (
        128, 128, 128, 128, 128, 128, 128, 256, 256, 256, 384, 384, 384, 512, 512
    )
    # stage 0 is the in-conv
    assert p.input_blocks[0] == (ConvSpec(2, 128),)
    # downsample stages are ResBlocks with down=True (resblock_updown)
    down_idx = [3, 6, 9, 12]
    for i in down_idx:
        (spec,) = p.input_blocks[i]
        assert isinstance(spec, ResSpec) and spec.down
    # no attention anywhere
    for stage in p.input_blocks + (p.middle_block,) + p.output_blocks:
        assert not any(isinstance(s, AttnSpec) for s in stage)


def test_production_middle():
    p = production_plan()
    assert p.middle_block == (ResSpec(512, 512), ResSpec(512, 512))


def test_production_pair_pop_decoder():
    """The critical wiring: pop inch, pop outch, ResBlock(inch*2 -> outch),
    re-push outch (reference unet.py:618-663)."""
    p = production_plan()
    res_io = []
    ups = []
    for i, stage in enumerate(p.output_blocks):
        first = stage[0]
        assert isinstance(first, ResSpec) and not first.up and not first.down
        res_io.append((first.in_ch, first.out_ch))
        if len(stage) > 1:
            up = stage[1]
            assert isinstance(up, ResSpec) and up.up  # resblock_updown
            ups.append(i)
    assert res_io == [
        (1024, 512), (1024, 384), (768, 384),
        (768, 384), (768, 256), (512, 256),
        (512, 256), (512, 128), (256, 128),
        (256, 128), (256, 128), (256, 128),
        (256, 128), (256, 128), (256, 128),
    ]
    assert ups == [2, 5, 8, 11]  # upsample at each level end except level 0
    assert p.head_norm_ch == 128
    assert p.head_conv_in_ch == 128


def test_attention_placement_when_enabled():
    # 64px config with attention at ds in {2, 4} (resolutions "32,16")
    ds = attention_ds_from_resolutions(64, "32,16")
    assert ds == (2, 4)
    p = plan_unet(
        in_channels=3,
        model_channels=64,
        out_channels=3,
        num_res_blocks=1,
        attention_resolutions=ds,
        channel_mult=(1, 2, 4),
        num_head_channels=32,
        middle_attention=True,
    )
    # level 0 (ds=1): no attention; level 1 (ds=2): attention; level 2 (ds=4)
    def has_attn(stage):
        return any(isinstance(s, AttnSpec) for s in stage)

    assert not has_attn(p.input_blocks[1])   # level 0 res
    assert has_attn(p.input_blocks[3])       # level 1 res (after down)
    assert has_attn(p.input_blocks[5])       # level 2 res
    assert any(isinstance(s, AttnSpec) for s in p.middle_block)
    # heads derived from num_head_channels
    attn = [s for s in p.input_blocks[5] if isinstance(s, AttnSpec)][0]
    assert attn.num_heads == 256 // 32


def test_non_resblock_updown_uses_plain_resample():
    p = plan_unet(
        in_channels=1,
        model_channels=32,
        out_channels=1,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        resblock_updown=False,
    )
    (down,) = p.input_blocks[2]
    assert isinstance(down, DownSpec)
    last_stage = p.output_blocks[1]
    assert isinstance(last_stage[-1], UpSpec)


def test_attention_ds_production_disables():
    # "1000" with image 96 -> ds = 0, which matches no level: attention off
    # (script_util.py:363-365 + SURVEY.md quirk)
    assert attention_ds_from_resolutions(96, "1000") == (0,)
