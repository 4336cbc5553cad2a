"""Model layer: NN primitives, UNet wiring plans, Flax model families."""

from . import nn
from .plan import (
    AttnSpec,
    ConvSpec,
    DownSpec,
    ResSpec,
    UNetPlan,
    UpSpec,
    attention_ds_from_resolutions,
    plan_unet,
)
from .unet import (
    AttentionBlock,
    AttentionPool,
    Downsample,
    EncoderUNetModel,
    ResBlock,
    SuperResModel,
    UNetModel,
    Upsample,
)
from .seg import (
    SegModel_3d_noatt_midcat,
    SegModelv2,
    SegModelv2_3d_noatt,
    SegModelv3,
    SegUNetModel,
)
from .aliases import (
    EncoderUNetModelv2,
    EncoderUNetModelv3,
    SegModelv2_6c,
    SegModelv3_6c,
    UNetModelv2,
)
