"""Conv3d lowerings and Pallas TPU kernels.

The production compute path is the XLA depth-decomposed conv3d
(:mod:`.conv3d`). The Pallas kernels (:mod:`.groupnorm`,
:mod:`.conv3d_mxu`, :mod:`.conv3d_fused`) are correctness-tested
infrastructure that measured SLOWER than XLA's fusion at this model's
shapes on v5e and are therefore off by default — see the README "Pallas
verdict" for the numbers.
"""

from .groupnorm import fused_group_norm_silu, reference_group_norm_silu
from .quant import (
    calib_enabled,
    conv3d_folded_int8,
    int8_enabled,
    quantize_act,
    quantize_kernel,
    static_scale_for,
    static_scales,
)
