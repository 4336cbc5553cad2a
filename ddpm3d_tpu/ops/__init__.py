"""Pallas TPU kernels for bandwidth-bound fused ops."""

from .groupnorm import fused_group_norm_silu, reference_group_norm_silu
