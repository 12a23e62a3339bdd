"""TPU-native building-block ops (NHWC, Flax linen)."""

from .attention import AttentionRoPE, core_attention, xla_attention
from .blocks import ResBlock, TransVAEBlock
from .ffn import ConvFFN, StandardFFN
from .norms import GroupNorm, LayerNorm, RMSNorm
from .resample import (Downsample, Upsample, depth_to_space, nearest_upsample,
                       space_to_depth)
from .rope import apply_rope2d, rope2d_tables

__all__ = [
    "AttentionRoPE", "core_attention", "xla_attention",
    "ResBlock", "TransVAEBlock",
    "ConvFFN", "StandardFFN",
    "GroupNorm", "LayerNorm", "RMSNorm",
    "Downsample", "Upsample", "depth_to_space", "nearest_upsample", "space_to_depth",
    "apply_rope2d", "rope2d_tables",
]
