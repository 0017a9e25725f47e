from .attention import (
    multi_head_attention,
    multi_head_attention_fused_qkv,
    multi_head_attention_packed,
    split_qkv_grouped,
)
from .flash_attention import flash_attention
from .groupnorm_silu import groupnorm_silu
from .ln_modulate import layernorm_modulate

__all__ = [
    "multi_head_attention",
    "multi_head_attention_fused_qkv",
    "multi_head_attention_packed",
    "split_qkv_grouped",
    "flash_attention",
    "groupnorm_silu",
    "layernorm_modulate",
]
