from .attention import multi_head_attention
from .flash_attention import flash_attention
from .ln_modulate import layernorm_modulate

__all__ = ["multi_head_attention", "flash_attention", "layernorm_modulate"]
