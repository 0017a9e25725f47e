from .attention import multi_head_attention
from .flash_attention import flash_attention

__all__ = ["multi_head_attention", "flash_attention"]
