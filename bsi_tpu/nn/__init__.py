from .attention import Attention2D, TokenAttention, repack_qkv_grouped
from .blocks import ResidualBlock, SimplifiedUNet, feature_modulation
from .fourier import FourierFeatures
from .mlp import MLP
from .pos_emb import NyquistPositionalEmbedding

__all__ = [
    "MLP",
    "FourierFeatures",
    "NyquistPositionalEmbedding",
    "TokenAttention",
    "Attention2D",
    "ResidualBlock",
    "SimplifiedUNet",
    "feature_modulation",
    "repack_qkv_grouped",
]
