from .dit import DenoisingDiT, DiT, DiTBlock
from .mlp import DenoisingMLP
from .unet import DenoisingVDMUNet
from .utils import actfn_from_str

__all__ = [
    "DenoisingDiT",
    "DiT",
    "DiTBlock",
    "DenoisingMLP",
    "DenoisingVDMUNet",
    "actfn_from_str",
]
