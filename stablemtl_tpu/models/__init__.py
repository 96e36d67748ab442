from .unet import UNetConfig, UNet2DConditionModel
from .vae import AutoencoderKL, VAEConfig
from .clip import CLIPTextConfig, CLIPTextModel

__all__ = [
    "UNetConfig",
    "UNet2DConditionModel",
    "AutoencoderKL",
    "VAEConfig",
    "CLIPTextConfig",
    "CLIPTextModel",
]
