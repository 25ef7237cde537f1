"""unet_tpu — a TPU-native diffusion U-Net training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of clu0/unet.cu
(ImageNet-64 unconditional DDPM, ADM U-Net): model, diffusion, trainer,
DDPM sampler, .bin interchange formats, parity test suite, and data-parallel
scaling over a TPU mesh.
"""

from unet_tpu.config import TrainConfig, UnetConfig

__version__ = "0.1.0"
__all__ = ["UnetConfig", "TrainConfig"]
