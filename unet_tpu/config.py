"""Typed model / training configuration.

One config object replaces the reference's two config surfaces: the hardcoded
C struct `UnetConfig` (reference train_unet.cu:3318-3335, values pinned at
train_unet.cu:4848-4864) and the argparse defaults dict
(reference train_unet.py:660-727).  The config round-trips through
checkpoints (see unet_tpu/io/checkpoint.py).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UnetConfig:
    """Architecture hyperparameters of the ADM U-Net.

    Defaults reproduce the reference's only supported model:
    ImageNet-64 unconditional DDPM (reference README.md:151-153).
    """

    in_channels: int = 3
    model_channels: int = 64
    out_channels: int = 3
    num_res_blocks: int = 2
    # Downsample factors at which attention runs.  The reference CLI takes
    # `--attention_resolutions "16,8"` in *resolution* units and converts to
    # ds factors image_size//res = (4, 8) (reference train_unet.py:751-753).
    attention_ds: Tuple[int, ...] = (4, 8)
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_head_channels: int = 32  # HS; NH = channels // HS per block
    # FiLM-style conditioning: emb projects to (scale, shift) applied
    # around GN2 instead of a plain add (reference train_unet.py:93-99,
    # 141-148; exposed as --use_scale_shift_norm, train_unet.py:687).
    use_scale_shift_norm: bool = False
    gn_num_groups: int = 32
    gn_eps: float = 1e-5
    image_size: int = 64
    max_period: int = 1000  # sinusoidal-embedding max period AND diffusion T

    @property
    def time_embed_dim(self) -> int:
        return 4 * self.model_channels

    @property
    def num_levels(self) -> int:
        return len(self.channel_mult)

    @property
    def num_skips(self) -> int:
        # One skip per input block: conv_in + num_res_blocks per level +
        # one downsample per non-final level (reference train_unet.cu:3338).
        return 1 + self.num_res_blocks * self.num_levels + (self.num_levels - 1)

    def level_channels(self) -> Sequence[int]:
        return [m * self.model_channels for m in self.channel_mult]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop hyperparameters (reference train_unet.cu:5019-5037 and
    train_unet.py:696-718)."""

    batch_size: int = 32
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    iterations: int = 100_000
    log_interval: int = 100
    save_interval: int = 10_000
    # Exponential moving average of the parameters (reference
    # train_unet.py:664 parses --ema_rate "0.9999" but neither trainer
    # consumes it — here 0 < ema_rate < 1 actually maintains the average
    # and checkpoints it for sampling).
    ema_rate: float = 0.0
    # Gradient accumulation: split each batch into microbatches of this
    # size and scan over them, averaging grads — EXACTLY the full-batch
    # step's math (mean loss is linear in the microbatch means), at
    # 1/(B/microbatch) the activation memory.  0 = off.  The reference
    # parses --microbatch but never uses it (train_unet.py:665).
    microbatch: int = 0
    # Linear learning-rate annealing: lr scales by
    # (1 - completed_steps / lr_anneal_steps), clamped at 0 — the
    # guided-diffusion schedule behind the reference's parsed-but-dead
    # --lr_anneal_steps flag (train_unet.py:666).  0 = constant lr.
    lr_anneal_steps: int = 0
    # Classifier-free guidance training: probability of replacing each
    # class label with the null label (-1, = unconditional) per example
    # (Ho & Salimans 2022).  Only meaningful with class-conditional
    # models; sample with generate.py --guidance_scale.
    label_dropout: float = 0.0
    # TPU-specific knobs (no reference equivalent):
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    remat: bool = False
    shuffle: bool = False  # reference CUDA loader streams sequentially

    @property
    def compute_jnp_dtype(self):
        return jnp.dtype(self.compute_dtype)


DIFFUSION_T = 1000
