from unet_tpu.diffusion.gaussian import (GaussianDiffusion,
                                         cosine_beta_schedule,
                                         linear_beta_schedule,
                                         named_beta_schedule,
                                         sample_timesteps)
from unet_tpu.diffusion.sampler import ddpm_sample, make_sampler, to_uint8

__all__ = ["GaussianDiffusion", "linear_beta_schedule",
           "cosine_beta_schedule", "named_beta_schedule",
           "sample_timesteps", "ddpm_sample", "make_sampler", "to_uint8"]
