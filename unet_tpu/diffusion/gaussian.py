"""Gaussian diffusion forward process (DDPM).

Schedules and q_sample matching the reference numerics exactly:
  * linear schedule scaled by 1000/T, beta in [1e-4, 0.02], computed in
    float64 then cast to float32 before cumprod (reference
    train_unet.py:811-828, 878-892; host recurrence train_unet.cu:3140-3147).
  * cosine schedule (reference train_unet.py:829-855) for parity of the
    Python surface.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(num_timesteps: int) -> np.ndarray:
    scale = 1000.0 / num_timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, num_timesteps,
                       dtype=np.float64)


def cosine_beta_schedule(num_timesteps: int, max_beta: float = 0.999
                         ) -> np.ndarray:
    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_timesteps):
        t1 = i / num_timesteps
        t2 = (i + 1) / num_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


def named_beta_schedule(name: str, num_timesteps: int) -> np.ndarray:
    if name == "linear":
        return linear_beta_schedule(num_timesteps)
    if name == "cosine":
        return cosine_beta_schedule(num_timesteps)
    raise ValueError(f"unknown beta schedule: {name}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Precomputed schedule tables, fp32 on device."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray

    @staticmethod
    def create(betas: np.ndarray) -> "GaussianDiffusion":
        # fp32 cumprod, matching the reference's "float32 everywhere"
        # choice (train_unet.py:883).
        betas32 = np.asarray(betas, dtype=np.float32)
        if betas32.size == 0 or np.any(betas32 <= 0) or np.any(betas32 >= 1):
            # The scaled linear schedule's beta_end is 20/T, so T <= 20
            # exceeds beta=1 and sqrt(1 - alphas_cumprod) silently goes
            # NaN.  The reference's cosine path clamps
            # (train_unet.py:829-855); the linear path has no valid
            # reading, so refuse it.
            rng = ("empty" if betas32.size == 0 else
                   f"range [{betas32.min():.4g}, {betas32.max():.4g}]")
            raise ValueError(
                "beta schedule must lie strictly in (0, 1); got "
                f"{rng} over {betas32.size} steps (linear schedule "
                "needs num_timesteps >= 21)")
        alphas_cumprod = np.cumprod(1.0 - betas32, axis=0)
        return GaussianDiffusion(
            betas=jnp.asarray(betas32),
            alphas_cumprod=jnp.asarray(alphas_cumprod),
            sqrt_alphas_cumprod=jnp.asarray(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=jnp.asarray(
                np.sqrt(1.0 - alphas_cumprod)),
        )

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    def q_sample(self, x_start, t, noise):
        """x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps, NHWC batch
        (reference train_unet.py:894-912, train_unet.cu:3200-3229).
        t may be int or float (the reference carries timesteps as floats,
        indexing by truncation — train_unet.cu:3217-3229)."""
        ti = t.astype(jnp.int32)
        a = self.sqrt_alphas_cumprod[ti][:, None, None, None]
        b = self.sqrt_one_minus_alphas_cumprod[ti][:, None, None, None]
        return (a * x_start.astype(jnp.float32)
                + b * noise.astype(jnp.float32))


def sample_timesteps(key, batch_size: int, num_timesteps: int):
    """Uniform timestep draw (reference train_unet.cu:3239-3254;
    importance-sampling weights are uniform in the reference trainer too,
    train_unet.py:1003)."""
    return jax.random.randint(key, (batch_size,), 0, num_timesteps)
