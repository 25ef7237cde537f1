"""DDPM ancestral sampler, fully on-device.

Math mirrors reference generate.py:29-52 exactly:
  loop t = T-1 ... 2 (998 model calls for T=1000);
  eps = model(x_t, t);
  mu_t   = (x_t - beta[t-1]/sqrt(1-abar[t-1]) * eps) / sqrt(1-beta[t-1]);
  sigma_t = sqrt((1-abar[t-2])/(1-abar[t-1]) * beta[t-1]);
  x_{t-1} = mu_t + sigma_t * N(0,1)      (noise added at every step).

The reference runs this as a Python loop over 998 B=1 forwards with a host
sync per step (generate.py:77-80); here the entire chain is ONE jitted
`lax.fori_loop`, so there are zero host round-trips until the final image
readback, and any batch size amortizes the model cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unet_tpu.config import UnetConfig
from unet_tpu.diffusion.gaussian import GaussianDiffusion
from unet_tpu.models import unet


def ddpm_sample(params, cfg: UnetConfig, diffusion: GaussianDiffusion, key,
                *, batch_size: int = 1, compute_dtype=jnp.float32,
                x_init=None):
    """Draw `batch_size` images.  Returns (B, H, W, C) fp32 in [-1, 1]-ish
    (unclipped, as the reference).  Jit-compatible; `cfg`, `batch_size` and
    `compute_dtype` are static under jit.
    """
    T = diffusion.num_timesteps
    S = cfg.image_size
    betas = diffusion.betas
    abar = diffusion.alphas_cumprod

    key, init_key = jax.random.split(key)
    if x_init is None:
        x = jax.random.normal(
            init_key, (batch_size, S, S, cfg.in_channels), jnp.float32)
    else:
        x = x_init.astype(jnp.float32)

    def body(i, carry):
        x, key = carry
        t = T - 1 - i  # t runs T-1, T-2, ..., 2
        key, nkey = jax.random.split(key)
        eps = unet.apply(params, cfg, x.astype(compute_dtype),
                         jnp.full((batch_size,), t, jnp.float32),
                         compute_dtype=compute_dtype).astype(jnp.float32)
        beta_t = betas[t - 1]
        alpha_t = abar[t - 1]
        alpha_t_1 = abar[t - 2]
        mu = (x - (beta_t * jax.lax.rsqrt(1.0 - alpha_t)) * eps) \
            * jax.lax.rsqrt(1.0 - beta_t)
        sigma = jnp.sqrt((1.0 - alpha_t_1) / (1.0 - alpha_t) * beta_t)
        x = mu + sigma * jax.random.normal(nkey, x.shape, jnp.float32)
        return x, key

    x, _ = jax.lax.fori_loop(0, T - 2, body, (x, key))
    return x


def make_sampler(cfg: UnetConfig, diffusion: GaussianDiffusion, *,
                 batch_size: int = 1, compute_dtype=jnp.float32):
    """Jitted `sample(params, key) -> (B, H, W, C)` closure."""
    return jax.jit(lambda params, key: ddpm_sample(
        params, cfg, diffusion, key,
        batch_size=batch_size, compute_dtype=compute_dtype))


def make_parallel_sampler(cfg: UnetConfig, diffusion: GaussianDiffusion,
                          mesh, *, batch_size: int,
                          compute_dtype=jnp.float32):
    """Jitted `sample(params, key) -> (B, H, W, C)` sharded over a mesh:
    the batch splits across the 'data' axis (each chip runs the full
    998-step chain on its shard; params replicated), the serving-side
    analog of the data-parallel train step.  `batch_size` is the GLOBAL
    batch and must divide by the data-axis size."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    assert batch_size % mesh.shape["data"] == 0, (
        batch_size, dict(mesh.shape))
    rep = NamedSharding(mesh, P())
    xsh = NamedSharding(mesh, P("data", None, None, None))

    def sample(params, key):
        x = ddpm_sample(params, cfg, diffusion, key,
                        batch_size=batch_size,
                        compute_dtype=compute_dtype)
        return jax.lax.with_sharding_constraint(x, xsh)

    return jax.jit(sample, in_shardings=(rep, rep), out_shardings=xsh)


def to_uint8(images) -> "jnp.ndarray":
    """[-1, 1] float -> uint8, the reference's unscale rule
    (generate.py:82-85)."""
    import numpy as np
    arr = (np.asarray(images) + 1.0) * 127.5
    return np.clip(arr, 0, 255).astype(np.uint8)
