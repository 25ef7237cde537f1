"""Samplers, fully on-device: DDPM ancestral (the reference surface) and
DDIM (fast sampling, no reference analog).

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


def make_model_fn(cfg: UnetConfig, *, compute_dtype=jnp.float32,
                  y=None, guidance_scale: float = 1.0):
    """`model_fn(params, x, t) -> eps` for the samplers.

    y = None: unconditional (the reference surface).  y = (B,) labels:
    class-conditional eps.  guidance_scale w != 1 additionally applies
    classifier-free guidance (Ho & Salimans 2022):
    eps = eps_uncond + w * (eps_cond - eps_uncond), computed as ONE
    model call on a doubled batch ([y | null]) so the conditional and
    unconditional branches share every conv's MXU tile — the TPU-native
    shape of the two-forward trick (w=1 degenerates to the plain
    conditional call, w=0 to unconditional)."""
    def model_fn(params, x, t):
        if y is None:
            return unet.apply(params, cfg, x.astype(compute_dtype), t,
                              compute_dtype=compute_dtype
                              ).astype(jnp.float32)
        yy = jnp.broadcast_to(jnp.asarray(y, jnp.int32), (x.shape[0],))
        if guidance_scale == 0.0:   # degenerates to unconditional: one
            yy = jnp.full_like(yy, -1)  # null-label call, not a doubled
        if guidance_scale in (0.0, 1.0):  # batch multiplied by zero
            return unet.apply(params, cfg, x.astype(compute_dtype), t, yy,
                              compute_dtype=compute_dtype
                              ).astype(jnp.float32)
        x2 = jnp.concatenate([x, x]).astype(compute_dtype)
        t2 = jnp.concatenate([t, t])
        y2 = jnp.concatenate([yy, jnp.full_like(yy, -1)])
        eps2 = unet.apply(params, cfg, x2, t2, y2,
                          compute_dtype=compute_dtype).astype(jnp.float32)
        eps_c, eps_u = jnp.split(eps2, 2)
        return eps_u + guidance_scale * (eps_c - eps_u)
    return model_fn


def ddpm_sample(params, cfg: UnetConfig, diffusion: GaussianDiffusion, key,
                *, batch_size: int = 1, compute_dtype=jnp.float32,
                x_init=None, num_steps=None, model_fn=None,
                y=None, guidance_scale: float = 1.0, noise=None):
    """Draw `batch_size` images.  Returns (B, H, W, C) fp32 in [-1, 1]-ish
    (unclipped, as the reference).  Jit-compatible; `cfg`, `batch_size` and
    `compute_dtype` are static under jit.  `num_steps` truncates the
    chain to its first iterations (t = T-1 downward) — partial
    denoising, used by tests and progressive-generation callers.
    `y`/`guidance_scale` select class-conditional and classifier-free-
    guided sampling (see make_model_fn); `model_fn` overrides the model
    call entirely.  `noise` (n_steps, B, H, W, C) supplies the per-step
    injected noise explicitly instead of drawing from `key` — the
    cross-framework parity hook: feed the exact randn sequence the
    reference's generate.py:52 draws and the chains match step-for-step.
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

    if model_fn is None:
        model_fn = make_model_fn(cfg, compute_dtype=compute_dtype, y=y,
                                 guidance_scale=guidance_scale)

    def body(i, carry):
        x, key = carry
        t = T - 1 - i  # t runs T-1, T-2, ..., 2
        key, nkey = jax.random.split(key)
        eps = model_fn(params, x,
                       jnp.full((batch_size,), t, jnp.float32))
        beta_t = betas[t - 1]
        alpha_t = abar[t - 1]
        alpha_t_1 = abar[t - 2]
        mu = (x - (beta_t * jax.lax.rsqrt(1.0 - alpha_t)) * eps) \
            * jax.lax.rsqrt(1.0 - beta_t)
        sigma = jnp.sqrt((1.0 - alpha_t_1) / (1.0 - alpha_t) * beta_t)
        z = (jax.random.normal(nkey, x.shape, jnp.float32)
             if noise is None else noise[i])
        x = mu + sigma * z
        return x, key

    n = T - 2 if num_steps is None else min(num_steps, T - 2)
    if noise is not None:
        assert noise.shape[0] >= n, (noise.shape, n)
    x, _ = jax.lax.fori_loop(0, n, body, (x, key))
    return x


def make_sampler(cfg: UnetConfig, diffusion: GaussianDiffusion, *,
                 batch_size: int = 1, compute_dtype=jnp.float32,
                 num_steps=None, y=None, guidance_scale: float = 1.0):
    """Jitted `sample(params, key) -> (B, H, W, C)` closure."""
    return jax.jit(lambda params, key: ddpm_sample(
        params, cfg, diffusion, key, num_steps=num_steps,
        batch_size=batch_size, compute_dtype=compute_dtype,
        y=y, guidance_scale=guidance_scale))


def ddim_sample(params, cfg: UnetConfig, diffusion: GaussianDiffusion, key,
                *, num_steps: int = 50, eta: float = 0.0,
                batch_size: int = 1, compute_dtype=jnp.float32,
                x_init=None, model_fn=None, y=None,
                guidance_scale: float = 1.0):
    """DDIM sampler (Song et al. 2020) — `num_steps` model calls instead
    of the ancestral chain's T-2.  No reference analog (generate.py only
    runs the full DDPM chain); this is the fast-sampling surface a
    production serving path needs: ~20x fewer forwards at 64px for
    visually comparable samples.

    Uses the repo's timestep convention (model time t indexes table slot
    t-1, as in ddpm_sample above): an evenly spaced descending
    subsequence T-1 = t_1 > t_2 > ... > t_S >= 1, with

      x0_pred = (x - sqrt(1-abar_t) eps) / sqrt(abar_t)
      sigma   = eta sqrt((1-abar_prev)/(1-abar_t)) sqrt(1-abar_t/abar_prev)
      x <- sqrt(abar_prev) x0_pred + sqrt(1-abar_prev-sigma^2) eps
           + sigma N(0,1)

    with abar_prev = 1 at the final step, so eta=0 is fully
    deterministic given x_init.  `model_fn(params, x, t) -> eps`
    overrides the U-Net call (used by the analytic exactness test).
    """
    import numpy as np
    T = diffusion.num_timesteps
    S = cfg.image_size
    assert 1 <= num_steps <= T - 1, (num_steps, T)
    abar = np.asarray(diffusion.alphas_cumprod)

    ts = np.unique(np.linspace(1, T - 1, num_steps)
                   .round().astype(np.int64))[::-1]
    a_cur = abar[ts - 1]
    a_prev = np.concatenate([abar[ts[1:] - 1], [1.0]])
    sigma = (eta * np.sqrt((1.0 - a_prev) / (1.0 - a_cur))
             * np.sqrt(np.maximum(1.0 - a_cur / a_prev, 0.0)))
    t_tab = jnp.asarray(ts, jnp.float32)
    a_cur_tab = jnp.asarray(a_cur, jnp.float32)
    a_prev_tab = jnp.asarray(a_prev, jnp.float32)
    sigma_tab = jnp.asarray(sigma, jnp.float32)

    key, init_key = jax.random.split(key)
    if x_init is None:
        x = jax.random.normal(
            init_key, (batch_size, S, S, cfg.in_channels), jnp.float32)
    else:
        x = x_init.astype(jnp.float32)

    if model_fn is None:
        model_fn = make_model_fn(cfg, compute_dtype=compute_dtype, y=y,
                                 guidance_scale=guidance_scale)

    def body(i, carry):
        x, key = carry
        key, nkey = jax.random.split(key)
        t = jnp.full((x.shape[0],), t_tab[i], jnp.float32)
        eps = model_fn(params, x, t)
        a_t, a_p, sg = a_cur_tab[i], a_prev_tab[i], sigma_tab[i]
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) * jax.lax.rsqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_p - sg * sg, 0.0)) * eps
        x = jnp.sqrt(a_p) * x0 + dir_xt \
            + sg * jax.random.normal(nkey, x.shape, jnp.float32)
        return x, key

    x, _ = jax.lax.fori_loop(0, len(ts), body, (x, key))
    return x


def make_ddim_sampler(cfg: UnetConfig, diffusion: GaussianDiffusion, *,
                      num_steps: int = 50, eta: float = 0.0,
                      batch_size: int = 1, compute_dtype=jnp.float32,
                      y=None, guidance_scale: float = 1.0):
    """Jitted DDIM `sample(params, key) -> (B, H, W, C)` closure."""
    return jax.jit(lambda params, key: ddim_sample(
        params, cfg, diffusion, key, num_steps=num_steps, eta=eta,
        batch_size=batch_size, compute_dtype=compute_dtype,
        y=y, guidance_scale=guidance_scale))


def make_parallel_sampler(cfg: UnetConfig, diffusion: GaussianDiffusion,
                          mesh, *, batch_size: int,
                          compute_dtype=jnp.float32, num_steps=None):
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
                        batch_size=batch_size, num_steps=num_steps,
                        compute_dtype=compute_dtype)
        return jax.lax.with_sharding_constraint(x, xsh)

    return jax.jit(sample, in_shardings=(rep, rep), out_shardings=xsh)


def to_uint8(images) -> "jnp.ndarray":
    """[-1, 1] float -> uint8, the reference's unscale rule
    (generate.py:82-85)."""
    import numpy as np
    arr = (np.asarray(images) + 1.0) * 127.5
    return np.clip(arr, 0, 255).astype(np.uint8)
