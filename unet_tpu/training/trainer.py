"""Training step and loop.

The reference's per-iteration sequence (train_unet.cu:5019-5058):
zero_grad -> next_batch -> H2D -> sample timesteps -> timestep embeddings
-> draw noise -> forward-diffuse -> unet_forward -> unet_backward ->
AdamW.  Here the entire sequence after the host batch fetch is ONE jitted
XLA program with donated state — timestep sampling, noise, q_sample,
forward, backward (jax.grad) and the optimizer all fuse; there is no
zero_grad (grads are values, not arenas) and the only host<->device
traffic per step is the input batch and the scalar loss.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.config import TrainConfig, UnetConfig
from unet_tpu.diffusion.gaussian import (GaussianDiffusion,
                                         named_beta_schedule)
from unet_tpu.models import unet
from unet_tpu.training import optim


class TrainState(NamedTuple):
    params: object
    m: object
    v: object
    step: jnp.ndarray  # int32, number of completed optimizer steps
    rng: jax.Array     # jax PRNG key


def init_state(params, *, seed: int = 0, step: int = 0) -> TrainState:
    m, v = optim.init_moments(params)
    return TrainState(params=params, m=m, v=v,
                      step=jnp.asarray(step, jnp.int32),
                      rng=jax.random.PRNGKey(seed))


def make_loss_fn(cfg: UnetConfig, diffusion: GaussianDiffusion,
                 compute_dtype=jnp.float32, remat: bool = False):
    def loss_fn(params, x_start, t, noise):
        x_t = diffusion.q_sample(x_start, t, noise)
        pred = unet.apply(params, cfg, x_t.astype(compute_dtype), t,
                          compute_dtype=compute_dtype, remat=remat)
        diff = pred.astype(jnp.float32) - noise.astype(jnp.float32)
        return jnp.mean(jnp.square(diff))
    return loss_fn


def make_train_step(cfg: UnetConfig, tc: TrainConfig,
                    diffusion: Optional[GaussianDiffusion] = None,
                    donate: bool = True):
    """Returns jitted `train_step(state, batch) -> (state, loss)`.

    batch: (B, H, W, C) fp32 NHWC in [-1, 1].
    """
    if diffusion is None:
        diffusion = GaussianDiffusion.create(
            named_beta_schedule("linear", cfg.max_period))
    hp = optim.AdamWParams(lr=tc.lr, beta1=tc.beta1, beta2=tc.beta2,
                           eps=tc.eps, weight_decay=tc.weight_decay)
    loss_fn = make_loss_fn(cfg, diffusion, tc.compute_jnp_dtype, tc.remat)

    def step_with(state: TrainState, batch, t, noise):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, t, noise)
        new_step = state.step + 1
        params, m, v = optim.adamw_update(
            state.params, grads, state.m, state.v, new_step, hp)
        return state._replace(params=params, m=m, v=v, step=new_step), loss

    def train_step(state: TrainState, batch):
        rng, t_key, n_key = jax.random.split(state.rng, 3)
        t = jax.random.randint(t_key, (batch.shape[0],), 0,
                               diffusion.num_timesteps)
        noise = jax.random.normal(n_key, batch.shape, jnp.float32)
        state, loss = step_with(state, batch, t, noise)
        return state._replace(rng=rng), loss

    donate_args = (0,) if donate else ()
    return (jax.jit(train_step, donate_argnums=donate_args),
            jax.jit(step_with, donate_argnums=donate_args))


class LossCounter:
    """Running mean since last flush (reference train_unet.cu:4917-4932)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def add(self, loss: float) -> None:
        self.total += float(loss)
        self.count += 1

    def mean_and_reset(self) -> float:
        mean = self.total / max(self.count, 1)
        self.total, self.count = 0.0, 0
        return mean
