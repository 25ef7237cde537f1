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
    rng: jax.Array     # BASE jax PRNG key (constant across the run)
    # fp32 exponential moving average of params, or None when disabled
    # (reference train_unet.py:664 parses --ema_rate but never uses it;
    # here it is a live feature — see TrainConfig.ema_rate)
    ema: object = None


def step_keys(state: "TrainState"):
    """Per-step (timestep_key, noise_key) derived as fold_in(base, step).

    The random stream is a pure function of (seed, step) — a run resumed
    from a checkpoint at step N continues the exact trajectory of the
    original run, with nothing but the seed and step count persisted
    (the reference could not resume faithfully: raw curandState blob +
    lost step count, train_unet.cu:4819-4911, SURVEY.md section 5)."""
    k = jax.random.fold_in(state.rng, state.step)
    return jax.random.split(k)


def init_state(params, *, seed: int = 0, step: int = 0,
               ema_rate: float = 0.0, ema=None) -> TrainState:
    """ema_rate > 0 seeds the EMA from `params` (or from `ema` when
    resuming a checkpoint that carries one)."""
    m, v = optim.init_moments(params)
    if ema is None and ema_rate > 0.0:
        # jnp.array (copy), NOT asarray: the EMA must not alias the
        # param buffers — the train steps donate the whole state, and a
        # shared buffer would be donated twice (runtime error)
        ema = jax.tree.map(lambda a: jnp.array(a, jnp.float32), params)
    return TrainState(params=params, m=m, v=v,
                      step=jnp.asarray(step, jnp.int32),
                      rng=jax.random.PRNGKey(seed), ema=ema)


def _ema_step(ema, params, rate: float):
    """ema <- rate * ema + (1 - rate) * params, fp32 master precision
    (the torch-side convention for diffusion EMAs: averaged AFTER the
    optimizer update each step)."""
    if ema is None or rate <= 0.0:
        return ema
    return jax.tree.map(
        lambda e, p: e * rate + p.astype(jnp.float32) * (1.0 - rate),
        ema, params)


def make_loss_fn(cfg: UnetConfig, diffusion: GaussianDiffusion,
                 compute_dtype=jnp.float32, remat: bool = False):
    def loss_fn(params, x_start, t, noise, y=None):
        x_t = diffusion.q_sample(x_start, t, noise)
        pred = unet.apply(params, cfg, x_t.astype(compute_dtype), t, y,
                          compute_dtype=compute_dtype, remat=remat)
        diff = pred.astype(jnp.float32) - noise.astype(jnp.float32)
        return jnp.mean(jnp.square(diff))
    return loss_fn


def _make_grad_fn(loss_fn, tc: TrainConfig, shards: int = 1):
    """`(params, batch, t, noise, y) -> (loss, grads)`.

    With tc.microbatch == 0 this is one value_and_grad call.  With
    0 < microbatch < batch it scans microbatches of that size and
    averages, which is EXACTLY the full-batch math (the mean MSE over B
    examples is the mean of the microbatch means, and grad is linear),
    at microbatch/B of the activation memory — the live version of the
    reference's parsed-but-dead --microbatch flag (train_unet.py:665).

    shards > 1 (the mesh path): the batch dim is sharded over `shards`
    devices, so microbatches are split INTERLEAVED — each device
    contributes its own contiguous rows to every microbatch — keeping
    every scanned slice on the devices that already hold it (a
    contiguous split would put microbatch 0 entirely on the first
    devices and force GSPMD to reshard per step).  Any equal-size
    disjoint regrouping leaves the mean-of-means identical."""
    vg = jax.value_and_grad(loss_fn)
    if not tc.microbatch:
        return lambda params, batch, t, noise, y=None: \
            vg(params, batch, t, noise, y)

    def grad_fn(params, batch, t, noise, y=None):
        mb = tc.microbatch
        n = batch.shape[0] // mb
        assert n * mb == batch.shape[0], (batch.shape[0], mb)
        assert mb % shards == 0, (mb, shards)
        if n == 1:
            return vg(params, batch, t, noise, y)

        def split(a):
            if shards == 1:
                return a.reshape((n, mb) + a.shape[1:])
            per = mb // shards
            return (a.reshape((shards, n, per) + a.shape[1:])
                    .swapaxes(0, 1)
                    .reshape((n, mb) + a.shape[1:]))

        def body(carry, xs):
            l_acc, g_acc = carry
            b, tt, nn, yy = xs
            loss, grads = vg(params, b, tt, nn, yy)
            g_acc = jax.tree.map(
                lambda acc, g: acc + g.astype(jnp.float32), g_acc, grads)
            return (l_acc + loss, g_acc), None

        zeros = jax.tree.map(
            lambda a: jnp.zeros(a.shape, jnp.float32), params)
        xs = (split(batch), split(t), split(noise),
              None if y is None else split(y))
        (l_acc, g_acc), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zeros), xs)
        inv = 1.0 / n
        return l_acc * inv, jax.tree.map(lambda g: g * inv, g_acc)

    return grad_fn


def _drop_labels(y, t_key, rate: float):
    """Per-example classifier-free-guidance label dropout: replace each
    label with the null label -1 (see models/unet.apply) with prob
    `rate`.  Keyed off a fold of the step's timestep key so enabling it
    perturbs nothing else in the random trajectory."""
    if y is None or rate <= 0.0:
        return y
    d_key = jax.random.fold_in(t_key, 0x1ABE1)
    drop = jax.random.bernoulli(d_key, rate, y.shape)
    return jnp.where(drop, jnp.asarray(-1, y.dtype), y)


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
                           eps=tc.eps, weight_decay=tc.weight_decay,
                           anneal_steps=tc.lr_anneal_steps)
    loss_fn = make_loss_fn(cfg, diffusion, tc.compute_jnp_dtype, tc.remat)
    grad_fn = _make_grad_fn(loss_fn, tc)

    def step_with(state: TrainState, batch, t, noise, y=None):
        loss, grads = grad_fn(state.params, batch, t, noise, y)
        new_step = state.step + 1
        params, m, v = optim.adamw_update(
            state.params, grads, state.m, state.v, new_step, hp)
        return state._replace(
            params=params, m=m, v=v, step=new_step,
            ema=_ema_step(state.ema, params, tc.ema_rate)), loss

    def train_step(state: TrainState, batch, y=None):
        t_key, n_key = step_keys(state)
        t = jax.random.randint(t_key, (batch.shape[0],), 0,
                               diffusion.num_timesteps)
        noise = jax.random.normal(n_key, batch.shape, jnp.float32)
        return step_with(state, batch, t, noise,
                         _drop_labels(y, t_key, tc.label_dropout))

    donate_args = (0,) if donate else ()
    return (jax.jit(train_step, donate_argnums=donate_args),
            jax.jit(step_with, donate_argnums=donate_args))


def make_multi_step(cfg: UnetConfig, tc: TrainConfig,
                    diffusion: Optional[GaussianDiffusion] = None,
                    donate: bool = True, unroll: int = 1,
                    input_u8: bool = False):
    """Returns jitted `multi_step(state, batches) -> (state, losses)` that
    scans K train steps in ONE XLA program.

    batches: (K, B, H, W, C).  Amortizes per-dispatch host overhead (the
    single-step program costs ~3.5 ms of host time per step on a 1-core
    host) — the TPU analog of the reference's aspiration to run the whole
    loop without host round-trips (its loop syncs per step for the loss,
    train_unet.cu:4419).

    input_u8=True takes batches as uint8 pixels and computes
    u/127.5 - 1 on DEVICE, at 1/4 the host->device bytes.  For any
    prepare_data-written .bin (which stores exactly that expression of
    uint8 pixels) the reconstruction matches the stored f32 within 1 ulp
    (XLA lowers the division as a reciprocal multiply) — noise four
    orders of magnitude below the data's own uint8 quantization.  On
    this machine's tunneled TPU the f32 chunk transfer costs ~17 ms/step
    of wall time against a 16.9 ms device step; u8 cuts it to ~4.
    cli/train.py probes the first chunk for exact u8-invertibility
    before enabling it.
    """
    if diffusion is None:
        diffusion = GaussianDiffusion.create(
            named_beta_schedule("linear", cfg.max_period))
    hp = optim.AdamWParams(lr=tc.lr, beta1=tc.beta1, beta2=tc.beta2,
                           eps=tc.eps, weight_decay=tc.weight_decay,
                           anneal_steps=tc.lr_anneal_steps)
    loss_fn = make_loss_fn(cfg, diffusion, tc.compute_jnp_dtype, tc.remat)
    grad_fn = _make_grad_fn(loss_fn, tc)

    def one(state: TrainState, batch):
        if input_u8:
            batch = batch.astype(jnp.float32) / 127.5 - 1.0
        t_key, n_key = step_keys(state)
        t = jax.random.randint(t_key, (batch.shape[0],), 0,
                               diffusion.num_timesteps)
        noise = jax.random.normal(n_key, batch.shape, jnp.float32)
        loss, grads = grad_fn(state.params, batch, t, noise)
        new_step = state.step + 1
        params, m, v = optim.adamw_update(
            state.params, grads, state.m, state.v, new_step, hp)
        return state._replace(
            params=params, m=m, v=v, step=new_step,
            ema=_ema_step(state.ema, params, tc.ema_rate)), loss

    def multi_step(state: TrainState, batches):
        return jax.lax.scan(one, state, batches, unroll=unroll)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def tree_sq_norm(tree) -> jnp.ndarray:
    """Sum of squared L2 norms over all leaves — the reference's norm
    metric (compute_norms, reference train_unet.py:937-945, which logs
    the SUM OF SQUARES, not its square root)."""
    return sum(jnp.sum(jnp.square(a.astype(jnp.float32)))
               for a in jax.tree.leaves(tree))


def make_train_step_aux(cfg: UnetConfig, tc: TrainConfig,
                        diffusion: Optional[GaussianDiffusion] = None,
                        donate: bool = True):
    """Like make_train_step but returns
    `(state, {"loss", "grad_norm", "param_norm"})` for the torch trainer's
    observability surface (reference train_unet.py:1022-1027)."""
    if diffusion is None:
        diffusion = GaussianDiffusion.create(
            named_beta_schedule("linear", cfg.max_period))
    hp = optim.AdamWParams(lr=tc.lr, beta1=tc.beta1, beta2=tc.beta2,
                           eps=tc.eps, weight_decay=tc.weight_decay,
                           anneal_steps=tc.lr_anneal_steps)
    loss_fn = make_loss_fn(cfg, diffusion, tc.compute_jnp_dtype, tc.remat)
    grad_fn = _make_grad_fn(loss_fn, tc)

    def train_step(state: TrainState, batch):
        t_key, n_key = step_keys(state)
        t = jax.random.randint(t_key, (batch.shape[0],), 0,
                               diffusion.num_timesteps)
        noise = jax.random.normal(n_key, batch.shape, jnp.float32)
        loss, grads = grad_fn(state.params, batch, t, noise)
        aux = {"loss": loss,
               "grad_norm": tree_sq_norm(grads),
               "param_norm": tree_sq_norm(state.params)}
        new_step = state.step + 1
        params, m, v = optim.adamw_update(
            state.params, grads, state.m, state.v, new_step, hp)
        return state._replace(
            params=params, m=m, v=v, step=new_step,
            ema=_ema_step(state.ema, params, tc.ema_rate)), aux

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def device_peak_memory_mib(compiled=None) -> Optional[float]:
    """Peak device memory in MiB (the reference logs
    torch.cuda.max_memory_allocated, train_unet.py:1036).

    Runtime allocator stats when the platform exposes them; otherwise
    (e.g. the axon PJRT plugin returns no memory_stats) falls back to the
    XLA buffer-assignment peak of `compiled` — the compile-time analog,
    which on TPU is exact for the program's own arena (static planning,
    like the reference's unet_make_ptrs_and_count_memory,
    train_unet.cu:3856)."""
    try:
        stats = jax.devices()[0].memory_stats()
        peak = (stats or {}).get("peak_bytes_in_use") \
            or (stats or {}).get("bytes_in_use")
        if peak is not None:
            return peak / (1024 * 1024)
    except Exception:
        pass
    if compiled is not None:
        try:
            ma = compiled.memory_analysis()
            peak = (ma.peak_memory_in_bytes
                    or (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                        + ma.output_size_in_bytes))
            return peak / (1024 * 1024)
        except Exception:
            pass
    return None


# ---------------------------------------------------------------------------
# Flat-master-parameter fast path.  Master params + AdamW moments live in
# one contiguous f32 vector (the reference's arena layout,
# train_unet.cu:4201-4235); per-tensor views exist only as the bf16 compute
# cast inside the step.  Avoids XLA's padded tiled layouts on optimizer
# traffic (~2 ms/step on the v5e at the default config).


class FlatState(NamedTuple):
    flat: jnp.ndarray   # f32[n] master parameters (tree-flatten order)
    m: jnp.ndarray      # f32[n]
    v: jnp.ndarray      # f32[n]
    step: jnp.ndarray   # int32
    rng: jax.Array


def flatten_state(params, *, seed: int = 0, step: int = 0):
    """(params pytree) -> (FlatState, unravel fn)."""
    from jax.flatten_util import ravel_pytree
    flat, unravel = ravel_pytree(
        jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params))
    return FlatState(flat=flat, m=jnp.zeros_like(flat),
                     v=jnp.zeros_like(flat),
                     step=jnp.asarray(step, jnp.int32),
                     rng=jax.random.PRNGKey(seed)), unravel


def make_flat_multi_step(cfg: UnetConfig, tc: TrainConfig, unravel,
                         diffusion: Optional[GaussianDiffusion] = None,
                         donate: bool = True):
    """Jitted `multi_step(FlatState, (K,B,H,W,C)) -> (FlatState, (K,) losses)`
    — scan over K steps, flat AdamW, one dispatch."""
    if diffusion is None:
        diffusion = GaussianDiffusion.create(
            named_beta_schedule("linear", cfg.max_period))
    hp = optim.AdamWParams(lr=tc.lr, beta1=tc.beta1, beta2=tc.beta2,
                           eps=tc.eps, weight_decay=tc.weight_decay,
                           anneal_steps=tc.lr_anneal_steps)
    loss_fn = make_loss_fn(cfg, diffusion, tc.compute_jnp_dtype, tc.remat)
    from jax.flatten_util import ravel_pytree

    def flat_loss(flat, batch, t, noise, y=None):
        return loss_fn(unravel(flat), batch, t, noise, y)

    # microbatch accumulation works on the flat vector exactly as on the
    # pytree (every step builder honors tc.microbatch)
    grad_fn = _make_grad_fn(flat_loss, tc)

    def one(state: FlatState, batch):
        t_key, n_key = step_keys(state)
        t = jax.random.randint(t_key, (batch.shape[0],), 0,
                               diffusion.num_timesteps)
        noise = jax.random.normal(n_key, batch.shape, jnp.float32)
        loss, g_flat = grad_fn(state.flat, batch, t, noise)
        new_step = state.step + 1
        flat, m, v = optim.adamw_update_flat(
            state.flat, g_flat, state.m, state.v, new_step, hp)
        return FlatState(flat, m, v, new_step, state.rng), loss

    def multi_step(state: FlatState, batches):
        return jax.lax.scan(one, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


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
