"""Device mesh + sharded training (green-field: the reference is strictly
single-GPU, SURVEY.md section 2.8; BASELINE.json asks for data-parallel
gradient-allreduce over ICI as the TPU-native scaling layer).

Design: GSPMD, not hand-written collectives.  The global batch is sharded
over the "data" mesh axis, parameters/optimizer state are replicated, and
the jitted train step computes a global-mean loss — XLA then inserts the
gradient all-reduce over ICI automatically.  Semantics: identical math to
one device with the same global batch.

An optional "model" mesh axis spatially shards activations (height dim)
inside each replica — XLA GSPMD performs the conv halo exchanges.  This is
the TPU analog of tensor/sequence parallelism for a convnet and becomes
profitable only at large image sizes (BASELINE stretch: 128x128+).

fsdp=True shards parameters and AdamW moments over the data axis
(ZeRO-3 style; all-gather on use, reduce-scatter on grads) for models
whose state exceeds one chip's HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unet_tpu.config import TrainConfig, UnetConfig
from unet_tpu.diffusion.gaussian import GaussianDiffusion, named_beta_schedule
from unet_tpu.models import unet
from unet_tpu.training import optim, trainer


def make_mesh(data: int = 0, model: int = 1,
              devices=None) -> Mesh:
    """1-D or 2-D mesh over the given (default: all) devices.
    data=0 means "all remaining devices on the data axis"."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == 0:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), ("data", "model"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """(B, H, W, C) activations: batch over 'data', optionally height over
    'model' (GSPMD halo-exchanges the conv aprons)."""
    return NamedSharding(
        mesh, P("data", "model" if spatial else None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_sharding(mesh: Mesh, params) -> "object":
    """Pytree of shardings that shards each parameter/optimizer-state leaf
    over the 'data' axis (ZeRO-3 style): the largest dim divisible by the
    axis size is sharded; indivisible leaves stay replicated.  XLA/GSPMD
    inserts the all-gathers before use and reduce-scatters on the grads.
    Cuts per-chip param+moment memory ~Nx — needed at the 128x128+
    stretch scales, irrelevant for the 20M-param base model."""
    n = mesh.shape["data"]

    def spec(a):
        dims = getattr(a, "shape", ())
        best = -1
        for i, d in enumerate(dims):
            if d % n == 0 and d >= n and (best < 0 or d > dims[best]):
                best = i
        if best < 0:
            return NamedSharding(mesh, P())
        parts = [None] * len(dims)
        parts[best] = "data"
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(spec, params)


def tp_sharding(mesh: Mesh, params) -> "object":
    """Megatron-style tensor parallelism over the 'model' axis.

    Column-parallel (output channels / heads sharded): each ResBlock's
    conv1 + its emb projection, and the attention qkv — their outputs are
    channel-sharded, which GroupNorm tolerates shard-locally because the
    32 groups split evenly across the axis.  Row-parallel (input channels
    sharded, outputs partial-summed by a GSPMD all-reduce): conv2 and the
    attention proj — the classic pairing that needs one all-reduce per
    block per direction.  Everything else (conv_in/out head, time MLP,
    GN affines, skip projections) stays replicated; leaves whose
    dimension does not divide the axis stay replicated too.

    The reference has no distribution layer at all (SURVEY.md section
    2.8); this is the TPU-native green-field design: annotate weight
    shardings, let GSPMD place the collectives on ICI.
    """
    n = mesh.shape["model"]
    COL = {"conv1", "qkv", "emb"}
    ROW = {"conv2", "proj"}

    def spec(path, a):
        names = [k.key for k in path
                 if isinstance(k, jax.tree_util.DictKey)]
        dims = getattr(a, "shape", ())
        mod = names[-2] if len(names) >= 2 else None
        leaf = names[-1] if names else None
        if mod in COL and dims and dims[-1] % n == 0:
            parts = [None] * len(dims)
            parts[-1] = "model"
            return NamedSharding(mesh, P(*parts))
        if mod in ROW and leaf == "w" and len(dims) >= 2 \
                and dims[-2] % n == 0:
            parts = [None] * len(dims)
            parts[-2] = "model"
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def tp_fsdp_sharding(mesh: Mesh, params) -> "object":
    """2-D parameter sharding: the Megatron 'model'-axis split
    (tp_sharding) composed with a ZeRO-3 'data'-axis split of the largest
    REMAINING dim of every leaf — tp cuts the math per chip, fsdp cuts
    the resident state per replica, and the two axes never collide
    because the fsdp dim is chosen among dims tp left unsharded.  Leaves
    tp replicates (GN affines, biases, time MLP) still get their 'data'
    split, so the memory win covers the whole tree."""
    nd = mesh.shape["data"]

    def spec(a, tsh):
        dims = getattr(a, "shape", ())
        tparts = list(tsh.spec)
        parts = tparts + [None] * (len(dims) - len(tparts))
        best, bestd = -1, 0
        for i, d in enumerate(dims):
            if parts[i] is None and d % nd == 0 and d >= nd and d > bestd:
                best, bestd = i, d
        if best >= 0:
            parts[best] = "data"
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(spec, params, tp_sharding(mesh, params))


def shard_fraction(ptree, params) -> float:
    """Fraction of parameter ELEMENTS whose leaf is actually sharded
    (any non-replicated dim) under the given sharding tree — the honesty
    metric for tp/fsdp trees that silently replicate indivisible leaves."""
    tot = sharded = 0
    for a, sh in zip(jax.tree.leaves(params), jax.tree.leaves(ptree)):
        n = int(np.prod(getattr(a, "shape", ()) or (1,), dtype=np.int64))
        tot += n
        if any(p is not None for p in sh.spec):
            sharded += n
    return sharded / max(tot, 1)


def param_sharding(mesh: Mesh, params, *, fsdp: bool = False,
                   tp: bool = False):
    """The parameter sharding tree make_parallel_train_step /
    shard_state use for a given fsdp/tp selection — public so callers
    can report shard_fraction(param_sharding(...), params) without
    rebuilding private internals (round-4 ADVICE item 3)."""
    if fsdp and tp:
        return tp_fsdp_sharding(mesh, params)
    return (fsdp_sharding if fsdp else tp_sharding)(mesh, params)


def make_parallel_train_step(cfg: UnetConfig, tc: TrainConfig, mesh: Mesh,
                             diffusion: Optional[GaussianDiffusion] = None,
                             *, spatial: bool = False, fsdp: bool = False,
                             tp: bool = False, donate: bool = True,
                             example_params=None, class_cond: bool = False):
    """Jitted `train_step(state, global_batch) -> (state, loss)` over the
    mesh.  `global_batch` is (B_global, H, W, C); B_global must divide by
    the data-axis size.  State is replicated; loss is the global mean, so
    XLA all-reduces gradients over ICI exactly like the reference's
    "same math as 1 device with bigger batch" target (SURVEY.md 2.8).

    fsdp=True additionally shards params and AdamW moments over the
    'data' axis (requires `example_params` to derive the sharding tree;
    see fsdp_sharding).  tp=True shards them Megatron-style over the
    'model' axis instead (see tp_sharding; mutually exclusive with
    spatial, which uses the same axis for activation height); both
    together compose into the 2-D tp_fsdp_sharding tree.  Use
    shard_state(state, mesh, fsdp=..., tp=...) to place the initial
    state.

    class_cond=True makes the step `train_step(state, batch, y)` with
    (B_global,) int labels sharded over 'data' exactly like the batch
    rows they belong to (label-dropout per tc.label_dropout, as the
    single-device step).
    """
    assert not (tp and spatial), "tp and spatial both use the model axis"
    if diffusion is None:
        diffusion = GaussianDiffusion.create(
            named_beta_schedule("linear", cfg.max_period))
    hp = optim.AdamWParams(lr=tc.lr, beta1=tc.beta1, beta2=tc.beta2,
                           eps=tc.eps, weight_decay=tc.weight_decay,
                           anneal_steps=tc.lr_anneal_steps)
    loss_fn = trainer.make_loss_fn(cfg, diffusion, tc.compute_jnp_dtype,
                                   tc.remat)
    x_shard = batch_sharding(mesh, spatial)
    # tc.microbatch is PER-DEVICE (as tc.batch_size is); the scan inside
    # _make_grad_fn splits the GLOBAL batch, so scale by the data axis
    # and split interleaved (shards=) so each device's own rows appear
    # in every microbatch — no per-step resharding, and the averaged
    # accumulation is exactly the full-batch math.
    grad_tc = (dataclasses.replace(
        tc, microbatch=tc.microbatch * mesh.shape["data"])
        if tc.microbatch else tc)
    grad_fn = trainer._make_grad_fn(loss_fn, grad_tc,
                                    shards=mesh.shape["data"])

    def step_body(state: trainer.TrainState, batch, y=None):
        batch = jax.lax.with_sharding_constraint(batch, x_shard)
        t_key, n_key = trainer.step_keys(state)
        t = jax.random.randint(t_key, (batch.shape[0],), 0,
                               diffusion.num_timesteps)
        noise = jax.random.normal(n_key, batch.shape, jnp.float32)
        loss, grads = grad_fn(state.params, batch, t, noise,
                              trainer._drop_labels(y, t_key,
                                                   tc.label_dropout))
        new_step = state.step + 1
        params, m, v = optim.adamw_update(
            state.params, grads, state.m, state.v, new_step, hp)
        return state._replace(
            params=params, m=m, v=v, step=new_step,
            ema=trainer._ema_step(state.ema, params, tc.ema_rate)), loss

    if class_cond:
        def train_step(state, batch, y):
            return step_body(state, batch, y)
    else:
        def train_step(state, batch):
            return step_body(state, batch)

    rep = replicated(mesh)
    if fsdp or tp:
        assert example_params is not None, "fsdp/tp needs example_params"
        ptree = param_sharding(mesh, example_params, fsdp=fsdp, tp=tp)
        state_sh = trainer.TrainState(
            params=ptree, m=ptree, v=ptree, step=rep, rng=rep,
            ema=ptree if tc.ema_rate > 0.0 else None)
    else:
        state_sh = rep
    in_sh = (state_sh, x_shard)
    if class_cond:
        in_sh = in_sh + (NamedSharding(mesh, P("data")),)
    return jax.jit(
        train_step,
        in_shardings=in_sh,
        out_shardings=(state_sh, rep),
        donate_argnums=(0,) if donate else (),
    )


def shard_state(state: trainer.TrainState, mesh: Mesh,
                fsdp: bool = False, tp: bool = False) -> trainer.TrainState:
    """Place a TrainState onto the mesh (replicated; FSDP-sharded over
    'data' when fsdp=True; Megatron-sharded over 'model' when tp=True;
    2-D tp_fsdp_sharding when both)."""
    if fsdp or tp:
        ptree = param_sharding(mesh, state.params, fsdp=fsdp, tp=tp)
        rep = replicated(mesh)
        return trainer.TrainState(
            params=jax.device_put(state.params, ptree),
            m=jax.device_put(state.m, ptree),
            v=jax.device_put(state.v, ptree),
            step=jax.device_put(state.step, rep),
            rng=jax.device_put(state.rng, rep),
            ema=(None if state.ema is None
                 else jax.device_put(state.ema, ptree)))
    return jax.device_put(state, replicated(mesh))


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    return jax.device_put(jnp.asarray(batch), batch_sharding(mesh, spatial))
