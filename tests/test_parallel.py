"""Data-parallel training on the 8-device virtual CPU mesh.

Parallelism is green-field (the reference is single-GPU, SURVEY.md
section 2.8); the correctness contract is "same math as 1 device with the
same global batch", verified by comparing sharded against single-device
gradients to fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.config import TrainConfig, UnetConfig
from unet_tpu.models import unet
from unet_tpu.parallel import mesh as pmesh
from unet_tpu.training import trainer

TINY = UnetConfig(model_channels=32, image_size=16, attention_ds=(2, 4),
                  num_head_channels=32, channel_mult=(1, 2))


@pytest.fixture()
def tiny_setup():
    # fresh param copies per test: the sharded train steps DONATE their
    # state, which would delete a module-scoped fixture's arrays
    params = jax.jit(lambda k: unet.init(k, TINY))(jax.random.PRNGKey(0))
    params = jax.tree.map(jnp.array, params)
    rng = np.random.default_rng(3)
    batch = rng.standard_normal((8, 16, 16, 3)).astype(np.float32) * 0.5
    return params, batch


def test_dp_matches_single_device(tiny_setup):
    # The DP contract is "same gradients as one device with the global
    # batch" (gradients ARE the allreduced quantity; comparing post-Adam
    # params instead would be ill-conditioned: at step 1 the update is
    # lr*g/(|g|+eps), so reduction-order noise on near-zero grads shifts
    # params by O(lr)).
    params, batch = tiny_setup
    mesh = pmesh.make_mesh(data=8)
    from unet_tpu.diffusion.gaussian import (GaussianDiffusion,
                                             named_beta_schedule)
    diffusion = GaussianDiffusion.create(
        named_beta_schedule("linear", TINY.max_period))
    loss_fn = trainer.make_loss_fn(TINY, diffusion)

    t = jnp.asarray([5, 99, 500, 731, 1, 999, 250, 400])
    noise = jnp.asarray(np.random.default_rng(4).standard_normal(
        batch.shape).astype(np.float32))
    batch = jnp.asarray(batch)

    loss1, grads1 = jax.jit(jax.value_and_grad(loss_fn))(
        params, batch, t, noise)

    rep = pmesh.replicated(mesh)
    xsh = pmesh.batch_sharding(mesh)
    tsh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data"))
    loss8, grads8 = jax.jit(
        jax.value_and_grad(loss_fn),
        in_shardings=(rep, xsh, tsh, xsh),
        out_shardings=(rep, rep))(
        jax.device_put(params, rep), jax.device_put(batch, xsh),
        jax.device_put(t, tsh), jax.device_put(noise, xsh))

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads1),
                    jax.tree.leaves(jax.device_get(grads8))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_parallel_train_step_runs(tiny_setup):
    # The full random-draw DP step (the production path) executes and
    # produces a finite loss on the 8-device mesh.
    params, batch = tiny_setup
    tc = TrainConfig(batch_size=8)
    mesh = pmesh.make_mesh(data=8)
    step_fn = pmesh.make_parallel_train_step(TINY, tc, mesh)
    state = pmesh.shard_state(trainer.init_state(params), mesh)
    state, loss = step_fn(state, pmesh.shard_batch(batch, mesh))
    assert np.isfinite(float(loss))
    state, loss2 = step_fn(state, pmesh.shard_batch(batch, mesh))
    assert np.isfinite(float(loss2))


def test_parallel_microbatch_matches_full_batch(tiny_setup):
    """Gradient accumulation under the mesh: the DP step with
    microbatch=1 (per-device) produces the same loss as the full-batch
    DP step for the same state — microbatch composes with parallelism
    (tc.batch_size and tc.microbatch are both per-device; mesh.py scales
    the scan split by the data axis)."""
    params, batch = tiny_setup
    mesh = pmesh.make_mesh(data=8)
    batch16 = np.concatenate([batch, batch[::-1]])  # global batch 16

    def run(tc):
        p = jax.tree.map(jnp.array, params)
        step_fn = pmesh.make_parallel_train_step(TINY, tc, mesh)
        state = pmesh.shard_state(trainer.init_state(p, seed=11), mesh)
        state, loss = step_fn(state, pmesh.shard_batch(batch16, mesh))
        return float(loss), jax.device_get(state.params)

    l_full, p_full = run(TrainConfig(batch_size=2))
    l_micro, p_micro = run(TrainConfig(batch_size=2, microbatch=1))
    np.testing.assert_allclose(l_micro, l_full, rtol=1e-6)
    # params after one AdamW step: reassociation-of-the-mean noise only
    for a, b in zip(jax.tree.leaves(p_micro), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_parallel_microbatch_fsdp_runs(tiny_setup):
    """Microbatch accumulation with FSDP-sharded params/moments executes
    and yields a finite loss (the f32 grad accumulator inherits the
    parameter sharding through the scan carry)."""
    params, batch = tiny_setup
    tc = TrainConfig(batch_size=2, microbatch=1)
    mesh = pmesh.make_mesh(data=8)
    step_fn = pmesh.make_parallel_train_step(TINY, tc, mesh, fsdp=True,
                                             example_params=params)
    state = pmesh.shard_state(trainer.init_state(params), mesh, fsdp=True)
    batch16 = np.concatenate([batch, batch[::-1]])
    state, loss = step_fn(state, pmesh.shard_batch(batch16, mesh))
    assert np.isfinite(float(loss))


def test_spatial_sharding_runs(tiny_setup):
    # 4x2 mesh: batch over data, activation height over model (GSPMD halo
    # exchange through the convs).
    params, batch = tiny_setup
    tc = TrainConfig(batch_size=8)
    mesh = pmesh.make_mesh(data=4, model=2)
    step_fn = pmesh.make_parallel_train_step(TINY, tc, mesh, spatial=True)
    state = pmesh.shard_state(trainer.init_state(params), mesh)
    state, loss = step_fn(state, pmesh.shard_batch(batch, mesh,
                                                   spatial=True))
    assert np.isfinite(float(loss))


def test_parallel_sampler_matches_single_device(tiny_setup):
    """The mesh-parallel DDPM sampler (batch over 'data') produces the
    same images as the single-device sampler for the same key."""
    from unet_tpu.diffusion.gaussian import (GaussianDiffusion,
                                             named_beta_schedule)
    from unet_tpu.diffusion import sampler as dsampler
    params, _ = tiny_setup
    cfg = UnetConfig(model_channels=32, image_size=16,
                     attention_ds=(2, 4), num_head_channels=32,
                     channel_mult=(1, 2), max_period=52)
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    diffusion = GaussianDiffusion.create(
        named_beta_schedule("linear", cfg.max_period))
    key = jax.random.PRNGKey(7)

    # Truncate the chain to 5 steps: with an UNTRAINED net the full
    # ancestral chain at small T is chaotic (x_{t-1} scales by
    # 1/sqrt(1-beta) per step, values reach O(100)), so fp-reassociation
    # noise between the two compiled programs amplifies past any fixed
    # tolerance.  5 steps keeps values O(1) while still exercising the
    # sharded convs/GN/attention and the per-device noise split.
    single = dsampler.make_sampler(cfg, diffusion, batch_size=8,
                                   num_steps=5)
    ref = np.asarray(single(params, key))

    mesh = pmesh.make_mesh(data=8)
    par = dsampler.make_parallel_sampler(cfg, diffusion, mesh,
                                         batch_size=8, num_steps=5)
    out = par(jax.device_put(params, pmesh.replicated(mesh)), key)
    assert not out.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(jax.device_get(out)), ref,
                               atol=1e-4)


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_tp_matches_replicated(tiny_setup):
    """Megatron-style tensor parallelism over the 'model' axis: conv1/
    qkv/emb column-sharded, conv2/proj row-sharded (GSPMD all-reduces the
    partial sums).  Same losses as replicated DP over two steps."""
    params, batch = tiny_setup
    tc = TrainConfig(batch_size=8)
    mesh = pmesh.make_mesh(data=4, model=2)

    step_rep = pmesh.make_parallel_train_step(TINY, tc, mesh, donate=False)
    s_rep = pmesh.shard_state(trainer.init_state(params), mesh)
    s_rep, l1 = step_rep(s_rep, pmesh.shard_batch(batch, mesh))
    s_rep, l2 = step_rep(s_rep, pmesh.shard_batch(batch, mesh))

    step_tp = pmesh.make_parallel_train_step(
        TINY, tc, mesh, tp=True, example_params=params, donate=False)
    s_t = pmesh.shard_state(trainer.init_state(params), mesh, tp=True)
    # column-parallel weights are actually sharded on their output dim
    leaf = s_t.params["input"][1]["res"]["conv1"]["w"]
    assert not leaf.sharding.is_fully_replicated
    spec = leaf.sharding.spec
    assert spec[-1] == "model", spec
    s_t, t1 = step_tp(s_t, pmesh.shard_batch(batch, mesh))
    s_t, t2 = step_tp(s_t, pmesh.shard_batch(batch, mesh))

    np.testing.assert_allclose(float(t1), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(t2), float(l2), rtol=1e-4)


def test_fsdp_matches_replicated(tiny_setup):
    """ZeRO-style sharded params/moments: same losses as replicated DP
    over two steps (GSPMD all-gathers on use, reduce-scatters grads)."""
    params, batch = tiny_setup
    tc = TrainConfig(batch_size=8)
    mesh = pmesh.make_mesh(data=8)

    step_rep = pmesh.make_parallel_train_step(TINY, tc, mesh, donate=False)
    s_rep = pmesh.shard_state(trainer.init_state(params), mesh)
    s_rep, l1 = step_rep(s_rep, pmesh.shard_batch(batch, mesh))
    s_rep, l2 = step_rep(s_rep, pmesh.shard_batch(batch, mesh))

    step_fsdp = pmesh.make_parallel_train_step(
        TINY, tc, mesh, fsdp=True, example_params=params, donate=False)
    s_f = pmesh.shard_state(trainer.init_state(params), mesh, fsdp=True)
    # params are actually sharded across devices
    leaf = s_f.params["input"][1]["res"]["conv1"]["w"]
    assert not leaf.sharding.is_fully_replicated
    s_f, f1 = step_fsdp(s_f, pmesh.shard_batch(batch, mesh))
    s_f, f2 = step_fsdp(s_f, pmesh.shard_batch(batch, mesh))

    np.testing.assert_allclose(float(f1), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(f2), float(l2), rtol=1e-4)


def test_fsdp_ema_sharded(tiny_setup):
    """ema_rate > 0 under FSDP: the EMA tree is sharded like the params
    (parallel/mesh.py state_sh) and follows the recursion."""
    params, raw_batch = tiny_setup
    tc = TrainConfig(batch_size=8, lr=1e-3, ema_rate=0.5)
    mesh = pmesh.make_mesh(data=8)
    step = pmesh.make_parallel_train_step(TINY, tc, mesh, fsdp=True,
                                          example_params=params)
    state = pmesh.shard_state(
        trainer.init_state(jax.tree.map(jnp.array, params), ema_rate=0.5),
        mesh, fsdp=True)
    batch = pmesh.shard_batch(raw_batch, mesh)
    state, loss = step(state, batch)
    assert np.isfinite(float(jax.device_get(loss)))
    # one step from ema0=params: ema = 0.5*params0 + 0.5*params1
    p0 = jax.device_get(params)
    p1 = jax.device_get(state.params)
    ema = jax.device_get(state.ema)
    for e, a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(p0),
                       jax.tree.leaves(p1)):
        np.testing.assert_allclose(
            e, 0.5 * np.asarray(a, np.float32) + 0.5 * np.asarray(b),
            rtol=1e-5, atol=1e-7)


def test_dp_class_cond_matches_single_device(tiny_setup):
    """Class-conditional DP (round-3 VERDICT item 4): labels shard over
    'data' like the batch rows they belong to; losses identical to the
    single-device class-cond step (same state rng -> same t/noise/
    label-dropout draws) over two steps."""
    _, batch = tiny_setup
    NCLS = 5
    params = jax.jit(lambda k: unet.init(k, TINY, NCLS))(
        jax.random.PRNGKey(2))
    y = jnp.asarray(np.arange(8) % NCLS, jnp.int32)
    tc = TrainConfig(batch_size=8, label_dropout=0.2)

    step1, _ = trainer.make_train_step(TINY, tc, donate=False)
    s1 = trainer.init_state(jax.tree.map(jnp.array, params), seed=9)
    s1, l1 = step1(s1, jnp.asarray(batch), y)
    s1, l2 = step1(s1, jnp.asarray(batch), y)

    mesh = pmesh.make_mesh(data=8)
    stepp = pmesh.make_parallel_train_step(TINY, tc, mesh, class_cond=True,
                                           donate=False)
    sp = pmesh.shard_state(
        trainer.init_state(jax.tree.map(jnp.array, params), seed=9), mesh)
    ysh = jax.device_put(y, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    sp, p1 = stepp(sp, pmesh.shard_batch(batch, mesh), ysh)
    sp, p2 = stepp(sp, pmesh.shard_batch(batch, mesh), ysh)
    np.testing.assert_allclose(float(p1), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(p2), float(l2), rtol=1e-4)


def test_tp_fsdp_2d_sharding_matches_replicated(tiny_setup):
    """2-D parameter sharding (round-3 VERDICT item 8): Megatron 'model'
    split composed with a ZeRO 'data' split.  Conv1 weights end up sharded
    on BOTH axes; losses match replicated DP over two steps."""
    params, batch = tiny_setup
    tc = TrainConfig(batch_size=8)
    mesh = pmesh.make_mesh(data=4, model=2)

    # honesty metric: virtually the whole tree is sharded in 2-D
    # (biases/affines get their 'data' split even where tp replicates)
    ptree = pmesh.tp_fsdp_sharding(mesh, params)
    assert pmesh.shard_fraction(ptree, params) > 0.95
    # ...while tp alone covers the conv/attention weight mass only
    assert pmesh.shard_fraction(pmesh.tp_sharding(mesh, params),
                                params) > 0.5

    step_rep = pmesh.make_parallel_train_step(TINY, tc, mesh, donate=False)
    s_rep = pmesh.shard_state(trainer.init_state(params), mesh)
    s_rep, l1 = step_rep(s_rep, pmesh.shard_batch(batch, mesh))
    s_rep, l2 = step_rep(s_rep, pmesh.shard_batch(batch, mesh))

    step_2d = pmesh.make_parallel_train_step(
        TINY, tc, mesh, tp=True, fsdp=True, example_params=params,
        donate=False)
    s2 = pmesh.shard_state(trainer.init_state(params), mesh, tp=True,
                           fsdp=True)
    leaf = s2.params["input"][1]["res"]["conv1"]["w"]
    spec = leaf.sharding.spec
    assert spec[-1] == "model" and "data" in tuple(spec), spec
    s2, t1 = step_2d(s2, pmesh.shard_batch(batch, mesh))
    s2, t2 = step_2d(s2, pmesh.shard_batch(batch, mesh))

    np.testing.assert_allclose(float(t1), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(t2), float(l2), rtol=1e-4)


@pytest.mark.slow
def test_flagship_config_dp_matches_single_device():
    """One 8-device DP train step of the FULL production UnetConfig()
    (64px, 4 levels, attention at ds 4/8) vs single-device — catches
    sharding bugs the tiny configs cannot (skip-concat channel widths,
    attention at two resolutions, 4-level topology).  Round-3 VERDICT
    item 6; marked slow (two full-config CPU compiles)."""
    cfg = UnetConfig()
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    tc = TrainConfig(batch_size=8)
    batch = np.random.default_rng(1).standard_normal(
        (8, 64, 64, 3)).astype(np.float32) * 0.5

    step1, _ = trainer.make_train_step(cfg, tc, donate=False)
    s1 = trainer.init_state(jax.tree.map(jnp.array, params), seed=4)
    s1, l1 = step1(s1, jnp.asarray(batch))

    mesh = pmesh.make_mesh(data=8)
    stepp = pmesh.make_parallel_train_step(cfg, tc, mesh, donate=False)
    sp = pmesh.shard_state(
        trainer.init_state(jax.tree.map(jnp.array, params), seed=4), mesh)
    sp, lp = stepp(sp, pmesh.shard_batch(batch, mesh))

    np.testing.assert_allclose(float(lp), float(l1), rtol=1e-5)
    # post-AdamW params: reduction-order noise through g/(sqrt(v)+eps)
    # only — loose absolute tier
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(sp.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
