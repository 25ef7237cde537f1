"""End-to-end training parity: 10 real AdamW steps vs torch.

The analog of the reference's unet_test tier (reference dev/unet_test.py +
dev/unet_test.cu; SURVEY.md section 4 tier 3): identical init, identical
timesteps/noise injected on both sides, compare the loss trajectory and
final params.  Like the reference test, uses lr=1e-3, wd=0.01
(dev/unet_test.py:255, dev/unet_test.cu:2108) — different from the
production trainer's lr=1e-4, wd=0.0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from unet_tpu.config import TrainConfig
from unet_tpu.diffusion.gaussian import (GaussianDiffusion,
                                         named_beta_schedule)
from unet_tpu.io import checkpoint as ckpt_io
from unet_tpu.training import trainer

from tests.test_model import make_params_and_flat
from tests.torch_ref import TorchUnet

N_STEPS = 10


def test_training_trajectory_parity(small_cfg, rng):
    params, flat = make_params_and_flat(small_cfg)
    tmodel = TorchUnet(small_cfg, flat)

    B, S = 4, small_cfg.image_size
    T = small_cfg.max_period
    diffusion = GaussianDiffusion.create(named_beta_schedule("linear", T))
    sqrt_ac = np.asarray(diffusion.sqrt_alphas_cumprod)
    sqrt_1mac = np.asarray(diffusion.sqrt_one_minus_alphas_cumprod)

    # Shared host-side draws (the reference shares an MT19937 stream
    # between torch and CUDA, dev/rand.h; here numpy plays that role).
    batches = rng.standard_normal((N_STEPS, B, 3, S, S),
                                  dtype=np.float32) * 0.5
    noises = rng.standard_normal((N_STEPS, B, 3, S, S), dtype=np.float32)
    tsteps = rng.integers(0, T, size=(N_STEPS, B))

    # --- torch side ---
    opt = torch.optim.AdamW(tmodel.params, lr=1e-3, weight_decay=0.01)
    torch_losses = []
    for i in range(N_STEPS):
        opt.zero_grad()
        x0 = torch.tensor(batches[i])
        noise = torch.tensor(noises[i])
        t = torch.tensor(tsteps[i])
        a = torch.tensor(sqrt_ac[tsteps[i]])[:, None, None, None]
        b = torch.tensor(sqrt_1mac[tsteps[i]])[:, None, None, None]
        x_t = a * x0 + b * noise
        out = tmodel.forward(x_t, t.float())
        loss = torch.mean((out - noise) ** 2)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # --- jax side ---
    tc = TrainConfig(batch_size=B, lr=1e-3, weight_decay=0.01)
    _, step_with = trainer.make_train_step(small_cfg, tc, diffusion,
                                           donate=False)
    state = trainer.init_state(params)
    jax_losses = []
    for i in range(N_STEPS):
        state, loss = step_with(
            state, jnp.asarray(batches[i].transpose(0, 2, 3, 1)),
            jnp.asarray(tsteps[i]),
            jnp.asarray(noises[i].transpose(0, 2, 3, 1)))
        jax_losses.append(float(loss))

    # Loss trajectories must track each other closely; the reference
    # prints both trajectories and eyeballs them (dev/unet_test.cu:2129);
    # we assert.
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)
    assert jax_losses[-1] < jax_losses[0], "training must reduce loss"

    # Final parameter parity after 10 AdamW steps.
    final_jax = ckpt_io.flatten_params(state.params, small_cfg)
    final_torch = np.concatenate(
        [p.detach().numpy().ravel() for p in tmodel.params])
    # 10 steps of fp32 drift through AdamW's rsqrt; reference end-to-end
    # grad tier is 1e-2 (dev/unet_test.cu:2085).
    np.testing.assert_allclose(final_jax, final_torch, atol=5e-3)


def test_rng_train_step_runs(small_cfg, rng):
    # The production train step (jax.random for t and noise) runs and
    # decreases loss on repeated identical batches.
    params, _ = make_params_and_flat(small_cfg, seed=1)
    tc = TrainConfig(batch_size=4, lr=1e-3)
    train_step, _ = trainer.make_train_step(small_cfg, tc, donate=False)
    state = trainer.init_state(params, seed=3)
    batch = jnp.asarray(
        rng.standard_normal((4, small_cfg.image_size, small_cfg.image_size,
                             3), dtype=np.float32) * 0.5)
    losses = []
    for _ in range(8):
        state, loss = train_step(state, batch)
        losses.append(float(loss))
    assert int(state.step) == 8
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_multi_step_matches_single_steps(small_cfg, rng):
    """lax.scan multi-step == K independent single steps (same RNG fold)."""
    params, _ = make_params_and_flat(small_cfg)
    B, S, K = 2, small_cfg.image_size, 3
    # large eps: Adam's g/(sqrt(v)+eps) would otherwise amplify the ~1 ULP
    # grad difference between the scanned and unrolled programs into
    # O(lr) param noise on near-zero-grad tensors
    tc = TrainConfig(batch_size=B, lr=1e-3, eps=1e-3)
    batches = rng.standard_normal((K, B, S, S, 3),
                                  dtype=np.float32) * 0.5

    step_fn, _ = trainer.make_train_step(small_cfg, tc, donate=False)
    s1 = trainer.init_state(params, seed=5)
    single_losses = []
    for i in range(K):
        s1, loss = step_fn(s1, jnp.asarray(batches[i]))
        single_losses.append(float(loss))

    ms = trainer.make_multi_step(small_cfg, tc, donate=False)
    s2 = trainer.init_state(params, seed=5)
    s2, losses = ms(s2, jnp.asarray(batches))
    np.testing.assert_allclose(np.asarray(losses), single_losses, rtol=1e-6)
    # scan and unrolled programs fuse differently -> ~1 ULP param drift
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(s2.step) == K


def test_flat_multi_step_matches_pytree(small_cfg, rng):
    """Flat-master-parameter fast path == pytree path."""
    params, _ = make_params_and_flat(small_cfg)
    B, S, K = 2, small_cfg.image_size, 2
    tc = TrainConfig(batch_size=B, lr=1e-3, eps=1e-3)  # see above
    batches = jnp.asarray(rng.standard_normal((K, B, S, S, 3),
                                              dtype=np.float32) * 0.5)

    ms = trainer.make_multi_step(small_cfg, tc, donate=False)
    s1 = trainer.init_state(params, seed=5)
    s1, losses1 = ms(s1, batches)

    fstate, unravel = trainer.flatten_state(params, seed=5)
    fms = trainer.make_flat_multi_step(small_cfg, tc, unravel,
                                       donate=False)
    fstate, losses2 = fms(fstate, batches)
    np.testing.assert_allclose(np.asarray(losses2), np.asarray(losses1),
                               rtol=1e-5)
    p1 = np.concatenate([np.asarray(a).ravel()
                         for a in jax.tree.leaves(s1.params)])
    p2_tree = unravel(fstate.flat)
    p2 = np.concatenate([np.asarray(a).ravel()
                         for a in jax.tree.leaves(p2_tree)])
    np.testing.assert_allclose(p1, p2, atol=2e-6)

    # the flat path honors tc.microbatch like every other step builder
    fstate3, unravel3 = trainer.flatten_state(params, seed=5)
    fms_mb = trainer.make_flat_multi_step(
        small_cfg, TrainConfig(batch_size=B, lr=1e-3, eps=1e-3,
                               microbatch=1),
        unravel3, donate=False)
    fstate3, losses3 = fms_mb(fstate3, batches)
    np.testing.assert_allclose(np.asarray(losses3), np.asarray(losses2),
                               rtol=1e-5)


def test_cross_framework_rng_trajectory(small_cfg, rng):
    """Bit-identical RNG streams on both sides (the reference's dev/rand.h
    strategy, SURVEY.md section 3.5): torch draws via manual_seed; the jax
    side draws the SAME timesteps/noise from the native TorchRng MT19937.
    Unlike test_training_trajectory_parity (shared numpy draws), this
    exercises the actual cross-framework RNG contract."""
    pytest.importorskip("unet_tpu.utils.native")
    from unet_tpu.utils.native import TorchRng

    params, flat = make_params_and_flat(small_cfg)
    tmodel = TorchUnet(small_cfg, flat)
    B, S, T = 2, small_cfg.image_size, small_cfg.max_period
    steps = 4
    diffusion = GaussianDiffusion.create(named_beta_schedule("linear", T))
    sqrt_ac = np.asarray(diffusion.sqrt_alphas_cumprod)
    sqrt_1mac = np.asarray(diffusion.sqrt_one_minus_alphas_cumprod)
    batches = rng.standard_normal((steps, B, 3, S, S),
                                  dtype=np.float32) * 0.5

    # torch side: torch.manual_seed-driven draws
    torch.manual_seed(123)
    opt = torch.optim.AdamW(tmodel.params, lr=1e-3, weight_decay=0.01)
    torch_losses = []
    for i in range(steps):
        opt.zero_grad()
        ts = torch.floor(
            torch.rand(B) * T).float()
        noise = torch.zeros(B, 3, S, S)
        noise.normal_()
        ti = ts.long().numpy()
        a = torch.tensor(sqrt_ac[ti])[:, None, None, None]
        b = torch.tensor(sqrt_1mac[ti])[:, None, None, None]
        x_t = a * torch.tensor(batches[i]) + b * noise
        out = tmodel.forward(x_t, ts)
        loss = torch.mean((out - noise) ** 2)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # jax side: same draws from the native MT19937
    try:
        hrng = TorchRng(123)
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    tc = TrainConfig(batch_size=B, lr=1e-3, weight_decay=0.01)
    _, step_with = trainer.make_train_step(small_cfg, tc, diffusion,
                                           donate=False)
    state = trainer.init_state(params)
    jax_losses = []
    for i in range(steps):
        ts = hrng.timesteps(B, T)
        noise = hrng.normal((B, 3, S, S)).transpose(0, 2, 3, 1)
        state, loss = step_with(
            state, jnp.asarray(batches[i].transpose(0, 2, 3, 1)),
            jnp.asarray(ts), jnp.asarray(noise))
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)


def test_training_trajectory_parity_100_steps(rng):
    """Long-horizon trajectory parity (round-2 VERDICT item 2): 100 real
    AdamW steps vs torch on a reduced config, comparing the running-mean
    loss (the reference's own reporting statistic, LossCounter
    train_unet.cu:4917-4932) every 10 steps plus the final params.
    Per-step fp32 drift compounds over 100 steps, so per-step rtol is
    meaningless here; the running mean is the signal a user watches."""
    from unet_tpu.config import UnetConfig
    cfg = UnetConfig(model_channels=32, image_size=16, attention_ds=(2, 4),
                     num_head_channels=32, channel_mult=(1, 2))
    params, flat = make_params_and_flat(cfg)
    tmodel = TorchUnet(cfg, flat)

    steps, B, S, T = 100, 4, cfg.image_size, cfg.max_period
    diffusion = GaussianDiffusion.create(named_beta_schedule("linear", T))
    sqrt_ac = np.asarray(diffusion.sqrt_alphas_cumprod)
    sqrt_1mac = np.asarray(diffusion.sqrt_one_minus_alphas_cumprod)

    batches = rng.standard_normal((steps, B, 3, S, S),
                                  dtype=np.float32) * 0.5
    noises = rng.standard_normal((steps, B, 3, S, S), dtype=np.float32)
    tsteps = rng.integers(0, T, size=(steps, B))

    opt = torch.optim.AdamW(tmodel.params, lr=1e-3, weight_decay=0.01)
    torch_losses = []
    for i in range(steps):
        opt.zero_grad()
        x0 = torch.tensor(batches[i])
        noise = torch.tensor(noises[i])
        a = torch.tensor(sqrt_ac[tsteps[i]])[:, None, None, None]
        b = torch.tensor(sqrt_1mac[tsteps[i]])[:, None, None, None]
        out = tmodel.forward(a * x0 + b * noise,
                             torch.tensor(tsteps[i]).float())
        loss = torch.mean((out - noise) ** 2)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    tc = TrainConfig(batch_size=B, lr=1e-3, weight_decay=0.01)
    _, step_with = trainer.make_train_step(cfg, tc, diffusion,
                                           donate=False)
    state = trainer.init_state(params)
    jax_losses = []
    for i in range(steps):
        state, loss = step_with(
            state, jnp.asarray(batches[i].transpose(0, 2, 3, 1)),
            jnp.asarray(tsteps[i]),
            jnp.asarray(noises[i].transpose(0, 2, 3, 1)))
        jax_losses.append(float(loss))

    jm = np.cumsum(jax_losses) / np.arange(1, steps + 1)
    tm = np.cumsum(torch_losses) / np.arange(1, steps + 1)
    np.testing.assert_allclose(jm[9::10], tm[9::10], rtol=1e-2)
    assert jm[-1] < jm[9], "running-mean loss must decrease over the run"
    # final params stay within the reference's end-to-end tier after 100
    # compounding AdamW steps
    final_jax = ckpt_io.flatten_params(state.params, cfg)
    final_torch = np.concatenate(
        [p.detach().numpy().ravel() for p in tmodel.params])
    np.testing.assert_allclose(final_jax, final_torch, atol=2e-2)


def test_multi_step_u8_input_equivalent(rng):
    """input_u8=True reconstructs u/127.5-1 on device within 1 ulp of
    the host f32 (XLA lowers /const as a reciprocal multiply, so exact
    bitness is not promised), and the training trajectory is equivalent
    at that noise level."""
    from unet_tpu.config import UnetConfig
    from unet_tpu.models import unet
    cfg = UnetConfig(model_channels=32, image_size=16, attention_ds=(2, 4),
                     num_head_channels=32, channel_mult=(1, 2))
    tc = TrainConfig(batch_size=2, lr=1e-3)
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    u8 = rng.integers(0, 256, (3, 2, 16, 16, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 127.5 - 1.0

    # reconstruction: within 1 ulp (of values in [-1, 1])
    rec = np.asarray(jax.jit(
        lambda u: u.astype(jnp.float32) / 127.5 - 1.0)(u8))
    np.testing.assert_allclose(rec, f32, atol=1.3e-7, rtol=0)

    m_f = trainer.make_multi_step(cfg, tc, donate=False)
    s_f = trainer.init_state(jax.tree.map(jnp.array, params))
    s_f, l_f = m_f(s_f, f32)

    m_u = trainer.make_multi_step(cfg, tc, donate=False, input_u8=True)
    s_u = trainer.init_state(jax.tree.map(jnp.array, params))
    s_u, l_u = m_u(s_u, u8)

    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_u),
                               rtol=1e-4)
