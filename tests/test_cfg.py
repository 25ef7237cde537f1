"""Classifier-free guidance, gradient accumulation, lr annealing.

The reference parses --microbatch and --lr_anneal_steps but never uses
them (reference train_unet.py:665-666), and its class-conditional
plumbing (label_emb, train_unet.py:320-321) is never exercised.  Here
all of it is live: exact-math gradient accumulation
(trainer._make_grad_fn), guided-diffusion-style linear lr annealing
(optim._lr_at), and classifier-free guidance (Ho & Salimans 2022):
label dropout to the null label -1 in training plus a doubled-batch
guided eps at sampling time (sampler.make_model_fn).
"""

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.config import TrainConfig, UnetConfig
from unet_tpu.diffusion.gaussian import GaussianDiffusion, named_beta_schedule
from unet_tpu.diffusion import sampler as S
from unet_tpu.models import unet
from unet_tpu.training import optim, trainer

CFG = UnetConfig(model_channels=32, image_size=16, attention_ds=(2,),
                 num_head_channels=32, channel_mult=(1, 2))
NUM_CLASSES = 5


def _init(num_classes=None, seed=0):
    return jax.jit(lambda k: unet.init(k, CFG, num_classes))(
        jax.random.PRNGKey(seed))


def _batch(b=4, seed=3):
    r = np.random.default_rng(seed)
    return jnp.asarray(
        r.standard_normal((b, 16, 16, 3)).astype(np.float32) * 0.4)


def _copy(tree):
    return jax.tree.map(jnp.array, tree)


# --- null label / classifier-free guidance ---------------------------------


def test_null_label_matches_unconditional():
    """apply(..., y=-1) on a class-conditional model == apply(..., y=None):
    the null label adds exactly nothing to the time embedding."""
    params = _init(NUM_CLASSES)
    x = _batch()
    t = jnp.asarray([0.0, 3.0, 7.0, 999.0])
    out_null = unet.apply(params, CFG, x, t, jnp.full((4,), -1, jnp.int32))
    out_uncond = unet.apply(params, CFG, x, t, None)
    np.testing.assert_array_equal(np.asarray(out_null),
                                  np.asarray(out_uncond))


def test_real_labels_differ_from_null():
    params = _init(NUM_CLASSES)
    x = _batch()
    t = jnp.full((4,), 10.0)
    out_c = unet.apply(params, CFG, x, t, jnp.asarray([0, 1, 2, 3]))
    out_u = unet.apply(params, CFG, x, t, jnp.full((4,), -1, jnp.int32))
    assert np.abs(np.asarray(out_c) - np.asarray(out_u)).max() > 1e-4


def test_label_dropout_one_equals_explicit_null():
    """label_dropout=1.0 makes the conditional train step bit-identical
    to feeding y=-1 explicitly (with dropout off)."""
    params = _init(NUM_CLASSES)
    x = _batch()
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    null = jnp.full((4,), -1, jnp.int32)

    tc_drop = TrainConfig(batch_size=4, lr=1e-3, label_dropout=1.0)
    tc_plain = TrainConfig(batch_size=4, lr=1e-3)
    step_d, _ = trainer.make_train_step(CFG, tc_drop, donate=False)
    step_p, _ = trainer.make_train_step(CFG, tc_plain, donate=False)

    s_d, loss_d = step_d(trainer.init_state(_copy(params)), x, y)
    s_p, loss_p = step_p(trainer.init_state(_copy(params)), x, null)
    assert float(loss_d) == float(loss_p)
    for a, b in zip(jax.tree.leaves(s_d.params), jax.tree.leaves(s_p.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_label_dropout_zero_keeps_labels():
    """dropout=0 must not perturb the conditional trajectory at all
    (the drop key is folded off to the side, never drawn)."""
    params = _init(NUM_CLASSES)
    x = _batch()
    y = jnp.asarray([4, 1, 0, 2], jnp.int32)
    step, _ = trainer.make_train_step(
        CFG, TrainConfig(batch_size=4, lr=1e-3), donate=False)
    s1, l1 = step(trainer.init_state(_copy(params)), x, y)
    s2, l2 = step(trainer.init_state(_copy(params)), x, y)
    assert float(l1) == float(l2)


def test_guided_model_fn_formula():
    """make_model_fn(w) == eps_u + w (eps_c - eps_u) of two plain calls."""
    params = _init(NUM_CLASSES)
    x = _batch()
    t = jnp.full((4,), 5.0)
    y = jnp.asarray([1, 2, 3, 4], jnp.int32)
    w = 3.0
    guided = S.make_model_fn(CFG, y=y, guidance_scale=w)(params, x, t)
    eps_c = unet.apply(params, CFG, x, t, y)
    eps_u = unet.apply(params, CFG, x, t, None)
    want = np.asarray(eps_u) + w * (np.asarray(eps_c) - np.asarray(eps_u))
    np.testing.assert_allclose(np.asarray(guided), want, atol=1e-5)


def test_guided_sampler_scale_one_is_conditional():
    """guidance_scale=1 must be the plain conditional chain (single
    model call — no doubled batch), and its randomness must match the
    unguided sampler's stream."""
    params = _init(NUM_CLASSES)
    diff = GaussianDiffusion.create(named_beta_schedule("linear", 100))
    key = jax.random.PRNGKey(11)
    y = jnp.asarray([2, 0], jnp.int32)
    a = S.ddim_sample(params, CFG, diff, key, num_steps=4, batch_size=2,
                      y=y, guidance_scale=1.0)

    def mf(params, x, t):  # plain conditional call, no guidance machinery
        return unet.apply(params, CFG, x, t, y)

    b = S.ddim_sample(params, CFG, diff, key, num_steps=4, batch_size=2,
                      model_fn=mf)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_guided_ddpm_sampler_runs():
    params = _init(NUM_CLASSES)
    diff = GaussianDiffusion.create(named_beta_schedule("linear", 100))
    out = S.ddpm_sample(params, CFG, diff, jax.random.PRNGKey(0),
                        batch_size=2, num_steps=3,
                        y=jnp.asarray([1, 3]), guidance_scale=2.5)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


# --- gradient accumulation (--microbatch) ----------------------------------


def test_microbatch_matches_full_batch():
    """Accumulated grads over microbatches == full-batch grads up to f32
    reassociation of the mean.  (Deliberately NOT compared through a
    whole optimizer step: AdamW's first step is g/(|g|+eps), which
    amplifies ulp-level grad reassociation into O(lr) parameter
    differences wherever |g| ~ eps — the grads are the contract.)"""
    params = _init()
    x = _batch(b=8, seed=9)
    t = jnp.asarray(np.random.default_rng(1).integers(0, 1000, 8))
    noise = jnp.asarray(np.random.default_rng(2).standard_normal(
        (8, 16, 16, 3)).astype(np.float32))
    diff = GaussianDiffusion.create(named_beta_schedule("linear", 1000))
    loss_fn = trainer.make_loss_fn(CFG, diff)

    full = jax.jit(trainer._make_grad_fn(
        loss_fn, TrainConfig(batch_size=8)))
    micro = jax.jit(trainer._make_grad_fn(
        loss_fn, TrainConfig(batch_size=8, microbatch=2)))
    l_f, g_f = full(params, x, t, noise, None)
    l_m, g_m = micro(params, x, t, noise, None)
    np.testing.assert_allclose(float(l_m), float(l_f), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_f)):
        a, b = np.asarray(a), np.asarray(b)
        # atol floor: leaves whose grads cancel to ~1e-9 across the
        # batch are pure reassociation noise at any relative tolerance
        np.testing.assert_allclose(a, b, rtol=2e-4,
                                   atol=1e-7 * max(np.abs(b).max(), 1.0))


def test_microbatch_equal_to_batch_is_identity():
    """microbatch == batch size short-circuits to the plain
    value_and_grad call (bit-identical)."""
    params = _init()
    x = _batch(b=4)
    t = jnp.asarray([1, 2, 3, 4])
    noise = jnp.zeros((4, 16, 16, 3), jnp.float32)
    diff = GaussianDiffusion.create(named_beta_schedule("linear", 1000))
    loss_fn = trainer.make_loss_fn(CFG, diff)
    plain = jax.jit(trainer._make_grad_fn(loss_fn, TrainConfig(batch_size=4)))
    same = jax.jit(trainer._make_grad_fn(
        loss_fn, TrainConfig(batch_size=4, microbatch=4)))
    l_p, g_p = plain(params, x, t, noise, None)
    l_s, g_s = same(params, x, t, noise, None)
    assert float(l_p) == float(l_s)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_microbatch_multi_step_scan():
    """make_multi_step honors microbatch (the production scan path):
    losses match the full-batch scan and training stays finite."""
    params = _init()
    batches = jnp.stack([_batch(b=4, seed=s) for s in (1, 2)])
    tc_f = TrainConfig(batch_size=4, lr=1e-3)
    tc_m = TrainConfig(batch_size=4, lr=1e-3, microbatch=2)
    s_f, l_f = trainer.make_multi_step(CFG, tc_f, donate=False)(
        trainer.init_state(_copy(params)), batches)
    s_m, l_m = trainer.make_multi_step(CFG, tc_m, donate=False)(
        trainer.init_state(_copy(params)), batches)
    # Step-1 losses identical inputs -> equal to reassociation; step-2
    # loss runs on step-1 params, which AdamW's eps-sensitive first step
    # lets drift by O(lr) (see test_microbatch_matches_full_batch).
    np.testing.assert_allclose(float(l_m[0]), float(l_f[0]), rtol=1e-5)
    assert int(s_m.step) == 2
    for a in jax.tree.leaves(s_m.params):
        assert np.isfinite(np.asarray(a)).all()


# --- linear lr annealing (--lr_anneal_steps) -------------------------------


def test_lr_anneal_schedule_values():
    """_lr_at reproduces guided-diffusion's _anneal_lr: full lr at step 1,
    linear to 0 at step anneal+1, clamped after."""
    hp = optim.AdamWParams(lr=1e-2, anneal_steps=4)
    got = [float(optim._lr_at(jnp.float32(s), hp)) for s in (1, 2, 3, 4, 5, 6)]
    np.testing.assert_allclose(
        got, [1e-2, 7.5e-3, 5e-3, 2.5e-3, 0.0, 0.0], rtol=1e-6)
    hp0 = optim.AdamWParams(lr=1e-2, anneal_steps=0)
    assert optim._lr_at(jnp.float32(100.0), hp0) == 1e-2


def test_lr_anneal_step_equals_scaled_lr():
    """A train step with anneal at step k == a step with the constant lr
    the schedule prescribes for k (bit-identical update)."""
    params = _init()
    x = _batch()
    t = jnp.asarray([1, 2, 3, 4])
    noise = jnp.zeros((4, 16, 16, 3), jnp.float32)
    anneal, k = 10, 3  # state at step k-1, taking step k
    lr = 1e-3
    lr_k = lr * (1.0 - (k - 1) / anneal)

    _, step_a = trainer.make_train_step(
        CFG, TrainConfig(batch_size=4, lr=lr, lr_anneal_steps=anneal),
        donate=False)
    _, step_c = trainer.make_train_step(
        CFG, TrainConfig(batch_size=4, lr=lr_k), donate=False)
    s_a, _ = step_a(trainer.init_state(_copy(params), step=k - 1), x, t,
                    noise)
    s_c, _ = step_c(trainer.init_state(_copy(params), step=k - 1), x, t,
                    noise)
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_c.params)):
        # the annealed lr is computed in f32 inside the step vs the
        # Python-float lr here: allow a few-ulp product difference
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
