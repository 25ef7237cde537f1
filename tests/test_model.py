"""Full-model forward/backward parity vs the torch plan-executor.

The model-level analog of the reference's block tests + unet_test
(reference dev/resblock.cu, dev/attention_block.py, dev/unet_test.py;
SURVEY.md section 4 tiers 2-3).  Runs on the shared scaled-down config so
the XLA compile is tractable on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from unet_tpu.io import checkpoint as ckpt_io
from unet_tpu.models import blocks, unet

from tests.torch_ref import TorchUnet


def make_params_and_flat(cfg, seed=0):
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(seed))
    flat = ckpt_io.flatten_params(params, cfg)
    return params, flat


def test_plan_topology(small_cfg):
    plan = unet.build_plan(small_cfg)
    # Default topology: 12 input blocks + conv_in? -> conv_in + 2 res/level
    # * 4 levels + 3 downsample = 12 entries; 12 skips; 12 output blocks
    # (reference train_unet.cu:3447-3487, NUM_SKIP_CONNECTIONS=12).
    assert len(plan.input_blocks) == 12
    assert len(plan.output_blocks) == 12
    assert small_cfg.num_skips == 12
    # attention at ds 4 and 8: levels 2,3 in input blocks
    n_attn_in = sum(1 for b in plan.input_blocks
                    for l in b if l[0] == "attn")
    n_attn_out = sum(1 for b in plan.output_blocks
                     for l in b if l[0] == "attn")
    assert n_attn_in == 4 and n_attn_out == 6


def test_param_count_full():
    # Full ImageNet-64 config must expose exactly the torch param vector
    # the .bin contract expects.
    from tests.conftest import FULL_CFG
    n = ckpt_io.num_params(FULL_CFG)
    refs = unet.param_order(FULL_CFG)
    shapes = ckpt_io.param_shape_tree(FULL_CFG)
    total = sum(int(np.prod(ckpt_io.tree_get(shapes, p).shape))
                for p, _ in refs)
    assert n == total
    # Known closed-form check: independently recompute from the plan.
    plan = unet.build_plan(FULL_CFG)

    def res_n(cin, cout, emb):
        n = 2 * cin + (9 * cin + 1) * cout + (emb + 1) * cout
        n += 2 * cout + (9 * cout + 1) * cout
        if cin != cout:
            n += (cin + 1) * cout
        return n

    def attn_n(c):
        return 2 * c + (c + 1) * 3 * c + (c + 1) * c

    expect = (64 + 1) * 256 + (256 + 1) * 256  # time mlp
    for group in (list(plan.input_blocks) + [
            (plan.middle[0],), (plan.middle[1],), (plan.middle[2],)]
            + list(plan.output_blocks)):
        for l in group:
            if l[0] == "conv_in":
                expect += (9 * l[1] + 1) * l[2]
            elif l[0] == "res":
                expect += res_n(l[1], l[2], 256)
            elif l[0] == "attn":
                expect += attn_n(l[1])
    expect += 2 * 64 + (9 * 64 + 1) * 3  # out head
    assert n == expect


def test_fwd_flops_matches_xla(small_cfg):
    """The analytic model-FLOPs count bench.py bases MFU on
    (unet.fwd_flops) must agree with XLA's own cost analysis of the
    compiled forward.  Two conventions differ slightly: analytic counts
    contractions only (no elementwise ops) but at FULL kernel taps,
    while XLA counts every op but discounts SAME-padding conv border
    positions (a 3x3 conv at 32x32 has 4.1% zero-padded taps, 16% at
    8x8 — the discount shrinks as images grow, ~3% at the production
    64x64).  So analytic lands slightly above XLA on this scaled-down
    config (measured 1.083x); assert a tight band around that."""
    B = 2
    params, _ = make_params_and_flat(small_cfg)
    x = jax.ShapeDtypeStruct((B, small_cfg.image_size,
                              small_cfg.image_size, 3), jnp.float32)
    t = jax.ShapeDtypeStruct((B,), jnp.float32)
    fn = jax.jit(lambda p, xx, tt: unet.apply(p, small_cfg, xx, tt))
    ca = fn.lower(params, x, t).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_flops = float(ca["flops"])
    analytic = unet.fwd_flops(small_cfg, B)
    assert 0.97 * xla_flops < analytic <= 1.15 * xla_flops, (
        analytic, xla_flops)


def test_forward_parity(small_cfg, rng):
    params, flat = make_params_and_flat(small_cfg)
    tmodel = TorchUnet(small_cfg, flat)

    B, S = 2, small_cfg.image_size
    x = rng.standard_normal((B, 3, S, S), dtype=np.float32)
    ts = np.array([7.0, 993.0], dtype=np.float32)

    ref = tmodel.forward(torch.tensor(x), torch.tensor(ts)).detach().numpy()
    out = jax.jit(
        lambda p, x, t: unet.apply(p, small_cfg, x, t)
    )(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    # fp32 accumulation drift through ~30 GroupNorm/conv layers; the
    # reference's own end-to-end out tolerance is 1e-2
    # (dev/unet_test.cu:2085).  Structural parity is separately pinned to
    # 1e-9 by test_forward_parity_f64.
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_forward_parity_f64(rng):
    """Structural parity at float64 on a tiny config: pins the math to
    ~1e-9, so the loose fp32 tolerance above cannot hide a real wiring
    bug (wrong head split, eps, schedule, ...)."""
    from unet_tpu.config import UnetConfig
    cfg = UnetConfig(model_channels=32, image_size=16, attention_ds=(2, 4),
                     num_head_channels=32, channel_mult=(1, 2))
    params, flat = make_params_and_flat(cfg)  # f32 values, exact in f64
    tmodel = TorchUnet(cfg, flat)
    tmodel.params = [p.detach().double() for p in tmodel.params]
    orig_te = tmodel.time_embedding
    tmodel.time_embedding = lambda t: orig_te(t).double()

    B, S = 2, cfg.image_size
    x = rng.standard_normal((B, 3, S, S))
    ts = np.array([7.0, 993.0])
    ref = tmodel.forward(torch.tensor(x, dtype=torch.float64),
                         torch.tensor(ts, dtype=torch.float64))
    with jax.enable_x64():
        p64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        out = unet.apply(p64, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(ts), compute_dtype=jnp.float64)
        out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref.detach().numpy(), atol=1e-9)


def test_grad_parity(small_cfg, rng):
    # Gradient of the MSE training loss wrt every parameter, compared as
    # one flat torch-order vector — the analog of validating the whole
    # grad arena in one call (reference dev/unet_test.cu:2105).
    params, flat = make_params_and_flat(small_cfg)
    tmodel = TorchUnet(small_cfg, flat)

    B, S = 2, small_cfg.image_size
    x = rng.standard_normal((B, 3, S, S), dtype=np.float32)
    ts = np.array([13.0, 600.0], dtype=np.float32)
    target = rng.standard_normal((B, 3, S, S), dtype=np.float32)

    out = tmodel.forward(torch.tensor(x), torch.tensor(ts))
    loss = torch.mean((out - torch.tensor(target)) ** 2)
    loss.backward()
    ref_grads = tmodel.grads_flat()

    def loss_fn(p):
        pred = unet.apply(p, small_cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(ts))
        return jnp.mean(
            (pred - jnp.asarray(target.transpose(0, 2, 3, 1))) ** 2)

    jloss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(jloss), float(loss.detach()),
                               rtol=1e-4)
    jax_grads = ckpt_io.flatten_params(grads, small_cfg)
    # Reference end-to-end grad tolerance is 1e-2 (dev/unet_test.cu:2085);
    # we hold a tighter 1e-3.
    np.testing.assert_allclose(jax_grads, ref_grads, atol=1e-3)


def test_resblock_updown(rng):
    # The reference ResBlock supports up/down resampling inside the block
    # (train_unet.py:91-99, train_unet.cu:2230-2236) even though the
    # default model never uses it; verify both modes against torch.
    import torch.nn.functional as TF
    cin, cout, emb_dim, B, S = 32, 64, 128, 2, 8
    key = jax.random.PRNGKey(1)
    p = jax.jit(lambda k: blocks.resblock_init(k, cin, cout, emb_dim))(key)

    x = rng.standard_normal((B, cin, S, S), dtype=np.float32)
    emb = rng.standard_normal((B, emb_dim), dtype=np.float32)

    def torch_res(p, x, emb, mode):
        g = lambda *path: torch.tensor(
            np.asarray(ckpt_io.tree_get(p, path)))
        conv_w = lambda *path: torch.tensor(
            np.asarray(ckpt_io.tree_get(p, path)).transpose(3, 2, 0, 1))
        h = TF.silu(TF.group_norm(x, 32, g("gn1", "scale"),
                                  g("gn1", "bias"), eps=1e-5))
        if mode == "up":
            h = TF.interpolate(h, scale_factor=2, mode="nearest")
            x = TF.interpolate(x, scale_factor=2, mode="nearest")
        elif mode == "down":
            h = TF.avg_pool2d(h, 2)
            x = TF.avg_pool2d(x, 2)
        h = TF.conv2d(h, conv_w("conv1", "w"), g("conv1", "b"), padding=1)
        e = TF.linear(TF.silu(emb),
                      torch.tensor(np.asarray(p["emb"]["w"]).T),
                      g("emb", "b"))
        h = h + e[:, :, None, None]
        h = TF.silu(TF.group_norm(h, 32, g("gn2", "scale"),
                                  g("gn2", "bias"), eps=1e-5))
        h = TF.conv2d(h, conv_w("conv2", "w"), g("conv2", "b"), padding=1)
        x = TF.conv2d(x, conv_w("skip", "w"), g("skip", "b"))
        return x + h

    for mode in ("up", "down"):
        ref = torch_res(p, torch.tensor(x), torch.tensor(emb), mode).numpy()
        out = jax.jit(lambda p, x, e: blocks.resblock_apply(
            p, x, e, up=(mode == "up"), down=(mode == "down")))(
            p, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(emb))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_class_conditional_forward(rng):
    """Class-conditional plumbing (label_emb added to the time embedding)
    — present-but-unused in the reference (train_unet.py:320-321,
    class_cond defaults False); functional here."""
    from unet_tpu.config import UnetConfig
    cfg = UnetConfig(model_channels=32, image_size=16, attention_ds=(2,),
                     channel_mult=(1, 2))
    N_CLASSES = 10
    params = unet.init(jax.random.PRNGKey(0), cfg, num_classes=N_CLASSES)
    assert "label_emb" in params
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    t = jnp.asarray([3.0, 500.0])
    y = jnp.asarray([1, 7])
    out = jax.jit(lambda p, x, t, y: unet.apply(p, cfg, x, t, y))(
        params, x, t, y)
    assert out.shape == (2, 16, 16, 3)
    # different labels must change the output
    out2 = jax.jit(lambda p, x, t, y: unet.apply(p, cfg, x, t, y))(
        params, x, t, jnp.asarray([2, 7]))
    assert not np.allclose(np.asarray(out[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(out2[1]))
    # flat round-trip includes the label embedding
    flat = ckpt_io.flatten_params(params, cfg, num_classes=N_CLASSES)
    p2 = ckpt_io.unflatten_params(flat, cfg, num_classes=N_CLASSES)
    np.testing.assert_array_equal(
        np.asarray(p2["label_emb"]), np.asarray(params["label_emb"]))
