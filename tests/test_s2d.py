"""Space-to-depth level-0 execution (unet_tpu/ops/s2d.py): pixel-space
semantics must be preserved exactly (up to f32 rounding) — op-level
parity vs the pixel-space ops, and full-model forward/grad parity with
the mode toggled."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.config import UnetConfig
from unet_tpu.models import unet
from unet_tpu.ops import functional as F
from unet_tpu.ops import s2d as S


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 5), dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(S.depth_to_space(S.space_to_depth(x))), np.asarray(x))


def test_conv2d_s2d_matches_pixel_conv(rng):
    for Cin, Cout, H, W in [(64, 64, 8, 8), (192, 64, 6, 10), (3, 32, 4, 4)]:
        x = jnp.asarray(rng.standard_normal((2, H, W, Cin),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout),
                                            dtype=np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal(Cout, dtype=np.float32) * 0.1)
        ref = F.conv2d(x, w, b)
        out = S.depth_to_space(S.conv2d_s2d(S.space_to_depth(x), w, b))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)


def test_conv2d_s2d_grads(rng):
    Cin, Cout = 32, 64
    x = jnp.asarray(rng.standard_normal((2, 8, 8, Cin), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout),
                                        dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(Cout, dtype=np.float32) * 0.1)
    dout = jnp.asarray(rng.standard_normal((2, 8, 8, Cout),
                                           dtype=np.float32))

    def ref_loss(x, w, b):
        return jnp.sum(F.conv2d(x, w, b) * dout)

    def s2d_loss(x, w, b):
        y = S.depth_to_space(S.conv2d_s2d(S.space_to_depth(x), w, b))
        return jnp.sum(y * dout)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x, w, b)
    g_s2d = jax.grad(s2d_loss, argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g_s2d, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=3e-4, rtol=1e-5)


def test_conv1x1_and_helpers(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 64, 32),
                                        dtype=np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(32, dtype=np.float32) * 0.1)
    ref = F.conv2d(x, w, b)
    out = S.depth_to_space(S.conv1x1_s2d(S.space_to_depth(x), w, b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    y = jnp.asarray(rng.standard_normal((2, 8, 8, 32), dtype=np.float32))
    cat = S.depth_to_space(S.concat_channels(
        S.space_to_depth(x), S.space_to_depth(y)))
    np.testing.assert_array_equal(
        np.asarray(cat), np.asarray(jnp.concatenate([x, y], axis=-1)))

    np.testing.assert_allclose(
        np.asarray(S.avg_pool_2x_from_s2d(S.space_to_depth(x))),
        np.asarray(F.avg_pool_2x(x)), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(S.depth_to_space(S.upsample_2x_to_s2d(x))),
        np.asarray(F.upsample_nearest_2x(x)))


@pytest.mark.parametrize("act", ["silu", "none"])
def test_group_norm_s2d(rng, act):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64), dtype=np.float32)
                    * 2 + 0.5)
    gamma = jnp.asarray(rng.standard_normal(64, dtype=np.float32) * 0.3 + 1)
    beta = jnp.asarray(rng.standard_normal(64, dtype=np.float32) * 0.2)
    ref = F.group_norm(x, gamma, beta, num_groups=32)
    if act == "silu":
        ref = F.silu(ref)
    out = S.depth_to_space(S.group_norm_silu_s2d(
        S.space_to_depth(x), gamma, beta, num_groups=32, act=act))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_s2d_supported_gating():
    assert unet.s2d_supported(UnetConfig())
    assert unet.s2d_supported(UnetConfig(image_size=128))
    # attention at ds=1 forces pixel space
    assert not unet.s2d_supported(UnetConfig(attention_ds=(1, 2)))
    # single-level model has no down/up boundary to convert at
    assert not unet.s2d_supported(UnetConfig(channel_mult=(1,)))
    assert not unet.s2d_supported(UnetConfig(image_size=2))


@pytest.mark.parametrize("ssn", [False, True])
def test_full_model_s2d_parity(rng, ssn):
    """apply() with level-0 in patch space == pixel space, forward and
    parameter gradients, f32."""
    cfg = UnetConfig(model_channels=32, image_size=16, attention_ds=(2, 4),
                     num_head_channels=32, channel_mult=(1, 2),
                     use_scale_shift_norm=ssn)
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    t = jnp.asarray([3.0, 500.0])
    dout = jnp.asarray(rng.standard_normal((2, 16, 16, 3),
                                           dtype=np.float32))

    def run(mode):
        prev = unet._S2D_MODE
        unet.set_s2d_mode(mode)
        try:
            out = jax.jit(lambda p, x, t: unet.apply(p, cfg, x, t))(
                params, x, t)
            loss = lambda p: jnp.sum(unet.apply(p, cfg, x, t) * dout)
            grads = jax.jit(jax.grad(loss))(params)
        finally:
            unet.set_s2d_mode(prev)
        return out, grads

    out_ref, g_ref = run("off")
    out_s2d, g_s2d = run("on")
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_ref),
                               atol=1e-4)
    flat_ref = jax.tree.leaves(g_ref)
    flat_s2d = jax.tree.leaves(g_s2d)
    for a, e in zip(flat_s2d, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-3, rtol=1e-4)
