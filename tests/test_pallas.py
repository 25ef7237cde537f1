"""Pallas TPU kernel parity vs the XLA reference path (interpret mode on
CPU).  Mirrors the reference's per-kernel golden tests (dev/groupnorm.*,
dev/silu.*) but fused."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.ops import functional as F
from unet_tpu.ops.pallas.groupnorm import group_norm_act


@pytest.mark.parametrize("shape,G", [((2, 8, 8, 64), 32),
                                     ((2, 4, 4, 192), 32),
                                     ((1, 4, 8, 512), 32)])
@pytest.mark.parametrize("act", ["silu", "none"])
def test_group_norm_act_forward(rng, shape, G, act):
    B, H, W, C = shape
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * 2 + 0.5)
    gamma = jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.3 + 1)
    beta = jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.2)

    ref = F.group_norm(x, gamma, beta, num_groups=G)
    if act == "silu":
        ref = F.silu(ref)
    out = group_norm_act(x, gamma, beta, G, 1e-5, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_group_norm_act_grad(rng):
    B, H, W, C, G = 2, 4, 4, 64, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    gamma = jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.2 + 1)
    beta = jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1)
    dout = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))

    def ref_loss(x, g, b):
        return jnp.sum(F.silu(F.group_norm(x, g, b, num_groups=G)) * dout)

    def pl_loss(x, g, b):
        return jnp.sum(group_norm_act(x, g, b, G, 1e-5, "silu") * dout)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(x, gamma, beta)
    pl_grads = jax.grad(pl_loss, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(pl_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_attention_block_q_always_tiles():
    """The query-block picker must either tile T exactly or report the
    shape unsupported — a non-divisor block would silently drop tail rows
    (the round-2 advisor finding)."""
    from unet_tpu.ops.pallas import attention as pattn
    for T in range(8, 2049, 8):
        bq = pattn._pick_block_q(T)
        if pattn.supports(T):
            assert bq > 0 and T % bq == 0, (T, bq)
        else:
            assert bq == 0, (T, bq)
    # T=576 (--attention_resolutions 24 at 192px) must tile at 192
    assert pattn._pick_block_q(576) == 192


def test_attention_fwd_block_cap_always_tiles():
    """The forward path's VMEM-capped block choice must find a valid
    8-aligned divisor for EVERY supported T, with score temporaries
    capped at 4 MB (a mod-8-misaligned cap once made T=1600 crash at
    trace time and T=1296 pick a sublane-misaligned 81-row block)."""
    from unet_tpu.ops.pallas import attention as pattn
    for T in range(8, 8193, 8):
        cap = min(1024, ((1 << 20) // T) & ~7)
        tq = pattn._pick_block_q(T, max_block=cap)
        assert tq > 0 and T % tq == 0, (T, tq)
        assert tq == T or tq % 8 == 0, (T, tq)
        if T > 1024:
            assert tq * T <= (1 << 20), (T, tq)


@pytest.mark.parametrize("B,T,C,NH", [(2, 64, 64, 2), (2, 256, 192, 6),
                                      (1, 1024, 192, 6), (1, 576, 64, 2),
                                      (1, 1024, 256, 8)])
def test_fused_attention_parity(rng, B, T, C, NH):
    """Fused attention kernel (interpret mode) vs the XLA einsum path —
    the analog of the reference's dev/attention.{py,cu} golden pair
    (B=4,T=1024,C=256,HS=32 there; same core shapes covered here)."""
    from unet_tpu.ops.pallas.attention import qkv_attention_fused
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * C),
                                          dtype=np.float32))
    dout = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32))
    ref = F.qkv_attention(qkv, NH)
    out = qkv_attention_fused(qkv, NH)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)
    g_ref = jax.grad(lambda q: jnp.sum(F.qkv_attention(q, NH) * dout))(qkv)
    g_out = jax.grad(
        lambda q: jnp.sum(qkv_attention_fused(q, NH) * dout))(qkv)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("act", ["silu", "none"])
def test_gn_fused_mode_parity(rng, act):
    """The custom-VJP "fused" GN mode matches the autodiff expression in
    both directions."""
    B, H, W, C, G = 2, 8, 8, 64, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32)
                    * 2 + 0.5)
    gamma = jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.3 + 1)
    beta = jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.2)
    dout = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))

    def loss(mode):
        F.set_gn_mode(mode)
        try:
            fn = lambda *a: jnp.sum(F.group_norm_silu(
                *a, num_groups=G, act=act) * dout)
            val = fn(x, gamma, beta)
            grads = jax.grad(fn, argnums=(0, 1, 2))(x, gamma, beta)
        finally:
            F.set_gn_mode("autodiff")
        return val, grads

    v_ref, g_ref = loss("autodiff")
    v_fused, g_fused = loss("fused")
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-5)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_group_norm_act_bf16(rng):
    B, H, W, C, G = 2, 4, 4, 64, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    gamma = jnp.ones((C,), jnp.bfloat16)
    beta = jnp.zeros((C,), jnp.bfloat16)
    out = group_norm_act(x.astype(jnp.bfloat16), gamma, beta, G, 1e-5,
                         "silu")
    assert out.dtype == jnp.bfloat16
    ref = F.silu(F.group_norm(x, jnp.ones(C), jnp.zeros(C), num_groups=G))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=3e-2)
