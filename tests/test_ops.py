"""Per-op fwd+bwd parity vs torch ground truth.

Mirrors the reference's per-kernel golden-file tier (reference dev/:
silu, groupnorm, conv2d_k3, conv2d_k1, linear, attention, upsample,
avgpool, broadcast/add via resblock, timestep_embedding, mse; SURVEY.md
section 4).  Backward parity uses the same trick as the reference
generators: a fake loss sum(out * dout) so grads equal the VJP of dout
(e.g. reference dev/groupnorm.py:33-35).  Tolerances follow the
reference's tiers: 1e-4ish for exact ops, looser for reduction-heavy ones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from unet_tpu.ops import functional as F


def vjp_wrt(fun, args, dout, argnums):
    """d/d(args[i]) of sum(fun(*args) * dout) for each i in argnums."""
    def fake_loss(*xs):
        full = list(args)
        for i, x in zip(argnums, xs):
            full[i] = x
        return jnp.sum(fun(*full) * dout)
    grads = jax.jit(jax.grad(fake_loss, argnums=tuple(range(len(argnums)))))(
        *[args[i] for i in argnums])
    return [np.asarray(g) for g in grads]


def torch_vjp(fun, tensors, dout):
    out = fun(*tensors)
    out.backward(torch.tensor(dout))
    return out.detach().numpy(), [t.grad.numpy() for t in tensors]


def t(rng, *shape):
    return torch.tensor(rng.standard_normal(shape, dtype=np.float32),
                        requires_grad=True)


def test_silu(rng):
    x = t(rng, 4, 100)
    dout = rng.standard_normal((4, 100), dtype=np.float32)
    ref, (dx_ref,) = torch_vjp(TF.silu, [x], dout)
    xj = jnp.asarray(x.detach().numpy())
    out = jax.jit(F.silu)(xj)
    # XLA's sigmoid and torch's differ by ~1 ULP on f32
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-6)
    (dx,) = vjp_wrt(F.silu, (xj,), jnp.asarray(dout), (0,))
    np.testing.assert_allclose(dx, dx_ref, atol=3e-6)


def test_linear(rng):
    # Reference linear test shapes: llm.c-style matmul (dev/linear.py).
    x, w, b = t(rng, 8, 64), t(rng, 32, 64), t(rng, 32)
    dout = rng.standard_normal((8, 32), dtype=np.float32)
    ref, (dx_r, dw_r, db_r) = torch_vjp(
        lambda x, w, b: TF.linear(x, w, b), [x, w, b], dout)
    args = (jnp.asarray(x.detach().numpy()),
            jnp.asarray(w.detach().numpy().T),  # native (I, O)
            jnp.asarray(b.detach().numpy()))
    out = jax.jit(F.linear)(*args)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    dx, dw, db = vjp_wrt(F.linear, args, jnp.asarray(dout), (0, 1, 2))
    np.testing.assert_allclose(dx, dx_r, atol=1e-4)
    np.testing.assert_allclose(dw.T, dw_r, atol=1e-4)
    np.testing.assert_allclose(db, db_r, atol=1e-4)


@pytest.mark.parametrize("cin,cout,hw,ksize", [
    (192, 64, 16, 3),   # reference conv2d_k3 benchmark shape family
    (16, 32, 8, 3),
    (32, 16, 8, 1),     # conv1x1 skip projection
])
def test_conv2d(rng, cin, cout, hw, ksize):
    B = 4
    x = t(rng, B, cin, hw, hw)
    w = t(rng, cout, cin, ksize, ksize)
    b = t(rng, cout)
    dout = rng.standard_normal((B, cout, hw, hw), dtype=np.float32) * 0.1
    ref, (dx_r, dw_r, db_r) = torch_vjp(
        lambda x, w, b: TF.conv2d(x, w, b, padding=ksize // 2),
        [x, w, b], dout)

    args = (jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0)),
            jnp.asarray(b.detach().numpy()))
    out = jax.jit(F.conv2d)(*args)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-3)
    dx, dw, db = vjp_wrt(F.conv2d, args,
                         jnp.asarray(dout.transpose(0, 2, 3, 1)), (0, 1, 2))
    np.testing.assert_allclose(dx.transpose(0, 3, 1, 2), dx_r, atol=2e-3)
    np.testing.assert_allclose(dw.transpose(3, 2, 0, 1), dw_r, atol=2e-2)
    np.testing.assert_allclose(db, db_r, atol=2e-2)


def test_group_norm(rng):
    # Reference groupnorm test shape: B=16, C=128, H=4, W=8
    # (dev/groupnorm.py:14-17); tolerances are the loose reduction tier.
    B, C, H, W = 16, 128, 4, 8
    x = t(rng, B, C, H, W)
    g = t(rng, C)
    b = t(rng, C)
    dout = rng.standard_normal((B, C, H, W), dtype=np.float32)
    ref, (dx_r, dg_r, db_r) = torch_vjp(
        lambda x, g, b: TF.group_norm(x, 32, g, b, eps=1e-5), [x, g, b], dout)

    fun = lambda x, g, b: F.group_norm(x, g, b, num_groups=32, eps=1e-5)
    args = (jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(g.detach().numpy()), jnp.asarray(b.detach().numpy()))
    out = jax.jit(fun)(*args)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-4)
    dx, dg, db = vjp_wrt(fun, args,
                         jnp.asarray(dout.transpose(0, 2, 3, 1)), (0, 1, 2))
    np.testing.assert_allclose(dx.transpose(0, 3, 1, 2), dx_r, atol=1e-3)
    np.testing.assert_allclose(dg, dg_r, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(db, db_r, atol=1e-3, rtol=1e-4)


def test_upsample_avgpool(rng):
    x = t(rng, 2, 8, 6, 6)
    dout_up = rng.standard_normal((2, 8, 12, 12), dtype=np.float32)
    ref, (dx_r,) = torch_vjp(
        lambda x: TF.interpolate(x, scale_factor=2, mode="nearest"),
        [x], dout_up)
    xj = jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))
    out = jax.jit(F.upsample_nearest_2x)(xj)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-6)
    (dx,) = vjp_wrt(F.upsample_nearest_2x, (xj,),
                    jnp.asarray(dout_up.transpose(0, 2, 3, 1)), (0,))
    np.testing.assert_allclose(dx.transpose(0, 3, 1, 2), dx_r, atol=1e-6)

    x2 = t(rng, 2, 8, 6, 6)
    dout_dn = rng.standard_normal((2, 8, 3, 3), dtype=np.float32)
    ref, (dx_r,) = torch_vjp(lambda x: TF.avg_pool2d(x, 2), [x2], dout_dn)
    xj = jnp.asarray(x2.detach().numpy().transpose(0, 2, 3, 1))
    out = jax.jit(F.avg_pool_2x)(xj)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-6)
    (dx,) = vjp_wrt(F.avg_pool_2x, (xj,),
                    jnp.asarray(dout_dn.transpose(0, 2, 3, 1)), (0,))
    np.testing.assert_allclose(dx.transpose(0, 3, 1, 2), dx_r, atol=1e-6)


def test_timestep_embedding():
    # Reference: [cos || sin], freqs exp(-ln(P) j / half)
    # (dev/timestep_embeddings.py, train_unet.py:467-485).
    import math
    ts = torch.tensor([0.0, 1.0, 57.0, 999.0])
    dim, P = 64, 1000
    half = dim // 2
    freqs = torch.exp(-math.log(P)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = ts[:, None] * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    out = jax.jit(lambda t: F.timestep_embedding(t, dim, max_period=P))(
        jnp.asarray(ts.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


@pytest.mark.parametrize("B,T,C", [
    (4, 1024, 256),   # the reference attention-core shape, dev/attention.cu:370-375
    (4, 256, 128),    # the 64px model's first attention level
])
def test_qkv_attention(rng, B, T, C):
    # Reference attention-core test (dev/attention.cu:370-375) with the
    # "new attention order" split (train_unet.py:168-187).
    HS = 32
    NH = C // HS
    import math
    qkv = t(rng, B, 3 * C, T)
    dout = rng.standard_normal((B, C, T), dtype=np.float32) * 0.1

    def torch_attn(qkv):
        q, k, v = qkv.chunk(3, dim=1)
        q = q.reshape(B * NH, HS, T) / math.sqrt(HS)
        k = k.reshape(B * NH, HS, T)
        v = v.reshape(B * NH, HS, T)
        w = torch.softmax(torch.einsum("bct,bcs->bts", q, k), dim=-1)
        return torch.einsum("bts,bcs->bct", w, v).reshape(B, C, T)

    ref, (dqkv_r,) = torch_vjp(torch_attn, [qkv], dout)

    # native layout: (B, T, 3C) with channel-major head split
    qkv_j = jnp.asarray(qkv.detach().numpy().transpose(0, 2, 1))
    fun = lambda q: F.qkv_attention(q, NH)
    out = jax.jit(fun)(qkv_j)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-4)
    (dqkv,) = vjp_wrt(fun, (qkv_j,),
                      jnp.asarray(dout.transpose(0, 2, 1)), (0,))
    np.testing.assert_allclose(dqkv.transpose(0, 2, 1), dqkv_r, atol=1e-4)


def test_mse(rng):
    a = t(rng, 8, 3, 16, 16)
    y = rng.standard_normal((8, 3, 16, 16), dtype=np.float32)
    ref = TF.mse_loss(a, torch.tensor(y))
    ref.backward()
    aj = jnp.asarray(a.detach().numpy())
    out = jax.jit(F.mse_loss)(aj, jnp.asarray(y))
    # f32 sum-reduction order differs between XLA and torch
    np.testing.assert_allclose(float(out), float(ref.detach()), rtol=1e-5)
    grad = jax.jit(jax.grad(F.mse_loss))(aj, jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(grad), a.grad.numpy(), atol=1e-7)
