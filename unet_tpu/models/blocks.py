"""Composite blocks: ResBlock and AttentionBlock (functional).

Equivalents of the reference's composite-block layer
(ResBlock: reference train_unet.cu:2008-2384, train_unet.py:58-157;
AttentionBlock: reference train_unet.cu:2746-2976, train_unet.py:189-235).
Here a block is (init_fn producing a param dict, apply_fn) — backward
passes, activation buffers and the reference's manual buffer aliasing are
all handled by jax.grad / XLA buffer assignment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unet_tpu.ops import functional as F


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _conv_init(key, kh, kw, cin, cout):
    """torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) on the
    weight and U(+-1/sqrt(fan_in)) on the bias, both of which reduce to
    U(+-1/sqrt(fan_in)) with fan_in = cin*kh*kw."""
    kw_key, b_key = jax.random.split(key)
    bound = 1.0 / (cin * kh * kw) ** 0.5
    return {
        "w": _uniform(kw_key, (kh, kw, cin, cout), bound),
        "b": _uniform(b_key, (cout,), bound),
    }


def _linear_init(key, cin, cout):
    """torch nn.Linear default init (same U(+-1/sqrt(fan_in)) rule)."""
    w_key, b_key = jax.random.split(key)
    bound = 1.0 / cin ** 0.5
    return {
        "w": _uniform(w_key, (cin, cout), bound),
        "b": _uniform(b_key, (cout,), bound),
    }


def _gn_init(channels):
    return {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))}


# ---------------------------------------------------------------------------
# ResBlock


def resblock_init(key, cin, cout, emb_dim, *, scale_shift_norm=False):
    keys = jax.random.split(key, 4)
    emb_out = 2 * cout if scale_shift_norm else cout
    p = {
        "gn1": _gn_init(cin),
        "conv1": _conv_init(keys[0], 3, 3, cin, cout),
        "emb": _linear_init(keys[1], emb_dim, emb_out),
        "gn2": _gn_init(cout),
        "conv2": _conv_init(keys[2], 3, 3, cout, cout),
    }
    if cin != cout:
        # Skip projection only exists when channels change
        # (reference train_unet.py:114-118, train_unet.cu:2101-2107).
        p["skip"] = _conv_init(keys[3], 1, 1, cin, cout)
    return p


def resblock_apply(p, x, emb, *, num_groups=32, eps=1e-5,
                   scale_shift_norm=False, up=False, down=False,
                   s2d=False):
    """GN1 -> SiLU -> [resample] -> Conv3x3 -> +emb-proj -> GN2 -> SiLU ->
    Conv3x3 -> + skip (reference train_unet.py:120-157).

    x: (B,H,W,Cin) NHWC; emb: (B, emb_dim).  With s2d=True, x is a
    space-to-depth (B, H/2, W/2, 4Cin) tensor and every op runs in patch
    space with pixel-space semantics (unet_tpu/ops/s2d.py).
    """
    if s2d:
        from unet_tpu.ops import s2d as S
        assert not up and not down

        def gn(h, sc, bi, act="silu"):
            return S.group_norm_silu_s2d(h, sc, bi, num_groups=num_groups,
                                         eps=eps, act=act)

        def conv3(h, c):
            return S.conv2d_s2d(h, c["w"], c["b"],
                                precision=F._mm_precision(h))

        def conv_skip(h, c):
            return S.conv1x1_s2d(h, c["w"], c["b"],
                                 precision=F._mm_precision(h))

        expand_c = S.tile_phases
    else:
        def gn(h, sc, bi, act="silu"):
            return F.group_norm_silu(h, sc, bi, num_groups=num_groups,
                                     eps=eps, act=act)

        def conv3(h, c):
            return F.conv2d(h, c["w"], c["b"])

        conv_skip = conv3

        def expand_c(v):
            return v

    h = gn(x, p["gn1"]["scale"], p["gn1"]["bias"])
    if up:
        h = F.upsample_nearest_2x(h)
        x = F.upsample_nearest_2x(x)
    elif down:
        h = F.avg_pool_2x(h)
        x = F.avg_pool_2x(x)
    h = conv3(h, p["conv1"])

    e = F.linear(F.silu(emb), p["emb"]["w"], p["emb"]["b"])
    if scale_shift_norm:
        scale, shift = jnp.split(e, 2, axis=-1)
        h = gn(h, p["gn2"]["scale"], p["gn2"]["bias"], act="none")
        h = h * (1.0 + expand_c(scale)[:, None, None, :]) \
            + expand_c(shift)[:, None, None, :]
        h = F.silu(h)
    else:
        h = h + expand_c(e)[:, None, None, :].astype(h.dtype)
        h = gn(h, p["gn2"]["scale"], p["gn2"]["bias"])
    h = conv3(h, p["conv2"])

    if "skip" in p:
        x = conv_skip(x, p["skip"])
    return x + h


# ---------------------------------------------------------------------------
# AttentionBlock


def attention_init(key, channels):
    k1, k2 = jax.random.split(key)
    # torch uses nn.Conv1d(C, 3C, 1) for qkv/proj (reference
    # train_unet.py:217-220); kernel-size-1 conv1d == linear, so weights
    # here are plain (I, O) matrices.
    return {
        "gn": _gn_init(channels),
        "qkv": _linear_init(k1, channels, 3 * channels),
        "proj": _linear_init(k2, channels, channels),
    }


def attention_apply(p, x, *, head_size=32, num_groups=32, eps=1e-5):
    """GN -> QKV linear -> MHA ("new order" head split) -> proj -> residual
    (reference train_unet.py:222-235).  x: (B,H,W,C) NHWC.

    The reference permutes NCHW <-> (B, HW, C) around every attention block
    and flags it as a known inefficiency (reference README.md:161-163);
    in NHWC the (B, T, C) view is a free reshape.
    """
    B, H, W, C = x.shape
    num_heads = C // head_size
    h = F.group_norm_silu(x, p["gn"]["scale"], p["gn"]["bias"],
                          num_groups=num_groups, eps=eps, act="none")
    h = h.reshape(B, H * W, C)
    qkv = F.linear(h, p["qkv"]["w"], p["qkv"]["b"])
    a = F.qkv_attention(qkv, num_heads)
    a = F.linear(a, p["proj"]["w"], p["proj"]["b"])
    return x + a.reshape(B, H, W, C)
