"""Space-to-depth execution of the highest-resolution U-Net level.

The model's level-0 convolutions (C = model_channels = 64 by default)
fill only half of the MXU's 128 output lanes; the roofline audit
(scripts/roofline.py, docs/PERF.md) shows them running at 45-75% of even
that halved ceiling, and they are the largest bucket of the train step.
This module runs level 0 on a 2x-coarser grid with 2x2 pixel patches
packed into channels: every (B, H, W, C) tensor becomes
(B, H/2, W/2, 4C) with channel layout (phase, c), phase = py*2 + px.

A stride-1 3x3 conv on the pixel grid is EXACTLY a 2x2 conv on the patch
grid with (4Cin, 4Cout) channels — except that each output phase reads a
window shifted by its own (py, px).  conv2d_s2d therefore pads by 1,
convolves once with the expanded (2, 2, 4Cin, 4Cout) kernel (9 of every
16 (tap, phase) slots are the original weights, the rest structural
zeros), and extracts the four phase-shifted (H/2, W/2) views.  FLOPs
inflate by 16/9, but O and K become 4x larger, filling the MXU: in
isolation on a v5e the patch conv beats the native C=64 3x3 (75.8 TF/s
at 64px, 42.0 at 128px) by ~2x at 128px shapes.

MEASURED NEGATIVE RESULT in situ (docs/PERF.md): the phase extraction
(four shifted slices + concat per conv, mirrored in the VJP) costs ~18
ms/step of layout copies and ~8 ms of broadcasts at 64px — 52.1 ms/step
vs 16.9 pixel-space — and the 16/9 FLOP inflation caps the effective
MXU ceiling at ~110 TF/s, barely above the 98 TF/s half-lane bound it
replaces.  models/unet.py gates it OFF by default; it stays as a
pixel-exact, fully differentiable alternate for the parity tests
(tests/test_s2d.py) and future lane-geometry experiments.

The reference has no analog (its CUDA conv is pixel-space only,
train_unet.cu:872-1720); this is a TPU-lane-geometry rewrite.  Autodiff
differentiates the expansion, so weight gradients land on the original
(3, 3, Cin, Cout) tensors and the optimizer/checkpoint contract is
untouched.  The tap-summation order differs from pixel-space convs,
which is within mixed-precision tolerance but outside the exact-f32
parity contract (docs/PARITY.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_CONV_DNUMS = ("NHWC", "HWIO", "NHWC")


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel layout (py, px, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x):
    """Inverse of space_to_depth."""
    B, Hp, Wp, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, Hp, Wp, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 2 * Hp, 2 * Wp, C)


def concat_channels(a, b):
    """Concat two s2d tensors along the ORIGINAL channel dim (phase-wise
    interleave): s2d(concat(x, y)) == concat_channels(s2d(x), s2d(y))."""
    B, H, W, Ca = a.shape
    Cb = b.shape[-1]
    a = a.reshape(B, H, W, 4, Ca // 4)
    b = b.reshape(B, H, W, 4, Cb // 4)
    return jnp.concatenate([a, b], axis=-1).reshape(
        B, H, W, Ca + Cb)


def tile_phases(v):
    """Per-original-channel vector (..., C) -> (..., 4C) matching the
    (phase, c) channel layout."""
    return jnp.concatenate([v, v, v, v], axis=-1)


def _tap_slot(q, d):
    """For output phase q in {0,1} and pixel tap offset d in {-1,0,1}:
    the (window position P, input phase p) covering that pixel, given the
    2x2 window at conv output index Y spans patches {Y-1, Y} (P=0,1) and
    phase q's true outputs are read from conv index Y_true + q."""
    if q == 0:
        return {-1: (0, 1), 0: (1, 0), 1: (1, 1)}[d]
    return {-1: (0, 0), 0: (0, 1), 1: (1, 0)}[d]


def _tap_map():
    """Constant 0/1 tensor M[ky, kx, P, Q, pin, qout]: pixel tap (ky, kx)
    of the 3x3 kernel lands at window position (P, Q), input phase pin,
    output phase qout of the (2, 2, 4Cin, 4Cout) patch kernel.  Built in
    numpy once so the per-step expansion is ONE einsum against a
    compile-time constant (a traced .at[].set() chain here exploded
    compile time ~6x and ran the update chain every step)."""
    import numpy as np
    m = np.zeros((3, 3, 2, 2, 4, 4), np.float32)
    for qy in (0, 1):
        for qx in (0, 1):
            for dy in (-1, 0, 1):
                P, py = _tap_slot(qy, dy)
                for dx in (-1, 0, 1):
                    Q, px = _tap_slot(qx, dx)
                    m[dy + 1, dx + 1, P, Q, py * 2 + px, qy * 2 + qx] = 1
    return m


_TAP_MAP = _tap_map()


def expand_weights(w):
    """(3, 3, Cin, Cout) pixel-space kernel -> (2, 2, 4Cin, 4Cout) patch-
    space kernel (structural zeros elsewhere).  Differentiable: grads
    gather back onto the original taps (the einsum transpose is the same
    contraction against the constant map)."""
    kh, kw, Cin, Cout = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    wp = jnp.einsum("yxcd,yxPQpq->PQpcqd", w,
                    jnp.asarray(_TAP_MAP, w.dtype))
    return wp.reshape(2, 2, 4 * Cin, 4 * Cout)


def conv2d_s2d(x, w, b, *, precision=None):
    """3x3 SAME pixel-space conv evaluated in patch space.

    x: (B, H', W', 4Cin) s2d activations; w: (3, 3, Cin, Cout) ORIGINAL
    weights; b: (Cout,).  Returns (B, H', W', 4Cout) s2d activations.
    """
    B, Hp, Wp, _ = x.shape
    Cout = w.shape[-1]
    wp = expand_weights(w)
    y = lax.conv_general_dilated(
        x, wp, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=_CONV_DNUMS, precision=precision)
    # y: (B, H'+1, W'+1, 4Cout); each output phase q=(qy,qx) is the
    # (qy:qy+H', qx:qx+W') view of its channel block.
    parts = []
    for qy in (0, 1):
        for qx in (0, 1):
            q = qy * 2 + qx
            parts.append(y[:, qy:qy + Hp, qx:qx + Wp,
                           q * Cout:(q + 1) * Cout])
    out = jnp.concatenate(parts, axis=-1)
    return out + tile_phases(b)


def conv1x1_s2d(x, w, b, *, precision=None):
    """1x1 pixel-space conv (= per-pixel matmul) on s2d activations:
    each phase block multiplies the same (Cin, Cout) matrix.
    w: (1, 1, Cin, Cout)."""
    B, Hp, Wp, C4 = x.shape
    Cin = C4 // 4
    m = w.reshape(Cin, -1)
    xb = x.reshape(B, Hp, Wp, 4, Cin)
    y = jnp.einsum("bhwpc,cd->bhwpd", xb, m, precision=precision)
    return y.reshape(B, Hp, Wp, -1) + tile_phases(b)


def group_norm_silu_s2d(x, gamma, beta, *, num_groups=32, eps=1e-5,
                        act="silu"):
    """GroupNorm(+SiLU) over s2d activations with PIXEL-SPACE semantics:
    statistics per (batch, group) pool over (H', W', all 4 phases, the
    group's channels); affine per original channel.  fp32 stats, one-pass
    E[x^2] (the bf16 contract of ops.functional._gn_stats — this path is
    bf16-only)."""
    B, Hp, Wp, C4 = x.shape
    C = C4 // 4
    G = num_groups
    xg = x.reshape(B, Hp * Wp * 4, G, C // G)
    xf = xg.astype(jnp.float32)
    inv_n = 1.0 / (Hp * Wp * 4 * (C // G))
    s1 = jnp.sum(xf, axis=(1, 3))
    s2 = jnp.sum(jnp.square(xf), axis=(1, 3))
    mean = s1 * inv_n
    var = jnp.maximum(s2 * inv_n - jnp.square(mean), 0.0)
    rstd = lax.rsqrt(var + eps)
    xn = (x.reshape(B, Hp, Wp, 4, G, C // G).astype(jnp.float32)
          - mean[:, None, None, None, :, None]) \
        * rstd[:, None, None, None, :, None]
    z = xn * gamma.astype(jnp.float32).reshape(G, C // G) \
        + beta.astype(jnp.float32).reshape(G, C // G)
    if act == "silu":
        z = z * jax.nn.sigmoid(z)
    return z.reshape(B, Hp, Wp, C4).astype(x.dtype)


def avg_pool_2x_from_s2d(x):
    """2x2 stride-2 average pool consuming s2d input, producing a NORMAL
    (B, H', W', C) tensor: the pool window IS the patch, so this is just
    the mean over the 4 phase blocks — no spatial traffic."""
    B, Hp, Wp, C4 = x.shape
    return jnp.mean(x.reshape(B, Hp, Wp, 4, C4 // 4), axis=3)


def upsample_2x_to_s2d(x):
    """Nearest-neighbor 2x upsample producing s2d output directly: every
    phase of a patch is a copy of the source pixel — a channel tile."""
    return tile_phases(x)
