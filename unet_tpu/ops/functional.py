"""Core ops, XLA path, NHWC layout.

Every op the reference hand-writes as a CUDA kernel exists here as a fused
XLA expression (reference train_unet.cu:17-3030 — linear, broadcast, add,
silu, upsample, avgpool, concat, conv1x1, conv3x3, groupnorm, attention,
mse).  On TPU the convs and matmuls lower to the MXU via
`lax.conv_general_dilated` / `jnp.einsum`; elementwise chains fuse on the
VPU.  Backward passes are `jax.grad` — the reference's ~2,000 lines of
hand-written backward kernels have no analog here by design.

Layout: activations are (B, H, W, C) [NHWC], conv kernels (kh, kw, I, O)
[HWIO] — the TPU-native layouts.  The NCHW/OIHW torch layouts exist only at
the .bin interchange boundary (unet_tpu/io/checkpoint.py).

Mixed precision: bf16 inputs run single-pass on the MXU, which accumulates
in fp32 internally; outputs are bf16.  (`preferred_element_type` is NOT
used — its f32 cotangents break the conv/dot transpose rules under
autodiff with bf16 weights.)  f32 inputs request Precision.HIGHEST so XLA
does not silently drop to bf16 passes.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
from jax import lax

_CONV_DNUMS = ("NHWC", "HWIO", "NHWC")


_F32_PRECISION = {"highest": lax.Precision.HIGHEST,
                  "high": lax.Precision.HIGH,
                  "default": lax.Precision.DEFAULT}[
    os.environ.get("UNET_TPU_F32_PRECISION", "highest")]


def set_f32_precision(name: str) -> None:
    """Select the MXU pass count for float32 matmuls/convs BEFORE tracing:
    "highest" (6-pass, full f32 — the parity default), "high" (3-pass
    bf16x3, ~f32 quality at roughly half the cost — the tf32 analog), or
    "default" (1-pass bf16).  Also settable via UNET_TPU_F32_PRECISION."""
    global _F32_PRECISION
    _F32_PRECISION = {"highest": lax.Precision.HIGHEST,
                      "high": lax.Precision.HIGH,
                      "default": lax.Precision.DEFAULT}[name]


def _mm_precision(x):
    """Matmul/conv precision.  f32 inputs default to HIGHEST — XLA's
    DEFAULT runs the MXU in bf16 passes (~2e-3 relative error, far outside
    the reference's fp32 parity tolerances); see set_f32_precision for the
    3-pass middle mode.  bf16 inputs take the fast single-pass path; that
    is the intended mixed-precision mode."""
    if x.dtype in (jnp.float32, jnp.float64):
        return _F32_PRECISION
    return lax.Precision.DEFAULT


def silu(x):
    """x * sigmoid(x) (reference train_unet.cu:305-317)."""
    return x * jax.nn.sigmoid(x)


def linear(x, w, b):
    """x @ w + b.  w is (I, O) — already transposed from torch's (O, I)
    (reference matmul_forward2, train_unet.cu:61-97)."""
    y = jnp.dot(x, w, precision=_mm_precision(x))
    return y + b


def conv2d(x, w, b, *, padding="SAME"):
    """NHWC conv, kernel HWIO; covers both the reference's 3x3
    (train_unet.cu:872-1720) and 1x1 (train_unet.cu:629-870) kernels —
    XLA lowers either onto the MXU directly."""
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=_CONV_DNUMS,
        precision=_mm_precision(x),
    )
    return y + b


def group_norm(x, gamma, beta, *, num_groups=32, eps=1e-5):
    """GroupNorm over (H, W, C//G) per group, NHWC.

    Matches torch nn.GroupNorm semantics used at reference
    train_unet.cu:1768-1829 (eps=1e-5, 32 groups).  Statistics in fp32.
    """
    B, H, W, C = x.shape
    G = num_groups
    stat_dt = jnp.promote_types(x.dtype, jnp.float32)  # stats in fp32
    xg = x.reshape(B, H, W, G, C // G).astype(stat_dt)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xn = (xg - mean) * lax.rsqrt(var + eps)
    xn = xn.reshape(B, H, W, C)
    return (xn * gamma + beta).astype(x.dtype)


_PALLAS_GN = os.environ.get("UNET_TPU_PALLAS", "0") == "1"


def group_norm_silu(x, gamma, beta, *, num_groups=32, eps=1e-5,
                    act: str = "silu"):
    """GroupNorm fused with SiLU (or plain GN with act="none").

    UNET_TPU_PALLAS=1 runs the Pallas fused kernel
    (ops/pallas/groupnorm.py) on TPU.  Default is the XLA expression.

    Measured on a v5e: standalone, the kernel BEATS XLA's fusions
    (fwd 0.019 vs 0.025 ms at 32x64x64x64); inside the full train step it
    LOSES (31.2 vs 20.7 ms/step) because XLA pins custom-call operands to
    default {3,2,1,0} layouts while it lays activations out {3,0,2,1}
    for the convs — every GN call gets layout-transpose copies on input
    and output, in both fwd and bwd.  Until Mosaic accepts non-default
    operand layouts, the XLA path wins in situ.  Both paths are
    numerically identical (fp32 two-pass stats) and covered by
    tests/test_pallas.py.
    """
    if _PALLAS_GN and jax.default_backend() == "tpu":
        from unet_tpu.ops.pallas.groupnorm import group_norm_act
        return group_norm_act(x, gamma, beta, num_groups, eps, act)
    y = group_norm(x, gamma, beta, num_groups=num_groups, eps=eps)
    return silu(y) if act == "silu" else y


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsample, NHWC (reference
    train_unet.cu:361-392)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def avg_pool_2x(x):
    """2x2 stride-2 average pool, NHWC (reference train_unet.cu:459-489)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.mean(x, axis=(2, 4))


def timestep_embedding(t, dim, *, max_period=1000):
    """Sinusoidal embedding [cos(t·f) ‖ sin(t·f)], f_j = exp(-ln(P)·j/half)
    (reference train_unet.cu:3265-3302, train_unet.py:467-485).

    t: (B,) float or int timesteps.  Returns (B, dim) float32.
    """
    half = dim // 2
    dt = (jnp.promote_types(t.dtype, jnp.float32)
          if jnp.issubdtype(jnp.asarray(t).dtype, jnp.floating)
          else jnp.dtype(jnp.float32))
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=dt) / half
    )
    args = t.astype(dt)[:, None] * freqs[None, :]
    if dt == jnp.float32:
        # XLA's f32 sin/cos range reduction loses ~1e-4 absolute for
        # args up to max_period (~1000 rad).  Cody-Waite reduce into
        # [-pi, pi] with a 3-way f32 split of 2*pi -> ~1e-7 parity with
        # torch's correctly-rounded libm (k*hi is exact: k < ~160 and hi
        # has 9 mantissa bits).
        import numpy as _np
        two_pi = 2.0 * math.pi
        hi = _np.float32(6.28125)
        mid = _np.float32(two_pi - float(hi))
        lo = _np.float32(two_pi - float(hi) - float(mid))
        k = jnp.round(args * _np.float32(1.0 / two_pi))
        args = ((args - k * hi) - k * mid) - k * lo
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def qkv_attention(qkv, num_heads):
    """Non-causal MHA with the guided-diffusion "new attention order" head
    split (reference train_unet.py:159-187, train_unet.cu:2386-2744).

    qkv: (B, T, 3C) where channels are laid out [q(C) ‖ k(C) ‖ v(C)] and
    each C splits contiguously into (NH, HS).  Returns (B, T, C).
    Softmax in fp32; scale applied to q before the dot, as the reference
    does for fp16 stability.

    Stays on plain XLA batched matmuls deliberately: T <= 256 at the
    64x64 config, and even at the 128x128 stretch (T=1024) the Pallas
    flash_attention library kernel measured 2.5x SLOWER on a v5e
    (fwd 7.3 vs 2.9 ms, bwd 22.8 vs 8.4 ms at B=32, C=192) — HS=32 pads
    4x against the 128-lane MXU inside the kernel, while XLA's batched
    GEMMs handle the small head dim better.
    """
    B, T, C3 = qkv.shape
    C = C3 // 3
    NH = num_heads
    HS = C // NH
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, NH, HS)
    k = k.reshape(B, T, NH, HS)
    v = v.reshape(B, T, NH, HS)
    scale = 1.0 / math.sqrt(HS)
    acc = jnp.promote_types(qkv.dtype, jnp.float32)
    logits = jnp.einsum(
        "bthd,bshd->bhts", q * scale, k,
        precision=_mm_precision(qkv),
    )
    # softmax statistics in fp32 (logits themselves may be bf16 — the MXU
    # accumulated them in fp32 and rounded once, which is the standard
    # TPU flash-attention numerics)
    weights = jax.nn.softmax(logits.astype(acc), axis=-1)
    out = jnp.einsum(
        "bhts,bshd->bthd",
        weights.astype(v.dtype), v,
        precision=_mm_precision(qkv),
    )
    return out.reshape(B, T, C)


def mse_loss(pred, target):
    """mean((pred - target)^2) over all elements
    (reference train_unet.cu:2981-3025)."""
    acc = jnp.promote_types(pred.dtype, jnp.float32)
    diff = pred.astype(acc) - target.astype(acc)
    return jnp.mean(jnp.square(diff))
