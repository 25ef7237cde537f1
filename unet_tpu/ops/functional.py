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

import functools
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
    mean, rstd = _gn_stats(x, G, eps)  # (B, G) each, fp32
    xg = x.reshape(B, H, W, G, C // G).astype(stat_dt)
    xn = (xg - mean[:, None, None, :, None]) \
        * rstd[:, None, None, :, None].astype(stat_dt)
    xn = xn.reshape(B, H, W, C)
    return (xn * gamma + beta).astype(x.dtype)


def _gn_stats(x, num_groups, eps):
    """Per-(batch, group) mean and rstd, fp32, shape (B, G) each.

    f32 inputs use the two-pass variance (torch-identical numerics, the
    parity contract — reference train_unet.cu:1768-1829).  bf16 inputs use
    one-pass E[x^2]-mean^2 in fp32 accumulation: the input's own
    quantization (~3e-3 relative) dwarfs the cancellation error, and one
    pass halves the HBM stat traffic (XLA fuses both sums into a single
    multi-output reduction over one read of x).
    """
    B, H, W, C = x.shape
    G = num_groups
    xg = x.reshape(B, H * W, G, C // G)
    inv_n = 1.0 / (H * W * (C // G))
    stat_dt = jnp.promote_types(x.dtype, jnp.float32)
    if x.dtype == jnp.float32 or x.dtype == jnp.float64:
        xf = xg.astype(stat_dt)
        mean = jnp.mean(xf, axis=(1, 3))
        var = jnp.mean(jnp.square(xf - mean[:, None, :, None]),
                       axis=(1, 3))
    else:
        xf = xg.astype(stat_dt)
        s1 = jnp.sum(xf, axis=(1, 3))
        s2 = jnp.sum(jnp.square(xf), axis=(1, 3))
        mean = s1 * inv_n
        var = jnp.maximum(s2 * inv_n - jnp.square(mean), 0.0)
    rstd = lax.rsqrt(var + eps)
    return mean, rstd


def _gn_expand(stat, C, G):
    """(B, G) per-group stat -> (B, 1, 1, C) per-channel broadcast."""
    B = stat.shape[0]
    return jnp.repeat(stat, C // G, axis=1).reshape(B, 1, 1, C)


def _gn_act_fwd_impl(x, gamma, beta, num_groups, eps, act):
    B, H, W, C = x.shape
    mean, rstd = _gn_stats(x, num_groups, eps)
    mean_c = _gn_expand(mean, C, num_groups)
    rstd_c = _gn_expand(rstd, C, num_groups)
    z = ((x.astype(jnp.float32) - mean_c) * rstd_c
         * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    if act == "silu":
        z = z * jax.nn.sigmoid(z)
    return z.astype(x.dtype), mean, rstd


@functools.lru_cache(maxsize=None)
def _gn_act_xla(num_groups, eps, act):
    """Fused GroupNorm(+SiLU) as XLA expressions with a custom VJP.

    vs plain autodiff: the backward recomputes xhat from (x, mean, rstd)
    instead of consuming autodiff's saved fp32 normalized/activation
    residuals — the residual set shrinks from several full (B,H,W,C) fp32
    tensors to x (already live) plus two (B,G) stat vectors, and the
    backward becomes two fused passes over (x, dy).  Same role as the
    reference's groupnorm_backward consuming saved mean/rstd
    (train_unet.cu:1849-1992).
    """

    @jax.custom_vjp
    def gn(x, gamma, beta):
        return _gn_act_fwd_impl(x, gamma, beta, num_groups, eps, act)[0]

    def gn_fwd(x, gamma, beta):
        y, mean, rstd = _gn_act_fwd_impl(x, gamma, beta, num_groups, eps,
                                         act)
        return y, (x, gamma, beta, mean, rstd)

    def gn_bwd(res, dy):
        x, gamma, beta, mean, rstd = res
        B, H, W, C = x.shape
        G = num_groups
        mean_c = _gn_expand(mean, C, G)
        rstd_c = _gn_expand(rstd, C, G)
        gamma_f = gamma.astype(jnp.float32)
        xhat = (x.astype(jnp.float32) - mean_c) * rstd_c
        dyf = dy.astype(jnp.float32)
        if act == "silu":
            z = xhat * gamma_f + beta.astype(jnp.float32)
            s = jax.nn.sigmoid(z)
            dz = dyf * (s * (1.0 + z * (1.0 - s)))
        else:
            dz = dyf
        # per-batch channel sums feed both the param grads and the two
        # per-group means the dx formula needs
        sb_dbeta = jnp.sum(dz, axis=(1, 2))           # (B, C)
        sb_dgamma = jnp.sum(dz * xhat, axis=(1, 2))   # (B, C)
        dbeta = jnp.sum(sb_dbeta, axis=0).astype(beta.dtype)
        dgamma = jnp.sum(sb_dgamma, axis=0).astype(gamma.dtype)
        inv_n = 1.0 / (H * W * (C // G))
        t1 = _gn_expand(jnp.sum((sb_dbeta * gamma_f)
                                .reshape(B, G, C // G), axis=2) * inv_n,
                        C, G)
        t2 = _gn_expand(jnp.sum((sb_dgamma * gamma_f)
                                .reshape(B, G, C // G), axis=2) * inv_n,
                        C, G)
        dx = (rstd_c * (dz * gamma_f - t1 - xhat * t2)).astype(x.dtype)
        return dx, dgamma, dbeta

    gn.defvjp(gn_fwd, gn_bwd)
    return gn


# "autodiff" (default) = plain expression under jax.grad — measured
# FASTEST in situ: XLA fuses the normalize+SiLU into the consumer convs
# and the stat reductions into producer epilogues on its own, and both
# alternatives below disrupt that pipeline.  "fused" = same expressions
# behind a custom VJP with recompute-from-(x,mean,rstd) backward (smaller
# residuals, but the VJP boundary costs ~0.8 ms/step of lost fusions).
# "pallas" = the VMEM-resident kernel (ops/pallas/groupnorm.py; loses in
# situ to custom-call layout pinning — XLA lays conv activations out
# {3,0,2,1} while custom calls pin default {3,2,1,0}, so every call pays
# transpose copies both directions).
_GN_MODE = os.environ.get(
    "UNET_TPU_GN",
    "pallas" if os.environ.get("UNET_TPU_PALLAS", "0") == "1"
    else "autodiff")


def set_gn_mode(name: str) -> None:
    """Select the GroupNorm implementation BEFORE tracing: "autodiff"
    (the default — see the mode comment above), "fused", or "pallas".
    Also via UNET_TPU_GN."""
    global _GN_MODE
    assert name in ("fused", "autodiff", "pallas"), name
    _GN_MODE = name


def group_norm_silu(x, gamma, beta, *, num_groups=32, eps=1e-5,
                    act: str = "silu"):
    """GroupNorm fused with SiLU (or plain GN with act="none").

    All modes share the fp32-statistics numerics of the reference
    (train_unet.cu:1768-1829); see set_gn_mode / tests/test_pallas.py.
    """
    if _GN_MODE == "pallas" and jax.default_backend() == "tpu":
        from unet_tpu.ops.pallas.groupnorm import group_norm_act
        return group_norm_act(x, gamma, beta, num_groups, eps, act)
    if _GN_MODE == "fused":
        return _gn_act_xla(num_groups, eps, act)(x, gamma, beta)
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


_ATTN_MODE = os.environ.get("UNET_TPU_ATTN", "auto")


def set_attn_mode(name: str) -> None:
    """Select the attention implementation BEFORE tracing: "auto"
    (default: the fused Pallas kernel for bf16 sequences of T >= 512 on
    TPU, XLA einsums below), "fused" (kernel whenever legal), or "xla"
    (einsums always).  Also via UNET_TPU_ATTN.

    Measured on a v5e: at T=1024 (the 128x128 stretch config) the kernel
    takes the full bf16 train step 98.0 -> 82.4 ms (XLA materializes the
    (B,NH,T,T) scores in HBM several times per direction); at T <= 256
    (the 64x64 config) XLA's batched GEMMs win by ~1.5 ms/step, so auto
    keeps them."""
    global _ATTN_MODE
    assert name in ("auto", "fused", "xla"), name
    _ATTN_MODE = name


def qkv_attention(qkv, num_heads):
    """Non-causal MHA with the guided-diffusion "new attention order" head
    split (reference train_unet.py:159-187, train_unet.cu:2386-2744).

    qkv: (B, T, 3C) where channels are laid out [q(C) ‖ k(C) ‖ v(C)] and
    each C splits contiguously into (NH, HS).  Returns (B, T, C).
    Softmax in fp32; scale applied to q before the dot, as the reference
    does for fp16 stability.

    bf16 on TPU routes to the fused Pallas kernel
    (ops/pallas/attention.py): scores never touch HBM and the backward
    recomputes them instead of saving fp32 softmax weights.  f32 stays on
    XLA einsums so the _mm_precision contract (HIGHEST-pass parity)
    applies.  NB the library flash_attention kernel is NOT suitable here:
    HS=32 pads 4x against its internal 128-lane tiling (measured 2.5x
    slower than XLA on a v5e).
    """
    use_kernel = (_ATTN_MODE == "fused"
                  or (_ATTN_MODE == "auto" and qkv.shape[1] >= 512))
    if (use_kernel and qkv.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"):
        from unet_tpu.ops.pallas import attention as pattn
        # supports() = T % 8 == 0: any such T has a divisor query block
        # (worst case 8, e.g. T=576 -> 192), and the kernel asserts
        # divisibility internally — it has no remainder handling and a
        # non-divisor block would silently drop the tail rows.
        if pattn.supports(qkv.shape[1]):
            return pattn.qkv_attention_fused(qkv, num_heads)
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
