"""Fused GroupNorm(+SiLU) Pallas TPU kernel with custom VJP.

Replaces the reference's groupnorm_forward/backward CUDA kernels
(reference train_unet.cu:1768-1992) AND the separate SiLU kernels
(train_unet.cu:305-342) with one fused pass in each direction.

Why a kernel here: GroupNorm is the U-Net's bandwidth hot spot after the
convs — XLA runs the statistics as separate convert+reduce passes and the
backward as three more reduction fusions (~4.5 ms/step of the ~17 ms
ImageNet-64 train step on a v5e).  Fusing keeps each (H,W,C) activation
slab resident in VMEM: HBM traffic drops to the information-theoretic
floor (fwd: read x, write y; bwd: read x,dy, write dx) and the two-pass
mean/variance — torch-exact numerics, no E[x^2]-E[x]^2 cancellation —
is free because both passes read VMEM.

Group reductions use a (C, G) one-hot matrix so lane-crossing sums become
tiny MXU matmuls instead of awkward sub-lane shuffles; statistics are
always fp32.

Grid: one program per batch element.  Inside the kernel, rows are
processed in H-chunks so fp32 temporaries stay ~2 MB regardless of slab
size (the bf16 slab itself stays VMEM-resident; a 64x64x192 slab is only
1.5 MB, but its fp32 intermediates would be 22 MB unchunked — past the
16 MB VMEM budget).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_matrices(C: int, G: int, dtype=jnp.float32):
    """M: (C, G) one-hot group membership; used as x @ M (sum channels ->
    groups) and stats @ M.T (broadcast groups -> channels)."""
    cg = C // G
    m = np.zeros((C, G), np.float32)
    m[np.arange(C), np.arange(C) // cg] = 1.0
    return jnp.asarray(m, dtype)


def _n_chunks(H, W, C, budget=2 * 1024 * 1024):
    """Smallest power-of-2 divisor n of H such that one (H/n, W, C) fp32
    chunk fits the temp budget."""
    n = 1
    while n < H and (H // n) * W * C * 4 > budget:
        n *= 2
    return n


def _fwd_kernel(x_ref, gamma_ref, beta_ref, mmat_ref,
                y_ref, mean_ref, rstd_ref, *, eps: float, act: str,
                inv_n: float):
    _, H, W, C = x_ref.shape
    G = mmat_ref.shape[1]
    mmat = mmat_ref[...]                       # (C, G)
    nch = _n_chunks(H, W, C)
    ch = H // nch

    def chunk(i):
        return x_ref[0, i * ch:(i + 1) * ch].astype(jnp.float32) \
            .reshape(ch * W, C)

    # accumulate per-CHANNEL sums on the VPU; group-reduce ONCE at the
    # end (v1 ran 3 tiny GEMVs per chunk per program — MXU-latency-bound)
    csum = jnp.zeros((1, C), jnp.float32)
    for i in range(nch):
        csum += jnp.sum(chunk(i), axis=0, keepdims=True)
    mean_g = jnp.dot(csum, mmat,
                     preferred_element_type=jnp.float32) * inv_n  # (1, G)
    mean_c = jnp.dot(mean_g, mmat.T,
                     preferred_element_type=jnp.float32)     # (1, C)

    vsum = jnp.zeros((1, C), jnp.float32)
    for i in range(nch):
        xc = chunk(i) - mean_c
        vsum += jnp.sum(xc * xc, axis=0, keepdims=True)
    rstd_g = jax.lax.rsqrt(
        jnp.dot(vsum, mmat, preferred_element_type=jnp.float32) * inv_n
        + eps)                                               # (1, G)
    rstd_c = jnp.dot(rstd_g, mmat.T,
                     preferred_element_type=jnp.float32)

    gamma = gamma_ref[...].astype(jnp.float32)
    beta = beta_ref[...].astype(jnp.float32)
    for i in range(nch):
        z = (chunk(i) - mean_c) * rstd_c * gamma + beta
        if act == "silu":
            z = z * jax.nn.sigmoid(z)
        y_ref[0, i * ch:(i + 1) * ch] = \
            z.reshape(ch, W, C).astype(y_ref.dtype)
    mean_ref[0] = mean_g        # (1, G) block of the (B, 1, G) array
    rstd_ref[0] = rstd_g


def _bwd_kernel(x_ref, gamma_ref, beta_ref, mean_ref, rstd_ref, mmat_ref,
                dy_ref, dx_ref, dgamma_ref, dbeta_ref, *, act: str,
                inv_n: float):
    _, H, W, C = x_ref.shape
    mmat = mmat_ref[...]
    G = mmat.shape[1]
    nch = _n_chunks(H, W, C)
    ch = H // nch
    gamma = gamma_ref[...].astype(jnp.float32)
    beta = beta_ref[...].astype(jnp.float32)
    mean_c = jnp.dot(mean_ref[0].astype(jnp.float32), mmat.T,
                     preferred_element_type=jnp.float32)     # (1, C)
    rstd_c = jnp.dot(rstd_ref[0].astype(jnp.float32), mmat.T,
                     preferred_element_type=jnp.float32)

    def pieces(i):
        xhat = (x_ref[0, i * ch:(i + 1) * ch].astype(jnp.float32)
                .reshape(ch * W, C) - mean_c) * rstd_c
        dy = dy_ref[0, i * ch:(i + 1) * ch].astype(jnp.float32) \
            .reshape(ch * W, C)
        if act == "silu":
            z = xhat * gamma + beta
            s = jax.nn.sigmoid(z)
            dz = dy * (s * (1.0 + z * (1.0 - s)))   # d silu(z) / dz
        else:
            dz = dy
        return xhat, dz

    dbeta = jnp.zeros((1, C), jnp.float32)
    dgamma = jnp.zeros((1, C), jnp.float32)
    for i in range(nch):
        xhat, dz = pieces(i)
        dbeta += jnp.sum(dz, axis=0, keepdims=True)
        dgamma += jnp.sum(dz * xhat, axis=0, keepdims=True)
    dbeta_ref[0] = dbeta
    dgamma_ref[0] = dgamma

    # dx = rstd * (dxhat - mean_g(dxhat) - xhat * mean_g(dxhat * xhat));
    # the two group means derive from the dgamma/dbeta accumulators:
    # sum_hw(dxhat) = dbeta_c * gamma, sum_hw(dxhat*xhat) = dgamma_c * gamma
    t1c = jnp.dot(
        jnp.dot(dbeta * gamma, mmat,
                preferred_element_type=jnp.float32) * inv_n,
        mmat.T, preferred_element_type=jnp.float32)
    t2c = jnp.dot(
        jnp.dot(dgamma * gamma, mmat,
                preferred_element_type=jnp.float32) * inv_n,
        mmat.T, preferred_element_type=jnp.float32)
    for i in range(nch):
        xhat, dz = pieces(i)
        dx = rstd_c * (dz * gamma - t1c - xhat * t2c)
        dx_ref[0, i * ch:(i + 1) * ch] = \
            dx.reshape(ch, W, C).astype(dx_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(x, gamma, beta, *, num_groups, eps, act):
    B, H, W, C = x.shape
    G = num_groups
    mmat = _group_matrices(C, G)
    inv_n = 1.0 / (H * W * (C // G))
    kernel = functools.partial(_fwd_kernel, eps=eps, act=act, inv_n=inv_n)
    y, mean, rstd = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, G), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, G), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, G), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, gamma, beta, mmat)
    return y, mean, rstd


def _bwd_call(x, gamma, beta, mean, rstd, dy, *, num_groups, eps, act):
    B, H, W, C = x.shape
    G = num_groups
    mmat = _group_matrices(C, G)
    inv_n = 1.0 / (H * W * (C // G))
    kernel = functools.partial(_bwd_kernel, act=act, inv_n=inv_n)
    dx, dgamma_b, dbeta_b = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, G), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, gamma, beta, mean, rstd, mmat, dy)
    return dx, dgamma_b, dbeta_b


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_act(x, gamma, beta, num_groups=32, eps=1e-5, act="silu"):
    """Fused GroupNorm + optional SiLU.  x: (B,H,W,C) NHWC.
    Numerics: fp32 statistics, two-pass variance (torch-identical)."""
    y, _, _ = _fwd_call(x, gamma, beta, num_groups=num_groups, eps=eps,
                        act=act)
    return y


def _gn_fwd(x, gamma, beta, num_groups, eps, act):
    y, mean, rstd = _fwd_call(x, gamma, beta, num_groups=num_groups,
                              eps=eps, act=act)
    return y, (x, gamma, beta, mean, rstd)


def _gn_bwd(num_groups, eps, act, res, dy):
    x, gamma, beta, mean, rstd = res
    dx, dgamma_b, dbeta_b = _bwd_call(
        x, gamma, beta, mean, rstd, dy,
        num_groups=num_groups, eps=eps, act=act)
    dgamma = jnp.sum(dgamma_b, axis=(0, 1)).astype(gamma.dtype)
    dbeta = jnp.sum(dbeta_b, axis=(0, 1)).astype(beta.dtype)
    return dx, dgamma, dbeta


group_norm_act.defvjp(_gn_fwd, _gn_bwd)
