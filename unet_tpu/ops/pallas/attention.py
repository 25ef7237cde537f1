"""Fused multi-head attention Pallas TPU kernel with custom VJP.

Replaces the reference's attention core — permute -> batched SGEMM QK^T ->
softmax -> batched SGEMM -> unpermute (reference train_unet.cu:2386-2744)
— with ONE kernel that consumes the (B, T, 3C) QKV tensor exactly as the
QKV linear produces it and writes (B, T, C).  No (B, NH, T, T) score
tensor ever touches HBM: XLA's lowering materializes the fp32 scores and
softmax weights (at the 128x128 stretch config that is 32*6*1024*1024*4 =
800 MB per tensor, several times per block per direction — the measured
reason the 128px step sat at ~5% of MXU peak); here scores live and die
in VMEM.

Semantics match ops/functional.qkv_attention (the guided-diffusion "new
attention order", reference train_unet.py:159-187): channels are
[q(C) ‖ k(C) ‖ v(C)], each C splitting contiguously into (NH, HS); scale
1/sqrt(HS) applied to q before the dot; softmax statistics in fp32.

T here is H*W <= 1024 and HS=32, so the whole K/V for one (batch, head)
fits VMEM comfortably — the kernel does EXACT blockwise softmax with the
full key range resident (no online-softmax running rescale needed).  The
library flash kernel loses 2.5x on these shapes because it pads HS=32 to
the 128-lane tile inside; this kernel keeps the native (T, 3C) layout
with C a lane multiple and slices heads at 32-lane offsets instead.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(qkv_q_ref, qkv_kv_ref, out_ref, *, num_heads: int,
                scale: float):
    _, TQ, C3 = qkv_q_ref.shape
    C = C3 // 3
    HS = C // num_heads
    for h in range(num_heads):
        o = h * HS
        q = qkv_q_ref[0, :, o:o + HS]                      # (TQ, HS)
        k = qkv_kv_ref[0, :, C + o:C + o + HS]             # (T, HS)
        v = qkv_kv_ref[0, :, 2 * C + o:2 * C + o + HS]     # (T, HS)
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (TQ, T)
        p = jax.nn.softmax(s, axis=-1)
        out_ref[0, :, o:o + HS] = jnp.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(qkv_ref, dout_ref, dqkv_ref, *, num_heads: int,
                scale: float, block_q: int):
    _, T, C3 = qkv_ref.shape
    C = C3 // 3
    HS = C // num_heads
    nblk = T // block_q
    f32 = jnp.float32
    for h in range(num_heads):
        o = h * HS
        k = qkv_ref[0, :, C + o:C + o + HS]                # (T, HS)
        v = qkv_ref[0, :, 2 * C + o:2 * C + o + HS]        # (T, HS)
        dk = jnp.zeros((T, HS), f32)
        dv = jnp.zeros((T, HS), f32)
        for i in range(nblk):
            r = slice(i * block_q, (i + 1) * block_q)
            q = qkv_ref[0, r, o:o + HS]
            do = dout_ref[0, r, o:o + HS].astype(f32)
            qs = (q.astype(f32) * scale).astype(q.dtype)
            s = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                # (TQ, T)
            p = jax.nn.softmax(s, axis=-1)                 # f32
            dob = do.astype(v.dtype)
            dp = jax.lax.dot_general(
                dob, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                # (TQ, T)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsb = ds.astype(q.dtype)
            # dq = (ds @ k) * scale
            dqkv_ref[0, r, o:o + HS] = (jnp.dot(
                dsb, k, preferred_element_type=f32)
                * scale).astype(dqkv_ref.dtype)
            # dk += ds^T @ qs ; dv += p^T @ dout
            dk = dk + jax.lax.dot_general(
                dsb, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dv = dv + jax.lax.dot_general(
                p.astype(v.dtype), dob.astype(v.dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
        dqkv_ref[0, :, C + o:C + o + HS] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * C + o:2 * C + o + HS] = dv.astype(dqkv_ref.dtype)


def _pick_block_q(T: int) -> int:
    return min(T, 256)


def _fwd_call(qkv, num_heads):
    B, T, C3 = qkv.shape
    C = C3 // 3
    HS = C // num_heads
    scale = 1.0 / math.sqrt(HS)
    TQ = _pick_block_q(T)
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B, T // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, C3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # second view of the SAME qkv array: full key range, constant
            # across the inner grid axis so Pallas fetches it once per b
            pl.BlockSpec((1, T, C3), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
        interpret=_interpret(),
    )(qkv, qkv)


def _bwd_call(qkv, dout, num_heads):
    B, T, C3 = qkv.shape
    C = C3 // 3
    HS = C // num_heads
    scale = 1.0 / math.sqrt(HS)
    TQ = _pick_block_q(T)
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                               scale=scale, block_q=TQ)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C3), qkv.dtype),
        interpret=_interpret(),
    )(qkv, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def qkv_attention_fused(qkv, num_heads):
    """Fused non-causal MHA.  qkv: (B, T, 3C) -> (B, T, C).

    Backward recomputes scores from qkv (flash-attention style): the
    only HBM residual is qkv itself, vs XLA's saved fp32 softmax
    weights (B, NH, T, T).
    """
    return _fwd_call(qkv, num_heads)


def _att_fwd(qkv, num_heads):
    return _fwd_call(qkv, num_heads), (qkv,)


def _att_bwd(num_heads, res, dout):
    (qkv,) = res
    return (_bwd_call(qkv, dout, num_heads),)


qkv_attention_fused.defvjp(_att_fwd, _att_bwd)
