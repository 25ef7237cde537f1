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


def _bwd_kernel(qkv_q_ref, qkv_kv_ref, dout_ref, dq_ref, dkv_ref,
                dkv_acc_ref, *, num_heads: int, scale: float, nblk: int):
    """Grid (B, T//TQ): one query block per step.  dq is written to the
    block's own rows; dk/dv accumulate in an fp32 VMEM scratch that
    persists across the (sequential) query-block axis and is flushed to
    dkv_ref on the last step.  This keeps the score temporaries to ONE
    (TQ, T) set regardless of T and num_heads — the previous
    whole-batch-per-step version ran out of scoped VMEM at the reference
    core shape (B=4, T=1024, C=256, HS=32, dev/attention.cu:370-375)."""
    i = pl.program_id(1)
    _, TQ, C3 = qkv_q_ref.shape
    C = C3 // 3
    HS = C // num_heads
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        dkv_acc_ref[...] = jnp.zeros_like(dkv_acc_ref)

    for h in range(num_heads):
        o = h * HS
        k = qkv_kv_ref[0, :, C + o:C + o + HS]             # (T, HS)
        v = qkv_kv_ref[0, :, 2 * C + o:2 * C + o + HS]     # (T, HS)
        q = qkv_q_ref[0, :, o:o + HS]                      # (TQ, HS)
        do = dout_ref[0, :, o:o + HS].astype(f32)
        qs = (q.astype(f32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                    # (TQ, T)
        p = jax.nn.softmax(s, axis=-1)                     # f32
        dob = do.astype(v.dtype)
        dp = jax.lax.dot_general(
            dob, v, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                    # (TQ, T)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        # dq = (ds @ k) * scale — this query block's rows only
        dq_ref[0, :, o:o + HS] = (jnp.dot(
            dsb, k, preferred_element_type=f32)
            * scale).astype(dq_ref.dtype)
        # dk += ds^T @ qs ; dv += p^T @ dout  (fp32 scratch accumulation)
        dkv_acc_ref[:, o:o + HS] += jax.lax.dot_general(
            dsb, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        dkv_acc_ref[:, C + o:C + o + HS] += jax.lax.dot_general(
            p.astype(v.dtype), dob.astype(v.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    @pl.when(i == nblk - 1)
    def _flush():
        dkv_ref[0] = dkv_acc_ref[...].astype(dkv_ref.dtype)


def _pick_block_q(T: int, max_block: int = 256) -> int:
    """Largest query block <= max_block that tiles T exactly (0 if none).

    The grids below launch T // block_q query blocks with no remainder
    handling, so a non-divisor block would silently drop the tail rows —
    callers must route T with _pick_block_q(T) == 0 to the XLA path
    (see supports()).

    max_block is direction-specific.  Forward uses the whole T (<= 1024):
    its only live score temporaries are s/p, and one grid step per batch
    row removes the per-block pipeline bubbles (trace-measured 0.75 ->
    0.60 ms at B=32,T=1024,C=192).  Backward keeps 256: it holds four
    (TQ, T) fp32 temporaries plus the (T, 2C) accumulator, and TQ=512
    already exceeds the 16 MB scoped-VMEM limit at the reference core
    shape (B=4,T=1024,C=256: 17.53 MB)."""
    if T <= max_block:
        return T
    for d in range(max_block, 7, -8):
        if T % d == 0:
            return d
    return 0


def supports(T: int) -> bool:
    """True iff the fused kernel can handle sequence length T exactly."""
    return T % 8 == 0 and _pick_block_q(T) > 0


def _fwd_call(qkv, num_heads):
    B, T, C3 = qkv.shape
    C = C3 // 3
    HS = C // num_heads
    scale = 1.0 / math.sqrt(HS)
    # Whole-T block when it fits: cap the (TQ, T) fp32 score temporaries
    # at 4 MB each (TQ*T <= 2^20) so T > 1024 shapes keep compiling
    # inside the 16 MB scoped-VMEM limit instead of regressing vs the
    # old 256-row cap.  The cap must be rounded DOWN to a multiple of 8:
    # _pick_block_q steps by 8 from max_block, so an unaligned cap would
    # scan only values congruent to it mod 8 and miss every valid block
    # (e.g. T=1600 -> cap 655 -> no divisor found at all).
    TQ = _pick_block_q(T, max_block=min(1024, ((1 << 20) // T) & ~7))
    assert TQ > 0 and T % TQ == 0, \
        f"fused attention needs a divisor block for T={T} (see supports())"
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
    assert TQ > 0 and T % TQ == 0, \
        f"fused attention needs a divisor block for T={T} (see supports())"
    nblk = T // TQ
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                               scale=scale, nblk=nblk)
    dq, dkv = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, TQ, C3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # full key range, constant across the query-block axis
            pl.BlockSpec((1, T, C3), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 2 * C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, T, 2 * C), qkv.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((T, 2 * C), jnp.float32)],
        interpret=_interpret(),
    )(qkv, qkv, dout)
    return jnp.concatenate([dq, dkv], axis=-1)


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
