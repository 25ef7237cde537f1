"""Golden parity against artifacts the REFERENCE'S OWN dev/ generators
produce (SURVEY.md section 4 tier 1; round-3 VERDICT item 3; round-4
VERDICT item 3 completes the set to all 13 generators).

tests/test_ops.py regenerates torch ground truth in-process with its own
shapes/seeds; here the ground truth is the .bin files written by running
/root/reference/dev/{groupnorm,silu,linear,attention,mse,upsample,
timestep_embeddings,conv2d_k3,conv2d_k1,broadcast,downsample,resblock,
attention_block}.py verbatim (their exact manual_seed(0) streams, shapes,
and write() order — dev/utils.py:7-12), validated at the tolerance tiers
the reference's own .cu harnesses use
(dev/common.h:57 validate_result default 1e-4; dev/groupnorm.cu:333-349
fwd 1e-1 / affine grads 1e-3 / dx 1.0; dev/conv2d_k3.cu:2662-2726
fwd 1e-1 / grads 1e-2; dev/conv2d_k1.cu:474 weight grads 1e-1;
dev/resblock.cu:542/594 acts 1e-5 / grads 1e-4;
dev/attention_block.cu:379 1e-4 throughout).

The two block-level tests also consume every INTERMEDIATE activation the
generators dump (dev/resblock.cu:544-568 checks h_gn1..h_2 one sub-op at
a time; dev/attention_block.cu:381-392 checks gn/qkv/att/proj), so a
block mismatch localizes to a sub-op exactly as in the reference harness
— plus the whole-block composite (models/blocks.py) and its grads.

The generators hardcode device='cuda:1' in places; they are executed with
that one string mapped to 'cpu' (no other modification), in a tmp cwd so
their artifacts land there.  conv2d_k3.py / resblock.py append
CUDA-events benchmarks AFTER writing their artifacts — the CUDA failure
there is tolerated once the .bin exists.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet_tpu.ops import functional as F  # noqa: E402

DEV = "/root/reference/dev"


@pytest.fixture(scope="module")
def golden_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("golden"))


def run_generator(name: str, outdir: str, artifact: str = None):
    """Execute a reference dev generator; returns the artifact as a flat
    float32 array.  Cached per test session by artifact presence."""
    artifact = artifact or f"{name}.bin"
    path = os.path.join(outdir, artifact)
    if os.path.exists(path):
        return np.fromfile(path, np.float32)
    with open(os.path.join(DEV, f"{name}.py")) as f:
        src = f.read()
    src = src.replace("'cuda:1'", "'cpu'").replace('"cuda:1"', '"cpu"')
    cwd = os.getcwd()
    sys.path.insert(0, DEV)
    # the reference root (already on sys.path for other tests) ALSO has a
    # utils.py; make sure the dev one wins, and leave no residue.  Same
    # for dev-local modules the block generators import (unet, resblock).
    saved = {m: sys.modules.pop(m, None)
             for m in ("utils", "unet", "resblock")}
    os.chdir(outdir)
    try:
        g = {"__name__": "__main__", "__file__": os.path.join(DEV, name)}
        try:
            exec(compile(src, f"{name}.py", "exec"), g)
        except Exception:
            if not os.path.exists(path):  # pre-artifact failure is real
                raise
        torch.manual_seed(0)  # don't leak the generator's rng state
    finally:
        os.chdir(cwd)
        sys.path.remove(DEV)
        for m, mod in saved.items():
            sys.modules.pop(m, None)
            if mod is not None:
                sys.modules[m] = mod
    assert os.path.exists(path), f"{name}.py wrote no {artifact}"
    return np.fromfile(path, np.float32)


def read_with_header(outdir: str, artifact: str, magic: int = 12345678):
    """Read a block-generator params file: 256-int32 header + flat f32
    params (dev/resblock.py:330-334, dev/attention_block.py:51-58)."""
    raw = open(os.path.join(outdir, artifact), "rb").read()
    header = np.frombuffer(raw[:1024], np.int32)
    assert header[0] == magic, header[0]
    return header, np.frombuffer(raw[1024:], np.float32)


def take(buf, *shape):
    """Pop the next tensor of `shape` off the flat artifact."""
    n = int(np.prod(shape))
    assert buf[1][0] + n <= buf[0].size, (buf[1][0], n, buf[0].size)
    out = buf[0][buf[1][0]:buf[1][0] + n].reshape(shape)
    buf[1][0] += n
    return out


def vjp_grads(fn, inputs, dout):
    """(out, grads) for fakeloss = sum(out * dout) — the reference
    generators' backward convention."""
    out, pull = jax.vjp(fn, *inputs)
    return np.asarray(out), [np.asarray(g) for g in pull(jnp.asarray(dout))]


def test_golden_groupnorm(golden_dir):
    B, C, H, W = 16, 128, 4, 8  # dev/groupnorm.py:14-17
    buf = [run_generator("groupnorm", golden_dir), [0]]
    x = take(buf, B, C, H, W)
    weight = take(buf, C)
    bias = take(buf, C)
    out_t = take(buf, B, C, H, W)
    dout = take(buf, B, C, H, W)
    dx_t = take(buf, B, C, H, W)
    dw_t = take(buf, C)
    db_t = take(buf, C)
    assert buf[1][0] == buf[0].size

    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    fn = jax.jit(lambda xx, w, b: F.group_norm(xx, w, b, num_groups=32))
    out, (dx, dw, db) = vjp_grads(
        fn, (xn, jnp.asarray(weight), jnp.asarray(bias)),
        dout.transpose(0, 2, 3, 1))
    # reference tiers: dev/groupnorm.cu:333-349 (out 1e-1, affine grads
    # 1e-3, dx 1.0); both sides are f32 here so assert far tighter too
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), out_t, atol=1e-4)
    np.testing.assert_allclose(dx.transpose(0, 3, 1, 2), dx_t, atol=1e-4)
    np.testing.assert_allclose(dw, dw_t, atol=1e-3)
    np.testing.assert_allclose(db, db_t, atol=1e-3)


def test_golden_silu(golden_dir):
    B, C, H, W = 1, 32, 32, 32  # dev/silu.py:8-11
    buf = [run_generator("silu", golden_dir), [0]]
    x = take(buf, B, C, H, W)
    out_t = take(buf, B, C, H, W)
    dout = take(buf, B, C, H, W)
    dx_t = take(buf, B, C, H, W)
    assert buf[1][0] == buf[0].size
    out, (dx,) = vjp_grads(jax.jit(F.silu), (jnp.asarray(x),), dout)
    np.testing.assert_allclose(out, out_t, atol=1e-4)  # dev/silu.cu:119
    np.testing.assert_allclose(dx, dx_t, atol=1e-4)


def test_golden_linear(golden_dir):
    B, C_in, C_out = 32, 64, 128  # dev/linear.py:9-11
    buf = [run_generator("linear", golden_dir), [0]]
    x = take(buf, B, C_in)
    w = take(buf, C_out, C_in)
    b = take(buf, C_out)
    out_t = take(buf, B, C_out)
    dout = take(buf, B, C_out)
    dx_t = take(buf, B, C_in)
    dw_t = take(buf, C_out, C_in)
    db_t = take(buf, C_out)
    assert buf[1][0] == buf[0].size
    out, (dx, dw, db) = vjp_grads(
        jax.jit(F.linear),
        (jnp.asarray(x), jnp.asarray(w.T), jnp.asarray(b)), dout)
    # dev/linear.cu:221-236 default tier 1e-4 (unscaled randn inputs)
    np.testing.assert_allclose(out, out_t, atol=1e-4)
    np.testing.assert_allclose(dx, dx_t, atol=1e-4)
    np.testing.assert_allclose(dw.T, dw_t, atol=1e-4)
    np.testing.assert_allclose(db, db_t, atol=1e-4)


def test_golden_attention(golden_dir):
    B, T, C, HS = 4, 1024, 256, 32  # dev/attention.py:27-30
    buf = [run_generator("attention", golden_dir), [0]]
    qkv = take(buf, B, T, 3 * C)
    out_t = take(buf, B, T, C)
    dout = take(buf, B, T, C)
    dqkv_t = take(buf, B, T, 3 * C)
    assert buf[1][0] == buf[0].size
    out, (dqkv,) = vjp_grads(
        jax.jit(lambda q: F.qkv_attention(q, C // HS)),
        (jnp.asarray(qkv),), dout)
    # dev/attention.cu:432-442 default tier 1e-4; logits are O(16) from
    # unscaled randn so softmax/exp crossings earn a small slack on dqkv
    np.testing.assert_allclose(out, out_t, atol=1e-4)
    np.testing.assert_allclose(dqkv, dqkv_t, atol=5e-4)


def test_golden_mse(golden_dir):
    N = 32 * 3 * 64 * 64  # dev/mse.py:7
    buf = [run_generator("mse", golden_dir), [0]]
    x = take(buf, N)
    y = take(buf, N)
    dx_t = take(buf, N)
    mse_t = take(buf, 1)
    assert buf[1][0] == buf[0].size
    # the target side carries no grad in the generator; pass it closed over
    out, (dx,) = vjp_grads(
        jax.jit(lambda xx: F.mse_loss(xx, jnp.asarray(y))),
        (jnp.asarray(x),), np.float32(1.0))
    np.testing.assert_allclose(out, mse_t[0], atol=1e-6)
    np.testing.assert_allclose(dx, dx_t, atol=1e-8)


def test_golden_upsample(golden_dir):
    B, C, H, W = 1, 64, 32, 32  # dev/upsample.py:33-36
    buf = [run_generator("upsample", golden_dir), [0]]
    x = take(buf, B, C, H, W)
    out_t = take(buf, B, C, 2 * H, 2 * W)
    dout = take(buf, B, C, 2 * H, 2 * W)
    dx_t = take(buf, B, C, H, W)
    assert buf[1][0] == buf[0].size
    out, (dx,) = vjp_grads(
        jax.jit(F.upsample_nearest_2x),
        (jnp.asarray(x.transpose(0, 2, 3, 1)),),
        dout.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), out_t, atol=0)
    np.testing.assert_allclose(dx.transpose(0, 3, 1, 2), dx_t, atol=1e-6)


def test_golden_timestep_embedding(golden_dir):
    B, dim, max_period = 32, 64, 1000  # dev/timestep_embeddings.py:26-28
    buf = [run_generator("timestep_embeddings", golden_dir,
                         artifact="time_emb.bin"), [0]]
    ts = take(buf, B, 1)
    emb_t = take(buf, B, 1, dim)  # generator's (B,1) input keeps a 1-axis
    freqs_t = take(buf, dim // 2)
    assert buf[1][0] == buf[0].size
    emb = np.asarray(jax.jit(lambda t: F.timestep_embedding(
        t, dim, max_period=max_period))(jnp.asarray(ts[:, 0])))
    np.testing.assert_allclose(emb, emb_t[:, 0, :], atol=1e-6)
    del freqs_t  # internal detail of the generator


def test_golden_conv2d_k1(golden_dir):
    B, C_in, C_out, H, W = 32, 64, 128, 64, 64  # dev/conv2d_k1.py:60-64
    buf = [run_generator("conv2d_k1", golden_dir), [0]]
    x = take(buf, B, C_in, H, W)
    w = take(buf, C_out, C_in, 1, 1)
    b = take(buf, C_out)
    out_t = take(buf, B, C_out, H, W)
    dout = take(buf, B, C_out, H, W)
    dx_t = take(buf, B, C_in, H, W)
    dw_t = take(buf, C_out, C_in, 1, 1)
    db_t = take(buf, C_out)
    assert buf[1][0] == buf[0].size

    out, (dx, dw, db) = vjp_grads(
        jax.jit(F.conv2d),
        (jnp.asarray(x.transpose(0, 2, 3, 1)),
         jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b)),
        dout.transpose(0, 2, 3, 1))
    # reference tiers: dev/conv2d_k1.cu:443/:484 default 1e-4 for out/dx
    # (unscaled randn, |out| ~ sqrt(64) ~ 8: grant reassociation slack),
    # :474 weight grads 1e-1 (dw sums B*H*W = 131072 randn products)
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), out_t, atol=5e-4)
    np.testing.assert_allclose(dx.transpose(0, 3, 1, 2), dx_t, atol=5e-4)
    np.testing.assert_allclose(dw.transpose(3, 2, 0, 1), dw_t, atol=1e-1)
    np.testing.assert_allclose(db, db_t, atol=1e-1)


def test_golden_broadcast(golden_dir):
    N, H, W = 8 * 64, 16, 16  # dev/broadcast.py:5-7
    buf = [run_generator("broadcast", golden_dir), [0]]
    x = take(buf, N, 1, 1)
    out_t = take(buf, N, H, W)
    dout = take(buf, N * H * W)
    dx_t = take(buf, N, 1, 1)
    assert buf[1][0] == buf[0].size
    # the op under test is the emb-broadcast in resblock_apply
    # (models/blocks.py:127): expand a per-row scalar over the spatial
    # grid; its grad (the spatial sum) comes from jax.grad
    out, (dx,) = vjp_grads(
        jax.jit(lambda v: jnp.broadcast_to(v, (N, H, W))),
        (jnp.asarray(x),), dout.reshape(N, H, W))
    np.testing.assert_allclose(out, out_t, atol=0)  # broadcast is exact
    np.testing.assert_allclose(dx, dx_t, atol=1e-4)  # dev/broadcast.cu:127


def test_golden_downsample(golden_dir):
    B, C, H, W = 1, 64, 32, 32  # dev/downsample.py:36-39
    buf = [run_generator("downsample", golden_dir, artifact="down.bin"),
           [0]]
    x = take(buf, B, C, H, W)
    out_t = take(buf, B, C, H // 2, W // 2)
    dout = take(buf, B, C, H // 2, W // 2)
    dx_t = take(buf, B, C, H, W)
    assert buf[1][0] == buf[0].size
    out, (dx,) = vjp_grads(
        jax.jit(F.avg_pool_2x), (jnp.asarray(x.transpose(0, 2, 3, 1)),),
        dout.transpose(0, 2, 3, 1))
    # dev/avgpool.cu:152/:161 default tier 1e-4
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), out_t, atol=1e-4)
    np.testing.assert_allclose(dx.transpose(0, 3, 1, 2), dx_t, atol=1e-4)


@pytest.mark.slow
def test_golden_resblock(golden_dir):
    """Block-level golden parity INCLUDING every intermediate the
    reference dumps, so a mismatch localizes to one sub-op — the exact
    checks of dev/resblock.cu:544-568 (acts, acc=1e-5) and :594-630
    (grads, acc=1e-4) — plus the composite models/blocks.resblock_apply
    output and its full grad set."""
    from unet_tpu.models import blocks

    run_generator("resblock", golden_dir, artifact="resblock_params.bin")
    header, pbuf = read_with_header(golden_dir, "resblock_params.bin")
    B, C, C_emb, C_out, H, W = (int(v) for v in header[1:7])
    assert (B, C, C_emb, C_out, H, W) == (32, 192, 256, 64, 64, 64)
    assert header[7] == 0 and header[8] == 0  # up/down off
    G = int(header[9])

    pb = [pbuf, [0]]
    # torch named_parameters() order (dev/resblock.py:70-105)
    gn1_w, gn1_b = take(pb, C), take(pb, C)
    cv1_w, cv1_b = take(pb, C_out, C, 3, 3), take(pb, C_out)
    emb_w, emb_b = take(pb, C_out, C_emb), take(pb, C_out)
    gn2_w, gn2_b = take(pb, C_out), take(pb, C_out)
    cv2_w, cv2_b = take(pb, C_out, C_out, 3, 3), take(pb, C_out)
    skip_w, skip_b = take(pb, C_out, C, 1, 1), take(pb, C_out)
    assert pb[1][0] == pb[0].size

    sb = [np.fromfile(os.path.join(golden_dir, "resblock_states.bin"),
                      np.float32), [0]]
    x = take(sb, B, C, H, W)
    emb = take(sb, B, C_emb)
    h_gn1_t = take(sb, B, C, H, W)
    h_silu1_t = take(sb, B, C, H, W)
    h_1_t = take(sb, B, C_out, H, W)
    x_1_t = take(sb, B, C, H, W)
    emb_1_t = take(sb, B, C_out)
    h_plus_emb_t = take(sb, B, C_out, H, W)
    h_gn2_t = take(sb, B, C_out, H, W)
    h_silu2_t = take(sb, B, C_out, H, W)
    h_2_t = take(sb, B, C_out, H, W)
    out_t = take(sb, B, C_out, H, W)
    dout = take(sb, B, C_out, H, W)
    dx_t = take(sb, B, C, H, W)
    demb_t = take(sb, B, C_emb)
    emb_broad_t = take(sb, B, C_out, H, W)
    dgn1_w_t, dgn1_b_t = take(sb, C), take(sb, C)
    dcv1_w_t, dcv1_b_t = take(sb, C_out, C, 3, 3), take(sb, C_out)
    demb_w_t, demb_b_t = take(sb, C_out, C_emb), take(sb, C_out)
    dgn2_w_t, dgn2_b_t = take(sb, C_out), take(sb, C_out)
    dcv2_w_t, dcv2_b_t = take(sb, C_out, C_out, 3, 3), take(sb, C_out)
    dskip_w_t, dskip_b_t = take(sb, C_out, C, 1, 1), take(sb, C_out)
    assert sb[1][0] == sb[0].size

    p = {
        "gn1": {"scale": jnp.asarray(gn1_w), "bias": jnp.asarray(gn1_b)},
        "conv1": {"w": jnp.asarray(cv1_w.transpose(2, 3, 1, 0)),
                  "b": jnp.asarray(cv1_b)},
        "emb": {"w": jnp.asarray(emb_w.T), "b": jnp.asarray(emb_b)},
        "gn2": {"scale": jnp.asarray(gn2_w), "bias": jnp.asarray(gn2_b)},
        "conv2": {"w": jnp.asarray(cv2_w.transpose(2, 3, 1, 0)),
                  "b": jnp.asarray(cv2_b)},
        "skip": {"w": jnp.asarray(skip_w.transpose(2, 3, 1, 0)),
                 "b": jnp.asarray(skip_b)},
    }
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    embn = jnp.asarray(emb)

    # ---- intermediate localization (dev/resblock.cu:544-568, acc 1e-5)
    def nchw(a):
        return np.asarray(a).transpose(0, 3, 1, 2)

    h_gn1 = jax.jit(lambda v: F.group_norm(
        v, p["gn1"]["scale"], p["gn1"]["bias"], num_groups=G))(xn)
    np.testing.assert_allclose(nchw(h_gn1), h_gn1_t, atol=1e-5)
    h_silu1 = F.silu(h_gn1)
    np.testing.assert_allclose(nchw(h_silu1), h_silu1_t, atol=1e-5)
    h_1 = jax.jit(F.conv2d)(h_silu1, p["conv1"]["w"], p["conv1"]["b"])
    np.testing.assert_allclose(nchw(h_1), h_1_t, atol=1e-5)
    np.testing.assert_allclose(x, x_1_t, atol=0)  # x_1 == x (no up/down)
    emb_1 = jax.jit(lambda e: F.linear(
        F.silu(e), p["emb"]["w"], p["emb"]["b"]))(embn)
    np.testing.assert_allclose(np.asarray(emb_1), emb_1_t, atol=1e-5)
    np.testing.assert_allclose(
        np.broadcast_to(emb_1_t[:, :, None, None], (B, C_out, H, W)),
        emb_broad_t, atol=0)
    h_pe = h_1 + emb_1[:, None, None, :]
    np.testing.assert_allclose(nchw(h_pe), h_plus_emb_t, atol=1e-5)
    h_gn2 = jax.jit(lambda v: F.group_norm(
        v, p["gn2"]["scale"], p["gn2"]["bias"], num_groups=G))(h_pe)
    np.testing.assert_allclose(nchw(h_gn2), h_gn2_t, atol=1e-5)
    h_silu2 = F.silu(h_gn2)
    np.testing.assert_allclose(nchw(h_silu2), h_silu2_t, atol=1e-5)
    h_2 = jax.jit(F.conv2d)(h_silu2, p["conv2"]["w"], p["conv2"]["b"])
    np.testing.assert_allclose(nchw(h_2), h_2_t, atol=1e-5)

    # ---- composite block output + grads (dev/resblock.cu:594-630,
    #      acc 1e-4)
    fn = jax.jit(lambda pp, xx, ee: blocks.resblock_apply(
        pp, xx, ee, num_groups=G))
    out, pull = jax.vjp(fn, p, xn, embn)
    np.testing.assert_allclose(nchw(out), out_t, atol=1e-5)
    dp, dx, demb = pull(jnp.asarray(dout.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(nchw(dx), dx_t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(demb), demb_t, atol=1e-4)
    for name, got, want in [
        ("gn1.w", dp["gn1"]["scale"], dgn1_w_t),
        ("gn1.b", dp["gn1"]["bias"], dgn1_b_t),
        ("conv1.w", np.asarray(dp["conv1"]["w"]).transpose(3, 2, 0, 1),
         dcv1_w_t),
        ("conv1.b", dp["conv1"]["b"], dcv1_b_t),
        ("emb.w", np.asarray(dp["emb"]["w"]).T, demb_w_t),
        ("emb.b", dp["emb"]["b"], demb_b_t),
        ("gn2.w", dp["gn2"]["scale"], dgn2_w_t),
        ("gn2.b", dp["gn2"]["bias"], dgn2_b_t),
        ("conv2.w", np.asarray(dp["conv2"]["w"]).transpose(3, 2, 0, 1),
         dcv2_w_t),
        ("conv2.b", dp["conv2"]["b"], dcv2_b_t),
        ("skip.w", np.asarray(dp["skip"]["w"]).transpose(3, 2, 0, 1),
         dskip_w_t),
        ("skip.b", dp["skip"]["b"], dskip_b_t),
    ]:
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4,
                                   err_msg=name)


def test_golden_attention_block(golden_dir):
    """Block-level golden parity with the reference's intermediate
    checks (dev/attention_block.cu:381-412, acc=1e-4): gn -> qkv -> att
    -> proj each validated standalone, then the composite
    models/blocks.attention_apply output and every grad."""
    from unet_tpu.models import blocks

    run_generator("attention_block", golden_dir,
                  artifact="attention_block_params.bin")
    header, pbuf = read_with_header(golden_dir,
                                    "attention_block_params.bin")
    B, C, H, W, HS, G = (int(v) for v in header[1:7])
    assert (B, C, H, W, HS, G) == (32, 64, 32, 32, 8, 32)
    T = H * W

    pb = [pbuf, [0]]
    gn_w, gn_b = take(pb, C), take(pb, C)
    qkv_w, qkv_b = take(pb, 3 * C, C, 1), take(pb, 3 * C)
    proj_w, proj_b = take(pb, C, C, 1), take(pb, C)
    assert pb[1][0] == pb[0].size

    sb = [np.fromfile(os.path.join(
        golden_dir, "attention_block_states.bin"), np.float32), [0]]
    x = take(sb, B, C, H, W)
    _gn_nct = take(sb, B, C, T)  # pre-permute copy; perm1 is its (B,T,C)
    perm1_t = take(sb, B, T, C)
    qkv_t = take(sb, B, T, 3 * C)
    att_t = take(sb, B, T, C)
    proj_t = take(sb, B, T, C)
    out_t = take(sb, B, C, H, W)
    dout = take(sb, B, C, H, W)
    dx_t = take(sb, B, C, H, W)
    dgn_w_t, dgn_b_t = take(sb, C), take(sb, C)
    dqkv_w_t, dqkv_b_t = take(sb, 3 * C, C, 1), take(sb, 3 * C)
    dproj_w_t, dproj_b_t = take(sb, C, C, 1), take(sb, C)
    assert sb[1][0] == sb[0].size
    np.testing.assert_allclose(_gn_nct.transpose(0, 2, 1), perm1_t, atol=0)

    p = {
        "gn": {"scale": jnp.asarray(gn_w), "bias": jnp.asarray(gn_b)},
        "qkv": {"w": jnp.asarray(qkv_w[:, :, 0].T),
                "b": jnp.asarray(qkv_b)},
        "proj": {"w": jnp.asarray(proj_w[:, :, 0].T),
                 "b": jnp.asarray(proj_b)},
    }
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))

    # ---- intermediate localization (dev/attention_block.cu:381-392)
    h_gn = jax.jit(lambda v: F.group_norm(
        v, p["gn"]["scale"], p["gn"]["bias"], num_groups=G))(xn)
    h_btc = np.asarray(h_gn).reshape(B, T, C)
    np.testing.assert_allclose(h_btc, perm1_t, atol=1e-4)
    qkv = jax.jit(F.linear)(h_gn.reshape(B, T, C), p["qkv"]["w"],
                            p["qkv"]["b"])
    np.testing.assert_allclose(np.asarray(qkv), qkv_t, atol=1e-4)
    att = jax.jit(lambda q: F.qkv_attention(q, C // HS))(qkv)
    np.testing.assert_allclose(np.asarray(att), att_t, atol=1e-4)
    proj = jax.jit(F.linear)(att, p["proj"]["w"], p["proj"]["b"])
    np.testing.assert_allclose(np.asarray(proj), proj_t, atol=1e-4)

    # ---- composite block output + grads (dev/attention_block.cu:400-412)
    fn = jax.jit(lambda pp, xx: blocks.attention_apply(
        pp, xx, head_size=HS, num_groups=G))
    out, pull = jax.vjp(fn, p, xn)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               out_t, atol=1e-4)
    dp, dx = pull(jnp.asarray(dout.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(dx).transpose(0, 3, 1, 2),
                               dx_t, atol=1e-4)
    for name, got, want in [
        ("gn.w", dp["gn"]["scale"], dgn_w_t),
        ("gn.b", dp["gn"]["bias"], dgn_b_t),
        ("qkv.w", np.asarray(dp["qkv"]["w"]).T[:, :, None], dqkv_w_t),
        ("qkv.b", dp["qkv"]["b"], dqkv_b_t),
        ("proj.w", np.asarray(dp["proj"]["w"]).T[:, :, None], dproj_w_t),
        ("proj.b", dp["proj"]["b"], dproj_b_t),
    ]:
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4,
                                   err_msg=name)


@pytest.mark.slow
def test_golden_conv2d_k3(golden_dir):
    B, C_in, C_out, H, W = 32, 192, 64, 64, 64  # dev/conv2d_k3.py:118-122
    buf = [run_generator("conv2d_k3", golden_dir), [0]]
    x = take(buf, B, C_in, H, W)
    w = take(buf, C_out, C_in, 3, 3)
    b = take(buf, C_out)
    out_t = take(buf, B, C_out, H, W)
    dout = take(buf, B, C_out, H, W)
    dx_t = take(buf, B, C_in, H, W)
    dw_t = take(buf, C_out, C_in, 3, 3)
    db_t = take(buf, C_out)
    # trailing dout_perm / x_tiled are internals of the reference's
    # hand-rolled backward — not part of the op contract

    out, (dx, dw, db) = vjp_grads(
        jax.jit(F.conv2d),
        (jnp.asarray(x.transpose(0, 2, 3, 1)),
         jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b)),
        dout.transpose(0, 2, 3, 1))
    # reference tiers: dev/conv2d_k3.cu:2662 fwd 1e-1, :2712 grads 1e-2
    # (unscaled randn inputs: |out| ~ sqrt(9*192) ~ 40)
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), out_t, atol=1e-1)
    np.testing.assert_allclose(dx.transpose(0, 3, 1, 2), dx_t, atol=1e-2)
    np.testing.assert_allclose(dw.transpose(3, 2, 0, 1), dw_t, atol=1e-2)
    np.testing.assert_allclose(db, db_t, atol=1e-2)
