"""Per-op golden parity against artifacts the REFERENCE'S OWN dev/
generators produce (SURVEY.md section 4 tier 1; round-3 VERDICT item 3).

tests/test_ops.py regenerates torch ground truth in-process with its own
shapes/seeds; here the ground truth is the .bin files written by running
/root/reference/dev/{groupnorm,silu,linear,attention,mse,upsample,
timestep_embeddings,conv2d_k3}.py verbatim (their exact manual_seed(0)
streams, shapes, and write() order — dev/utils.py:7-12), validated at the
tolerance tiers the reference's own .cu harnesses use
(dev/common.h:57 validate_result default 1e-4; dev/groupnorm.cu:333-349
fwd 1e-1 / affine grads 1e-3 / dx 1.0; dev/conv2d_k3.cu:2662-2726
fwd 1e-1 / grads 1e-2).

The generators hardcode device='cuda:1' in places; they are executed with
that one string mapped to 'cpu' (no other modification), in a tmp cwd so
their artifacts land there.  conv2d_k3.py appends a CUDA-events benchmark
AFTER writing its artifact — the CUDA failure there is tolerated once the
.bin exists.
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
    # utils.py; make sure the dev one wins, and leave no residue
    saved_utils = sys.modules.pop("utils", None)
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
        sys.modules.pop("utils", None)
        if saved_utils is not None:
            sys.modules["utils"] = saved_utils
    assert os.path.exists(path), f"{name}.py wrote no {artifact}"
    return np.fromfile(path, np.float32)


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
