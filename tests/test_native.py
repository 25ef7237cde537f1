"""Native runtime tests: torch-parity RNG (bit-exact) + prefetch loader.

The RNG plays the role of the reference's dev/rand.h (torch-identical
MT19937 for cross-framework trajectory parity, SURVEY.md section 3.5);
asserted bit-exact against torch itself here.
"""

import os

import numpy as np
import pytest
import torch

native = pytest.importorskip("unet_tpu.utils.native")


@pytest.fixture(scope="module")
def rng137():
    try:
        return native.TorchRng(137)
    except Exception as e:  # g++ missing etc.
        pytest.skip(f"native build unavailable: {e}")


def test_randint32_matches_torch(rng137):
    # torch.randint with int64 output draws a u64 from the stream and
    # takes it modulo the range; two of our u32 draws reproduce it
    # bit-exactly, proving the raw MT19937 stream is torch's.
    rng137.seed(137)
    torch.manual_seed(137)
    for _ in range(5):
        u64 = (rng137.randint32() << 32) | rng137.randint32()
        assert u64 % 0xFFFFFFFF == int(
            torch.randint(0, 0xFFFFFFFF, [1]).item())


def test_normal_matches_torch_blocked_and_scalar(rng137):
    # Consumes the identical uniform stream; the Box-Muller cos lanes are
    # bit-exact, the sin lanes differ from torch's vectorized sin by at
    # most 1 ULP (libm build difference), so assert <= 2 ULP at |x|~1.
    for n in (16, 24, 37):  # blocked path incl. ragged-tail redraw
        rng137.seed(7)
        torch.manual_seed(7)
        t = torch.zeros(n)
        t.normal_()
        np.testing.assert_allclose(rng137.normal((n,)), t.numpy(),
                                   atol=2.5e-7, rtol=0)
    # n < 16: scalar double path with cached second sample
    rng137.seed(3)
    torch.manual_seed(3)
    t = torch.zeros(5)
    t.normal_()
    np.testing.assert_allclose(rng137.normal((5,)), t.numpy(),
                               atol=2.5e-7, rtol=0)


def test_uniform_matches_torch(rng137):
    rng137.seed(11)
    torch.manual_seed(11)
    t = torch.zeros(33)
    t.uniform_()
    np.testing.assert_array_equal(rng137.uniform(33), t.numpy())


def test_timesteps_in_range(rng137):
    rng137.seed(0)
    ts = rng137.timesteps(1000, 1000)
    assert ts.dtype == np.float32
    assert (ts >= 0).all() and (ts < 1000).all()
    assert (ts == np.floor(ts)).all()


def test_native_loader_matches_python_reader(tmp_path):
    from unet_tpu.data import dataset
    try:
        native.load_library()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")

    imgs = (np.random.default_rng(0)
            .standard_normal((10, 3, 8, 8)).astype(np.float32))
    path = os.path.join(tmp_path, "d.bin")
    dataset.write_bin(path, imgs)

    loader = native.NativeLoader(path, batch_size=4)
    assert (loader.n_images, loader.channels,
            loader.height, loader.width) == (10, 3, 8, 8)
    ds = dataset.BinDataset(path)
    # sequential wrap semantics: batches [0..3], [4..7], wrap -> [0..3]
    b1 = loader.next_batch()
    np.testing.assert_array_equal(b1, ds.batch_nhwc(np.arange(0, 4)))
    b2 = loader.next_batch()
    np.testing.assert_array_equal(b2, ds.batch_nhwc(np.arange(4, 8)))
    b3 = loader.next_batch()
    np.testing.assert_array_equal(b3, ds.batch_nhwc(np.arange(0, 4)))


def test_native_augmented_loader_parity(tmp_path):
    """NativeAugmentedLoader (C++ gather+transpose+flip, Python rng) is
    bit-identical to data_loader across shuffle/flip/shard/resume
    combinations, including epoch wraps."""
    from unet_tpu.data import dataset
    try:
        native.load_library()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")

    imgs = (np.random.default_rng(1)
            .standard_normal((37, 3, 8, 8)).astype(np.float32))
    path = os.path.join(tmp_path, "d.bin")
    dataset.write_bin(path, imgs)

    cases = [
        dict(shuffle=True, flip=True),
        dict(shuffle=True, flip=True, skip_batches=7),
        dict(shuffle=False, flip=True, skip_batches=5),
        dict(shuffle=True, flip=False, num_shards=2, shard_index=1,
             skip_batches=3),
        dict(shuffle=False, flip=False),
    ]
    for kw in cases:
        py = dataset.data_loader(path, 4, seed=3, **kw)
        nat = native.NativeAugmentedLoader(path, 4, seed=3, **kw)
        for k in range(25):  # 37 imgs / B=4 -> several epoch wraps
            np.testing.assert_array_equal(next(py), next(nat),
                                          err_msg=f"{kw} batch {k}")


def test_loaders_reject_undersized_dataset(tmp_path):
    """n < batch_size*num_shards must fail loudly in BOTH loaders — a
    silently clamped per_epoch would serve ragged batches that retrace
    or crash a compiled step (round-4 ADVICE item 1)."""
    from unet_tpu.data import dataset

    imgs = (np.random.default_rng(3)
            .standard_normal((6, 3, 8, 8)).astype(np.float32))
    path = os.path.join(tmp_path, "d.bin")
    dataset.write_bin(path, imgs)

    with pytest.raises(ValueError, match="full batch"):
        next(dataset.data_loader(path, 8, shuffle=True))
    with pytest.raises(ValueError, match="full batch"):
        next(dataset.data_loader(path, 4, num_shards=2, shard_index=0))
    try:
        native.load_library()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    with pytest.raises(ValueError, match="full batch"):
        native.NativeAugmentedLoader(path, 8, shuffle=True)


def test_native_next_into(tmp_path):
    """next_into fills a row view of a preallocated chunk (the
    trainer's multi-step assembly path) identically to next_batch."""
    from unet_tpu.data import dataset
    try:
        native.load_library()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")

    imgs = (np.random.default_rng(2)
            .standard_normal((12, 3, 8, 8)).astype(np.float32))
    path = os.path.join(tmp_path, "d.bin")
    dataset.write_bin(path, imgs)
    ds = dataset.BinDataset(path)

    loader = native.NativeLoader(path, batch_size=4)
    out = np.empty((3, 4, 8, 8, 3), np.float32)
    for j in range(3):
        loader.next_into(out[j])
    np.testing.assert_array_equal(out[0], ds.batch_nhwc(np.arange(0, 4)))
    np.testing.assert_array_equal(out[2], ds.batch_nhwc(np.arange(8, 12)))


def test_native_u8_emission(tmp_path):
    """loader_next_u8 emits round((v+1)*127.5) bytes matching np.round
    of the f32 batch (the H2D byte encoding)."""
    from unet_tpu.data import dataset
    try:
        native.load_library()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")

    u8src = (np.random.default_rng(5)
             .integers(0, 256, (20, 3, 8, 8)).astype(np.uint8))
    path = os.path.join(tmp_path, "d.bin")
    dataset.write_bin(path, u8src.astype(np.float32) / 127.5 - 1.0)
    a = native.NativeAugmentedLoader(path, 4, shuffle=True, flip=True,
                                     seed=3)
    b = native.NativeAugmentedLoader(path, 4, shuffle=True, flip=True,
                                     seed=3)
    for _ in range(12):  # covers epoch wraps
        o8 = np.empty((4, 8, 8, 3), np.uint8)
        a.next_into(o8)
        of = np.empty((4, 8, 8, 3), np.float32)
        b.next_into(of)
        np.testing.assert_array_equal(
            o8, np.round((of + 1.0) * 127.5).astype(np.uint8))


def test_sharded_shuffle_streams_stay_disjoint(tmp_path):
    """Round-3 ADVICE item 1: with n % (batch*num_shards) straddling a
    batch boundary (n=39, B=4, 2 shards -> shard lens 20/19, old
    per-rank per_epoch 5 vs 4), the shared seeded rng streams used to
    desynchronize after the first epoch so ranks sliced DIFFERENT
    permutations — silent shard overlap.  Epoch cadence is now computed
    from the global size: every step's shard batches stay disjoint
    across many epochs.  Pixel values encode the image index."""
    from unet_tpu.data import dataset
    n, B = 39, 4
    imgs = np.zeros((n, 3, 8, 8), np.float32) \
        + np.arange(n, dtype=np.float32)[:, None, None, None]
    path = os.path.join(tmp_path, "d.bin")
    dataset.write_bin(path, imgs)
    l0 = dataset.data_loader(path, B, shuffle=True, seed=7,
                             num_shards=2, shard_index=0)
    l1 = dataset.data_loader(path, B, shuffle=True, seed=7,
                             num_shards=2, shard_index=1)
    for step in range(20):  # per_epoch = 39 // 8 = 4 -> 5 epochs
        i0 = set(np.unique(next(l0)).astype(int))
        i1 = set(np.unique(next(l1)).astype(int))
        assert not (i0 & i1), f"step {step}: shards overlap {i0 & i1}"
