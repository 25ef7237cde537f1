"""Checkpoint + dataset .bin interchange tests.

Covers the reference's save/load contract (reference
train_unet.cu:4759-4911, train_unet.py:768-795, generate.py:17-27,
prepare_data.py:19-51): header layout, torch named_parameters() flat
order, AdamW moment round-trip, and the dataset format.
"""

import os

import jax
import numpy as np

from unet_tpu.data import dataset
from unet_tpu.io import checkpoint as ckpt_io
from unet_tpu.training import trainer


def test_checkpoint_roundtrip(small_cfg, rng, tmp_path):
    from tests.test_model import make_params_and_flat
    params, flat = make_params_and_flat(small_cfg)
    state = trainer.init_state(params, step=42)

    path = os.path.join(tmp_path, "model.bin")
    ckpt_io.save(path, ckpt_io.Checkpoint(
        params=params, cfg=small_cfg, batch_size=32, step=42,
        adam_m=state.m, adam_v=state.v, rng_seed=7))

    loaded = ckpt_io.load(path, small_cfg)
    assert loaded.step == 42
    assert loaded.batch_size == 32
    assert loaded.rng_seed == 7
    assert loaded.noise_schedule == "linear"  # header[40] default
    np.testing.assert_array_equal(
        ckpt_io.flatten_params(loaded.params, small_cfg), flat)
    assert loaded.adam_m is not None
    np.testing.assert_array_equal(
        ckpt_io.flatten_params(loaded.adam_m, small_cfg),
        np.zeros_like(flat))


def test_checkpoint_save_is_atomic(small_cfg, tmp_path, monkeypatch):
    """A crash mid-save must not clobber an existing checkpoint: save
    writes to a .tmp sibling and renames, so --auto_resume never picks a
    truncated model_N.bin after a kill landed inside the write."""
    from tests.test_model import make_params_and_flat
    params, flat = make_params_and_flat(small_cfg)
    path = os.path.join(tmp_path, "model.bin")
    good = ckpt_io.Checkpoint(params=params, cfg=small_cfg,
                              batch_size=32, step=1)
    ckpt_io.save(path, good)
    assert not os.path.exists(path + ".tmp")
    before = open(path, "rb").read()

    calls = {"n": 0}
    real = ckpt_io.flatten_params

    def dies_mid_write(*a, **k):
        calls["n"] += 1
        if calls["n"] > 1:  # first call succeeds: bytes hit the tmp file
            raise KeyboardInterrupt("kill mid-save")
        return real(*a, **k)

    monkeypatch.setattr(ckpt_io, "flatten_params", dies_mid_write)
    crash = ckpt_io.Checkpoint(params=params, cfg=small_cfg,
                               batch_size=32, step=2,
                               adam_m=params, adam_v=params)
    try:
        ckpt_io.save(path, crash)
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(ckpt_io, "flatten_params", real)
    assert open(path, "rb").read() == before  # original intact
    loaded = ckpt_io.load(path, small_cfg)
    assert loaded.step == 1


def test_checkpoint_header_reference_layout(small_cfg, tmp_path):
    # Byte-level header contract (reference train_unet.cu:4762-4814).
    from tests.test_model import make_params_and_flat
    params, flat = make_params_and_flat(small_cfg)
    path = os.path.join(tmp_path, "model.bin")
    ckpt_io.save(path, ckpt_io.Checkpoint(
        params=params, cfg=small_cfg, batch_size=16))

    raw = np.fromfile(path, dtype=np.int32, count=256)
    assert raw[0] == 12345678
    assert raw[1] == 16
    assert raw[2] == small_cfg.in_channels
    assert raw[3] == small_cfg.model_channels
    assert raw[4] == small_cfg.out_channels
    assert raw[5] == small_cfg.image_size
    assert raw[7] == small_cfg.max_period
    assert raw[8] == 0 and raw[9] == 0
    body = np.fromfile(path, dtype=np.float32, offset=256 * 4)
    np.testing.assert_array_equal(body, flat)


def test_checkpoint_noise_schedule_roundtrip(small_cfg, tmp_path):
    """header[40] records the beta schedule so generate.py samples with
    the tables the model was trained on (the reference hardcodes linear,
    generate.py:66-75)."""
    from tests.test_model import make_params_and_flat
    params, _ = make_params_and_flat(small_cfg)
    path = os.path.join(tmp_path, "cos.bin")
    ckpt_io.save(path, ckpt_io.Checkpoint(
        params=params, cfg=small_cfg, batch_size=4,
        noise_schedule="cosine"))
    assert ckpt_io.load(path, small_cfg).noise_schedule == "cosine"
    # a reference-style file (no EXT marker) has no record -> None
    raw = np.fromfile(path, dtype=np.int32).copy()
    raw[12] = 0  # clear EXT_MAGIC
    noext = os.path.join(tmp_path, "noext.bin")
    raw.tofile(noext)
    assert ckpt_io.load(noext, small_cfg).noise_schedule is None


def test_load_python_init_style_file(small_cfg, tmp_path):
    # A params-only file in the reference Python writer's format
    # (train_unet.py:768-795) loads, and the config is recoverable from
    # the header alone.
    n = ckpt_io.num_params(small_cfg)
    flat = np.arange(n, dtype=np.float32)
    header = np.zeros(256, dtype=np.int32)
    header[0] = 12345678
    header[1] = 32
    header[2], header[3], header[4] = 3, small_cfg.model_channels, 3
    header[5] = header[6] = small_cfg.image_size
    header[7] = 1000
    path = os.path.join(tmp_path, "unet_init.bin")
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(flat.tobytes())

    loaded = ckpt_io.load(path)  # cfg inferred from header
    assert loaded.cfg.model_channels == small_cfg.model_channels
    np.testing.assert_array_equal(
        ckpt_io.flatten_params(loaded.params, loaded.cfg), flat)


def test_dataset_bin_roundtrip(tmp_path, rng):
    imgs = rng.standard_normal((10, 3, 8, 8)).astype(np.float32)
    path = os.path.join(tmp_path, "data.bin")
    dataset.write_bin(path, imgs)

    raw = np.fromfile(path, dtype=np.int32, count=5)
    assert list(raw) == [20240620, 10, 3, 8, 8]

    ds = dataset.BinDataset(path)
    assert len(ds) == 10
    batch = ds.batch_nhwc(np.array([3, 1]))
    np.testing.assert_array_equal(batch.transpose(0, 3, 1, 2), imgs[[3, 1]])


def test_data_loader_sequential_wrap(tmp_path, rng):
    imgs = rng.standard_normal((7, 3, 4, 4)).astype(np.float32)
    path = os.path.join(tmp_path, "data.bin")
    dataset.write_bin(path, imgs)
    it = dataset.data_loader(path, batch_size=3)
    b1, b2, b3 = next(it), next(it), next(it)
    # Sequential, wraps at EOF like the reference loader
    # (train_unet.cu:3085-3096).
    np.testing.assert_array_equal(b1.transpose(0, 3, 1, 2), imgs[0:3])
    np.testing.assert_array_equal(b2.transpose(0, 3, 1, 2), imgs[3:6])
    np.testing.assert_array_equal(b3.transpose(0, 3, 1, 2), imgs[0:3])


def test_data_loader_sharded(tmp_path, rng):
    imgs = rng.standard_normal((8, 3, 4, 4)).astype(np.float32)
    path = os.path.join(tmp_path, "data.bin")
    dataset.write_bin(path, imgs)
    a = next(dataset.data_loader(path, 2, num_shards=2, shard_index=0))
    b = next(dataset.data_loader(path, 2, num_shards=2, shard_index=1))
    np.testing.assert_array_equal(a.transpose(0, 3, 1, 2), imgs[[0, 2]])
    np.testing.assert_array_equal(b.transpose(0, 3, 1, 2), imgs[[1, 3]])


def test_torch_pt_checkpoint_load(small_cfg, tmp_path):
    """.pt state_dict loading (reference generate.py:12-16): build a fake
    state_dict whose tensors are the torch-shaped views of a known flat
    vector, save with torch, load, and compare flat round-trip."""
    import torch
    from unet_tpu.models import unet as junet
    from tests.test_model import make_params_and_flat

    params, flat = make_params_and_flat(small_cfg)
    shapes = ckpt_io.param_shape_tree(small_cfg)
    state = {}
    offset = 0
    for i, (path, kind) in enumerate(junet.param_order(small_cfg)):
        native = ckpt_io.tree_get(shapes, path).shape
        tshape = ckpt_io._to_torch(np.empty(native, np.float32), kind).shape
        n = int(np.prod(tshape))
        # torch.compile-style prefixed keys must not matter
        state[f"_orig_mod.p{i}"] = torch.tensor(
            flat[offset:offset + n].reshape(tshape))
        offset += n
    path = os.path.join(tmp_path, "model.pt")
    torch.save(state, path)

    loaded = ckpt_io.load(path, small_cfg)
    np.testing.assert_array_equal(
        ckpt_io.flatten_params(loaded.params, small_cfg), flat)


def test_data_loader_flip_and_image_dir(tmp_path, rng):
    from PIL import Image
    # flip: with flip=True some batches differ from unflipped, and every
    # row is either identical or exactly mirrored
    imgs = rng.standard_normal((6, 3, 8, 8)).astype(np.float32)
    path = os.path.join(tmp_path, "d.bin")
    dataset.write_bin(path, imgs)
    plain = next(dataset.data_loader(path, 6))
    flipped = next(dataset.data_loader(path, 6, flip=True, seed=1))
    same = mirrored = 0
    for i in range(6):
        if np.array_equal(flipped[i], plain[i]):
            same += 1
        elif np.array_equal(flipped[i], plain[i, :, ::-1]):
            mirrored += 1
    assert same + mirrored == 6 and mirrored > 0

    # image_dir_loader: labels from filename prefix (reference
    # train_unet.py:498-502)
    d = os.path.join(tmp_path, "imgs")
    os.makedirs(d)
    for cls in ("cat", "dog"):
        for i in range(2):
            arr = (rng.uniform(0, 255, (8, 8, 3))).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{cls}_{i}.png"))
    batch, labels = next(dataset.image_dir_loader(
        d, 4, size=8, class_cond=True))
    assert batch.shape == (4, 8, 8, 3)
    assert sorted(labels.tolist()) == [0, 0, 1, 1]


def test_image_dir_loader_skip_batches(tmp_path, rng):
    """Resume contract for --data_dir runs: skip_batches=N reproduces the
    exact stream (pixels, flips, shuffle order, labels) a fresh loader
    yields after dropping N batches (round-2 advisor finding)."""
    from PIL import Image
    d = os.path.join(tmp_path, "imgs")
    os.makedirs(d)
    for cls in ("ant", "bee"):
        for i in range(5):
            arr = (rng.uniform(0, 255, (8, 8, 3))).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{cls}_{i}.png"))
    for randomize in (False, True):
        for skip in (3, 7):  # mid-epoch and epoch-crossing (per_epoch=5)
            fresh = dataset.image_dir_loader(
                d, 2, size=8, class_cond=True, randomize=randomize, seed=9)
            for _ in range(skip):
                next(fresh)
            resumed = dataset.image_dir_loader(
                d, 2, size=8, class_cond=True, randomize=randomize, seed=9,
                skip_batches=skip)
            for _ in range(6):
                b1, l1 = next(fresh)
                b2, l2 = next(resumed)
                np.testing.assert_array_equal(b1, b2)
                np.testing.assert_array_equal(l1, l2)
