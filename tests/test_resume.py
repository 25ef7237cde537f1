"""Trajectory-faithful checkpoint/resume.

The reference documents that resume is NOT faithful: the curandState blob
is device-specific, the optimizer step count is lost (bias correction
restarts at t=1) and the data stream restarts at 0
(reference train_unet.cu:4819-4911, :5019, SURVEY.md section 5).  Here all
of it is persisted — step, RNG seed (device keys are fold_in(seed, step)),
dataloader cursor, host MT19937 state — and these tests assert the strong
form: training N steps equals training k steps, saving, loading, and
training N-k more, BIT-IDENTICALLY.
"""

import numpy as np
import pytest

from unet_tpu.cli import train as train_cli
from unet_tpu.data import dataset
from unet_tpu.io import checkpoint as ckpt_io

# Tiny-but-real config: 2 levels, attention at ds 2, GN needs C >= 32.
CLI_FLAGS = [
    "--image_size", "8", "--num_channels", "32",
    "--channel_mult", "1,2", "--attention_resolutions", "4",
    "--batch_size", "4", "--log_interval", "1", "--save_interval", "5",
    "--lr", "1e-3", "--seed", "0",
    "--num_devices", "1",  # the conftest mesh has 8 virtual CPU devices
]


@pytest.fixture(scope="module")
def data_bin(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "train.bin")
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((10, 3, 8, 8)).astype(np.float32) * 0.5
    dataset.write_bin(path, imgs)
    return path


def run_train(tmp_path, data_bin, out_name, iterations, extra=()):
    out_dir = str(tmp_path / out_name)
    train_cli.main(CLI_FLAGS + list(extra) + [
        "--data_file", data_bin,
        "--log_file", str(tmp_path / f"{out_name}.log"),
        "--iterations", str(iterations),
        "--output_dir", out_dir,
    ])
    return out_dir


def read_blob(path):
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("extra", [(), ("--host_rng", "true"),
                                   ("--flip", "true")],
                         ids=["device_rng", "host_rng", "flip"])
def test_resume_bit_identical(tmp_path, data_bin, extra):
    """train(10) == train(5) + save + load + train(5), bit-for-bit."""
    dir_a = run_train(tmp_path, data_bin, f"a{extra}", 10, extra)
    dir_b = run_train(tmp_path, data_bin, f"b{extra}", 10, extra + (
        "--model_weights", f"{dir_a}/model_5.bin"))
    blob_a = read_blob(f"{dir_a}/model_10.bin")
    blob_b = read_blob(f"{dir_b}/model_10.bin")
    assert blob_a == blob_b, (
        "resumed run diverged from the uninterrupted run")


def test_checkpoint_carries_resume_state(tmp_path, data_bin):
    from unet_tpu.config import UnetConfig
    dir_a = run_train(tmp_path, data_bin, "meta", 5, ("--host_rng", "true"))
    cfg = UnetConfig(model_channels=32, image_size=8, attention_ds=(2,),
                     channel_mult=(1, 2))
    ckpt = ckpt_io.load(f"{dir_a}/model_5.bin", cfg)
    assert ckpt.step == 5
    assert ckpt.rng_seed == 0
    assert ckpt.loader_pos == 5
    assert ckpt.host_rng_state is not None
    assert ckpt.host_rng_state.shape == (ckpt_io.HOST_RNG_WORDS,)
    assert ckpt.adam_m is not None


# ---------------------------------------------------------------------------
# Header contract (ADVICE round 1): reference compatibility of the spare
# slots.


def test_header_has_rng_always_zero(tmp_path, data_bin):
    """header[9]=1 would make the reference loader freadCheck a curandState
    blob and hard-exit (train_unet.cu:4893-4901) — we never set it."""
    dir_a = run_train(tmp_path, data_bin, "h9", 5, ("--host_rng", "true"))
    header = np.fromfile(f"{dir_a}/model_5.bin", dtype=np.int32, count=256)
    assert header[9] == 0
    assert header[12] == ckpt_io.EXT_MAGIC
    assert header[15] == 1  # host MT19937 blob appended instead


def test_garbage_spare_slots_ignored(tmp_path):
    """The reference CUDA saver leaves header[10..] as uninitialized stack
    garbage (train_unet.cu:4764-4774); without our marker the extension
    fields must not be trusted."""
    from unet_tpu.config import UnetConfig
    import jax
    from unet_tpu.models import unet

    cfg = UnetConfig(model_channels=32, image_size=8, attention_ds=(2,),
                     channel_mult=(1, 2))
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    path = str(tmp_path / "garbage.bin")
    ckpt_io.save(path, ckpt_io.Checkpoint(params=params, cfg=cfg,
                                          batch_size=4))
    raw = bytearray(open(path, "rb").read())
    header = np.frombuffer(bytes(raw[:1024]), dtype=np.int32).copy()
    header[10] = -123456789   # garbage step
    header[11] = 987654321    # garbage seed
    header[12] = 0xBAD        # NOT our marker
    header[13] = 1
    header[14] = 77777
    raw[:1024] = header.tobytes()
    open(path, "wb").write(bytes(raw))

    ckpt = ckpt_io.load(path, cfg)
    assert ckpt.step == 0
    assert ckpt.rng_seed is None
    assert ckpt.loader_pos == 0
    assert ckpt.host_rng_state is None


# ---------------------------------------------------------------------------
# Loader cursor fast-forward equivalence.


@pytest.mark.parametrize("shuffle,flip", [(False, False), (False, True),
                                          (True, True)])
def test_data_loader_skip_batches(data_bin, shuffle, flip):
    full = dataset.data_loader(data_bin, 3, shuffle=shuffle, flip=flip,
                               seed=1)
    consumed = [next(full) for _ in range(12)]
    skipped = dataset.data_loader(data_bin, 3, shuffle=shuffle, flip=flip,
                                  seed=1, skip_batches=7)
    for i in range(7, 12):
        np.testing.assert_array_equal(next(skipped), consumed[i])
