"""Parameter EMA (TrainConfig.ema_rate).

The reference parses --ema_rate but neither of its trainers consumes it
(reference train_unet.py:664); here it is a live feature: fp32 EMA
updated after each optimizer step, checkpointed (header[38]), resumable,
and sampleable via generate.py --use_ema."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.config import TrainConfig, UnetConfig
from unet_tpu.io import checkpoint as ckpt_io
from unet_tpu.models import unet
from unet_tpu.training import trainer

CFG = UnetConfig(model_channels=32, image_size=16, attention_ds=(2, 4),
                 num_head_channels=32, channel_mult=(1, 2))
RATE = 0.5  # far from 1 so three steps move the average measurably


def _init_params():
    return jax.jit(lambda k: unet.init(k, CFG))(jax.random.PRNGKey(0))


def _batches(n, b=2):
    r = np.random.default_rng(7)
    return [jnp.asarray(r.standard_normal(
        (b, 16, 16, 3)).astype(np.float32) * 0.4) for _ in range(n)]


def test_ema_recursion_matches_param_trajectory(rng):
    """state.ema after N steps == the fold of ema = r*ema + (1-r)*params
    over the (identical) parameter trajectory."""
    tc = TrainConfig(batch_size=2, lr=1e-3, ema_rate=RATE)
    step, _ = trainer.make_train_step(CFG, tc, donate=False)
    params0 = _init_params()
    state = trainer.init_state(jax.tree.map(jnp.array, params0),
                               ema_rate=RATE)
    expected = jax.tree.map(lambda a: np.asarray(a, np.float32), params0)
    for batch in _batches(3):
        state, _ = step(state, batch)
        p = jax.device_get(state.params)
        expected = jax.tree.map(
            lambda e, q: RATE * e + (1 - RATE) * np.asarray(q, np.float32),
            expected, p)
    for a, e in zip(jax.tree.leaves(jax.device_get(state.ema)),
                    jax.tree.leaves(expected)):
        np.testing.assert_allclose(a, e, rtol=1e-6, atol=1e-7)


def test_ema_multi_step_recursion(rng):
    """The scanned multi-step program carries the EMA recursion over its
    OWN parameter trajectory.  (Comparing against the single-step
    program instead would be invalid: AdamW's first steps amplify
    cross-program FMA-reassociation ulps into ~1e-3 parameter
    divergence — mhat/sqrt(vhat) is sign-like when v is near zero — so
    the scan is driven one step at a time to capture its trajectory.)"""
    tc = TrainConfig(batch_size=2, lr=1e-3, ema_rate=RATE)
    multi = trainer.make_multi_step(CFG, tc, donate=False)
    state = trainer.init_state(jax.tree.map(jnp.array, _init_params()),
                               ema_rate=RATE)
    expected = jax.tree.map(lambda a: np.asarray(a, np.float32),
                            state.params)
    for batch in _batches(4):
        state, _ = multi(state, batch[None])
        p = jax.device_get(state.params)
        expected = jax.tree.map(
            lambda e, q: RATE * e + (1 - RATE) * np.asarray(q, np.float32),
            expected, p)
    for a, e in zip(jax.tree.leaves(jax.device_get(state.ema)),
                    jax.tree.leaves(expected)):
        np.testing.assert_allclose(a, e, rtol=1e-5, atol=1e-6)


def test_ema_checkpoint_roundtrip(tmp_path):
    params = _init_params()
    ema = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32) * 0.9, params)
    path = os.path.join(tmp_path, "ema.bin")
    ckpt_io.save(path, ckpt_io.Checkpoint(
        params=params, cfg=CFG, batch_size=2, step=5, ema=ema,
        ema_rate=0.9999))
    back = ckpt_io.load(path)
    assert back.ema is not None
    assert back.ema_rate == np.float32(0.9999)  # header[39] roundtrip
    for a, e in zip(jax.tree.leaves(back.ema), jax.tree.leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))
    # a file saved WITHOUT ema still loads ema=None
    path2 = os.path.join(tmp_path, "noema.bin")
    ckpt_io.save(path2, ckpt_io.Checkpoint(
        params=params, cfg=CFG, batch_size=2))
    assert ckpt_io.load(path2).ema is None


def test_ema_cli_train_resume_and_generate(tmp_path):
    """CLI surface: --ema_rate checkpoints the EMA, resume continues it
    (bit-identical to an uninterrupted run), generate --use_ema samples
    it."""
    from unet_tpu.cli import generate as cli_generate
    from unet_tpu.cli import train as cli_train
    from unet_tpu.data import dataset

    data = os.path.join(tmp_path, "train.bin")
    imgs = (np.random.default_rng(0)
            .standard_normal((8, 3, 16, 16)).astype(np.float32) * 0.3)
    dataset.write_bin(data, imgs)
    base = ["--data_file", data,
            "--image_size", "16", "--num_channels", "32",
            "--batch_size", "4", "--log_interval", "1",
            "--num_devices", "1", "--ema_rate", "0.5"]

    # uninterrupted 4 steps
    out_a = os.path.join(tmp_path, "a")
    cli_train.main(base + [
        "--log_file", os.path.join(tmp_path, "a.txt"),
        "--iterations", "4", "--save_interval", "4",
        "--output_dir", out_a])
    full = ckpt_io.load(os.path.join(out_a, "model_4.bin"))
    assert full.ema is not None

    # 2 steps, save, resume 2 more
    out_b = os.path.join(tmp_path, "b")
    cli_train.main(base + [
        "--log_file", os.path.join(tmp_path, "b1.txt"),
        "--iterations", "2", "--save_interval", "2",
        "--output_dir", out_b])
    # resume WITHOUT re-passing --ema_rate: the rate travels in the
    # checkpoint (header[39]) and averaging must continue, not freeze
    base_no_rate = [a for a in base if a not in ("--ema_rate", "0.5")]
    cli_train.main(base_no_rate + [
        "--log_file", os.path.join(tmp_path, "b2.txt"),
        "--model_weights", os.path.join(out_b, "model_2.bin"),
        "--iterations", "4", "--save_interval", "2",
        "--output_dir", out_b])
    resumed = ckpt_io.load(os.path.join(out_b, "model_4.bin"))
    for a, e in zip(jax.tree.leaves(resumed.ema),
                    jax.tree.leaves(full.ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))

    out_png = os.path.join(tmp_path, "ema_sample.png")
    cli_generate.main(["--model_filename",
                       os.path.join(out_a, "model_4.bin"),
                       "--output_filename", out_png, "--use_ema", "true"])
    assert os.path.exists(out_png)

    out_ddim = os.path.join(tmp_path, "ddim_sample.png")
    cli_generate.main(["--model_filename",
                       os.path.join(out_a, "model_4.bin"),
                       "--output_filename", out_ddim, "--use_ema", "true",
                       "--sampler", "ddim", "--ddim_steps", "7"])
    assert os.path.exists(out_ddim)


def test_ema_resume_explicit_zero_drops_ema(tmp_path):
    """Resuming with an explicit --ema_rate 0 turns EMA off (the flag is
    the user's instruction); later checkpoints carry no EMA."""
    from unet_tpu.cli import train as cli_train
    from unet_tpu.data import dataset

    data = os.path.join(tmp_path, "train.bin")
    imgs = (np.random.default_rng(0)
            .standard_normal((8, 3, 16, 16)).astype(np.float32) * 0.3)
    dataset.write_bin(data, imgs)
    base = ["--data_file", data, "--image_size", "16",
            "--num_channels", "32", "--batch_size", "4",
            "--num_devices", "1", "--log_interval", "1",
            "--output_dir", os.path.join(tmp_path, "m")]
    cli_train.main(base + ["--ema_rate", "0.5", "--iterations", "2",
                           "--save_interval", "2",
                           "--log_file", os.path.join(tmp_path, "a.txt")])
    cli_train.main(base + ["--ema_rate", "0", "--iterations", "4",
                           "--save_interval", "2",
                           "--model_weights",
                           os.path.join(tmp_path, "m", "model_2.bin"),
                           "--log_file", os.path.join(tmp_path, "b.txt")])
    final = ckpt_io.load(os.path.join(tmp_path, "m", "model_4.bin"))
    assert final.ema is None


def test_ema_resume_without_rate_from_old_file(tmp_path):
    """A pre-header[39] checkpoint (EMA present, rate slot zero) cannot
    silently freeze the average: resume without --ema_rate must refuse."""
    import pytest
    from unet_tpu.cli import train as cli_train
    from unet_tpu.data import dataset

    data = os.path.join(tmp_path, "train.bin")
    imgs = (np.random.default_rng(0)
            .standard_normal((8, 3, 16, 16)).astype(np.float32) * 0.3)
    dataset.write_bin(data, imgs)
    params = _init_params()
    old = os.path.join(tmp_path, "old.bin")
    ckpt_io.save(old, ckpt_io.Checkpoint(   # ema_rate defaults to 0.0
        params=params, cfg=CFG, batch_size=4, step=2,
        ema=jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)))
    with pytest.raises(SystemExit, match="ema_rate"):
        cli_train.main(["--data_file", data, "--image_size", "16",
                        "--num_channels", "32", "--channel_mult", "1,2",
                        "--attention_resolutions", "8,4",
                        "--batch_size", "4",
                        "--num_devices", "1", "--iterations", "4",
                        "--model_weights", old,
                        "--log_file", os.path.join(tmp_path, "l.txt"),
                        "--output_dir", os.path.join(tmp_path, "m")])
