"""Graceful preemption: SIGTERM mid-run saves a full resume checkpoint
and exits 0 (cli/train.py).  The reference loses everything since the
last periodic save when its process is killed (train_unet.cu has no
signal handling); docs/TRAINING_DEMO.md's real run was wall-clock-killed
and lost ~400 steps — this closes that hole.
"""

import os
import re
import signal
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER_CODE = """
import os, re, sys
os.environ["XLA_FLAGS"] = (re.sub(
    r"--xla_force_host_platform_device_count=\\d+", "",
    os.environ.get("XLA_FLAGS", ""))
    + " --xla_force_host_platform_device_count=1").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join({repo!r}, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, {repo!r})
from unet_tpu.cli import train
train.main({argv!r})
"""


def test_sigterm_saves_resume_checkpoint(tmp_path):
    from unet_tpu.config import UnetConfig
    from unet_tpu.data import dataset
    from unet_tpu.io import checkpoint as ckpt_io
    from unet_tpu.cli import train as cli_train

    data = os.path.join(tmp_path, "train.bin")
    imgs = (np.random.default_rng(0)
            .standard_normal((8, 3, 16, 16)).astype(np.float32) * 0.3)
    dataset.write_bin(data, imgs)
    log = os.path.join(tmp_path, "train.log")
    outdir = os.path.join(tmp_path, "models")

    argv = ["--data_file", data, "--log_file", log,
            "--image_size", "16", "--num_channels", "32",
            "--channel_mult", "1,2", "--attention_resolutions", "8",
            "--batch_size", "2", "--iterations", "100000",
            "--log_interval", "1", "--save_interval", "0",  # NO periodic
            "--output_dir", outdir, "--num_devices", "1"]
    # stdout goes to a FILE, never a pipe: a chatty child (e.g. persistent
    # -cache warnings) would fill a 64 KB pipe and deadlock against the
    # poll loop below, which reads nothing until after SIGTERM.
    out_path = os.path.join(tmp_path, "child.out")
    with open(out_path, "w") as out_f:
        proc = subprocess.Popen(
            [sys.executable, "-c",
             _WORKER_CODE.format(repo=_REPO, argv=argv)],
            stdout=out_f, stderr=subprocess.STDOUT, text=True)
        try:
            # wait until a few optimizer steps have landed, then preempt
            deadline = time.time() + 600
            while time.time() < deadline:
                if os.path.exists(log) and "step 3:" in open(log).read():
                    break
                if proc.poll() is not None:
                    raise AssertionError(
                        f"trainer exited early:\n{open(out_path).read()}")
                time.sleep(0.2)
            else:
                raise AssertionError("trainer never reached step 3")
            proc.send_signal(signal.SIGTERM)
            proc.wait(timeout=180)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
    out = open(out_path).read()
    assert proc.returncode == 0, f"non-zero exit:\n{out}"
    assert "caught signal" in out

    ckpts = [f for f in os.listdir(outdir)
             if re.fullmatch(r"model_\d+\.bin", f)]
    assert len(ckpts) == 1, ckpts  # the signal save, no periodic ones
    step = int(re.findall(r"\d+", ckpts[0])[0])
    assert step >= 3
    cfg = UnetConfig(model_channels=32, image_size=16, attention_ds=(2,),
                     channel_mult=(1, 2))
    path = os.path.join(outdir, ckpts[0])
    ckpt = ckpt_io.load(path, cfg)
    assert ckpt.step == step
    assert ckpt.adam_m is not None  # full resume state, not params-only

    # and the checkpoint actually resumes: one more step in-process
    cli_train.main(["--data_file", data, "--log_file", log,
                    "--image_size", "16", "--num_channels", "32",
                    "--channel_mult", "1,2", "--attention_resolutions", "8",
                    "--batch_size", "2", "--iterations", str(step + 1),
                    "--log_interval", "1", "--save_interval", str(step + 1),
                    "--output_dir", outdir, "--num_devices", "1",
                    "--model_weights", path])
    assert os.path.exists(os.path.join(outdir, f"model_{step + 1}.bin"))
