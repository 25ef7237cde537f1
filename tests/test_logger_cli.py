"""Logger + CLI surface tests (reference train_unet.py:541-655 logger,
train_unet.cu:4948-4956 / train_unet.py:660-727 CLI)."""

import io
import json
import os
import subprocess
import sys

import numpy as np

from unet_tpu.utils.args import add_dict_to_argparser, str2bool
from unet_tpu.utils.logger import CSVOutputFormat, Logger, TextLog


def test_logkv_mean_and_dump(tmp_path):
    stream = io.StringIO()
    log = Logger(stream=stream)
    log.logkv("step", 100)
    log.logkv_mean("loss", 1.0)
    log.logkv_mean("loss", 3.0)
    out = log.dumpkvs()
    assert out["loss"] == 2.0 and out["step"] == 100
    assert "loss" in stream.getvalue()
    assert log.name2val == {}


def test_csv_dynamic_header(tmp_path):
    path = os.path.join(tmp_path, "log.csv")
    csv = CSVOutputFormat(path)
    csv.writekvs({"a": 1})
    csv.writekvs({"a": 2, "b": 3})
    csv.close()
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "a,b"
    assert lines[1] == "1,"
    assert lines[2] == "2,3"


def test_text_log(tmp_path):
    path = os.path.join(tmp_path, "log.txt")
    tl = TextLog(path)
    tl.log("step 100: loss 0.5")
    tl.log("step 200: loss 0.4")
    assert open(path).read() == "step 100: loss 0.5\nstep 200: loss 0.4\n"


def test_argparser_autogen():
    import argparse
    p = argparse.ArgumentParser()
    add_dict_to_argparser(p, dict(lr=1e-4, n=3, flag=False, name="x"))
    a = p.parse_args(["--lr", "0.01", "--flag", "true"])
    assert a.lr == 0.01 and a.n == 3 and a.flag is True and a.name == "x"
    assert str2bool("False") is False


def test_train_cli_init_model_only(tmp_path):
    """--init_model_only writes a loadable .bin and exits (reference
    train_unet.py:956-958) — exercised in-process on a tiny config."""
    from unet_tpu.cli import train as cli_train
    from unet_tpu.io import checkpoint as ckpt_io

    out = os.path.join(tmp_path, "init.bin")
    cli_train.main([
        "--init_model_only", "true", "--init_model_filename", out,
        "--image_size", "16", "--num_channels", "32",
    ])
    ckpt = ckpt_io.load(out)
    assert ckpt.cfg.model_channels == 32
    assert ckpt.cfg.image_size == 16


def test_train_cli_short_run(tmp_path):
    """3 iterations end-to-end through the CLI main on a synthetic
    dataset: loader -> jitted step -> log file -> checkpoint."""
    from unet_tpu.cli import train as cli_train
    from unet_tpu.data import dataset
    from unet_tpu.io import checkpoint as ckpt_io

    data = os.path.join(tmp_path, "train.bin")
    imgs = (np.random.default_rng(0)
            .standard_normal((8, 3, 16, 16)).astype(np.float32) * 0.3)
    dataset.write_bin(data, imgs)
    log_file = os.path.join(tmp_path, "log.txt")
    outdir = os.path.join(tmp_path, "models")

    cli_train.main([
        "--data_file", data, "--log_file", log_file,
        "--image_size", "16", "--num_channels", "32",
        "--batch_size", "4", "--iterations", "3",
        "--log_interval", "1", "--save_interval", "3",
        "--output_dir", outdir, "--num_devices", "1",
    ])
    text = open(log_file).read()
    assert "step 1:" in text and "step 3:" in text
    ckpt = ckpt_io.load(os.path.join(outdir, "model_3.bin"))
    assert ckpt.step == 3
    assert ckpt.adam_m is not None


def test_train_cli_log_norms(tmp_path):
    """--log_norms logs grad/param norms (reference
    train_unet.py:1022-1027 surface)."""
    from unet_tpu.cli import train as cli_train
    from unet_tpu.data import dataset

    data = os.path.join(tmp_path, "train.bin")
    imgs = (np.random.default_rng(0)
            .standard_normal((4, 3, 16, 16)).astype(np.float32) * 0.3)
    dataset.write_bin(data, imgs)
    csvdir = os.path.join(tmp_path, "csv")
    cli_train.main([
        "--data_file", data, "--log_file", os.path.join(tmp_path, "l.txt"),
        "--image_size", "16", "--num_channels", "32",
        "--batch_size", "2", "--iterations", "2",
        "--log_interval", "1", "--save_interval", "2",
        "--output_dir", os.path.join(tmp_path, "m"),
        "--num_devices", "1", "--log_norms", "true",
        "--csv_log_dir", csvdir,
    ])
    csvs = [f for f in os.listdir(csvdir) if f.endswith(".csv")]
    assert csvs, "csv log written"
    header = open(os.path.join(csvdir, csvs[0])).readline().strip()
    assert "grad_norm" in header and "param_norm" in header
