"""Multi-process (multi-host) training tier (parallel/distributed.py).

The reference is single-GPU (SURVEY.md section 2.8) and the single-host
mesh layer is proven in test_parallel.py; this validates the third tier —
REAL separate processes joined by jax.distributed over gloo CPU
collectives, each feeding only its own rows — against the single-process
trajectory on the same global batches.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_WORKER = os.path.join(_HERE, "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair_once(mode: str, extra, timeout: int):
    """One 2-process rendezvous attempt: (returncodes, outputs)."""
    coord = f"127.0.0.1:{_free_port()}"
    cmd = [sys.executable, _WORKER, coord]
    # stdout to files, not pipes: rank 0's communicate() would otherwise
    # sit while rank 1 blocks writing a full 64 KB pipe inside a gloo
    # collective — a cross-process deadlock (same class of bug the
    # test_preempt fix removed).
    import tempfile
    outs, procs, files = [], [], []
    try:
        for rank in (0, 1):
            f = tempfile.NamedTemporaryFile(
                "w+", suffix=f".rank{rank}.out", delete=False)
            files.append(f)
            procs.append(subprocess.Popen(
                cmd + [str(rank), mode] + list(extra),
                stdout=f, stderr=subprocess.STDOUT, text=True))
        for p in procs:
            p.wait(timeout=timeout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        for f in files:
            f.flush()
            f.seek(0)
            outs.append(f.read())
            f.close()
            os.unlink(f.name)
    return [p.returncode for p in procs], outs


def _run_pair(mode: str, *extra: str, timeout: int = 900):
    """Launch the 2-process rendezvous; retries once if the rendezvous
    itself failed (_free_port() closes its probe socket before the worker
    rebinds it, so a concurrent process can occasionally steal the port)."""
    codes, outs = _run_pair_once(mode, extra, timeout)
    if any(c != 0 for c in codes) and any(
            "DEADLINE_EXCEEDED" in o or "Address already in use" in o
            or "failed to connect" in o.lower() for o in outs):
        codes, outs = _run_pair_once(mode, extra, timeout)
    for rank, (c, out) in enumerate(zip(codes, outs)):
        assert c == 0, f"rank {rank} failed:\n{out}"
    return outs


def test_two_process_dp_matches_single_process():
    """2 processes x 2 virtual CPU devices, global mesh of 4: the
    process-local-rows data path (global_batch) + gloo gradient
    all-reduce reproduce the single-process 4-device trajectory."""
    outs = _run_pair("api")
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES ")]
        assert line, f"no losses printed:\n{out}"
        losses.append(json.loads(line[-1][len("LOSSES "):]))
    # the loss is replicated: both ranks must report the same trajectory
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process reference on the same global batches (the suite's
    # 8-device CPU mesh; first 4 devices), identical seeds and state
    import jax
    import jax.numpy as jnp
    from unet_tpu.config import TrainConfig, UnetConfig
    from unet_tpu.models import unet
    from unet_tpu.parallel import mesh as pmesh
    from unet_tpu.training import trainer

    cfg = UnetConfig(model_channels=32, image_size=8, attention_ds=(2,),
                     channel_mult=(1, 2), num_head_channels=32)
    tc = TrainConfig(batch_size=2, lr=1e-3)
    mesh = pmesh.make_mesh(data=4, model=1, devices=jax.devices()[:4])
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    state = pmesh.shard_state(
        trainer.init_state(jax.tree.map(jnp.array, params)), mesh)
    step = pmesh.make_parallel_train_step(cfg, tc, mesh)
    rng = np.random.default_rng(7)
    ref = []
    for _ in range(3):
        gb = rng.standard_normal((8, 8, 8, 3)).astype(np.float32) * 0.5
        state, loss = step(state, pmesh.shard_batch(gb, mesh))
        ref.append(float(jax.device_get(loss)))
    # gloo all-reduce may order the sum differently than the in-process
    # XLA collective; the trajectories agree to float tolerance
    np.testing.assert_allclose(losses[0], ref, rtol=2e-5)


def test_two_process_cli_end_to_end(tmp_path):
    """The production CLI surface: 2 ranks run `train
    --coordinator_address`, each auto-reads its own loader shard, and
    rank 0 alone writes the checkpoint."""
    from unet_tpu.config import UnetConfig
    from unet_tpu.data import dataset
    from unet_tpu.io import checkpoint as ckpt_io

    data = os.path.join(tmp_path, "train.bin")
    imgs = (np.random.default_rng(0)
            .standard_normal((16, 3, 16, 16)).astype(np.float32) * 0.3)
    dataset.write_bin(data, imgs)
    outdir = str(tmp_path / "run")
    os.makedirs(outdir)

    outs = _run_pair("cli", data, outdir)  # both ranks share the outdir;
    #                                        only rank 0 may write into it
    assert all("CLI_OK" in o for o in outs)

    cfg = UnetConfig(model_channels=32, image_size=16, attention_ds=(2,),
                     channel_mult=(1, 2))
    ckpt = ckpt_io.load(os.path.join(outdir, "models", "model_2.bin"), cfg)
    assert ckpt.step == 2
    assert ckpt.adam_m is not None
    assert os.path.exists(os.path.join(outdir, "train.log"))


def test_two_process_cli_fsdp(tmp_path):
    """Multi-process + FSDP: params/moments are sharded over the data
    axis ACROSS processes, and the checkpoint write exercises the
    collective gather (dist.replicate) before rank 0 serializes."""
    from unet_tpu.config import UnetConfig
    from unet_tpu.data import dataset
    from unet_tpu.io import checkpoint as ckpt_io

    data = os.path.join(tmp_path, "train.bin")
    imgs = (np.random.default_rng(0)
            .standard_normal((16, 3, 16, 16)).astype(np.float32) * 0.3)
    dataset.write_bin(data, imgs)
    outdir = str(tmp_path / "run")
    os.makedirs(outdir)

    outs = _run_pair("cli", data, outdir, "--fsdp", "true")
    assert all("CLI_OK" in o for o in outs)
    cfg = UnetConfig(model_channels=32, image_size=16, attention_ds=(2,),
                     channel_mult=(1, 2))
    ckpt = ckpt_io.load(os.path.join(outdir, "models", "model_2.bin"), cfg)
    assert ckpt.step == 2
    assert ckpt.adam_m is not None


def test_reject_multiprocess_bad_combos():
    """Single-process-only features error loudly under a multi-process
    launch (the combo gate runs before any work)."""
    from unet_tpu.cli import train as cli_train

    args = cli_train.create_argparser().parse_args([
        "--host_rng", "true", "--num_devices", "0"])
    with pytest.raises(SystemExit, match="single-process"):
        cli_train._reject_bad_combos(args, multiproc=True)
    args = cli_train.create_argparser().parse_args(
        ["--data_dir", "/tmp/x"])
    with pytest.raises(SystemExit, match="shard support"):
        cli_train._reject_bad_combos(args, multiproc=True)
    # a subset mesh would exclude some processes' devices (this test
    # process is single-process, so process_count()=1 and any
    # 0 < n < len(devices) must be rejected)
    import jax
    n_sub = len(jax.devices()) - 2
    args = cli_train.create_argparser().parse_args(
        ["--num_devices", str(n_sub)])
    with pytest.raises(SystemExit, match="subset of the global"):
        cli_train._reject_bad_combos(args, multiproc=True)
    # same command on every rank with an explicit --num_shards would
    # stream shard 0 twice: require per-rank --shard_index (rank 0
    # passes trivially, so probe a non-zero shard_index mismatch)
    args = cli_train.create_argparser().parse_args(
        ["--num_shards", "1", "--shard_index", "0"])
    args.num_shards, args.shard_index = 1, 0
    cli_train._reject_bad_combos(args, multiproc=True)  # auto path: ok
    args.num_shards, args.shard_index = 2, 1  # != process_index()==0
    with pytest.raises(SystemExit, match="assigned per process"):
        cli_train._reject_bad_combos(args, multiproc=True)
