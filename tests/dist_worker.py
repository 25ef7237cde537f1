"""Worker process for tests/test_distributed.py (NOT a pytest file).

Usage: python dist_worker.py <coordinator host:port> <process_id> <mode>

mode "api": join a 2-process rendezvous (2 virtual CPU devices each, 4
global), run 3 data-parallel train steps on a tiny U-Net where each
process contributes its own rows of the global batch
(parallel/distributed.py global_batch), and print the loss trajectory.

mode "cli": run the full training CLI with --coordinator_address (the
multi-host production surface): a .bin stream, auto per-process loader
shards, rank-0-only checkpoint writes.  argv[4] = the dataset path,
argv[5] = the output/log directory.
"""

import json
import os
import re
import sys

# exactly 2 virtual CPU devices per process, whatever the parent had
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=2").strip()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> None:
    coordinator, proc_id, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    if mode == "cli":
        from unet_tpu.cli import train as cli_train

        data, outdir = sys.argv[4], sys.argv[5]
        cli_train.main([
            "--coordinator_address", coordinator,
            "--num_processes", "2", "--process_id", str(proc_id),
            "--data_file", data,
            "--log_file", os.path.join(outdir, "train.log"),
            "--image_size", "16", "--num_channels", "32",
            "--channel_mult", "1,2", "--attention_resolutions", "8",
            "--batch_size", "2", "--iterations", "2",
            "--log_interval", "1", "--save_interval", "2",
            "--output_dir", os.path.join(outdir, "models"),
            "--num_devices", "4",
        ] + sys.argv[6:])  # extra flags from the test (e.g. --fsdp true)
        print("CLI_OK")
        return

    import numpy as np
    import jax.numpy as jnp
    from unet_tpu.config import TrainConfig, UnetConfig
    from unet_tpu.models import unet
    from unet_tpu.parallel import distributed as dist
    from unet_tpu.parallel import mesh as pmesh
    from unet_tpu.training import trainer

    dist.initialize(coordinator, 2, proc_id)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    cfg = UnetConfig(model_channels=32, image_size=8, attention_ds=(2,),
                     channel_mult=(1, 2), num_head_channels=32)
    tc = TrainConfig(batch_size=2, lr=1e-3)  # per-device; global B = 8
    mesh = pmesh.make_mesh(data=4, model=1)
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    state = pmesh.shard_state(
        trainer.init_state(jax.tree.map(jnp.array, params)), mesh)
    step = pmesh.make_parallel_train_step(cfg, tc, mesh)

    rng = np.random.default_rng(7)  # same global stream on both ranks
    losses = []
    for _ in range(3):
        gb = rng.standard_normal((8, 8, 8, 3)).astype(np.float32) * 0.5
        local = gb[proc_id * 4:(proc_id + 1) * 4]  # this rank's rows only
        state, loss = step(state, dist.global_batch(mesh, local))
        losses.append(float(jax.device_get(loss)))
    print("LOSSES " + json.dumps(losses))


if __name__ == "__main__":
    main()
