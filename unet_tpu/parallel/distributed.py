"""Multi-process (multi-host) training: jax.distributed + process-local data.

The reference is strictly single-GPU (SURVEY.md section 2.8); single-host
multi-chip scaling lives in parallel/mesh.py (GSPMD over ICI).  This module
adds the third tier — several processes, each owning its local chips (the
TPU multi-host/pod topology, DCN between hosts) — the idiomatic JAX way:

  * initialize() wraps jax.distributed.initialize (coordinator
    rendezvous).  After it returns, jax.devices() is the GLOBAL device
    list, so every parallel/mesh.py mesh and train step spans all hosts
    unchanged; GSPMD places gradient all-reduces over ICI within a host
    and DCN across hosts.
  * Each process feeds only its own rows: the dataloaders' num_shards /
    shard_index (data/dataset.py) map to process_count/process_index and
    global_batch() assembles the globally-sharded array from the
    process-local rows with zero cross-host pixel movement
    (jax.make_array_from_process_local_data).
  * replicate() gathers a (possibly FSDP/TP-sharded) pytree into
    process-local replicas so rank 0 can write reference-format
    checkpoints (io/checkpoint.py needs host copies of every leaf).

No pod is needed to validate any of this: jaxlib's gloo CPU collectives
back the same API, and tests/test_distributed.py runs real 2-process
training against a single-process trajectory.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax

from unet_tpu.parallel import mesh as pmesh


def initialize(coordinator_address: str,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-process rendezvous at `coordinator_address`
    (host:port; the process with process_id 0 hosts it).  Must run
    before the first backend query (jax.devices() etc).  On TPU pods
    the arguments are normally inferrable from the environment and may
    be None; on CPU/GPU clusters pass all three."""
    try:
        # CPU backend: cross-process collectives need gloo (the jaxlib
        # default; asserting it here keeps the failure mode loud if a
        # build without gloo ever lands)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main() -> bool:
    """True on the process that should own logging and checkpoint IO."""
    return jax.process_index() == 0


def global_batch(mesh, local_rows, spatial: bool = False):
    """Assemble the global (B_global, H, W, C) batch-sharded array from
    this process's local rows (B_global // process_count of them).

    Row order follows process index: process p contributes rows
    [p*B_local, (p+1)*B_local) of the global batch — the same layout a
    single process feeding the concatenated stream would produce, so the
    training math is identical to one host with the full batch.  The
    rows land directly on this host's devices; nothing crosses DCN."""
    n = jax.process_count()
    gshape = (local_rows.shape[0] * n,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_process_local_data(
        pmesh.batch_sharding(mesh, spatial), local_rows, gshape)


@functools.lru_cache(maxsize=None)
def _gather_fn(mesh):
    # one jitted gather per mesh (re-traced per leaf shape, cached across
    # checkpoint writes): a fresh lambda per call would defeat jit's
    # cache and recompile the all-gathers on every periodic save
    return jax.jit(lambda t: t, out_shardings=pmesh.replicated(mesh))


def replicate(tree, mesh):
    """Gather a pytree of global arrays (replicated or FSDP/TP-sharded)
    into host copies on every process (used for checkpoint writes).
    A collective: EVERY process must call it, and pytree iteration order
    is deterministic so all ranks issue the same collective sequence.

    Leaf-by-leaf with an immediate device_get: gathering the whole state
    in one program would transiently materialize params + both AdamW
    moments + EMA fully-replicated per chip (~4x model state) — defeating
    FSDP's memory headroom exactly at save time (round-3 ADVICE item 4).
    This bounds the extra device memory to one leaf."""
    fn = _gather_fn(mesh)
    return jax.tree.map(lambda a: jax.device_get(fn(a)), tree)
