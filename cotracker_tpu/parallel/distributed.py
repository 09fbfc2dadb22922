"""Multi-host bring-up: process initialization and per-host data sharding.

Replaces the reference's LightningLite/DDP/SLURM launch
(train_on_kubric.py:698-706, launch_training_kubric_offline.sh: 4 nodes x
8 GPUs over NCCL) with the JAX runtime model:

  * every host runs the same program; `initialize()` wires them into one
    jax.distributed job (coordinator + process_id from args or SLURM/env);
  * the global ("data", "track") Mesh spans all hosts' devices; params and
    optimizer state are replicated, gradients psum over "data" ride
    ICI within a slice and DCN across hosts — XLA inserts the collectives
    from the sharding specs, there is no NCCL-style explicit all-reduce;
  * each host loads only its own batch rows (DistributedSampler equivalent)
    and contributes them to a globally-sharded array via
    jax.make_array_from_process_local_data.

Mechanics are validated by a 2-process CPU test (tests/test_multihost.py)
and scripts/launch_multihost.sh shows the SLURM incantation.
"""

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
):
    """jax.distributed.initialize with SLURM/env fallbacks.

    On TPU pods all arguments are auto-detected and this is a plain
    jax.distributed.initialize(). On CPU/GPU clusters (or tests), pass the
    coordinator explicitly or set JAX_COORDINATOR_ADDRESS /
    SLURM_NTASKS+SLURM_PROCID.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
    if process_id is None and "SLURM_PROCID" in os.environ:
        process_id = int(os.environ["SLURM_PROCID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def host_shard_bounds(total: int, axis_size_hint: Optional[int] = None):
    """[start, stop) rows of the global batch this process owns.

    The global batch is split evenly over processes (it must divide, like the
    reference's DistributedSampler with drop_last)."""
    n = jax.process_count()
    i = jax.process_index()
    assert total % n == 0, f"global batch {total} does not divide over {n} hosts"
    per = total // n
    return i * per, (i + 1) * per


def global_batch(mesh: Mesh, tree_specs, host_tree):
    """Assemble globally-sharded arrays from per-host local rows.

    tree_specs: pytree of PartitionSpec matching host_tree; each host passes
    only ITS rows of any "data"-sharded leading axis (jax requires the local
    shard shape to match the sharding's per-process shape)."""

    def put(spec, local):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sharding, np.asarray(local))

    return jax.tree_util.tree_map(
        put, tree_specs, host_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def sync_global_devices(tag: str = "barrier"):
    """Cross-host barrier (reference self.barrier(), train_on_kubric.py:445)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
