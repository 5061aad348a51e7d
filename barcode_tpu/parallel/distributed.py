"""Multi-host initialization and chain sharding across a pod slice.

The reference is one POSIX process (SURVEY.md §2.12); scale-out here is
jax.distributed + a 2-axis mesh ('hosts x chips' collapsed into 'chains',
optionally x 'grid' for sharded FFTs).  Chains are independent, so the only
per-step collectives are the pooled adaptation statistics (pmean over
'chains') — they ride ICI; DCN sees only checkpoint/log traffic (§5.8).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-based autodetection (TPU pods set
    the env themselves; explicit args for CPU/GPU test rigs)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def pod_chain_mesh(grid_axis: int = 1) -> Mesh:
    """Global mesh over all devices of all hosts: ('chains',) or
    ('chains', 'grid') when grid_axis > 1 devices are reserved for sharded
    FFTs."""
    devs = np.asarray(jax.devices())
    if grid_axis <= 1:
        return Mesh(devs, axis_names=("chains",))
    assert devs.size % grid_axis == 0
    return Mesh(devs.reshape(devs.size // grid_axis, grid_axis),
                axis_names=("chains", "grid"))


def local_chain_count(n_chains_global: int) -> int:
    """Chains this process owns under even sharding."""
    n_proc = jax.process_count()
    assert n_chains_global % n_proc == 0, (
        f"{n_chains_global} chains do not split over {n_proc} processes")
    return n_chains_global // n_proc
