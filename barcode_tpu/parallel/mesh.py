"""Device-mesh utilities: chain-parallel sampling over jax.sharding.

The reference is strictly single-process/single-chain (SURVEY.md §2.12);
the TPU-native scale-out axis is *chains* — independent HMC chains sharded
over a ('chains',) mesh, with collectives only for pooled adaptation
statistics and diagnostics (§5.8).  Large-grid ('grid' axis) sharding lives
in parallel/sharded_fft.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("chains",))


def shard_chain_states(states, mesh: Mesh):
    """Place a ChainState pytree (leading chain axis on every array leaf)
    with the chain axis sharded over the mesh."""

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return jax.device_put(leaf, NamedSharding(mesh, P("chains")))
        return leaf

    return jax.tree_util.tree_map(put, states)


def replicate(tree, mesh: Mesh):
    """Fully replicate observation/mass data on every device."""

    def put(leaf):
        if hasattr(leaf, "ndim"):
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return leaf

    return jax.tree_util.tree_map(put, tree)


def pooled_acceptance_rate(acc_flags, mesh_axis: str = "chains"):
    """Cross-chain pooled recent acceptance rate (inside shard_map/pjit):
    the reference's single global controller window generalizes to a pmean
    over the chain axis."""
    local = jnp.mean(acc_flags.astype(jnp.float32))
    return jax.lax.pmean(local, mesh_axis)
