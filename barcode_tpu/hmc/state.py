"""Chain state pytree.

The reference threads sampler state through the DATA/HAMIL_DATA god-structs
and a performance-log file (struct_hamil.h, SURVEY.md §5.4); here it is one
explicit pytree per chain, vmappable and checkpointable in a single blob.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChainState:
    """Everything a chain needs to continue sampling.

    Cached (psi, grad) of the current signal saves one full
    posterior+gradient evaluation per attempt relative to the reference,
    which recomputes psi(signal_i) inside every delta_Hamiltonian call
    (HMC.cc:209-248).
    """

    delta: Any          # current Lagrangian signal, grid shape
    psi: Any            # psi(delta), scalar
    psi_prior: Any
    psi_like: Any
    grad: Any           # grad psi(delta), grid shape
    key: Any            # per-chain PRNG key
    eps_fac: Any        # adaptive step-size scale (scalar)
    acc_flags: Any      # int32[N_a] circular acceptance table
    eps_table: Any      # float32[N_a] circular epsilon table
    count_attempts: Any  # int32, completed attempts
    rejections: Any     # int32
    accepted: Any       # int32, accepted samples so far
    got_first_accept: Any  # bool (for eps controller type 3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AttemptStats:
    """Per-attempt record — the columns of the reference's
    performance_log.txt (HMC.cc:40-60)."""

    accepted: Any
    epsilon: Any
    Neps: Any
    dH: Any
    dK: Any
    dE: Any
    psi_prior_i: Any
    psi_prior_f: Any
    psi_likeli_i: Any
    psi_likeli_f: Any
    H_kin_i: Any
    H_kin_f: Any
    eps_fac: Any
    acc_rate_recent: Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MassState:
    """Mass-matrix data (FS spectrum and/or real-space diagonal).

    Passed as an argument (not closed over) so the runner can recompute
    signal-dependent masses (types 2/3) without re-jitting — the reference
    instead round-trips auxmass_{r,f} files (HMC.cc:387-424).
    """

    mass_f: Any  # rfft-grid spectrum, or scalar 0.0 when unused
    mass_r: Any  # grid diagonal, or scalar 0.0 when unused
