"""barcode_tpu — a TPU-native Bayesian cosmic density-field inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Barcode
(Bos, Kitaura & van de Weygaert 2019, MNRAS 488, 2573; reference C++ code
surveyed in /root/repo/SURVEY.md): Hamiltonian Monte Carlo sampling of the
posterior over an N^3 Lagrangian density grid, with Lagrangian
perturbation-theory forward models (Zel'dovich / 2LPT / ALPT), mass-assignment
kernels (NGP/CIC/TSC/SPH), plane-parallel redshift-space distortions, a
Gaussian random-field prior, and Poisson/Gaussian/log-normal/GRF likelihoods.

Design (TPU-first, not a port):
  * all hot-path math is pure jittable functions over jnp arrays,
  * gradients come from jax.grad of the actual discrete log-posterior
    (the reference's hand-derived adjoint is kept as a cross-check),
  * chains are vmapped/sharded over a jax.sharding.Mesh,
  * mass assignment is deterministic (scatter-add / Fourier-space kernels),
  * no file round-trips in the hot loop (the reference round-trips
    smoothing kernels and mass matrices through disk).
"""

__version__ = "0.1.0"

from barcode_tpu.grid.spec import GridSpec  # noqa: F401
from barcode_tpu.config import RunConfig  # noqa: F401
