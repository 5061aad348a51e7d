"""Lagrangian perturbation theory displacement fields.

TPU-native redesign of the reference's structure-formation solvers
(/root/reference/barlib/src/Lag2Eul.cc, EqSolvers.cc).  All paths are pure
spectral pipelines: one rfft of the input field plus a handful of irffts,
which XLA fuses with the surrounding elementwise multipliers.

Models (input.par `sfmodel`):
  1 Zel'dovich:  div Psi = -D1 * delta1
  2 2LPT:        div Psi = -D1 delta1 + D2 m2v, with second-order source
                 m2v = sum_{i<j} (phi,ii phi,jj - phi,ij^2), lap phi = delta1
                 (D2 is negative, init_par.cc:528)
  3 ALPT:        long-range Gaussian-smoothed 2LPT + short-range spherical
                 collapse: K_s o Psi_2LPT + (Psi_SC - K_s o Psi_SC), where
                 div Psi_SC = 3(sqrt(1 + 2/3 psi_lin) - 1), psi_lin = -D1 d
                 (Lag2Eul.cc:194-274)

and Psi is the potential flow with that divergence:
Psi_k = -i k (div Psi)_k / k^2.

Sign conventions here are the standard (Bouchet et al. 1995) ones, matching
the reference's Zel'dovich path.  N.B.: the reference's non-Zel'dovich path
(Lag2Eul_non_zeldovich) feeds +D1 delta - D2 m2v — the *negated* standard
divergence — into the same -i k/k^2 solver it uses for Zel'dovich, i.e. its
2LPT/ALPT displacements come out with the opposite global sign to its own
Zel'dovich displacements.  We keep the physically standard sign; the parity
harness checks this against the compiled reference.  Note also that the
reference dispatches sfmodel=2 and 3 to the same ALPT code (Lag2Eul.cc:
318-332 branches only on ==1); here 2LPT is the textbook model and ALPT the
blended one.
"""
from __future__ import annotations

import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier


def _psi_from_div_C(div_C, g: GridSpec):
    """Potential flow with the given (half-complex) divergence:
    Psi_k = -i k (div)_k / k^2, DC and Nyquist zeroed (theta2vel multiplier,
    EqSolvers.cc:168-277)."""
    kx, ky, kz = fourier.kvec(g)
    k2 = kx * kx + ky * ky + kz * kz
    guard = k2 > 1e-14
    inv_k2 = jnp.where(guard, 1.0 / jnp.where(guard, k2, 1.0), 0.0)
    base = (-1j) * div_C * inv_k2 * fourier.nyquist_mask(g)
    # one batched irfft over the 3 components (XLA pipelines a single
    # batched transform much better than 3 sequential ones)
    return fourier.irfft3(jnp.stack([kx * base, ky * base, kz * base]), g)


def zeldovich_psi(delta1, g: GridSpec, D1: float, delta_C=None):
    """Psi with div Psi = -D1 delta1.

    Parity: Lag2Eul_zeldovich + theta2vel
    (/root/reference/barlib/src/Lag2Eul.cc:69-132, EqSolvers.cc:168-277).
    Returns (3, N1, N2, N3).  `delta_C` = optional precomputed rfft3(delta1)
    (round-5 FFT dedupe: the prior energy needs the same spectrum).
    """
    if delta_C is None:
        delta_C = fourier.rfft3(delta1)
    return _psi_from_div_C(-D1 * delta_C, g)


def _second_order_source(delta_C, g: GridSpec, deriv_scheme: str = "fft"):
    """m2v = sum_{i<j} (phi,ii phi,jj - phi,ij^2) with lap phi = delta.

    deriv_scheme='fft' (the reference's GFFT build): spectral second
    derivatives phi,ij = IFFT[ (k_i k_j / k^2) delta_k ] (phi_k =
    -delta_k/k^2; d_i d_j multiplies by -k_i k_j).
    deriv_scheme='findif' (the GFINDIFF build): nested 4th-order
    finite-difference gradients of the Poisson solution.
    Parity: calc_m2v_mem + calc_LapPhiv (EqSolvers.cc:29-64, 373-422,
    scheme switch at :399-412).  m2v is quadratic in phi, so it is
    independent of the sign convention of phi.
    """
    kx, ky, kz = fourier.kvec(g)
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)

    if deriv_scheme == "findif":
        phi = fourier.irfft3(-delta_C * inv_k2, g)
        grads = [fourier.gradfindif(phi, g, a) for a in range(3)]
        p = {(a, b): fourier.gradfindif(grads[a], g, b)
             for a in range(3) for b in range(a, 3)}
        return (p[0, 0] * p[1, 1] - p[0, 1] ** 2
                + p[0, 0] * p[2, 2] - p[0, 2] ** 2
                + p[1, 1] * p[2, 2] - p[1, 2] ** 2)

    base = delta_C * inv_k2
    # all six second derivatives in one batched irfft (multiply by the full
    # half-complex base first: kvec components are broadcast-shaped)
    stack = jnp.stack([kx * kx * base, ky * ky * base, kz * kz * base,
                       kx * ky * base, kx * kz * base, ky * kz * base])
    pxx, pyy, pzz, pxy, pxz, pyz = fourier.irfft3(stack, g)
    return pxx * pyy - pxy * pxy + pxx * pzz - pxz * pxz + pyy * pzz - pyz * pyz


def two_lpt_div_C(delta1, g: GridSpec, D1: float, D2: float,
                  deriv_scheme: str = "fft", transfer=None, delta_C=None):
    """Half-complex div Psi_2LPT = -D1 delta1_C + D2 rfft(m2v) (D2 < 0).

    Built spectrally so the linear term reuses `delta_C` (= rfft3(delta1),
    computed here if not given — round-5 FFT dedupe: one transform of delta
    serves the prior, the linear term, and the m2v source) and the TRANSF
    kernels multiply in place instead of round-tripping through real space.

    `transfer` = optional (t_zeld, t_2lpt) rfft-layout kernels convolved
    into the linear field and the 2LPT source — the reference's TRANSF
    build (auxtransfzeld/auxtransf2lpt files, Lag2Eul.cc:174-191)."""
    t_zeld, t_2lpt = transfer if transfer is not None else (None, None)
    if delta_C is None:
        delta_C = fourier.rfft3(delta1)
    m2v = _second_order_source(delta_C, g, deriv_scheme)
    m2v_C = fourier.rfft3(m2v)
    lin_C = delta_C if t_zeld is None else t_zeld * delta_C
    if t_2lpt is not None:
        m2v_C = t_2lpt * m2v_C
    return -D1 * lin_C + D2 * m2v_C


def two_lpt_div_psi(delta1, g: GridSpec, D1: float, D2: float,
                    deriv_scheme: str = "fft", transfer=None):
    """Real-space div Psi_2LPT (kept for tests/tools; the hot path uses
    two_lpt_div_C directly)."""
    return fourier.irfft3(
        two_lpt_div_C(delta1, g, D1, D2, deriv_scheme, transfer), g)


def two_lpt_psi(delta1, g: GridSpec, D1: float, D2: float,
                deriv_scheme: str = "fft", transfer=None, delta_C=None):
    return _psi_from_div_C(
        two_lpt_div_C(delta1, g, D1, D2, deriv_scheme, transfer, delta_C), g)


def spherical_collapse_div_psi(delta1, g: GridSpec, D1: float):
    """div Psi_SC = 3(sqrt(1 + 2/3 psi_lin) - 1) clipped at -3,
    psi_lin = -D1 delta1 (Lag2Eul.cc:226-247)."""
    psilin = -D1 * delta1
    arg = 1.0 + (2.0 / 3.0) * psilin
    # double-where: the masked branch must never see sqrt(<=0), or its NaN
    # cotangent (0/sqrt(0)) poisons the gradient at collapsed cells
    safe = jnp.where(arg > 0.0, arg, 1.0)
    return jnp.where(arg > 0.0, 3.0 * (jnp.sqrt(safe) - 1.0), -3.0)


def cellbound(v):
    """Half-cell diagonal average: 0.5*(v + v shifted by (+1,+1,+1)), the
    reference's cell-center -> cell-corner interpolation (cellboundcomp,
    massFunctions.cc:588-658 — its 7 periodic special cases are one roll)."""
    return 0.5 * (v + jnp.roll(v, (1, 1, 1), (-3, -2, -1)))


def alpt_psi(delta1, g: GridSpec, D1: float, D2: float, slength: float,
             apply_cellbound: bool = True, deriv_scheme: str = "fft",
             transfer=None, delta_C=None):
    """ALPT: Gaussian long/short-range split at scale `slength`:
    div = K o div_2LPT + (1 - K) o div_SC, then one displacement solve.

    The reference smoothes each Psi *component* separately
    (Lag2Eul.cc:249-312); smoothing commutes with the spectral grad-inv-lap,
    so blending the divergences first is equivalent and saves 12 FFTs.  It
    also applies cellboundcomp to each component (Lag2Eul.cc:290,300,311);
    kept for parity via `apply_cellbound`.

    TRANSF data flow (Lag2Eul.cc:156-191 then 226): m2v is computed from the
    *raw* delta1, after which the auxtransfzeld convolution replaces delta1
    itself — so the transferred field feeds BOTH the 2LPT linear term
    (D1*dummy at :195) and the spherical-collapse psilin=-D1*dummy (:212).
    We mirror that: transfer delta1 once, reuse it for both terms.

    FFT budget (round-5 dedupe): rfft3(delta1) is taken once (or reused via
    `delta_C`); the 2LPT linear term stays spectral; only [m2v, div_sc] need
    a (batched) forward transform.
    """
    t_zeld, t_2lpt = transfer if transfer is not None else (None, None)
    if delta_C is None:
        delta_C = fourier.rfft3(delta1)
    m2v = _second_order_source(delta_C, g, deriv_scheme)
    if t_zeld is None:
        lin_C, delta1_t = delta_C, delta1
    else:
        lin_C = t_zeld * delta_C
        delta1_t = fourier.irfft3(lin_C, g)
    div_sc = spherical_collapse_div_psi(delta1_t, g, D1)
    K = jnp.exp(-fourier.k_squared(g) * (slength * slength) / 2.0)
    # one batched rfft over [m2v, div_sc] (XLA pipelines a batched
    # transform better than two sequential ones; see _psi_from_div_C)
    m2v_C, divsc_C = fourier.rfft3(jnp.stack([m2v, div_sc]))
    if t_2lpt is not None:
        m2v_C = t_2lpt * m2v_C
    div2lpt_C = -D1 * lin_C + D2 * m2v_C
    div_C = K * div2lpt_C + (1.0 - K) * divsc_C
    psi = _psi_from_div_C(div_C, g)
    if apply_cellbound:
        psi = cellbound(psi)
    return psi


def lpt_psi(delta1, g: GridSpec, sfmodel: int, D1: float, D2: float,
            slength: float, deriv_scheme: str = "fft", transfer=None,
            delta_C=None):
    """Dispatch like Lag2Eul (Lag2Eul.cc:318-332). sfmodel is static.

    `transfer` (TRANSF build) only exists on the non-Zel'dovich path, as in
    the reference (the #ifdef sits in Lag2Eul_non_zeldovich only).
    `delta_C` = optional precomputed rfft3(delta1) shared with the prior
    energy (round-5 FFT dedupe)."""
    if sfmodel == 1:
        return zeldovich_psi(delta1, g, D1, delta_C)
    if sfmodel == 2:
        return two_lpt_psi(delta1, g, D1, D2, deriv_scheme, transfer, delta_C)
    if sfmodel == 3:
        return alpt_psi(delta1, g, D1, D2, slength, deriv_scheme=deriv_scheme,
                        transfer=transfer, delta_C=delta_C)
    raise ValueError(f"unknown sfmodel {sfmodel}")
