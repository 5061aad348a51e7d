"""Gaussian random fields with a prescribed power spectrum.

TPU-native replacement of create_GARFIELD (/root/reference/barlib/src/
random.cpp:48-511).  The reference draws a "resolution independent random
grid" serially, scales it by sqrt(ps2dft_amp * P / 2) with ps2dft_amp = N^2/V
(FOURIER_DEF_2, random.cpp:77-83), hand-symmetrizes ~20 Hermitian special
cases and applies C2R.

Two TPU-native generators:

* `grf` — fast path: rfftn of white real-space noise is automatically
  Hermitian with Var[Re] = Var[Im] = N/2 off the self-conjugate modes (and
  Var = N on them), so scaling by sqrt(P * N / V) gives
  E|delta_k|^2 = N^2 P / V for *every* mode — exactly the reference's target
  amplitude, special cases included.  Used in the hot loop (momentum draws).

* `grf_resolution_independent` — keys every Fourier mode by its *signed
  integer wavevector* with counter-based hashing, so the same seed produces
  the same large-scale modes at any grid size.  This reproduces the
  determinism *property* of the reference's corner-out fill
  (/root/reference/barlib/include/random.hpp:36-120), not its exact stream.
  Used for mock truth / initial guesses where cross-resolution
  reproducibility matters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier


def white_noise(key, g: GridSpec, dtype=jnp.float32):
    return jax.random.normal(key, g.shape, dtype)


def grf_from_white(white, g: GridSpec, power_rfft):
    """Color real-space white noise to the target spectrum (half-complex P)."""
    amp = jnp.sqrt(power_rfft * (g.N / g.vol))
    return fourier.irfft3(amp * fourier.rfft3(white), g)


def grf(key, g: GridSpec, power_rfft, dtype=jnp.float32):
    """delta ~ GRF with spectrum P(k); E[measure_spectrum(delta)] = P."""
    return grf_from_white(white_noise(key, g, dtype), g, power_rfft)


# ---------------------------------------------------------------------------
# Resolution-independent variant
# ---------------------------------------------------------------------------

def _signed_freqs(g: GridSpec):
    """Signed integer frequencies of the rfft layout, per axis, with the
    Nyquist frequency represented as +N/2 (the reference's i<=N/2 convention,
    scale_space.cpp:41-51)."""
    def signed(n):
        i = jnp.arange(n)
        return jnp.where(i <= n // 2, i, i - n).astype(jnp.int32)

    fx = signed(g.N1)[:, None, None]
    fy = signed(g.N2)[None, :, None]
    fz = jnp.arange(g.N3 // 2 + 1, dtype=jnp.int32)[None, None, :]
    return fx, fy, fz


def _unit_hermitian_modes(key, g: GridSpec):
    """Complex field A on the rfft grid with E|A|^2 = 2 for every mode,
    Hermitian-consistent, where each mode's value is a pure function of
    (key, signed wavevector) — hence stable under grid refinement."""
    fx, fy, fz = _signed_freqs(g)
    fx = jnp.broadcast_to(fx, g.rshape)
    fy = jnp.broadcast_to(fy, g.rshape)
    fz = jnp.broadcast_to(fz, g.rshape)

    # Per-axis "state" under torus negation: 0 for self-negating freqs
    # (0 and Nyquist), else the sign.
    def state(f, n):
        self_neg = (f == 0) | (2 * f == n)
        return jnp.where(self_neg, 0, jnp.sign(f))

    # torus negation: -f, except Nyquist (and 0) map to themselves
    def neg(f, n):
        return jnp.where(2 * f == n, f, -f)

    sx = state(fx, g.N1)
    sy = state(fy, g.N2)

    # A mode on the z-planes fz==0 (and fz==N3/2 for even N3) pairs with the
    # torus-negated (fx,fy) on the same plane; pick the canonical member.
    on_pair_plane = (fz == 0) | ((g.N3 % 2 == 0) & (fz == g.N3 // 2))
    canonical_pair = (sy > 0) | ((sy == 0) & (sx >= 0))
    take_conj = on_pair_plane & ~canonical_pair
    cx = jnp.where(take_conj, neg(fx, g.N1), fx)
    cy = jnp.where(take_conj, neg(fy, g.N2), fy)
    cz = fz
    self_conj = on_pair_plane & (sx == 0) & (sy == 0)

    def draw(kx_i, ky_i, kz_i):
        k = jax.random.fold_in(jax.random.fold_in(jax.random.fold_in(key, kx_i), ky_i), kz_i)
        return jax.random.normal(k, (2,))

    flat = jax.vmap(draw)(cx.reshape(-1), cy.reshape(-1), cz.reshape(-1))
    a = flat[:, 0].reshape(g.rshape)
    b = flat[:, 1].reshape(g.rshape)
    re = jnp.where(self_conj, jnp.sqrt(2.0) * a, a)
    im = jnp.where(self_conj, 0.0, jnp.where(take_conj, -b, b))
    return re + 1j * im


def grf_resolution_independent(key, g: GridSpec, power_rfft, dtype=jnp.float32):
    """GRF whose large-scale modes are identical across grid sizes for the
    same key (the reference's random.hpp determinism feature)."""
    A = _unit_hermitian_modes(key, g)
    sigma = jnp.sqrt(power_rfft * (g.N * (g.N / g.vol)) / 2.0)
    return fourier.irfft3(A * sigma, g).astype(dtype)
