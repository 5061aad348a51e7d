"""GRF generator tests: spectrum recovery + Hermitian/variance conventions
(SURVEY.md §4: 'GRF spectrum recovery', 'E[kinetic] ~ N/2')."""
import jax
import jax.numpy as jnp
import numpy as np

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields as rf
from barcode_tpu.model import likelihoods

G = GridSpec.cube(16, 200.0)


def flat_power(g, p0=50.0):
    return jnp.full(g.rshape, p0).at[0, 0, 0].set(0.0)


def test_grf_spectrum_recovery():
    P = flat_power(G)
    keys = jax.random.split(jax.random.key(0), 24)
    tot_p = 0.0
    tot_n = 0.0
    for k in keys:
        d = rf.grf(k, G, P)
        km, pw, nm = fourier.measure_spectrum(d, G, 16)
        tot_p += np.asarray(pw * nm)
        tot_n += np.asarray(nm)
    mean_p = tot_p.sum() / tot_n.sum()
    np.testing.assert_allclose(mean_p, 50.0, rtol=0.05)


def test_grf_real_space_variance():
    """Var[delta(x)] = (1/V) sum_k P(k) -> flat P: (N-1)/V * P."""
    P = flat_power(G)
    d = rf.grf(jax.random.key(1), G, P, dtype=jnp.float32)
    expected = 50.0 * (G.N - 1) / G.vol
    var = float(jnp.var(d))
    np.testing.assert_allclose(var, expected, rtol=0.1)


def test_prior_energy_expectation():
    """s ~ GRF(P) => E[1/2 s S^-1 s] = (N-1)/2 (DC excluded)."""
    P = flat_power(G)
    vals = []
    for i in range(16):
        s = rf.grf(jax.random.key(i), G, P)
        obs = likelihoods.ObsData(nobs=0.0, window=0.0, noise=1.0, power=P)
        vals.append(float(likelihoods.prior_psi(s, G, obs)))
    np.testing.assert_allclose(np.mean(vals), (G.N - 1) / 2.0, rtol=0.05)


def test_resolution_independent_large_scale_modes():
    """Same key at N and 2N: the shared low-k modes must agree."""
    P16 = flat_power(G)
    g32 = GridSpec.cube(32, 200.0)
    P32 = flat_power(g32)
    key = jax.random.key(7)
    d16 = rf.grf_resolution_independent(key, G, P16)
    d32 = rf.grf_resolution_independent(key, g32, P32)
    F16 = np.asarray(fourier.rfft3(d16))
    F32 = np.asarray(fourier.rfft3(d32))
    # compare a few interior modes (signed freqs well inside both grids);
    # amplitudes scale as N (ps2dft amp sqrt(N^2 P/V)/... -> delta_k ~ N)
    for mode in [(1, 2, 3), (2, 1, 1), (3, 3, 2), (-2, 3, 1), (1, -4, 2)]:
        ix, iy, iz = mode
        v16 = F16[ix % 16, iy % 16, iz] / G.N
        v32 = F32[ix % 32, iy % 32, iz] / g32.N
        np.testing.assert_allclose(v16, v32, rtol=1e-4, atol=1e-8)


def test_resolution_independent_spectrum():
    P = flat_power(G)
    d = rf.grf_resolution_independent(jax.random.key(3), G, P)
    km, pw, nm = fourier.measure_spectrum(d, G, 16)
    mean_p = float((pw * nm).sum() / nm.sum())
    np.testing.assert_allclose(mean_p, 50.0, rtol=0.15)


def test_resolution_independent_is_real_consistent():
    """The hermitian construction must produce exactly the irfft of a valid
    half-complex field: re-transforming must reproduce the coefficients."""
    P = flat_power(G)
    d = rf.grf_resolution_independent(jax.random.key(4), G, P)
    A = rf._unit_hermitian_modes(jax.random.key(4), G)
    sigma = np.sqrt(np.asarray(P) * (G.N * (G.N / G.vol)) / 2.0)
    F = np.asarray(fourier.rfft3(d))
    np.testing.assert_allclose(F, np.asarray(A) * sigma, rtol=1e-3, atol=1e-2)
