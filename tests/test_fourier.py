"""Spectral-operator closed-form tests (SURVEY.md §4 test plan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier

G = GridSpec.cube(16, 100.0)


def sine_mode(g, m=(1, 2, 3), amp=1.0):
    """Real single-mode field amp*cos(k.x + 0.3)."""
    x = np.stack(np.meshgrid(*[np.arange(n) for n in g.shape], indexing="ij"))
    k = 2 * np.pi * np.array([m[0] / g.N1, m[1] / g.N2, m[2] / g.N3])
    phase = k[0] * x[0] + k[1] * x[1] + k[2] * x[2] + 0.3
    return jnp.asarray(amp * np.cos(phase), jnp.float32)


def kphys(g, m):
    return 2 * np.pi * np.array([m[0] / g.L1, m[1] / g.L2, m[2] / g.L3]) * np.array([1, 1, 1])


def test_fft_roundtrip():
    x = jax.random.normal(jax.random.key(0), G.shape)
    y = fourier.irfft3(fourier.rfft3(x), G)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_gradfft_sine():
    m = (1, 2, 3)
    x = sine_mode(G, m)
    k = kphys(G, m)
    for axis in range(3):
        grad = fourier.gradfft(x, G, axis)
        # d/dx cos(kx+p) = -k sin(kx+p); compare against numerical expectation
        xs = np.stack(np.meshgrid(*[np.arange(n) for n in G.shape], indexing="ij"))
        kc = 2 * np.pi * np.array([m[0] / G.N1, m[1] / G.N2, m[2] / G.N3])
        phase = kc[0] * xs[0] + kc[1] * xs[1] + kc[2] * xs[2] + 0.3
        expected = -k[axis] * np.sin(phase)
        np.testing.assert_allclose(np.asarray(grad), expected, atol=1e-4)


def test_displacement_from_phi_single_mode():
    """Psi = grad inv-lap phi: for phi = cos(k.x+p),
    inv-lap phi = -cos/k^2, so Psi_i = +(k_i/k^2) sin."""
    m = (2, 1, 1)
    phi = sine_mode(G, m)
    k = kphys(G, m)
    k2 = (k**2).sum()
    psi = fourier.displacement_from_phi(phi, G)
    xs = np.stack(np.meshgrid(*[np.arange(n) for n in G.shape], indexing="ij"))
    kc = 2 * np.pi * np.array([m[0] / G.N1, m[1] / G.N2, m[2] / G.N3])
    phase = kc[0] * xs[0] + kc[1] * xs[1] + kc[2] * xs[2] + 0.3
    for axis in range(3):
        expected = (k[axis] / k2) * np.sin(phase)
        np.testing.assert_allclose(np.asarray(psi[axis]), expected, atol=1e-4)


def test_poisson_solve():
    """lap(poisson_solve(delta)) == delta (up to DC)."""
    x = jax.random.normal(jax.random.key(1), G.shape)
    x = x - x.mean()
    phi = fourier.poisson_solve(x, G)
    # laplacian via spectral multiply
    lap = fourier.irfft3(-fourier.k_squared(G) * fourier.rfft3(phi), G)
    np.testing.assert_allclose(np.asarray(lap), np.asarray(x), atol=1e-4)


def test_convolve_inv_corr_inverse_pair():
    x = jax.random.normal(jax.random.key(2), G.shape)
    corr = jnp.exp(-fourier.k_squared(G) / 10.0) + 0.1
    y = fourier.apply_corr(fourier.convolve_inv_corr(x, G, corr), G, corr)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_measure_spectrum_single_mode():
    """A single cosine mode of amplitude A has P = A^2/2 * V/N^2 * N^2... i.e.
    |delta_k|^2 = (A N / 2)^2 in each of the two conjugate modes, so
    P = (V/N^2)(A N/2)^2 in its bin."""
    m = (3, 0, 0)
    A = 2.0
    x = sine_mode(G, m, amp=A)
    km, pw, nm = fourier.measure_spectrum(x, G, 32)
    kmag = np.sqrt((kphys(G, m) ** 2).sum())
    dk = G.kmax / 32
    b = int(kmag / dk)
    expected_total = 2 * (A * G.N / 2) ** 2 * G.vol / G.N**2  # both conjugates
    total = float((pw * nm)[b])
    np.testing.assert_allclose(total, expected_total, rtol=1e-3)


def test_smooth_gaussian_dc_preserved():
    x = jax.random.normal(jax.random.key(3), G.shape) + 5.0
    y = fourier.smooth(x, G, 10.0, filtertype=1)
    np.testing.assert_allclose(float(y.mean()), float(x.mean()), rtol=1e-5)


def test_power_table_interp():
    k_t = np.array([0.01, 0.1, 1.0, 10.0])
    p_t = np.array([10.0, 100.0, 5.0, 0.1])
    P = fourier.power_table_to_rfft_grid(k_t, p_t, G)
    assert P.shape == G.rshape
    assert float(P[0, 0, 0]) == 0.0
    # the fundamental mode k = 2pi/100 ~ 0.063 interpolates between rows 0,1
    kf = 2 * np.pi / 100.0
    expected = np.interp(kf, k_t, p_t)
    np.testing.assert_allclose(float(P[1, 0, 0]), expected, rtol=1e-5)


def test_rfft_grid_to_full_hermitian_mirror():
    kk_r = fourier.k_squared(G)                      # rfft layout
    full = fourier.rfft_grid_to_full(kk_r, G)
    kk_full = fourier.k_squared(G, rfft=False)
    np.testing.assert_allclose(np.asarray(full), np.asarray(kk_full), rtol=1e-6)
