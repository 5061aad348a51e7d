"""Statistics + tools tests."""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields as rf, statistics, io as bio

G = GridSpec.cube(16, 160.0)


def test_correlation_of_white_noise():
    """White noise: xi(0) = var, xi(r>0) ~ 0."""
    x = jax.random.normal(jax.random.key(0), G.shape)
    rm, corr, nm = statistics.measure_correlation(x, G, 24)
    # bin 0 contains r=0
    np.testing.assert_allclose(float(corr[0]), float(x.var()), rtol=0.05)
    assert abs(float(corr[5])) < 0.05 * float(x.var())


def test_correlation_consistency_with_spectrum():
    """xi(r) should equal the Fourier pair of the measured P(k) for a
    smooth single-scale field: check xi(0) = (1/V) sum P = variance."""
    P = jnp.exp(-fourier.k_squared(G) * 20.0) * 1e3
    P = P.at[0, 0, 0].set(0.0)
    x = rf.grf(jax.random.key(1), G, P)
    xi3 = statistics.correlation_3d(x, G)
    np.testing.assert_allclose(float(xi3[0, 0, 0]), float(jnp.var(x)), rtol=1e-3)


def test_spec2d_consistent_with_1d():
    """Summing P(kperp,kpar) weighted by counts ~ total power of 1D measure."""
    P = jnp.full(G.rshape, 25.0).at[0, 0, 0].set(0.0)
    x = rf.grf(jax.random.key(2), G, P)
    km1, p1, n1 = fourier.measure_spectrum(x, G, 16)
    km2, p2, n2 = statistics.measure_spectrum_2d(x, G, 16)
    tot1 = float((p1 * n1).sum())
    tot2 = float((p2 * n2).sum()) * 4.0 * np.pi  # undo the reference's 1/4pi
    np.testing.assert_allclose(tot2, tot1, rtol=0.15)


def test_corr2d_isotropy():
    """For an isotropic field, xi(sigma,pi) ~ xi(pi,sigma) at small lags."""
    P = jnp.exp(-fourier.k_squared(G) * 30.0) * 1e3
    P = P.at[0, 0, 0].set(0.0)
    x = rf.grf(jax.random.key(3), G, P)
    rm, corr, nm = statistics.measure_correlation_2d(x, G, 12)
    c = np.asarray(corr)
    # the signal decays within the first bin; isotropy shows as the first
    # off-axis bins agreeing to a small fraction of the zero-lag value
    assert abs(c[0, 1] - c[1, 0]) < 0.2 * c[0, 0], (c[0, 1], c[1, 0], c[0, 0])


def test_gelman_rubin_converged_vs_not():
    key = jax.random.key(4)
    same = jax.random.normal(key, (4, 200))
    rhat = float(statistics.gelman_rubin(same))
    assert rhat < 1.1, rhat
    shifted = same + jnp.arange(4)[:, None] * 5.0
    rhat2 = float(statistics.gelman_rubin(shifted))
    assert rhat2 > 1.5, rhat2


def test_tools_cli_powspec_and_corr(tmp_path):
    x = np.asarray(jax.random.normal(jax.random.key(5), G.shape))
    fname = tmp_path / "grid"
    bio.write_array(fname, x)
    from barcode_tpu.tools.__main__ import main
    assert main(["powspec", str(fname), "16", "160.0", "--nbin", "16"]) == 0
    k, p = np.loadtxt(str(fname) + "_powspec.dat", unpack=True)
    assert (p[1:10] > 0).all()
    assert main(["corr_fct", str(fname), "16", "160.0", "--nbin", "16"]) == 0
    assert main(["2D_powspec", str(fname), "16", "160.0", "--nbin", "8"]) == 0


def test_tools_cli_lag2eul_and_upres(tmp_path):
    P = jnp.full(G.rshape, 20.0).at[0, 0, 0].set(0.0)
    x = np.asarray(rf.grf(jax.random.key(6), G, P))
    fname = tmp_path / "lag"
    bio.write_array(fname, x)
    from barcode_tpu.tools.__main__ import main
    assert main(["lag2eul", str(fname), "16", "160.0"]) == 0
    d = bio.read_array(str(fname) + "_eul", G.shape)
    assert abs(d.mean()) < 1e-4
    assert main(["interp_upres", str(fname), "16", "160.0", "32"]) == 0
    up = bio.read_array(str(fname) + "_interpCIC32", (32, 32, 32))
    assert up.std() > 0
    # TRANSF kernels: identity kernels must reproduce the plain 2LPT run
    tname = tmp_path / "auxtransf"
    bio.write_array(tname, np.ones(G.shape, np.float32))
    assert main(["lag2eul", str(fname), "16", "160.0", "--sfmodel", "2",
                 "--out", str(tmp_path / "plain")]) == 0
    assert main(["lag2eul", str(fname), "16", "160.0", "--sfmodel", "2",
                 "--transf-zeld", str(tname) + ".dat",
                 "--transf-2lpt", str(tname) + ".dat",
                 "--out", str(tmp_path / "transf")]) == 0
    a = bio.read_array(tmp_path / "plain", G.shape)
    b = bio.read_array(tmp_path / "transf", G.shape)
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
