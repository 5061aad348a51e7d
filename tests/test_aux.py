"""Auxiliary subsystem tests: transfer functions, metrics, protocols,
zero-padded smoothing, FFT upsampling."""
import numpy as np
import jax
import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu.forward import transfer
from barcode_tpu.utils import metrics
from barcode_tpu.protocol import Protocols

G = GridSpec.cube(16, 160.0)


def test_rankorder_monotone_and_continuous():
    d = jnp.linspace(-0.99, 20.0, 2000)
    for fn in (transfer.rankorder_leclercq_za, transfer.rankorder_leclercq_2lpt):
        y = np.asarray(fn(d))
        assert (np.diff(y) > 0).all()  # monotone (rank-preserving)
        assert np.abs(np.diff(y)).max() < 1.0  # no jump at the threshold


def test_transfer_identity_and_scaling():
    k = np.logspace(-3, 1, 50)
    x = jax.random.normal(jax.random.key(0), G.shape)
    y = transfer.apply_transfer_table(x, G, k, np.full_like(k, 2.0))
    np.testing.assert_allclose(np.asarray(y), 2.0 * np.asarray(x), atol=1e-4)


def test_fft_upsample_preserves_modes():
    x = jax.random.normal(jax.random.key(1), G.shape)
    up = fourier.fft_upsample(x, G, 2)
    assert up.shape == (32, 32, 32)
    # original samples sit at even indices... no — band-limited interpolation
    # preserves the mean and total power of existing modes
    np.testing.assert_allclose(float(up.mean()), float(x.mean()), atol=1e-5)
    # every original interior mode is preserved exactly (amplitude scales
    # by factor^3 with the unnormalized-forward convention)
    F1 = np.asarray(fourier.rfft3(x))
    F2 = np.asarray(fourier.rfft3(up)) / 8.0
    for m in [(1, 2, 3), (3, 1, 0), (5, 14, 2)]:  # 14 = -2 on the 16 grid
        m2 = (m[0], m[1] if m[1] <= 8 else m[1] + 16, m[2])
        np.testing.assert_allclose(F2[m2], F1[m], rtol=1e-4, atol=1e-4)


def test_smooth_zeropad_close_to_periodic_for_small_kernels():
    x = jax.random.normal(jax.random.key(2), G.shape)
    a = fourier.smooth(x, G, 5.0, 1)
    b = fourier.smooth_zeropad(x, G, 5.0, 1)
    # interior cells should agree well (kernel support << box)
    ia = np.asarray(a)[4:12, 4:12, 4:12]
    ib = np.asarray(b)[4:12, 4:12, 4:12]
    corr = np.corrcoef(ia.ravel(), ib.ravel())[0, 1]
    assert corr > 0.99, corr


def test_metrics_ess_and_summary():
    rng = np.random.default_rng(0)
    assert metrics.effective_sample_size(rng.normal(size=500)) > 300
    walk = np.cumsum(rng.normal(size=500))
    assert metrics.effective_sample_size(walk) < 100


def test_check_finite_raises():
    class S:
        delta = np.array([1.0, np.nan])
        psi = np.array(1.0)
        grad = np.array([0.0, 0.0])
        eps_fac = np.array(0.1)

    import pytest
    with pytest.raises(FloatingPointError):
        metrics.check_finite(S())


def test_protocols_files(tmp_path):
    p = Protocols(tmp_path)
    p.log_convergence(1, 0.9, 0.65)
    p.log_spectrum(1, np.arange(10.0), np.ones(10), np.ones(10) * 2)
    p.write_restart_marker(5)
    assert (tmp_path / "convergence.prt").read_text().count("\n") == 2
    spec = (tmp_path / "spec_protocol.prt").read_text()
    assert "0.5" in spec  # ratio to truth
    assert (tmp_path / "restart.prt").read_text().strip() == "5"


def test_debug_array_statistics():
    from barcode_tpu.utils import debug

    a = np.array([1.0, 2.0, np.nan, 4.0])
    s = debug.array_statistics(a, "x")
    assert s["n_nonfinite"] == 1
    np.testing.assert_allclose(s["mean"], 7.0 / 3)


def test_cli_parses_and_runs_tiny(tmp_path, monkeypatch):
    """End-to-end CLI: default config overridden to a tiny grid via a
    minimal input.par; runs a few samples and writes a checkpoint."""
    par = tmp_path / "input.par"
    par.write_text("\n".join([
        "Nx = 8", "Lx = 8.", "seed = 3", "likelihood = 1", "sfmodel = 1",
        "masskernel = 2", "mass_type = 1", "eps_fac = 0.3",
        "eps_fac_update_type = 3", "N_Gibbs = 2", "random_test = true",
        "sigma_min = 0.5", f"dir = {tmp_path}/out/",
    ]))
    from barcode_tpu.cli import main
    rc = main([str(par), "--chains", "2", "--samples", "2"])
    assert rc == 0
    assert (tmp_path / "out" / "checkpoint.npz").exists()
    assert (tmp_path / "out" / "performance_log.txt").exists()


def test_calc_dcom():
    from barcode_tpu import cosmo

    c = cosmo.preset("wmap7_max", z=0.0)
    assert cosmo.calc_dcom(c) == 0.0
    c1 = cosmo.preset("wmap7_max", z=1.0)
    d = cosmo.calc_dcom(c1)
    # LCDM z=1 comoving distance ~ 2300-2400 Mpc/h for Om~0.27
    assert 2200 < d < 2500, d


def test_tools_fft_upsample_flag(tmp_path):
    import jax
    from barcode_tpu import io as bio
    from barcode_tpu.tools.__main__ import main

    x = np.asarray(jax.random.normal(jax.random.key(11), G.shape))
    fname = tmp_path / "grid"
    bio.write_array(fname, x)
    assert main(["corr_fct", str(fname), "16", "160.0", "--nbin", "16",
                 "--fft-upsample", "2"]) == 0
    r, corr = np.loadtxt(str(fname) + "_corr_fct.dat", unpack=True)
    assert np.isfinite(corr).all()


def test_split_rhat_converged_vs_not():
    rng = np.random.default_rng(0)
    same = rng.normal(size=(8, 400))
    r_same = metrics.split_rhat(same)
    assert abs(r_same - 1.0) < 0.05
    # chains stuck at different levels: R-hat far from 1
    apart = same + np.arange(8)[:, None] * 5.0
    assert metrics.split_rhat(apart) > 1.5
    # too short -> inf, constant chains -> 1
    assert metrics.split_rhat(np.zeros((4, 2))) == float("inf")
    assert metrics.split_rhat(np.ones((4, 100))) == 1.0


def test_dashboard_renders_to_stream():
    import io as _io
    from barcode_tpu.hmc.state import AttemptStats
    from barcode_tpu.utils.dashboard import Dashboard

    n_att, n_ch = 3, 2
    arr = lambda v: np.full((n_att, n_ch), v, np.float32)
    stats = AttemptStats(
        accepted=arr(1).astype(bool), epsilon=arr(0.1),
        Neps=arr(4).astype(np.int32), dH=arr(0.2), dK=arr(0.1), dE=arr(0.1),
        psi_prior_i=arr(0), psi_prior_f=arr(0), psi_likeli_i=arr(0),
        psi_likeli_f=arr(0), H_kin_i=arr(0), H_kin_f=arr(0),
        eps_fac=arr(0.5), acc_rate_recent=arr(0.6))

    class FakeStates:
        eps_fac = np.full(n_ch, 0.5)
        accepted = np.array([3, 4])

    buf = _io.StringIO()
    dash = Dashboard(stream=buf, force=True)
    summary = {"attempts": 3, "accepted": 3, "acc_rate": 1.0,
               "leapfrog_steps_per_s": 12.0, "elapsed_s": 1.0}
    dash.update(stats, FakeStates(), summary)
    dash.update(stats, FakeStates(), summary)  # second draw rewinds cursor
    text = buf.getvalue()
    assert "barcode_tpu" in text and "P(a)" in text and "\x1b[" in text
    # inert off-TTY
    buf2 = _io.StringIO()
    d2 = Dashboard(stream=buf2)
    d2.update(stats, FakeStates(), summary)
    assert buf2.getvalue() == ""


def test_eh98_power_spectrum():
    from barcode_tpu import cosmo as cosmo_mod

    c = cosmo_mod.preset("wmap7_max")
    k = np.logspace(-4, 2, 512)
    T = cosmo_mod.eh_transfer_nowiggle(c, k)
    assert abs(T[0] - 1.0) < 1e-3          # T -> 1 at large scales
    assert np.all(np.diff(T) <= 1e-12)     # monotone suppression
    P = cosmo_mod.linear_power(c, k)
    kn = np.logspace(-4, 2.5, 2048)
    s8 = cosmo_mod.sigma_r(c, kn, cosmo_mod.linear_power(c, kn))
    assert abs(s8 - c.sigma8) < 1e-3       # sigma8 normalization holds
    # turnover near k_eq ~ 0.01-0.1 h/Mpc
    assert 1e-3 < k[np.argmax(P)] < 0.2


def test_cli_profile_flag(tmp_path, monkeypatch):
    """--profile captures a jax.profiler trace directory."""
    import runpy
    from barcode_tpu import cli
    par = tmp_path / "input.par"
    par.write_text("Nx = 8\nLx = 8.0\nseed = 3\nsfmodel = 1\nmasskernel = 2\n"
                   "likelihood = 1\nrandom_test = true\nN_Gibbs = 1\n"
                   "eps_fac = 0.3\neps_fac_update_type = 3\nmass_type = 1\n"
                   f"dir = {tmp_path}/\n")
    prof_dir = tmp_path / "prof"
    rc = cli.main([str(par), "--samples", "1", "--out", str(tmp_path),
                   "--no-dashboard", "--profile", str(prof_dir)])
    assert rc == 0
    assert prof_dir.exists() and any(prof_dir.rglob("*"))


def test_tools_cic_upsample_flag(tmp_path):
    """interp_mode=0 of 2D_corr_fct_interp: CIC-upsample then measure."""
    import jax
    from barcode_tpu import io as bio
    from barcode_tpu.tools.__main__ import main

    x = np.asarray(jax.random.normal(jax.random.key(12), G.shape))
    fname = tmp_path / "grid"
    bio.write_array(fname, x)
    assert main(["2D_corr_fct", str(fname), "16", "160.0", "--nbin", "8",
                 "--cic-upsample", "2"]) == 0
    corr = bio.read_array(str(fname) + "_2D_corr_fct", (8, 8))
    assert np.isfinite(corr).all()
    # both upsample modes at once is an error
    import pytest
    with pytest.raises(SystemExit):
        main(["powspec", str(fname), "16", "160.0",
              "--fft-upsample", "2", "--cic-upsample", "2"])


def test_tools_poisson_upres_exact(tmp_path):
    """Reference semantics (tools/poisson_upres.cc): Poisson counts per
    input cell, per-particle uniform in-cell jitter, CIC density on the
    output grid.  Mass conservation is exact (periodic CIC); the cell-mean
    matches Nbar * (N/N_out)^3."""
    import jax
    from barcode_tpu import io as bio
    from barcode_tpu.tools.__main__ import main

    delta = 0.5 * np.asarray(jax.random.normal(jax.random.key(13), G.shape))
    fname = tmp_path / "delta"
    bio.write_array(fname, delta)
    assert main(["poisson_upres", str(fname), "16", "160.0", "32", "4.0",
                 "--seed", "5"]) == 0
    rho = bio.read_array(str(fname) + "_poisCIC32_Nbar4", (32, 32, 32))
    assert (rho >= 0).all()
    n_part = rho.sum()
    expect = 4.0 * np.maximum(1.0 + delta, 0.0).sum()
    # Poisson fluctuation of sum ~ sqrt(expect)
    assert abs(n_part - expect) < 6.0 * np.sqrt(expect)
    assert float(n_part) == int(round(float(n_part)))  # integer total mass


def test_cic_deposit_host_matches_assign(tmp_path):
    """The tool's host CIC equals the jitted CIC deposit on grid-shaped
    particle sets (same getCICcells convention)."""
    from barcode_tpu.forward import assign, particles
    from barcode_tpu.tools.__main__ import _cic_deposit_host

    key = jax.random.key(14)
    pos = particles.lagrangian_positions(G) + \
        0.8 * G.cell[0] * jax.random.normal(key, (3,) + G.shape)
    pos = particles.wrap(pos, G)
    ref = np.asarray(assign.cic_deposit(pos, G))
    host = _cic_deposit_host(np.asarray(pos).reshape(3, -1), G)
    np.testing.assert_allclose(host, ref, atol=1e-4)
