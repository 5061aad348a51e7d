"""Runner integration tests: mock setup, short run, outputs, checkpoint."""
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from barcode_tpu.config import HMCConfig, MockConfig, RunConfig
from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.forward.lag2eul import ForwardConfig
from barcode_tpu.model.posterior import ModelConfig
from barcode_tpu.runner import Runner
from barcode_tpu import io as bio


def small_conf(tmp_path, likelihood=1, n_chains=2):
    return RunConfig(
        grid=GridSpec.cube(8, 8.0),
        model=ModelConfig(likelihood=likelihood,
                          forward=ForwardConfig(sfmodel=1, masskernel="tsc")),
        hmc=HMCConfig(eps_fac=0.3, eps_fac_update_type=3, mass_type=1,
                      N_a_eps_update=16),
        mock=MockConfig(random_test=True, sigma_min=0.5),
        n_chains=n_chains,
        N_Gibbs=3,
        outnum=1,
        dir=str(tmp_path),
        seed=7,
    )


def test_runner_end_to_end(tmp_path):
    conf = small_conf(tmp_path)
    r = Runner(conf).setup()
    # mock dumps exist and are reference-format readable
    for f in ["deltaLAGtest", "deltaEULtest", "win", "nobs", "sigma"]:
        arr = bio.read_array(tmp_path / f, conf.grid.shape)
        assert arr.shape == conf.grid.shape
    states = r.run(n_samples=3, max_attempts=400, log=True)
    assert int(states.accepted.min()) >= 3
    # sample dumps + spectrum + performance log
    assert (tmp_path / "deltaLAG_1.dat").exists()
    assert (tmp_path / "powSpecit1.dat").exists()
    log_lines = (tmp_path / "performance_log.txt").read_text().splitlines()
    assert len(log_lines) > 3 and log_lines[0].startswith("#")


def test_checkpoint_roundtrip(tmp_path):
    conf = small_conf(tmp_path)
    r = Runner(conf).setup()
    r.run(n_samples=1, max_attempts=64, log=False)
    path = r.checkpoint()
    before = r.states

    r2 = Runner(conf, out_dir=str(tmp_path / "second")).setup()
    r2.restore(path)
    after = r2.states
    for name in ["delta", "psi", "eps_fac", "acc_flags", "eps_table",
                 "count_attempts", "accepted", "rejections"]:
        np.testing.assert_array_equal(getattr(before, name), getattr(after, name),
                                      err_msg=name)
    # resumed sampling continues deterministically from the same keys
    s1, _ = r._run(r.states, r.obs, r.mass)
    s2, _ = r2._run(r2.states, r2.obs, r2.mass)
    np.testing.assert_allclose(np.asarray(s1.delta), np.asarray(s2.delta), atol=1e-6)


def test_fastexit(tmp_path):
    conf = small_conf(tmp_path)
    r = Runner(conf).setup()
    (tmp_path / "fastexit").touch()
    states = r.run(n_samples=100, max_attempts=1000, log=False)
    assert int(states.count_attempts.max()) == 0  # stopped before any batch


def test_poisson_mock_counts(tmp_path):
    conf = small_conf(tmp_path, likelihood=0)
    r = Runner(conf).setup()
    nobs = np.asarray(r.obs.nobs)
    assert (nobs >= 0).all()
    assert np.allclose(nobs, np.round(nobs))  # integer counts
    states = r.run(n_samples=1, max_attempts=200, log=False)
    assert int(states.accepted.min()) >= 1


def test_rhat_stop_and_diagnostics(tmp_path):
    conf = small_conf(tmp_path, n_chains=4)
    r = Runner(conf).setup()
    # loose threshold: 8^3 Gaussian chains mix quickly, so this exercises the
    # convergence-stop path without a long run
    states = r.run(n_samples=10**6, max_attempts=4096, log=False, rhat_stop=1.5)
    d = r.diagnostics()
    assert "rhat_psi" in d and np.isfinite(d["rhat_psi"])
    assert d["rhat_psi"] < 1.5
    assert int(states.accepted.min()) >= 1


def test_internal_eh98_power_path(tmp_path):
    conf = dataclasses.replace(small_conf(tmp_path), readPS=False)
    r = Runner(conf).setup()
    states = r.run(n_samples=1, max_attempts=200, log=False)
    assert int(states.accepted.min()) >= 1
    P = np.asarray(jax.jit(r.load_power)())
    assert P.shape == (8, 8, 5) and P[0, 0, 0] == 0.0 and (P >= 0).all()


def test_runner_pallas_deposit_path(tmp_path):
    """pallas_deposit config end-to-end on CPU (interpret auto-selected),
    including the halo-contract violation monitor."""
    conf = small_conf(tmp_path)
    fwd = dataclasses.replace(conf.model.forward, masskernel="tsc",
                              pallas_deposit=True, pallas_halo=4)
    conf = dataclasses.replace(conf, model=dataclasses.replace(conf.model, forward=fwd))
    r = Runner(conf).setup()
    states = r.run(n_samples=1, max_attempts=200, log=False)
    assert int(states.accepted.min()) >= 1
    assert int(r._violations_jit(r.current_signal())) == 0


def test_runner_auto_halo(tmp_path):
    conf = small_conf(tmp_path)
    fwd = dataclasses.replace(conf.model.forward, masskernel="tsc",
                              pallas_deposit=True, pallas_halo=0)
    conf = dataclasses.replace(conf, model=dataclasses.replace(conf.model, forward=fwd))
    r = Runner(conf).setup()
    h = r.conf.model.forward.pallas_halo
    assert h >= 4  # resolved: bound + reach + margin
    states = r.run(n_samples=1, max_attempts=200, log=False)
    assert int(states.accepted.min()) >= 1
    assert int(r._violations_jit(r.current_signal())) == 0


def test_mass_recompute_cadence(tmp_path):
    """massnum cadence (HMC.cc:387-424): likelihood-force masses recompute
    during the run; the mass object actually changes."""
    conf = small_conf(tmp_path)
    conf = dataclasses.replace(
        conf, hmc=dataclasses.replace(conf.hmc, mass_type=2, massnum_burn=1,
                                      massnum_post=1))
    r = Runner(conf).setup()
    m0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), r.mass)
    r.run(n_samples=3, max_attempts=400, log=False)
    assert getattr(r, "_mass_at_sample", 0) >= 1
    leaves0 = jax.tree_util.tree_leaves(m0)
    leaves1 = jax.tree_util.tree_leaves(r.mass)
    changed = any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1)
                  if hasattr(a, "shape") and a.shape)
    assert changed


def test_outnum_ps_cadence(tmp_path):
    """Fields follow outnum, spectra follow outnum_ps independently
    (barcoderunner.cc:513-533: ii%outnum / ii%outnum_ps, first 10 always)."""
    conf = small_conf(tmp_path)
    conf = dataclasses.replace(conf, N_Gibbs=14, outnum=2, outnum_ps=3)
    r = Runner(conf).setup()
    r.run(n_samples=14, max_attempts=3000, log=False)
    for i in range(1, 15):
        wf = i <= 10 or i % 2 == 0
        wp = i <= 10 or i % 3 == 0
        assert (tmp_path / f"deltaLAG_{i}.dat").exists() == wf, f"fields {i}"
        assert (tmp_path / f"powSpecit{i}.dat").exists() == wp, f"spec {i}"


def test_restore_from_dumps(tmp_path):
    """File-based restart (main.cc:121-131): delete the checkpoint, resume
    from deltaLAG_<k> + performance-log replay alone."""
    conf = small_conf(tmp_path)
    r = Runner(conf).setup()
    r.run(n_samples=3, max_attempts=400, log=True)
    k = 3
    truth_field = bio.read_array(tmp_path / f"deltaLAG_{k}", conf.grid.shape)

    r2 = Runner(conf).setup()  # same seed -> same obs; no checkpoint used
    r2.restore_from_dumps(k)
    np.testing.assert_allclose(np.asarray(r2.states.delta[0]), truth_field,
                               atol=1e-6)
    assert int(r2.states.accepted.min()) == k
    # perflog replay restored controller state
    assert int(r2.states.count_attempts[0]) > 0
    assert float(r2.states.eps_fac[0]) > 0
    # sampling continues and dumps resume AFTER k
    r2.run(n_samples=k + 1, max_attempts=400, log=False)
    assert (tmp_path / f"deltaLAG_{k + 1}.dat").exists()
    assert int(r2.states.accepted.min()) >= k + 1


def test_itmax_triggers_mass_recompute(tmp_path, capsys):
    """itmax (HMC.cc:431): a stalled chain triggers the security_recursion
    equivalent (mass recompute + retry) instead of sampling forever."""
    conf = small_conf(tmp_path)
    # unacceptably large fixed step -> ~0 acceptance -> stall
    conf = dataclasses.replace(
        conf, hmc=dataclasses.replace(conf.hmc, eps_fac=50.0,
                                      eps_fac_update_type=0, itmax=32))
    r = Runner(conf).setup()
    r.run(n_samples=1, max_attempts=96, log=True)
    out = capsys.readouterr().out
    assert "itmax=32" in out
