"""Runner-level sharded sampling mode (config 5) on the 8-virtual-device
CPU mesh: mock setup, attempts, adaptation, outputs, checkpoint/resume."""
import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from barcode_tpu.config import RunConfig
from barcode_tpu.parallel import sharded_forward as sfw
from barcode_tpu.parallel.sharded_runner import ShardedRunner

N_CHAINS = 4


@pytest.fixture(scope="module")
def mesh2():
    devs = np.asarray(jax.devices()[:8]).reshape(N_CHAINS, 2)
    return Mesh(devs, axis_names=("chains", sfw.AXIS))


@pytest.fixture(scope="module")
def conf():
    from barcode_tpu.grid.spec import GridSpec
    c = RunConfig(grid=GridSpec.cube(16, 16.0), seed=3, n_chains=N_CHAINS,
                  initial_guess=4, N_Gibbs=2, outnum=1)
    hmc = dataclasses.replace(c.hmc, eps_fac=0.3, eps_fac_update_type=2,
                              mass_type=1, N_a_eps_update=8)
    model = dataclasses.replace(
        c.model, likelihood=1,
        forward=dataclasses.replace(c.model.forward, sfmodel=1,
                                    masskernel="tsc"))
    mock = dataclasses.replace(c.mock, random_test=True)
    return dataclasses.replace(c, hmc=hmc, model=model, mock=mock,
                               readPS=False)


def test_sharded_runner_end_to_end(conf, mesh2, tmp_path):
    r = ShardedRunner(conf, mesh=mesh2, out_dir=tmp_path, halo=2).setup()
    state = r.run(n_samples=1, max_attempts=40)
    acc = np.asarray(state["accepted"])
    assert acc.min() >= 1, f"no acceptance on some chain: {acc}"
    # outputs: mock dumps, chain-0 sample + spectrum, perflog
    assert (tmp_path / "deltaLAGtest.dat").exists()
    assert (tmp_path / "deltaLAG_1.dat").exists()
    assert (tmp_path / "powSpecit1.dat").exists()
    log = (tmp_path / "performance_log.txt").read_text().splitlines()
    assert log[0].startswith("#") and len(log) >= 2
    # full 12-column rows (runner parity)
    from barcode_tpu.runner import PERFLOG_COLUMNS
    assert log[0] == "# " + "\t".join(PERFLOG_COLUMNS)
    assert len(log[1].split("\t")) == len(PERFLOG_COLUMNS)
    # in-state adaptation tables advanced once per attempt
    assert int(np.asarray(state["count_attempts"])[0]) == len(log) - 1
    # deltaEUL dumped alongside deltaLAG (runner parity)
    assert (tmp_path / "deltaEUL_1.dat").exists()
    # protocol files written
    assert (tmp_path / "convergence.prt").exists()
    # state stays consistent with a fresh sharded psi evaluation
    (vals, _), _ = r._vg(state["delta"], r.obs_sh)
    np.testing.assert_allclose(np.asarray(state["psi"]), np.asarray(vals),
                               rtol=2e-4)


def test_sharded_runner_checkpoint_roundtrip(conf, mesh2, tmp_path):
    r = ShardedRunner(conf, mesh=mesh2, out_dir=tmp_path, halo=2).setup()
    r.run(n_samples=1, max_attempts=10)
    p = r.checkpoint()
    before = {k: np.asarray(v) for k, v in r.state.items()}
    r2 = ShardedRunner(conf, mesh=mesh2, out_dir=tmp_path, halo=2).setup()
    r2.restore(p)
    for k, v in r2.state.items():
        np.testing.assert_array_equal(np.asarray(v), before[k])
    # resumed runner keeps sampling
    r2.run(n_samples=2, max_attempts=30)


def test_sharded_runner_fastexit(conf, mesh2, tmp_path):
    (tmp_path / "fastexit").touch()
    r = ShardedRunner(conf, mesh=mesh2, out_dir=tmp_path, halo=2).setup()
    state = r.run(n_samples=5, max_attempts=50)
    assert int(np.asarray(state["accepted"]).max()) == 0


def test_sharded_runner_dashboard(conf, mesh2, tmp_path, capsys):
    """dashboard=True renders the ANSI candidate table from the sharded
    loop (full Runner parity for the interactive surface)."""
    r = ShardedRunner(conf, mesh=mesh2, out_dir=tmp_path / "d",
                      halo=2).setup()
    r.run(n_samples=1, max_attempts=16, log=False, dashboard=True)
    out = capsys.readouterr().out
    assert "barcode_tpu sharded" in out
    assert "dH" in out and "Neps" in out


def test_sharded_restore_from_dumps(tmp_path, mesh2, conf):
    """Sharded file-based restart (main.cc:121-131 twin of
    test_restore_from_dumps): resume chain 0 from deltaLAG_<k> with
    performance-log replay, then keep sampling."""
    from barcode_tpu import io as bio

    r = ShardedRunner(conf, mesh=mesh2, out_dir=tmp_path, halo=2).setup()
    r.run(n_samples=2, max_attempts=80, log=True)
    k = 2
    dumped = bio.read_array(tmp_path / f"deltaLAG_{k}", conf.grid.shape)

    r2 = ShardedRunner(conf, mesh=mesh2, out_dir=tmp_path, halo=2).setup()
    r2.restore_from_dumps(k)
    np.testing.assert_allclose(np.asarray(r2.state["delta"][0]), dumped,
                               atol=1e-6)
    assert int(np.asarray(r2.state["accepted"]).min()) == k
    # perflog replay restored controller state
    assert int(np.asarray(r2.state["count_attempts"])[0]) > 0
    assert float(np.asarray(r2.state["eps_fac"])[0]) > 0
    # psi was recomputed through the sharded posterior for the dumped field
    (vals, _), _ = r2._vg(r2.state["delta"], r2.obs_sh)
    np.testing.assert_allclose(np.asarray(r2.state["psi"]),
                               np.asarray(vals), rtol=2e-4)
    # sampling continues and dumps resume AFTER k
    r2.run(n_samples=k + 1, max_attempts=80, log=False)
    assert (tmp_path / f"deltaLAG_{k + 1}.dat").exists()
    assert int(np.asarray(r2.state["accepted"]).min()) >= k + 1


def test_sharded_mass_recompute_cadence(tmp_path, mesh2, conf):
    """massnum cadence in sharded mode (HMC.cc:387-424 twin of
    test_mass_recompute_cadence): the type-2 likelihood-force mass spectrum
    actually changes during the run."""
    c = dataclasses.replace(
        conf, hmc=dataclasses.replace(conf.hmc, mass_type=2, massnum_burn=1,
                                      massnum_post=1))
    r = ShardedRunner(c, mesh=mesh2, out_dir=tmp_path, halo=2).setup()
    m0 = np.asarray(r.mass_f).copy()
    r.run(n_samples=3, max_attempts=200, log=False)
    assert getattr(r, "_mass_at_sample", 0) >= 1
    assert not np.allclose(m0, np.asarray(r.mass_f))
