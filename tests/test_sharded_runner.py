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
