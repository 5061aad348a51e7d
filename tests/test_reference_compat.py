"""Direct compatibility tests against the reference repo's own fixtures
(read-only at /root/reference) — the golden-file strategy of SURVEY.md §4."""
from pathlib import Path

import numpy as np
import pytest

from barcode_tpu import io as bio
from barcode_tpu.config import RunConfig
from barcode_tpu.runner import Runner

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


def test_golden_file_backward_compat():
    """Read the reference's committed binary fixture
    (test/data/io_array.dat, written by a double-precision build) and match
    the hard-coded values of test/io_array.cpp:64-99 exactly."""
    arr = bio.read_array(REF / "test/data/io_array", dtype=np.float64)
    expected = [18012.18201, 280.22, 300021.850, 3.14, 2.0, 333888.0,
                807520.20, 170412.0]
    np.testing.assert_array_equal(arr, expected)


def test_roundtrip_both_precisions(tmp_path):
    data = np.array([1.5, -2.25, 3e10, 4e-10, 0.0, 7.0, 8.0, 9.0])
    for dt in (np.float32, np.float64):
        p = bio.write_array(tmp_path / f"rt_{dt.__name__}", data, dtype=dt)
        back = bio.read_array(p, dtype=dt)
        np.testing.assert_array_equal(back, data.astype(dt))


def test_parse_reference_input_par():
    """The reference's own input.par files parse into a full RunConfig with
    the documented values (parameter_inifile semantics, ini_reader.cpp)."""
    conf = RunConfig.from_input_par(REF / "data/input.par")
    assert conf.grid.N1 == 64 and conf.grid.L1 == 200.0
    assert conf.model.likelihood == 1
    assert conf.model.forward.sfmodel == 1
    assert conf.model.forward.masskernel == 3
    assert conf.hmc.mass_type == 1
    assert conf.hmc.eps_fac_update_type == 3
    assert conf.hmc.N_a_eps_update == 100
    assert conf.hmc.acc_min == 0.6 and conf.hmc.acc_max == 0.7
    assert conf.mock.random_test is True
    assert conf.seed == 1
    # derived heuristics (init_par.cc:259-298)
    np.testing.assert_allclose(conf.hmc.eps_fac_target(conf.grid.N),
                               2.38902581 * (64**3) ** (-0.57495347))
    assert conf.hmc.s_eps_total(conf.grid.N) == 158

    conf_smoke = RunConfig.from_input_par(REF / "test/run/input.par")
    assert conf_smoke.grid.N1 == 8 and conf_smoke.grid.L1 == 500.0
    assert conf_smoke.N_Gibbs == 5


def test_reference_ci_smoke_run(tmp_path):
    """The reference's CI end-to-end test (.travis.yml:75-80): run the full
    engine on test/run/input.par (8^3, 5 samples, real WMAP7 CAMB table)
    to completion."""
    conf = RunConfig.from_input_par(REF / "test/run/input.par")
    conf = conf.__class__(**{**conf.__dict__,
                             "dir": str(tmp_path),
                             "fnamePS": str(REF / "data/WMAP7_CAMB.dat"),
                             "n_chains": 2})
    r = Runner(conf).setup()
    states = r.run(n_samples=5, max_attempts=2000, log=True)
    assert int(states.accepted.min()) >= 5
    # outputs the reference produces too
    assert (tmp_path / "deltaLAG_1.dat").exists()
    assert (tmp_path / "performance_log.txt").exists()
    assert (tmp_path / "specLAGtest.dat").exists()
    # startup dumps (main.cc:156-168, barcoderunner.cc:324-329)
    n = conf.grid.N1
    assert (tmp_path / "powerero.dat").stat().st_size == 4 * n ** 3
    assert (tmp_path / "initial_guess.dat").stat().st_size == 4 * n ** 3
    assert (tmp_path / "spec_initial_guess.dat").exists()
