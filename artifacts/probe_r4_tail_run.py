"""Round-4 probe: the halo-tail split inside a real sampling run (hardware).

Runs the full Runner at 64^3 (ALPT+RSD+Gaussian, 8 vmapped chains) with
pallas_deposit + auto quantile halo + tail, for a fixed attempt budget, and
reports acceptance, throughput, the resolved halo/tail capacity and the
violation-monitor state — the sampler-level evidence that the tail path is
statistically healthy (bench only times the kernels).

Writes probe_r4_tail_run.json.
Usage: timeout 3000 python artifacts/probe_r4_tail_run.py
"""
import dataclasses
import json
import tempfile
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    from barcode_tpu.config import RunConfig, HMCConfig, MockConfig
    from barcode_tpu.model.posterior import ModelConfig
    from barcode_tpu.forward.lag2eul import ForwardConfig
    from barcode_tpu.grid.spec import GridSpec
    from barcode_tpu.runner import Runner

    g = GridSpec.cube(64, 200.0)
    fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0,
                       pallas_deposit=True, pallas_halo=0,
                       pallas_tail_k=max(g.N // 2048, 1024))
    conf = RunConfig(
        grid=g, n_chains=8, seed=11, N_Gibbs=50,
        model=ModelConfig(likelihood=1, forward=fc),
        hmc=HMCConfig(eps_fac=0.0, eps_fac_update_type=3, mass_type=1,
                      N_eps_fac=8, N_a_eps_update=32),
        mock=MockConfig(random_test=True), outnum=50, outnum_ps=50,
        readPS=False)
    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        r = Runner(conf, out_dir=d).setup()
        fcr = r.conf.model.forward
        print(f"resolved halo {fcr.pallas_halo}, tail_k {fcr.pallas_tail_k}",
              flush=True)
        r.run(n_samples=50, max_attempts=256, log=False, dashboard=False)
        diag = r.diagnostics()
        nviol = int(r._violations_jit(r.current_signal())) \
            if r._violations_jit is not None else -1
        out = {
            "halo": fcr.pallas_halo, "tail_k": fcr.pallas_tail_k,
            "violators_final": nviol,
            "acc_rate": round(diag["acc_rate"], 4),
            "accepted_per_chain": diag.get("accepted_per_chain"),
            "leapfrog_steps_per_s": round(diag["leapfrog_steps_per_s"], 2),
            "ess_psi_per_s": round(diag.get("ess_psi_per_s", 0.0), 3),
            "wall_s": round(time.time() - t0, 1),
        }
    print(json.dumps(out), flush=True)
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
