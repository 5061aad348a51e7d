"""Benchmark: leapfrog steps/s per chip on the headline configuration.

Config 3 of BASELINE.json: 128^3 grid, ALPT forward model with plane-parallel
RSD, Gaussian likelihood, inverse-P(k) Fourier-space mass.  One leapfrog
step = one posterior gradient (prior convolution + ALPT forward + adjoint)
plus one FS mass-inverse application — the reference's inner-inner hot path
(SURVEY.md §3.3, ~6-12 N^3 FFTs per step).

Baseline denominator: the reference C++ cannot be built in this image (no
FFTW/GSL; see BASELINE.md), so `vs_baseline` divides by the same algorithm
executed single-threaded on the host CPU (XLA CPU, 1 thread) — the
reference's own execution model (single-core C++/FFTW) on this machine.
The canonical denominator lives in bench_cpu_baseline.json (committed):
the best-of-3 measurement taken on an otherwise-idle box (round 4;
BASELINE.md quotes the same number).  Delete the file to re-measure —
but note an ad-hoc in-run measurement is usually *contended* (this
2-core box also drives the TPU client) and biases vs_baseline high.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}
"""
from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time
from pathlib import Path

N_GRID = int(os.environ.get("BENCH_N", 128))
BOX = 200.0
N_EPS = 8          # fixed leapfrog steps per attempt for exact step counting
N_ATTEMPTS = 8     # timed attempts per measurement
# Pallas deposit path (default ON since the Mosaic kernels run on hardware:
# 3.1x end-to-end at 128^3); BENCH_PALLAS=0 for the XLA scatter path,
# [BENCH_HALO=n] [BENCH_BLOCK=bx] to tune
PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
HALO = int(os.environ.get("BENCH_HALO", 0))
BLOCK = tuple(int(b) for b in os.environ.get("BENCH_BLOCK", "8,8").split(","))
if len(BLOCK) == 1:
    BLOCK = (BLOCK[0], 8)
# deposit block: "auto" -> (16,16) when the grid divides it (r3 sweep optimum)
_BD = os.environ.get("BENCH_BLOCK_DEP", "auto")
BLOCK_DEP = None if _BD == "auto" else tuple(int(b) for b in _BD.split(","))
if BLOCK_DEP is not None and len(BLOCK_DEP) == 1:
    BLOCK_DEP = (BLOCK_DEP[0], BLOCK_DEP[0])  # square block, as BENCH_BLOCK
# bf16 MXU dots in the Pallas kernels (force path / deposit path)
BF16_GRAD = os.environ.get("BENCH_BF16_GRAD", "0") == "1"
BF16_DEP = os.environ.get("BENCH_BF16_DEP", "0") == "1"
# halo-tail split (assign.make_tsc_deposit_fast tail_k): kernels run at a
# small quantile halo; violators go through the exact compacted XLA path.
# Default ON (exact + monitored; 69.9 -> 76.9 steps/s at 128^3, 3.49 -> 4.03
# at 256^3, sweep_r4_tail.json); BENCH_TAIL=0 for the worst-case-halo mode.
TAIL = os.environ.get("BENCH_TAIL", "1") == "1"
CPU_BASELINE_FILE = Path(__file__).parent / "bench_cpu_baseline.json"


def build_step(n_grid: int):
    import jax
    import jax.numpy as jnp
    from barcode_tpu.config import HMCConfig
    from barcode_tpu.grid.spec import GridSpec
    from barcode_tpu.grid import fourier
    from barcode_tpu import random_fields
    from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
    from barcode_tpu.model.likelihoods import ObsData
    from barcode_tpu.model.posterior import ModelConfig
    from barcode_tpu.hmc import mass as mass_mod, sampler

    g = GridSpec.cube(n_grid, BOX)
    gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85, hubble=100.0)
    fc0 = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0)
    halo = HALO
    tail_k = 0
    if not halo and PALLAS:
        # auto-halo: measure the mock truth's actual x/y displacement
        # distribution once (halo=20 from the 4-sigma formula costs ~2.5x
        # the kernel time of the measured bound ~4 cells + reach)
        from barcode_tpu.forward import pallas_deposit as _pd

        @jax.jit
        def _off_hist():
            kk = jnp.sqrt(fourier.k_squared(g))
            keq = 0.02
            P = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5).at[0, 0, 0].set(0.0)
            truth = random_fields.grf(jax.random.key(0), g, P)
            _, pos = lag2eul(truth, g, fc0, gp, return_pos=True)
            d = jnp.asarray(g.cell, pos.dtype).reshape(3, 1, 1, 1)
            base = jnp.floor(pos / d)
            q = jnp.stack(jnp.meshgrid(
                jnp.arange(g.N1), jnp.arange(g.N2), jnp.arange(g.N3),
                indexing="ij")).astype(pos.dtype)
            off = base - q
            L = jnp.asarray([g.N1, g.N2, g.N3], pos.dtype).reshape(3, 1, 1, 1)
            off = jnp.mod(off + L / 2, L) - L / 2
            m = jnp.maximum(jnp.abs(off[0]), jnp.abs(off[1]))
            # full min-image range so no offset is silently dropped
            # (jnp.bincount drops out-of-range values)
            return jnp.bincount(m.astype(jnp.int32).ravel(),
                                length=max(g.N1, g.N2) // 2 + 1)

        import numpy as _np
        hist = _np.asarray(_off_hist())
        if TAIL:
            # halo-tail split: smallest halo whose violator count fits the
            # tail capacity with 4x headroom (positions drift over the run —
            # with the tail, drift only adds exactly-handled violators, so
            # no +cells sampling slack is needed and the halo stays on the
            # kernels' mult-of-4 quantization sweet spot).  Distribution:
            # probe_r4_tail.json.
            tail_k = max(g.N // 2048, 1024)
            viol = hist[::-1].cumsum()[::-1]  # viol[k] = #particles off >= k
            halo = next(k for k in range(1, len(viol))
                        if viol[k] <= tail_k // 4)
        else:
            # contract: |base - q| <= halo - 1 covers the bound incl. the
            # TSC reach (the window extends halo beyond the block); +2 = 1
            # cell of sampling slack.  Kernels round only their Mosaic-bound
            # axis up (deposit WX, gather WY), so the other axis keeps this
            # tight halo.
            halo = int(max(k for k, c in enumerate(hist) if c > 0)) + 2
    halo = halo or 8
    fc = dataclasses.replace(fc0, pallas_deposit=PALLAS, pallas_halo=halo,
                             pallas_block=BLOCK, pallas_block_dep=BLOCK_DEP,
                             pallas_bf16_grad=BF16_GRAD, pallas_bf16_dep=BF16_DEP,
                             pallas_tail_k=tail_k)
    mc = ModelConfig(likelihood=1, forward=fc)
    hc = HMCConfig(eps_fac=1e-4, eps_fac_update_type=0, mass_type=1,
                   N_eps_fac=N_EPS, N_a_eps_update=32)

    # the axon TPU backend supports no eager ops — build everything under jit
    @jax.jit
    def setup():
        kk = jnp.sqrt(fourier.k_squared(g))
        keq = 0.02
        P = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5).at[0, 0, 0].set(0.0)
        truth = random_fields.grf(jax.random.key(0), g, P)
        d_eul = lag2eul(truth, g, fc, gp)
        nobs = jnp.maximum(1.0 + d_eul + jax.random.normal(jax.random.key(1), g.shape), 0.0)
        obs = ObsData(nobs=nobs, window=jnp.ones(g.shape), noise=jnp.ones(g.shape), power=P)
        mass = mass_mod.compute_mass(g, hc.mass_type, P)
        init = sampler.make_init(g, mc, gp, hc)
        state = init(jax.random.key(2), truth * 0.5, obs)
        return state, obs, mass

    state, obs, mass = setup()
    attempt = sampler.make_attempt(g, mc, gp, hc)

    @jax.jit
    def step(state, obs, mass):
        return attempt(state, obs, mass)

    return step, state, obs, mass


def measure_steps_per_s(n_grid: int, n_attempts: int = N_ATTEMPTS):
    import jax

    step, state, obs, mass = build_step(n_grid)
    # warm-up / compile (sync via a real device->host transfer: the axon
    # relay's block_until_ready has been observed returning early)
    state, stats = step(state, obs, mass)
    float(state.psi)
    t0 = time.perf_counter()
    for _ in range(n_attempts):
        state, stats = step(state, obs, mass)
    float(state.psi)
    dt = time.perf_counter() - t0
    # Every attempt executes N_EPS masked leapfrog iterations regardless of
    # the drawn Neps, so the honest hardware step count is N_EPS per attempt.
    hw_steps = n_attempts * N_EPS
    return hw_steps / dt, dt


def cpu_baseline(n_grid: int) -> float:
    """Same algorithm, single CPU thread (cached)."""
    cache = {}
    if CPU_BASELINE_FILE.exists():
        try:
            data = json.loads(CPU_BASELINE_FILE.read_text())
            # legacy single-entry {"n_grid": N, "steps_per_s": s} or the
            # multi-entry {"<N>": s, ...} form — accept both
            if "n_grid" in data:
                cache = {str(data["n_grid"]): float(data["steps_per_s"])}
            else:
                cache = {k: float(v) for k, v in data.items()}
            if str(n_grid) in cache:
                return cache[str(n_grid)]
        except Exception:
            pass
    code = f"""
import os, json, time
os.environ["XLA_FLAGS"] = "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
os.environ["OMP_NUM_THREADS"] = "1"
os.environ["BENCH_PALLAS"] = "0"  # CPU baseline always uses the XLA deposit
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {str(Path(__file__).parent)!r})
import bench
sps, dt = bench.measure_steps_per_s({n_grid}, n_attempts=2)
print(json.dumps({{"steps_per_s": sps}}))
"""
    try:
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=3000)
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        sps = float(json.loads(line)["steps_per_s"])
        cache[str(n_grid)] = sps
        CPU_BASELINE_FILE.write_text(json.dumps(cache))
        return sps
    except Exception as e:
        print(f"# cpu baseline failed: {e}", file=sys.stderr)
        return float("nan")


def main():
    sys.path.insert(0, str(Path(__file__).parent))
    # watchdog: a wedged TPU relay (single-tenant; see CLAUDE.md) must not
    # hang the caller — emit the error line and die instead
    import signal

    def _alarm(signum, frame):
        print(json.dumps({"metric": "bench_error", "value": 0,
                          "unit": "watchdog timeout (TPU relay unresponsive)",
                          "vs_baseline": None}), flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("BENCH_WATCHDOG_S", "3000")))
    try:
        sps, dt = measure_steps_per_s(N_GRID)
        base = cpu_baseline(N_GRID)
        vs = sps / base if base == base and base > 0 else None
        tag = "_pallas" if PALLAS else ""
        print(json.dumps({
            "metric": f"leapfrog_steps_per_s_{N_GRID}cube_alpt_rsd_gauss{tag}",
            "value": round(sps, 3),
            "unit": "steps/s/chip",
            "vs_baseline": round(vs, 2) if vs is not None else None,
        }))
    except Exception as e:  # always emit one JSON line
        print(json.dumps({"metric": "bench_error", "value": 0,
                          "unit": str(e)[:200], "vs_baseline": None}))
        raise


if __name__ == "__main__":
    main()
