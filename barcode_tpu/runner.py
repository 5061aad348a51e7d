"""Session runner: the TPU-native replacement for barcoderunner + main.

Responsibilities (parity: /root/reference/barlib/src/barcoderunner.cc and
barcode/main.cc):
  * assemble the model from a RunConfig (P(k) table -> grid, growth factors),
  * mock-data generation (random_test) or observed-data loading
    (win/nobs/sigma files),
  * initial guess (zero / file / GRF / smoothed GRF / zero+noise),
  * the sampling loop with per-attempt performance log, periodic sample +
    spectrum dumps, and a `fastexit` sentinel,
  * single-file checkpoint/resume of the FULL sampler state (replaces the
    reference's performance-log replay, SURVEY.md §5.4 — RNG keys and the
    adaptive-eps tables are restored exactly, which the reference cannot do).

Differences by design:
  * many chains, vmapped; chain 0's outputs use the reference's file names
    (deltaLAG_<i> etc.), all chains go into the checkpoint;
  * a "Gibbs iteration" (one accepted sample) is tracked per chain; attempts
    run in fixed-size jitted batches instead of a retry loop.
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from barcode_tpu import io as bio
from barcode_tpu import mock as mock_mod
from barcode_tpu.config import RunConfig
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields
from barcode_tpu.forward.lag2eul import lag2eul
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.model import posterior
from barcode_tpu.hmc import mass as mass_mod, sampler
from barcode_tpu.hmc.state import ChainState

PERFLOG_COLUMNS = [
    "accepted", "epsilon", "Neps", "dH", "dK", "dE",
    "psi_prior_i", "psi_prior_f", "psi_likeli_i", "psi_likeli_f",
    "H_kin_i", "H_kin_f",
]


class Runner:
    def __init__(self, conf: RunConfig, out_dir: str | None = None):
        self.conf = conf
        self.g = conf.grid
        self.gp = conf.growth()
        self.dir = Path(out_dir if out_dir is not None else conf.dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.key = jax.random.key(conf.seed)
        self.obs: ObsData | None = None
        self.truth = None
        self.states: ChainState | None = None
        self.mass = None
        self.attempt_batch = 16
        self._run = None
        self._perflog = None
        from barcode_tpu.protocol import Protocols
        self._protocols = Protocols(self.dir)
        self._truth_spec = None
        self._make_jits()

    def _make_jits(self):
        """Jitted helpers (the axon TPU backend has no eager ops); rebuilt if
        setup() resolves an auto halo."""
        self._spec_jit = jax.jit(
            lambda x: fourier.measure_spectrum(x, self.g, self.conf.N_bin))
        fwd = self.conf.model.forward
        self._lag2eul_jit = jax.jit(
            lambda s: lag2eul(s, self.g, dataclasses.replace(fwd, rsd=False), self.gp))
        self._lag2eul_rsd_jit = jax.jit(
            lambda s: lag2eul(s, self.g, fwd, self.gp)) if fwd.rsd else None
        if fwd.pallas_deposit and fwd.pallas_halo > 0:
            # halo-contract monitor (x/y only — RSD shifts z): breached
            # particles silently lose their deposit (unless the tail split
            # handles them — then the monitor watches the tail capacity)
            from barcode_tpu.forward import pallas_deposit as _pd
            fwd_norsd = dataclasses.replace(fwd, rsd=False)
            self._violations_jit = jax.jit(lambda s: _pd.deposit_violations(
                lag2eul(s, self.g, fwd_norsd, self.gp, return_pos=True)[1],
                self.g, fwd.pallas_halo))
        else:
            self._violations_jit = None

    def _resolve_auto_halo(self, truth):
        """pallas_halo <= 0 -> measure the mock truth's x/y displacement
        bound (+ TSC reach + sampling margin), like bench.py's auto-halo;
        with the tail split (pallas_tail_k > 0) the quantile halo instead."""
        fwd = self.conf.model.forward
        if not (fwd.pallas_deposit and fwd.pallas_halo <= 0):
            return
        from barcode_tpu.forward import pallas_deposit as _pd
        if fwd.pallas_tail_k > 0:
            halo = _pd.displacement_halo_quantile(truth, self.g, fwd, self.gp,
                                                  fwd.pallas_tail_k)
        else:
            halo = _pd.displacement_bound_cells(truth, self.g, fwd, self.gp)
        fwd = dataclasses.replace(fwd, pallas_halo=halo)
        self.conf = dataclasses.replace(
            self.conf, model=dataclasses.replace(self.conf.model, forward=fwd))
        self._make_jits()

    # -- setup ------------------------------------------------------------

    def load_power(self):
        """readtab equivalent (calc_power.cc:31-108): CAMB table -> rfft
        grid; with readPS=false, the internal EH98 fitting-formula P(k)
        (the path the reference stubs out at main.cc:169-177)."""
        if self.conf.readPS and self.conf.fnamePS:
            k_t, p_t = bio.read_powspec_table(self.conf.fnamePS)
        else:
            from barcode_tpu import cosmo as cosmo_mod
            c = self.conf.cosmo()
            k_t = np.logspace(-4, 2, 1024)
            p_t = cosmo_mod.linear_power(c, k_t)
        return fourier.power_table_to_rfft_grid(
            jnp.asarray(k_t, jnp.float32), jnp.asarray(p_t, jnp.float32), self.g)

    def setup(self, n_chains: int | None = None):
        conf = self.conf
        # every array-producing path is jitted: the axon TPU backend has no
        # eager op support (see .claude/skills/verify/SKILL.md)
        power = jax.jit(self.load_power)()
        # powerero: the input P(k) on the (full-layout) grid, dumped once at
        # startup (main.cc:156-168 via dump_scalar after readtab)
        bio.write_array(self.dir / "powerero", np.asarray(
            jax.jit(lambda P: fourier.rfft_grid_to_full(P, self.g))(power)))
        self.key, k_mock, k_guess, k_chains = jax.random.split(self.key, 4)

        fwd_mock = conf.model.forward
        if fwd_mock.pallas_deposit and fwd_mock.pallas_halo <= 0:
            # the halo is resolved from the mock truth below — the mock
            # itself must use the XLA deposit (halo=0 would corrupt the
            # Pallas window layout)
            fwd_mock = dataclasses.replace(fwd_mock, pallas_deposit=False)
        if conf.mock.random_test:
            md = jax.jit(lambda k: mock_mod.generate(
                k, self.g, conf.mock, fwd_mock, self.gp, power,
                conf.model.likelihood, delta_min=conf.delta_min))(k_mock)
            mock_mod.validate(md, conf.model.likelihood)
            self.obs, self.truth = md.obs, md.truth_lag
            self._dump_mock(md)
        else:
            shape = self.g.shape
            win = jnp.asarray(bio.read_array(self.dir / "win", shape))
            nobs = jnp.asarray(bio.read_array(self.dir / "nobs", shape))
            sigma = jnp.asarray(bio.read_array(self.dir / "sigma", shape))
            self.obs = ObsData(nobs=nobs, window=win, noise=sigma, power=power,
                               delta_min=conf.delta_min)

        if conf.model.forward.pallas_deposit and conf.model.forward.pallas_halo <= 0:
            proxy = (self.truth if self.truth is not None else
                     jax.jit(lambda k: random_fields.grf(k, self.g, power))(
                         jax.random.key(conf.seed + 17)))
            self._resolve_auto_halo(proxy)
        conf = self.conf  # may carry the resolved halo now

        n_chains = n_chains or conf.n_chains
        init = sampler.make_init(self.g, conf.model, self.gp, conf.hmc)
        keys = jax.random.split(k_chains, n_chains)
        if conf.initial_guess in (2, 3, 4):
            # stochastic guesses are drawn per chain: over-dispersed starts
            # make the cross-chain R-hat diagnostic meaningful (the
            # single-chain reference shares one guess by construction)
            gkeys = jax.random.split(k_guess, n_chains)
            guesses = jnp.stack([self._initial_guess(k) for k in gkeys])
            self.states = jax.jit(
                lambda ks, gs, ob: jax.vmap(lambda k, gu: init(k, gu, ob))(ks, gs)
            )(keys, guesses, self.obs)
        else:
            guess = self._initial_guess(k_guess)
            self.states = jax.jit(
                lambda ks, gs, ob: jax.vmap(lambda k: init(k, gs, ob))(ks)
            )(keys, guess, self.obs)
            guesses = guess[None]
        # initial_guess field + its spectrum (barcoderunner.cc:324-329);
        # chain 0's guess carries the reference's file names
        bio.write_array(self.dir / "initial_guess", np.asarray(guesses[0]))
        km, pw, _ = self._spec_jit(guesses[0])
        bio.dump_spectrum(self.dir / "spec_initial_guess.dat", km, pw)
        self.mass = self._compute_mass()
        self._run = sampler.make_sampler(self.g, conf.model, self.gp, conf.hmc,
                                         n_attempts_per_call=self.attempt_batch)
        return self

    def _initial_guess(self, key):
        """make_initial_guess (barcoderunner.cc:207-247)."""
        conf = self.conf
        ig = conf.initial_guess
        if ig == 0:
            return jnp.zeros(self.g.shape)
        if ig == 1:
            return jnp.asarray(bio.read_array(self.dir / conf.initial_guess_file,
                                              self.g.shape))
        if ig in (2, 3):
            def make(k, P):
                s = random_fields.grf(k, self.g, P)
                if ig == 3:
                    s = fourier.smooth(s, self.g, conf.initial_guess_smoothing_scale,
                                       conf.initial_guess_smoothing_type)
                return s
            return jax.jit(make)(key, self.obs.power)
        if ig == 4:
            return jax.jit(lambda k: 0.1 * jax.random.normal(k, self.g.shape))(key)
        raise ValueError(f"invalid initial_guess {ig}")

    def _compute_mass(self):
        hc = self.conf.hmc
        force = None
        if hc.mass_type in (2, 3):
            force = self._likelihood_force(self.current_signal())
        from barcode_tpu.forward.lag2eul import kernel_h as kh
        burned_in = (self.states is not None and
                     int(self.states.accepted.min()) >= hc.s_eps_total(self.g.N))
        build = lambda P, w, n, f: mass_mod.compute_mass(
            self.g, hc.mass_type, P, nbin=self.conf.N_bin, likeli_force=f,
            mass_factor=hc.mass_factor, window=w, noise=n,
            kernel_h=kh(self.conf.model.forward, self.g), burned_in=burned_in)
        return jax.jit(build)(self.obs.power, self.obs.window, self.obs.noise,
                              force if force is not None
                              else jnp.zeros(self.g.shape))

    def _likelihood_force(self, signal):
        mc = self.conf.model
        # XLA deposit here: the force only seeds the mass-2/3 preconditioner
        # spectrum (likeli_force_mass, HMC_mass.cc:127-161), so the Pallas
        # kernels buy nothing — and skipping them avoids compiling a
        # standalone Pallas-VJP program just for the occasional massnum
        # recompute (the sharded runner does the same)
        fwd = dataclasses.replace(mc.forward, pallas_deposit=False)

        def psi_like_only(s):
            if mc.likelihood == 3:
                from barcode_tpu.model import likelihoods
                return likelihoods.grf_psi(s, self.obs)
            dx = lag2eul(mc.deltaQ_factor * s, self.g, fwd, self.gp)
            from barcode_tpu.model import likelihoods
            return likelihoods.likelihood_psi(mc.likelihood, dx, self.obs)

        return jax.jit(jax.grad(psi_like_only))(signal)

    def current_signal(self, chain: int = 0):
        return self.states.delta[chain]

    # -- outputs ----------------------------------------------------------

    def _dump_mock(self, md: mock_mod.MockData):
        g, nb = self.g, self.conf.N_bin
        bio.write_array(self.dir / "deltaLAGtest", np.asarray(md.truth_lag))
        bio.write_array(self.dir / "deltaEULtest", np.asarray(md.truth_eul))
        bio.write_array(self.dir / "win", np.asarray(md.obs.window))
        bio.write_array(self.dir / "nobs", np.asarray(md.obs.nobs))
        bio.write_array(self.dir / "sigma", np.asarray(md.obs.noise))
        for name, field in [("specLAGtest", md.truth_lag), ("specEULtest", md.truth_eul),
                            ("spec_nobs", md.obs.nobs)]:
            km, pw, _ = self._spec_jit(field)
            bio.dump_spectrum(self.dir / f"{name}.dat", km, pw)
            if name == "specLAGtest":
                self._truth_spec = np.asarray(pw)

    def dump_sample(self, iteration: int, chain: int = 0,
                    fields: bool = True, spectrum: bool = True):
        """dump_deltas + dump_ps_it (IOfunctionsGen.cc:136-171,
        IOfunctions.cc:37) + protocol rows (protocol.cc).  `fields` and
        `spectrum` carry the independent outnum / outnum_ps cadences
        (barcoderunner.cc:513-533)."""
        s = self.current_signal(chain)
        mc = self.conf.model
        if fields:
            bio.write_array(self.dir / f"deltaLAG_{iteration}", np.asarray(s))
            d_eul = self._lag2eul_jit(s)
            bio.write_array(self.dir / f"deltaEUL_{iteration}", np.asarray(d_eul))
            if mc.forward.rsd:
                d_rss = self._lag2eul_rsd_jit(s)
                bio.write_array(self.dir / f"deltaRSS_{iteration}", np.asarray(d_rss))
        if spectrum:
            km, pw, _ = self._spec_jit(s)
            bio.dump_spectrum(self.dir / f"powSpecit{iteration}.dat", km, pw)
        if fields and self._violations_jit is not None:
            nviol = int(self._violations_jit(s))
            tail_k = self.conf.model.forward.pallas_tail_k
            if tail_k > 0:
                if nviol > tail_k // 2:
                    over = " OVERFLOW: excess mass is dropped;" \
                        if nviol > tail_k else ""
                    print(f"WARNING: {nviol} halo-contract violators against "
                          f"a tail capacity of {tail_k} (pallas_tail_k) —"
                          f"{over} raise pallas_tail_k or pallas_halo")
            elif nviol:
                print(f"WARNING: {nviol} particles breach the Pallas deposit "
                      f"halo contract (pallas_halo={self.conf.model.forward.pallas_halo})"
                      " — their mass is dropped; increase pallas_halo")
        if spectrum and self._protocols is not None:
            acc = float(np.asarray(self.states.acc_flags[chain]).mean())
            resid = float(self.states.psi_like[chain]) / (self.g.N / 2.0)
            self._protocols.log_convergence(iteration, resid, acc)
            self._protocols.log_spectrum(iteration, km, pw, self._truth_spec)

    def _log_attempts(self, stats):
        """Append chain-0 rows to performance_log.txt (HMC.cc:40-60 format)."""
        if self._perflog is None:
            path = self.dir / "performance_log.txt"
            new = not path.exists()
            self._perflog = open(path, "a")
            if new:
                self._perflog.write("# " + "\t".join(PERFLOG_COLUMNS) + "\n")
        rows = np.column_stack([np.asarray(getattr(stats, c))[:, 0] for c in PERFLOG_COLUMNS])
        for r in rows:
            self._perflog.write("\t".join(f"{v:.6g}" for v in r) + "\n")
        self._perflog.flush()

    # -- sampling loop ----------------------------------------------------

    def run(self, n_samples: int | None = None, max_attempts: int = 10**9,
            log: bool = True, progress_every: int = 10,
            nan_check: bool = False, rhat_stop: float | None = None,
            dashboard: bool | None = None):
        """Sample until every chain has >= n_samples accepted samples (the
        reference's N_Gibbs), dumping chain-0 fields every `outnum` samples.

        nan_check=True aborts on non-finite sampler state (the reference's
        NAN_DETECTION FPE trap, main.cc:46-78).

        rhat_stop: if set, also stop once the split Gelman-Rubin R-hat of the
        per-chain psi traces (second half, warmup discarded) drops below this
        threshold with every chain holding at least one accepted sample — a
        convergence criterion the single-chain reference cannot express.

        dashboard: live ANSI candidate table (the ncurses UI equivalent,
        utils/dashboard.py); None = auto-enable on a TTY."""
        from barcode_tpu.utils.dashboard import Dashboard
        from barcode_tpu.utils.metrics import (SamplerMetrics, check_finite,
                                               split_rhat)

        conf = self.conf
        n_samples = n_samples if n_samples is not None else conf.N_Gibbs
        # samples 1-10 always dump fields AND spectra; afterwards fields
        # follow outnum and spectra follow their own outnum_ps cadence
        # (barcoderunner.cc:513-533); the cursor persists across segmented
        # run() calls
        dump_cursor = getattr(self, "_dump_cursor", 0)
        attempts_done = 0
        # metrics/traces persist across segmented run() calls (long runs are
        # driven in wall-clock segments; diagnostics should span them all)
        if getattr(self, "metrics", None) is None:
            self.metrics = SamplerMetrics()
        if getattr(self, "_psi_trace", None) is None:
            self._psi_trace: list[np.ndarray] = []
            # wall-clock stamp per trace row: diagnostics() divides the ESS of
            # the post-warmup half by the time that half actually took, not by
            # a guessed fraction of the total
            self._trace_t: list[float] = []
        dash = Dashboard(title=f"barcode_tpu  N={self.g.N1}  "
                         f"L={self.g.L1:g}", force=dashboard)
        rhat = float("inf")
        while attempts_done < max_attempts:
            if (self.dir / "fastexit").exists():
                print("fastexit sentinel found — stopping cleanly")
                break
            self.states, stats = self._run(self.states, self.obs, self.mass)
            attempts_done += self.attempt_batch
            self.metrics.update(stats)
            self._psi_trace.append(np.asarray(self.states.psi))
            self._trace_t.append(time.time())
            if nan_check:
                check_finite(self.states, f"after attempt {attempts_done}")
            if log:
                self._log_attempts(stats)
            acc0 = int(self.states.accepted[0])
            for i in range(dump_cursor + 1, min(acc0, n_samples) + 1):
                wf = i <= 10 or (conf.outnum > 0 and i % conf.outnum == 0)
                wp = i <= 10 or (conf.outnum_ps > 0 and i % conf.outnum_ps == 0)
                if wf or wp:
                    self.dump_sample(i, fields=wf, spectrum=wp)
            dump_cursor = max(dump_cursor, min(acc0, n_samples))
            self._dump_cursor = dump_cursor
            # mass recompute cadence (Hamiltonian_mass reload, HMC.cc:387-424;
            # massnum_burn before / massnum_post after burn-in, 0 = never).
            # Only the signal-dependent masses (likelihood-force types) change.
            if conf.hmc.mass_type in (2, 3, 60):
                burned = acc0 >= conf.hmc.s_eps_total(self.g.N)
                cadence = (conf.hmc.massnum_post if burned
                           else conf.hmc.massnum_burn)
                last = getattr(self, "_mass_at_sample", 0)
                if cadence > 0 and acc0 - last >= cadence:
                    self.mass = self._compute_mass()
                    self._mass_at_sample = acc0
            min_acc = int(self.states.accepted.min())
            # itmax: attempt cap per sample (HMC.cc:431).  The reference
            # never aborts on it — security_recursion re-enters
            # HamiltonianMC, whose first act is to recompute/reload the mass
            # (sample_maker.cc:17-34, HMC.cc:387-424).  Emulate: when the
            # slowest chain stalls for itmax attempts, recompute the mass
            # and continue.
            if conf.hmc.itmax > 0:
                if min_acc > getattr(self, "_stall_acc", -1):
                    self._stall_acc = min_acc
                    self._stall_attempts = 0
                else:
                    self._stall_attempts = (getattr(self, "_stall_attempts", 0)
                                            + self.attempt_batch)
                    if self._stall_attempts >= conf.hmc.itmax:
                        if log:
                            print(f"itmax={conf.hmc.itmax} attempts without "
                                  "an accepted sample — recomputing the mass "
                                  "and retrying (security_recursion, "
                                  "sample_maker.cc:17-34)")
                        self.mass = self._compute_mass()
                        self._stall_attempts = 0
            if dash.enabled:
                dash.update(stats, self.states, self.metrics.summary(),
                            extra=f"rhat={rhat:.3f}" if np.isfinite(rhat) else "")
            elif log and attempts_done % (self.attempt_batch * progress_every) == 0:
                print(self.metrics.status_line(
                    f"acc_min={min_acc} eps_fac={float(self.states.eps_fac.mean()):.4g}"))
            if min_acc >= n_samples:
                break
            if rhat_stop is not None and len(self._psi_trace) >= 8 and min_acc >= 1:
                trace = np.stack(self._psi_trace, axis=1)  # [chains, draws]
                rhat = split_rhat(trace[:, trace.shape[1] // 2:])
                if rhat < rhat_stop:
                    if log:
                        print(f"converged: split R-hat {rhat:.4f} < {rhat_stop}"
                              f" after {attempts_done} attempts")
                    break
            if conf.hmc.total_steps_lim and attempts_done >= conf.hmc.total_steps_lim:
                raise RuntimeError("ABORTING: total steps exceeds total_steps_lim "
                                   "(HMC.cc:533-535)")
        return self.states

    def diagnostics(self) -> dict:
        """End-of-run diagnostics: throughput metrics + cross-chain split
        R-hat on the per-chain psi traces (warmup half discarded) — the
        convergence view the single-chain reference cannot produce."""
        from barcode_tpu.utils.metrics import split_rhat

        out = dict(self.metrics.summary()) if hasattr(self, "metrics") else {}
        if self.states is not None:
            out["acc_rate_recent"] = float(
                np.asarray(self.states.acc_flags).mean())
            out["eps_fac"] = np.asarray(self.states.eps_fac).tolist()
            out["accepted_per_chain"] = np.asarray(self.states.accepted).tolist()
        if getattr(self, "_psi_trace", None) and len(self._psi_trace) >= 4:
            from barcode_tpu.utils.metrics import effective_sample_size
            trace = np.stack(self._psi_trace, axis=1)
            half_ix = trace.shape[1] // 2
            half = trace[:, half_ix:]
            out["rhat_psi"] = split_rhat(half)
            ess = sum(effective_sample_size(row) for row in half)
            out["ess_psi"] = ess
            # ESS/s over the wall-clock span the measured half actually took
            # (per-row timestamps recorded in run(); spans any host work
            # between segments honestly)
            ts = getattr(self, "_trace_t", [])
            if len(ts) == trace.shape[1] and half_ix >= 1:
                span = ts[-1] - ts[half_ix - 1]
            elif "elapsed_s" in out:
                span = 0.5 * out["elapsed_s"]  # legacy traces without stamps
            else:
                span = 0.0
            if span > 0:
                out["ess_psi_per_s"] = ess / span
        return out

    # -- checkpoint / resume ----------------------------------------------

    @staticmethod
    def _is_key(leaf) -> bool:
        return jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)

    def checkpoint(self, path=None):
        path = Path(path or (self.dir / "checkpoint.npz"))
        leaves, _ = jax.tree_util.tree_flatten(self.states)
        arrs, key_ix = {}, []
        for i, leaf in enumerate(leaves):
            if self._is_key(leaf):
                arrs[f"leaf_{i}"] = np.asarray(jax.random.key_data(leaf))
                key_ix.append(i)
            else:
                arrs[f"leaf_{i}"] = np.asarray(leaf)
        np.savez(path, **arrs)
        meta = {"n_leaves": len(leaves), "key_leaves": key_ix,
                "conf_seed": self.conf.seed, "grid": [self.g.N1, self.g.L1],
                # resume must not re-dump already-dumped samples
                "dump_cursor": getattr(self, "_dump_cursor", 0),
                "mass_at_sample": getattr(self, "_mass_at_sample", 0)}
        path.with_suffix(".json").write_text(json.dumps(meta))
        if self._protocols is not None and self.states is not None:
            self._protocols.write_restart_marker(int(self.states.accepted.min()))
        return path

    def restore(self, path=None):
        path = Path(path or (self.dir / "checkpoint.npz"))
        data = np.load(path)
        meta = json.loads(path.with_suffix(".json").read_text())
        key_ix = set(meta["key_leaves"])
        leaves, treedef = jax.tree_util.tree_flatten(self.states)
        new_leaves = [
            jax.random.wrap_key_data(jnp.asarray(data[f"leaf_{i}"]))
            if i in key_ix else jnp.asarray(data[f"leaf_{i}"])
            for i in range(len(leaves))
        ]
        self.states = jax.tree_util.tree_unflatten(treedef, new_leaves)
        self._dump_cursor = int(meta.get("dump_cursor", 0))
        self._mass_at_sample = int(meta.get("mass_at_sample", 0))
        return self

    def _replay_perflog(self):
        return replay_perflog(self.dir, self.conf.hmc, self.g.N)

    def restore_from_dumps(self, iteration: int):
        """File-based restart without a checkpoint (main.cc:121-131,
        load_initial_fields barcoderunner.cc:284-344): resume from the
        dumped deltaLAG_<iteration> field (win/nobs/sigma were already
        loaded by setup()).  Chain 0 resumes the dumped sample exactly;
        other chains keep their re-dispersed initial guesses (they restart
        their own trajectories — the multi-chain generalization of the
        single-chain reference resume).  The adaptive-eps controller state
        is reconstructed by replaying performance_log.txt (§3.5)."""
        from barcode_tpu.model.posterior import make_psi_force

        s0 = jnp.asarray(bio.read_array(self.dir / f"deltaLAG_{iteration}",
                                        self.g.shape))
        delta = self.states.delta.at[0].set(s0)
        vag = make_psi_force(self.g, self.conf.model, self.gp, self.obs)
        (psi, (pp, pl)), grad = jax.jit(jax.vmap(vag))(delta)
        n_chains = delta.shape[0]
        rep = self._replay_perflog()
        st = dataclasses.replace(
            self.states, delta=delta, psi=psi, psi_prior=pp, psi_like=pl,
            grad=grad,
            accepted=jnp.full(n_chains, iteration, jnp.int32))
        if rep is not None:
            bc = lambda x: jnp.broadcast_to(jnp.asarray(x), (n_chains,)
                                            + jnp.asarray(x).shape)
            st = dataclasses.replace(
                st,
                eps_fac=jnp.full(n_chains, rep["eps_fac"], jnp.float32),
                acc_flags=bc(rep["acc_flags"]).astype(jnp.int32),
                eps_table=bc(rep["eps_table"]).astype(jnp.float32),
                count_attempts=jnp.full(n_chains, rep["count_attempts"],
                                        jnp.int32),
                rejections=jnp.full(n_chains, rep["rejections"], jnp.int32),
                got_first_accept=jnp.full(n_chains, rep["got_first_accept"],
                                          bool))
        self.states = st
        self._dump_cursor = iteration
        return self

def replay_perflog(run_dir: Path, hc, N: int):
    """Reconstruct the adaptive-eps state from performance_log.txt —
    the reference's restart path (barcoderunner.cc:408-479): rejection
    count and the (accepted, epsilon) circular tables are replayed
    exactly; eps_fac is the max epsilon among recently *accepted*
    attempts (the reference's own approximation for controllers 2/3,
    barcoderunner.cc:449-473).  Returns None when no log exists.
    Shared by Runner and parallel.sharded_runner.ShardedRunner."""
    path = Path(run_dir) / "performance_log.txt"
    if not path.exists():
        return None
    rows = []
    for line in path.read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split("\t")
        rows.append((float(parts[0]), float(parts[1])))  # accepted, eps
    if not rows:
        return None
    n_a = hc.N_a_eps_update
    acc = np.zeros(n_a, np.int32)
    eps = np.full(n_a, hc.eps_fac_start(N), np.float32)
    for t, (a, e) in enumerate(rows):
        acc[t % n_a] = int(a)
        eps[t % n_a] = e
    recent = rows[-n_a:]
    acc_eps = [e for a, e in recent if a > 0]
    eps_fac = max(acc_eps) if acc_eps else float(eps.max())
    return {
        "count_attempts": len(rows),
        "rejections": len(rows) - sum(int(a) for a, _ in rows),
        "acc_flags": acc,
        "eps_table": eps,
        "eps_fac": eps_fac,
        "got_first_accept": any(a > 0 for a, _ in rows),
    }
