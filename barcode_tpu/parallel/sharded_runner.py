"""Runner-level config-5 sampling mode: HMC on the ('chains','grid') mesh.

The session-level counterpart of runner.Runner for grids that exceed one
chip (BASELINE ladder config 5): mock/observed-data setup, per-chain initial
guesses, batched on-device sharded attempts (parallel/sharded_sampler.py —
the adaptive-eps controllers run INSIDE the jitted attempt since round 4,
so a dispatch covers attempt_batch attempts with no host round-trip),
full 12-column performance logging, deltaLAG/EUL/RSS + spectrum dumps on
the outnum/outnum_ps cadences, protocol files, R-hat/ESS diagnostics and a
single-file checkpoint — the same surface as the dense Runner.

Parity: this covers the barcoderunner Gibbs loop responsibilities
(/root/reference/barlib/src/barcoderunner.cc:364-544) for the sharded
engine; the reference itself has no distributed mode of any kind
(SURVEY.md §2.12/§5.7), so the mesh layout here is new TPU-native design:
chains are data-parallel over the 'chains' axis, every field is x-slab
sharded over the 'grid' axis, and the posterior gradient flows through the
sharded FFT / halo-exchange deposit pipeline.

Scope notes (documented limits, not silent gaps):
  * Fourier-space masses only (mass types 1/2/3/4) — the sharded attempt
    applies M^-1 as a spectral multiply; the likelihood-force spectra of
    types 2/3 are built once at setup from the dense chain-0 guess (the
    massnum recompute cadence stays a dense-runner feature).
  * Mock generation and dumps run dense on the host at setup/output time
    (one-off, not in the sampling hot path).
  * ForwardConfig.pallas_deposit routes the sharded deposit through the
    Pallas slab kernels (7.9x the XLA windowed scatter at 256^3 on v5e);
    halo=None resolves to the measured displacement bound of the mock
    truth when available, else suggest_halo.
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from barcode_tpu import io as bio
from barcode_tpu import mock as mock_mod
from barcode_tpu import random_fields
from barcode_tpu.config import RunConfig
from barcode_tpu.grid import fourier
from barcode_tpu.hmc import mass as mass_mod
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.parallel import sharded_forward as sfw
from barcode_tpu.parallel import sharded_sampler as ss
from barcode_tpu.parallel.sharded_forward import AXIS
from barcode_tpu.runner import PERFLOG_COLUMNS


def default_mesh(n_chains: int) -> Mesh:
    """All local devices as a (chains, grid) grid — grid axis gets the rest."""
    devs = np.asarray(jax.devices())
    if len(devs) % n_chains != 0:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"{n_chains} chains")
    return Mesh(devs.reshape(n_chains, -1), axis_names=("chains", AXIS))


class ShardedRunner:
    def __init__(self, conf: RunConfig, mesh: Mesh | None = None,
                 out_dir: str | None = None, halo: int | None = None):
        if conf.hmc.mass_type not in (1, 2, 3, 4):
            raise ValueError("sharded mode supports Fourier-space masses "
                             f"(mass_type 1/2/3/4), got {conf.hmc.mass_type}")
        self.conf = conf
        self.g = conf.grid
        self.gp = conf.growth()
        self.mesh = mesh if mesh is not None else default_mesh(conf.n_chains)
        self.n_chains = self.mesh.shape["chains"]
        self.halo = halo
        self.dir = Path(out_dir if out_dir is not None else conf.dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.key = jax.random.key(conf.seed)
        self.obs = None          # dense ObsData (host/setup copy)
        self.obs_sh = None       # sharded layout
        self.truth = None
        self.state = None        # sharded chain-state dict
        self.mass_f = None       # sharded FS mass spectrum
        self.attempt_batch = 16
        self._run = None
        self._perflog = None
        self._dump_cursor = 0
        self._truth_spec = None
        self._spec_jit = jax.jit(
            lambda x: fourier.measure_spectrum(x, self.g, self.conf.N_bin))
        from barcode_tpu.protocol import Protocols
        self._protocols = Protocols(self.dir)

    # -- setup -------------------------------------------------------------

    def _load_power(self):
        if self.conf.readPS and self.conf.fnamePS:
            k_t, p_t = bio.read_powspec_table(self.conf.fnamePS)
        else:
            from barcode_tpu import cosmo as cosmo_mod
            c = self.conf.cosmo()
            k_t = np.logspace(-4, 2, 1024)
            p_t = cosmo_mod.linear_power(c, k_t)
        return fourier.power_table_to_rfft_grid(
            jnp.asarray(k_t, jnp.float32), jnp.asarray(p_t, jnp.float32),
            self.g)

    def _initial_guess(self, key, power):
        """make_initial_guess (barcoderunner.cc:207-247), dense at setup."""
        conf, ig = self.conf, self.conf.initial_guess
        if ig == 0:
            return jnp.zeros(self.g.shape)
        if ig == 1:
            return jnp.asarray(bio.read_array(
                self.dir / conf.initial_guess_file, self.g.shape))
        if ig in (2, 3):
            def make(k):
                s = random_fields.grf(k, self.g, power)
                if ig == 3:
                    s = fourier.smooth(s, self.g,
                                       conf.initial_guess_smoothing_scale,
                                       conf.initial_guess_smoothing_type)
                return s
            return jax.jit(make)(key)
        if ig == 4:
            return jax.jit(
                lambda k: 0.1 * jax.random.normal(k, self.g.shape))(key)
        raise ValueError(f"invalid initial_guess {ig}")

    def setup(self):
        conf = self.conf
        g, gp, mesh = self.g, self.gp, self.mesh
        fc = conf.model.forward
        power = jax.jit(self._load_power)()
        self.key, k_mock, k_guess, k_chains = jax.random.split(self.key, 4)

        fc_mock = fc
        if fc.pallas_deposit:
            # the mock runs the DENSE forward at setup; the Pallas halo may
            # still be unresolved (<= 0) here, so use the XLA deposit
            fc_mock = dataclasses.replace(fc, pallas_deposit=False)
        if conf.mock.random_test:
            md = jax.jit(lambda k: mock_mod.generate(
                k, g, conf.mock, fc_mock, gp, power, conf.model.likelihood,
                delta_min=conf.delta_min))(k_mock)
            mock_mod.validate(md, conf.model.likelihood)
            self.obs, self.truth = md.obs, md.truth_lag
            bio.write_array(self.dir / "deltaLAGtest", np.asarray(md.truth_lag))
            bio.write_array(self.dir / "deltaEULtest", np.asarray(md.truth_eul))
            bio.write_array(self.dir / "win", np.asarray(md.obs.window))
            bio.write_array(self.dir / "nobs", np.asarray(md.obs.nobs))
            bio.write_array(self.dir / "sigma", np.asarray(md.obs.noise))
            km, pw, _ = self._spec_jit(md.truth_lag)
            bio.dump_spectrum(self.dir / "specLAGtest.dat", km, pw)
            self._truth_spec = np.asarray(pw)
        else:
            shape = g.shape
            win = jnp.asarray(bio.read_array(self.dir / "win", shape))
            nobs = jnp.asarray(bio.read_array(self.dir / "nobs", shape))
            sigma = jnp.asarray(bio.read_array(self.dir / "sigma", shape))
            self.obs = ObsData(nobs=nobs, window=win, noise=sigma,
                               power=power, delta_min=conf.delta_min)
        self.obs_sh = sfw.shard_obs_chains(self.obs, mesh)

        # dense lag2eul jits for the deltaEUL/RSS dumps (output-time only)
        from barcode_tpu.forward.lag2eul import lag2eul
        self._lag2eul_jit = jax.jit(
            lambda s: lag2eul(s, g, dataclasses.replace(
                fc, rsd=False, pallas_deposit=False), gp))
        self._lag2eul_rsd_jit = jax.jit(
            lambda s: lag2eul(s, g, dataclasses.replace(
                fc, pallas_deposit=False), gp)) if fc.rsd else None

        # auto-halo: with the Pallas slab deposit the kernel cost scales
        # ~linearly with the halo, so measure the true displacement bound
        # from the mock truth instead of the a-priori sigma formula.  With
        # the tail split (pallas_tail_k > 0) the bound stays the ppermute
        # EXCHANGE margin while the kernels run at the quantile halo
        # (fc.pallas_halo), the slab twin of the round-4 dense split
        # (sharded_forward._make_pallas_slab_deposit).
        if self.truth is not None:
            from barcode_tpu.forward import pallas_deposit as _pd
            if self.halo is None:
                # measured bound for the XLA slab path too: the a-priori
                # sigma formula (suggest_halo) oversizes ~2.5x and can
                # exceed the slab width on small grids
                self.halo = _pd.displacement_bound_cells(self.truth, g, fc, gp)
        if getattr(fc, "pallas_deposit", False) and self.truth is not None:
            from barcode_tpu.forward import pallas_deposit as _pd
            if fc.pallas_tail_k > 0 and fc.pallas_halo <= 0:
                fc = dataclasses.replace(fc, pallas_halo=(
                    _pd.displacement_halo_quantile(self.truth, g, fc, gp,
                                                   fc.pallas_tail_k)))
                self.conf = dataclasses.replace(
                    conf, model=dataclasses.replace(conf.model, forward=fc))
                conf = self.conf
        if getattr(fc, "pallas_deposit", False) and fc.pallas_halo > 0:
            # kernel-halo contract monitor at dump time (runner.py twin):
            # with the tail split it watches the tail capacity instead
            from barcode_tpu.forward import pallas_deposit as _pd
            from barcode_tpu.forward.lag2eul import lag2eul as _l2e
            fc_norsd = dataclasses.replace(fc, rsd=False,
                                           pallas_deposit=False)
            self._violations_jit = jax.jit(lambda s: _pd.deposit_violations(
                _l2e(s, g, fc_norsd, gp, return_pos=True)[1], g,
                fc.pallas_halo))
        else:
            self._violations_jit = None

        # per-chain over-dispersed starts (stochastic guesses), as in
        # runner.Runner.setup
        if conf.initial_guess in (2, 3, 4):
            gkeys = jax.random.split(k_guess, self.n_chains)
            batch = jnp.stack([self._initial_guess(k, power) for k in gkeys])
        else:
            batch = jnp.stack([self._initial_guess(k_guess, power)]
                              * self.n_chains)
        bio.write_array(self.dir / "initial_guess", np.asarray(batch[0]))
        km, pw, _ = self._spec_jit(batch[0])
        bio.dump_spectrum(self.dir / "spec_initial_guess.dat", km, pw)
        batch = jax.device_put(
            batch, NamedSharding(mesh, P("chains", AXIS, None, None)))

        vg = sfw.make_sharded_psi_vg_chains(
            g, fc, gp, conf.model.likelihood, mesh, halo=self.halo)
        (vals, aux), grads = vg(batch, self.obs_sh)
        self._vg = vg

        seeds = (conf.seed + 1 + jnp.arange(self.n_chains)).astype(jnp.uint32)
        eps0 = jnp.full(self.n_chains, conf.hmc.eps_fac_start(g.N),
                        jnp.float32)
        self.state = ss.shard_chain_state(
            ss.init_chain_state(batch, vals, aux, grads, seeds, eps0,
                                conf.hmc), mesh)

        # FS mass; likelihood-force types (2/3) build their force spectrum
        # from the dense chain-0 signal (likeli_force_mass semantics,
        # HMC_mass.cc:127-161) and are recomputed on the massnum cadence
        # during run() exactly like the dense runner (HMC.cc:387-424)
        self._power = power
        self.mass_f = self._compute_mass_f(np.asarray(batch[0]))

        self._run = ss.make_sharded_sampler(
            g, fc, gp, conf.model.likelihood, conf.hmc, mesh, halo=self.halo,
            n_attempts_per_call=self.attempt_batch)
        return self

    def _compute_mass_f(self, signal=None):
        """Build (or rebuild) the sharded FS mass spectrum.  For the
        likelihood-force mass types (2/3) the force is evaluated densely on
        `signal` (default: the current chain-0 delta) — the sharded twin of
        Runner._compute_mass / likeli_force_mass (HMC_mass.cc:127-161)."""
        conf, g, gp = self.conf, self.g, self.gp
        fc = conf.model.forward
        if signal is None:
            signal = np.asarray(self.state["delta"][0])
        force = None
        if conf.hmc.mass_type in (2, 3):
            mc = conf.model

            def psi_like_only(s):
                from barcode_tpu.model import likelihoods
                if mc.likelihood == 3:
                    return likelihoods.grf_psi(s, self.obs)
                from barcode_tpu.forward.lag2eul import lag2eul as l2e
                dx = l2e(mc.deltaQ_factor * s, g, dataclasses.replace(
                    fc, pallas_deposit=False), gp)
                return likelihoods.likelihood_psi(mc.likelihood, dx, self.obs)

            force = jax.jit(jax.grad(psi_like_only))(jnp.asarray(signal))
        from barcode_tpu.forward.lag2eul import kernel_h as kh
        mass = jax.jit(lambda P_, f: mass_mod.compute_mass(
            g, conf.hmc.mass_type, P_, nbin=conf.N_bin, likeli_force=f,
            mass_factor=conf.hmc.mass_factor, window=self.obs.window,
            noise=self.obs.noise, kernel_h=kh(fc, g)))(
                self._power, force if force is not None
                else jnp.zeros(g.shape))
        return jax.device_put(
            mass.mass_f, NamedSharding(self.mesh, P(None, AXIS, None)))

    # -- outputs -------------------------------------------------------------

    def _log_attempts(self, stats):
        """Chain-0 rows of the full 12-column performance_log.txt
        (HMC.cc:40-60 format, as runner.Runner._log_attempts)."""
        if self._perflog is None:
            path = self.dir / "performance_log.txt"
            new = not path.exists()
            self._perflog = open(path, "a")
            if new:
                self._perflog.write("# " + "\t".join(PERFLOG_COLUMNS) + "\n")
        rows = np.column_stack([np.asarray(getattr(stats, c))[:, 0]
                                for c in PERFLOG_COLUMNS])
        for r in rows:
            self._perflog.write("\t".join(f"{v:.6g}" for v in r) + "\n")
        self._perflog.flush()

    def dump_sample(self, iteration: int, chain: int = 0,
                    fields: bool = True, spectrum: bool = True):
        """deltaLAG/EUL(/RSS) + powSpecit + protocol rows, as the dense
        runner (dump_deltas IOfunctionsGen.cc:136-171, dump_ps_it
        IOfunctions.cc:37, protocol.cc)."""
        s = jnp.asarray(np.asarray(self.state["delta"][chain]))
        if fields:
            bio.write_array(self.dir / f"deltaLAG_{iteration}", np.asarray(s))
            d_eul = self._lag2eul_jit(s)
            bio.write_array(self.dir / f"deltaEUL_{iteration}",
                            np.asarray(d_eul))
            if self._lag2eul_rsd_jit is not None:
                d_rss = self._lag2eul_rsd_jit(s)
                bio.write_array(self.dir / f"deltaRSS_{iteration}",
                                np.asarray(d_rss))
        if fields and getattr(self, "_violations_jit", None) is not None:
            nviol = int(self._violations_jit(s))
            tail_k = self.conf.model.forward.pallas_tail_k
            if tail_k > 0:
                if nviol > tail_k // 2:
                    over = " OVERFLOW: excess mass is dropped;" \
                        if nviol > tail_k else ""
                    print(f"WARNING: {nviol} kernel-halo violators against "
                          f"a tail capacity of {tail_k} (pallas_tail_k) —"
                          f"{over} raise pallas_tail_k or pallas_halo")
            elif nviol:
                print(f"WARNING: {nviol} particles breach the slab kernel "
                      f"halo contract (pallas_halo="
                      f"{self.conf.model.forward.pallas_halo}) — their mass "
                      "is dropped; increase pallas_halo")
        if spectrum:
            km, pw, _ = self._spec_jit(s)
            bio.dump_spectrum(self.dir / f"powSpecit{iteration}.dat", km, pw)
            if self._protocols is not None:
                acc = float(np.asarray(self.state["acc_flags"][chain]).mean())
                resid = float(np.asarray(self.state["psi_like"][chain])) / \
                    (self.g.N / 2.0)
                self._protocols.log_convergence(iteration, resid, acc)
                self._protocols.log_spectrum(iteration, km, pw,
                                             self._truth_spec)

    # -- sampling loop -------------------------------------------------------

    def run(self, n_samples: int | None = None, max_attempts: int = 10**9,
            log: bool = True, progress_every: int = 10,
            rhat_stop: float | None = None, dashboard: bool | None = None,
            nan_check: bool = False):
        """Sample until every chain holds >= n_samples accepted samples,
        with the same loop surface as runner.Runner.run: attempt batches on
        device, metrics/psi traces, outnum/outnum_ps dump cadences, itmax
        stall warning, massnum mass-recompute cadence (types 2/3), optional
        cross-chain R-hat stop, NaN abort, live ANSI dashboard (None =
        auto-enable on a TTY)."""
        from barcode_tpu.utils.dashboard import Dashboard
        from barcode_tpu.utils.metrics import (SamplerMetrics, check_finite,
                                               split_rhat)

        conf = self.conf
        n_samples = n_samples if n_samples is not None else conf.N_Gibbs
        attempts = 0
        if getattr(self, "metrics", None) is None:
            self.metrics = SamplerMetrics()
        if getattr(self, "_psi_trace", None) is None:
            self._psi_trace = []
            self._trace_t = []  # per-row wall stamps (see Runner.diagnostics)
        dash = Dashboard(title=f"barcode_tpu sharded  N={self.g.N1}  "
                         f"mesh={dict(self.mesh.shape)}", force=dashboard)
        rhat = float("inf")
        while attempts < max_attempts:
            if (self.dir / "fastexit").exists():
                print("fastexit sentinel found — stopping cleanly")
                break
            self.state, stats = self._run(self.state, self.obs_sh,
                                          self.mass_f)
            attempts += self.attempt_batch
            self.metrics.update(stats)
            self._psi_trace.append(np.asarray(self.state["psi"]))
            self._trace_t.append(time.time())
            if nan_check:
                check_finite({k: v for k, v in self.state.items()
                              if k != "key_data"},
                             f"after attempt {attempts}")
            if log:
                self._log_attempts(stats)
            acc0 = int(np.asarray(self.state["accepted"])[0])
            # mass recompute cadence (HMC.cc:387-424): only the
            # signal-dependent likelihood-force masses change
            if conf.hmc.mass_type in (2, 3):
                burned = acc0 >= conf.hmc.s_eps_total(self.g.N)
                cadence = (conf.hmc.massnum_post if burned
                           else conf.hmc.massnum_burn)
                last = getattr(self, "_mass_at_sample", 0)
                if cadence > 0 and acc0 - last >= cadence:
                    self.mass_f = self._compute_mass_f()
                    self._mass_at_sample = acc0
            for i in range(self._dump_cursor + 1,
                           min(acc0, n_samples) + 1):
                wf = i <= 10 or (conf.outnum > 0 and i % conf.outnum == 0)
                wp = i <= 10 or (conf.outnum_ps > 0
                                 and i % conf.outnum_ps == 0)
                if wf or wp:
                    self.dump_sample(i, fields=wf, spectrum=wp)
            self._dump_cursor = max(self._dump_cursor, min(acc0, n_samples))
            min_acc = int(np.asarray(self.state["accepted"]).min())
            # itmax stall guard (HMC.cc:431; FS masses are signal-free, so
            # the security_recursion mass recompute is a no-op here — warn)
            if conf.hmc.itmax > 0:
                if min_acc > getattr(self, "_stall_acc", -1):
                    self._stall_acc = min_acc
                    self._stall_attempts = 0
                else:
                    self._stall_attempts = (
                        getattr(self, "_stall_attempts", 0)
                        + self.attempt_batch)
                    if self._stall_attempts >= conf.hmc.itmax:
                        if log:
                            print(f"itmax={conf.hmc.itmax} attempts without "
                                  "an accepted sample — continuing "
                                  "(security_recursion semantics)")
                        self._stall_attempts = 0
            if dash.enabled:
                from types import SimpleNamespace
                dash.update(stats, SimpleNamespace(
                    eps_fac=self.state["eps_fac"],
                    accepted=self.state["accepted"]),
                    self.metrics.summary(),
                    extra=f"rhat={rhat:.3f}" if np.isfinite(rhat) else "")
            elif log and attempts % (self.attempt_batch * progress_every) == 0:
                print(self.metrics.status_line(
                    f"acc_min={min_acc} eps_fac="
                    f"{float(np.asarray(self.state['eps_fac']).mean()):.4g}"))
            if min_acc >= n_samples:
                break
            if rhat_stop is not None and len(self._psi_trace) >= 8 \
                    and min_acc >= 1:
                trace = np.stack(self._psi_trace, axis=1)
                rhat = split_rhat(trace[:, trace.shape[1] // 2:])
                if rhat < rhat_stop:
                    if log:
                        print(f"converged: split R-hat {rhat:.4f} < "
                              f"{rhat_stop} after {attempts} attempts")
                    break
            if conf.hmc.total_steps_lim and attempts >= conf.hmc.total_steps_lim:
                raise RuntimeError("ABORTING: total steps exceeds "
                                   "total_steps_lim (HMC.cc:533-535)")
        return self.state

    def diagnostics(self) -> dict:
        """Throughput metrics + cross-chain split R-hat / ESS of the psi
        traces — same surface as runner.Runner.diagnostics."""
        from barcode_tpu.utils.metrics import split_rhat

        out = dict(self.metrics.summary()) if hasattr(self, "metrics") else {}
        if self.state is not None:
            out["acc_rate_recent"] = float(
                np.asarray(self.state["acc_flags"]).mean())
            out["eps_fac"] = np.asarray(self.state["eps_fac"]).tolist()
            out["accepted_per_chain"] = np.asarray(
                self.state["accepted"]).tolist()
        if getattr(self, "_psi_trace", None) and len(self._psi_trace) >= 4:
            from barcode_tpu.utils.metrics import effective_sample_size
            trace = np.stack(self._psi_trace, axis=1)
            half_ix = trace.shape[1] // 2
            half = trace[:, half_ix:]
            out["rhat_psi"] = split_rhat(half)
            ess = sum(effective_sample_size(row) for row in half)
            out["ess_psi"] = ess
            # ESS/s over the measured half's actual wall span (see Runner)
            ts = getattr(self, "_trace_t", [])
            if len(ts) == trace.shape[1] and half_ix >= 1:
                span = ts[-1] - ts[half_ix - 1]
                if span > 0:
                    out["ess_psi_per_s"] = ess / span
        return out

    # -- checkpoint / resume --------------------------------------------------

    def checkpoint(self, path=None):
        path = Path(path or (self.dir / "checkpoint_sharded.npz"))
        arrs = {f"state_{k}": np.asarray(v) for k, v in self.state.items()}
        np.savez(path, **arrs)
        path.with_suffix(".json").write_text(json.dumps(
            {"dump_cursor": self._dump_cursor, "seed": self.conf.seed}))
        if self._protocols is not None and self.state is not None:
            self._protocols.write_restart_marker(
                int(np.asarray(self.state["accepted"]).min()))
        return path

    def restore(self, path=None):
        path = Path(path or (self.dir / "checkpoint_sharded.npz"))
        data = np.load(path)
        meta = json.loads(path.with_suffix(".json").read_text())
        state = {k[len("state_"):]: jnp.asarray(v) for k, v in data.items()
                 if k.startswith("state_")}
        self.state = ss.shard_chain_state(state, self.mesh)
        self._dump_cursor = int(meta.get("dump_cursor",
                                         meta.get("next_dump", 1) - 1))
        return self

    def restore_from_dumps(self, iteration: int):
        """File-based restart without a checkpoint — the sharded twin of
        Runner.restore_from_dumps (reference semantics main.cc:121-131,
        load_initial_fields barcoderunner.cc:284-344): chain 0 resumes the
        dumped deltaLAG_<iteration> exactly, other chains keep their setup
        guesses; psi/grads are recomputed through the sharded posterior;
        the adaptive-eps controller state is replayed from
        performance_log.txt (runner.replay_perflog)."""
        from barcode_tpu.runner import replay_perflog

        s0 = bio.read_array(self.dir / f"deltaLAG_{iteration}", self.g.shape)
        delta = np.asarray(self.state["delta"]).copy()
        delta[0] = s0
        batch = jax.device_put(
            jnp.asarray(delta),
            NamedSharding(self.mesh, P("chains", AXIS, None, None)))
        (vals, (pp, pl)), grads = self._vg(batch, self.obs_sh)
        nc = self.n_chains
        state = dict(self.state)
        state.update(delta=batch, psi=vals, psi_prior=pp, psi_like=pl,
                     grad=grads,
                     accepted=jnp.full(nc, iteration, jnp.int32))
        rep = replay_perflog(self.dir, self.conf.hmc, self.g.N)
        if rep is not None:
            bc = lambda x: jnp.broadcast_to(
                jnp.asarray(x), (nc,) + jnp.asarray(x).shape)
            state.update(
                eps_fac=jnp.full(nc, rep["eps_fac"], jnp.float32),
                acc_flags=bc(rep["acc_flags"]).astype(jnp.int32),
                eps_table=bc(rep["eps_table"]).astype(jnp.float32),
                count_attempts=jnp.full(nc, rep["count_attempts"], jnp.int32),
                rejections=jnp.full(nc, rep["rejections"], jnp.int32),
                got_first_accept=jnp.full(nc, rep["got_first_accept"], bool))
        self.state = ss.shard_chain_state(state, self.mesh)
        self._dump_cursor = iteration
        return self
