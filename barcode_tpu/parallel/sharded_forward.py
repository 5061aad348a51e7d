"""Fully sharded forward model + posterior for grids that exceed one chip.

Everything runs inside a single jax.shard_map region over a ('grid',) mesh:
x-slab-sharded fields, slab-local FFT stages with all-to-all transposes
(parallel/sharded_fft.py), slab-local particles, a halo-exchange deposit
(ppermute ring), pmean/psum reductions for overdensity and energies.  The
posterior gradient is jax.grad *through* the shard_map — every collective
has a registered transpose, so the adjoint is sharded too.

Halo contract: a particle's deposit support must stay within `halo` cells of
its home slab in x:  halo >= max|Psi_x|/d + stencil reach.  For LCDM-like
spectra max displacements are ~15-20 Mpc/h; at 256^3/200 the default
halo=16 covers 25 Mpc/h.  Violations wrap into wrong cells (garbage in, no
crash) — `suggest_halo` picks a safe value from the box.

The reference has no counterpart: it is single-process and its largest
feasible grid is bounded by one node's RAM (SURVEY.md §5.7).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.forward import assign
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, kernel_h
from barcode_tpu.model import likelihoods
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.parallel import sharded_fft as sf

AXIS = "grid"


def suggest_halo(g: GridSpec, sigma_psi: float = 6.0, nsigma: float = 4.0) -> int:
    """Halo cells covering nsigma * sigma_psi of displacement + TSC reach."""
    d1 = g.cell[0]
    return int(np.ceil(nsigma * sigma_psi / d1)) + 2


def _local_positions_x(g: GridSpec, n_dev: int, dev, dtype=jnp.float32):
    """Slab-local Lagrangian cell-center positions (x uses global coords)."""
    n1_loc = g.N1 // n_dev
    d1, d2, d3 = g.cell
    x = (dev * n1_loc + jnp.arange(n1_loc, dtype=dtype) + 0.5) * d1
    y = (jnp.arange(g.N2, dtype=dtype) + 0.5) * d2
    z = (jnp.arange(g.N3, dtype=dtype) + 0.5) * d3
    return jnp.stack(jnp.meshgrid(x, y, z, indexing="ij"))


def _halo_exchange_add(ext, halo: int, axis_name: str = AXIS):
    """Fold the x-halos of an extended slab [H + n_loc + H, N2, N3] into the
    neighbours' interiors via a cyclic ppermute ring; returns the interior."""
    n_dev = jax.lax.axis_size(axis_name)
    left_h = ext[:halo]          # belongs to the left neighbour's tail
    right_h = ext[-halo:]        # belongs to the right neighbour's head
    interior = ext[halo:-halo]
    send_left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    send_right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    from_right = jax.lax.ppermute(left_h, axis_name, send_left)
    from_left = jax.lax.ppermute(right_h, axis_name, send_right)
    interior = interior.at[-halo:].add(from_right)
    interior = interior.at[:halo].add(from_left)
    return interior


def _deposit_local(pos, g: GridSpec, fc: ForwardConfig, halo: int, n_dev: int, dev):
    """TSC deposit of slab-local particles into an extended x buffer,
    folded back via halo exchange.  'sph_ft' adds the W4 convolution on the
    already-sharded field afterwards (spectral, so it commutes with the
    exchange)."""
    n1_loc = g.N1 // n_dev
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    u = pos / d
    # x: min-image offset from the slab start (particles stay within halo
    # of their home slab by the halo contract)
    slab_start = dev * n1_loc
    bx_glob = jnp.floor(u[0])
    # min-image offset relative to the particle's OWN local row (not the slab
    # start: that breaks when the slab spans more than half the box, e.g. a
    # 1-device mesh), then back to slab coordinates
    qx = jnp.arange(n1_loc, dtype=pos.dtype).reshape(-1, 1, 1)
    offq = jnp.mod(bx_glob - (slab_start + qx) + g.N1 / 2.0,
                   g.N1) - g.N1 / 2.0
    off = qx + offq
    bx_ext = jnp.clip(off + halo, 0, n1_loc + 2 * halo - 1).astype(jnp.int32)
    base_y = jnp.mod(jnp.floor(u[1]).astype(jnp.int32), g.N2)
    base_z = jnp.mod(jnp.floor(u[2]).astype(jnp.int32), g.N3)
    frac = jnp.stack([u[0] - bx_glob - 0.5,
                      u[1] - jnp.floor(u[1]) - 0.5,
                      u[2] - jnp.floor(u[2]) - 0.5])

    n1_ext = n1_loc + 2 * halo
    ws = assign._tsc_weights(frac)
    flat_base = ((bx_ext * g.N2 + base_y) * g.N3 + base_z).reshape(-1)
    vals = jnp.stack([w.reshape(-1) for w in ws], axis=-1)
    ch = jnp.zeros((n1_ext * g.N2 * g.N3, len(assign._TSC_OFFSETS)),
                   vals.dtype).at[flat_base].add(vals)
    ext = 0.0
    for k, o in enumerate(assign._TSC_OFFSETS):
        # x rolls move within the extended buffer (no wrap needed thanks to
        # the halo margin); y/z wrap periodically
        ck = ch[:, k].reshape(n1_ext, g.N2, g.N3)
        ck = jnp.roll(ck, (o[1], o[2]), axis=(1, 2))
        zero = jnp.zeros_like(ck[:1])
        if o[0] == 1:
            ck = jnp.concatenate([zero, ck[:-1]], axis=0)
        elif o[0] == -1:
            ck = jnp.concatenate([ck[1:], zero], axis=0)
        ext = ext + ck
    return _halo_exchange_add(ext, halo)


def _make_pallas_slab_deposit(g: GridSpec, halo: int, n_dev: int,
                              interpret: bool | None = None,
                              block: tuple = (8, 8),
                              bf16_fwd: bool = False, bf16_bwd: bool = False,
                              kernel_halo: int | None = None,
                              tail_k: int = 0):
    """Slab-local Pallas TSC deposit (pos, devf) -> extended x buffer, with
    an exact custom VJP via the windowed slab gather kernel.  `devf` is the
    'grid' axis index as float (a regular argument, not a closure, so the
    custom_vjp never captures a shard_map tracer); its cotangent is zero.

    The ring-exchange fold stays *outside* (plain jnp ops, ppermute has a
    transpose), so jax.grad of the folded density reaches this VJP with the
    extended-buffer cotangent the gather kernel expects.

    Halo-tail split (round 5, the slab twin of assign.make_tsc_deposit_fast):
    with tail_k > 0 and kernel_halo < halo, the KERNELS run at the small
    quantile `kernel_halo` (their MAC/VPU cost scales with the window area
    (B + 2h)^2) while the exchange margin stays at the worst-case `halo` —
    the margin is pure ppermute bandwidth, which is cheap.  Contract
    violators of the kernel halo are zero-weighted in-kernel (a violator
    would otherwise deposit PARTIAL mass), compacted (rounds-of-strided-
    argmax, not top_k — PLAN.md round 4), and deposited/differentiated
    exactly through a 27-point XLA path into the worst-case-sized extended
    buffer, which the ring exchange then folds as usual.  Violators beyond
    the worst-case margin itself lose mass (none exist when `halo` is the
    measured displacement bound)."""
    from barcode_tpu.forward import pallas_deposit as _pd

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n1_loc = g.N1 // n_dev
    h_k = halo if (tail_k <= 0 or kernel_halo is None) else min(kernel_halo,
                                                                halo)
    h_k4 = -(-h_k // 4) * 4  # Mosaic: WY must divide by 8
    h_x = max(halo, h_k4)    # exchange margin (worst case)
    split = tail_k > 0 and h_k4 < h_x
    if not split:
        h_x = h_k4  # single-halo path: buffer sized by the kernel halo
    assert h_x <= n1_loc, (
        f"pallas slab exchange halo ({h_x}) must not exceed the slab width "
        f"({n1_loc}): the ring exchange only reaches adjacent slabs")
    pad = h_x - h_k4

    @jax.custom_vjp
    def dep(pos, devf):
        if not split:
            return _pd.tsc_deposit_pallas_slab(
                pos, g, n1_loc, devf, h_k4, block=block, interpret=interpret,
                bf16=bf16_fwd)
        excess = assign._slab_halo_excess(pos, g, n1_loc, devf, h_k4)
        ok = (excess <= 0.0).astype(pos.dtype)
        ext_k = _pd.tsc_deposit_pallas_slab(
            pos, g, n1_loc, devf, h_k4, block=block, interpret=interpret,
            bf16=bf16_fwd, weights=ok)
        ext = jnp.pad(ext_k, ((pad, pad), (0, 0), (0, 0)))
        vals, idx = assign._compact_topk(excess.ravel(), tail_k)
        pos_k = pos.reshape(3, -1)[:, idx]
        row_k = (idx // (g.N2 * g.N3)).astype(pos.dtype)
        return ext + assign._tail_deposit_slab(
            pos_k, row_k, vals > 0.0, g, n1_loc, h_x, devf * n1_loc)

    def dep_fwd(pos, devf):
        return dep(pos, devf), (pos, devf)

    def dep_bwd(res, cot):
        pos, devf = res
        cot_k = cot[pad:pad + n1_loc + 2 * h_k4] if split else cot
        out = _pd.tsc_gather_grads_pallas_slab(
            cot_k, pos, g, n1_loc, devf, h_k4, block=block,
            interpret=interpret, bf16=bf16_bwd, want_value=False)
        if not split:
            return out, jnp.zeros_like(devf)
        excess = assign._slab_halo_excess(pos, g, n1_loc, devf, h_k4)
        ok = (excess <= 0.0).astype(cot.dtype)
        vals, idx = assign._compact_topk(excess.ravel(), tail_k)
        pos_k = pos.reshape(3, -1)[:, idx]
        row_k = (idx // (g.N2 * g.N3)).astype(pos.dtype)
        vk = assign._tail_weight_grad_slab(
            cot, pos_k, row_k, vals > 0.0, g, n1_loc, h_x, devf * n1_loc)
        outf = (out * ok[None]).reshape(3, -1).at[:, idx].add(vk)
        return outf.reshape((3, n1_loc, g.N2, g.N3)), jnp.zeros_like(devf)

    dep.defvjp(dep_fwd, dep_bwd)
    return dep, h_x


def _make_psi_local(g: GridSpec, fc: ForwardConfig, gp: GrowthParams,
                    likelihood: int, halo: int, n_dev: int):
    """The slab-local posterior body shared by the ('grid',) and
    ('chains','grid') entry points; collectives run over AXIS only."""
    h = kernel_h(fc, g)
    # normalize the input.par integer encoding (config.py parses masskernel
    # as an int; mirror lag2eul.py:72) so .par/CLI-driven runs hit the same
    # gates as string-configured ones
    mk = {0: "ngp", 1: "cic", 2: "tsc", 3: "sph"}.get(fc.masskernel,
                                                      fc.masskernel)
    use_pallas = bool(getattr(fc, "pallas_deposit", False)) and \
        mk in ("tsc", "sph_ft")
    if use_pallas:
        # halo-tail split: fc.pallas_halo (the quantile kernel halo) + the
        # worst-case exchange margin `halo`; see _make_pallas_slab_deposit
        pallas_dep, halo = _make_pallas_slab_deposit(
            g, halo, n_dev, block=tuple(getattr(fc, "pallas_block", (8, 8))),
            bf16_fwd=getattr(fc, "pallas_bf16_dep", False),
            bf16_bwd=getattr(fc, "pallas_bf16_grad", False),
            kernel_halo=getattr(fc, "pallas_halo", 0) or None,
            tail_k=getattr(fc, "pallas_tail_k", 0))

    def psi_local(delta, nobs, window, noise, power_f):
        dev = jax.lax.axis_index(AXIS)
        kx, ky, kz = sf.kvec_sharded(g, n_dev, dev)
        k2 = kx * kx + ky * ky + kz * kz
        guard = k2 > 1e-14
        inv_k2 = jnp.where(guard, 1.0 / jnp.where(guard, k2, 1.0), 0.0)
        # Nyquist zeroing (odd derivative), by index on the sharded layout
        n2_loc = g.N2 // n_dev
        mx = jnp.where(jnp.arange(g.N1) == g.N1 // 2, 0.0, 1.0)[:, None, None]
        my = jnp.where(dev * n2_loc + jnp.arange(n2_loc) == g.N2 // 2,
                       0.0, 1.0)[None, :, None]
        mz = jnp.where(jnp.arange(g.N3 // 2 + 1) == g.N3 // 2,
                       0.0, 1.0)[None, None, :]
        # --- LPT divergence (sharded spectral pipeline; mirrors lpt.py) ---
        if fc.sfmodel == 1:
            div_C = sf._rfft3_local(-gp.D1 * delta, n_dev, AXIS)
        else:
            Fd = sf._rfft3_local(delta, n_dev, AXIS)
            b2 = Fd * inv_k2
            dd = lambda ka, kb: sf._irfft3_local(ka * kb * b2, n_dev, g.N3, AXIS)
            pxx, pyy, pzz = dd(kx, kx), dd(ky, ky), dd(kz, kz)
            pxy, pxz, pyz = dd(kx, ky), dd(kx, kz), dd(ky, kz)
            m2v = (pxx * pyy - pxy * pxy + pxx * pzz - pxz * pxz
                   + pyy * pzz - pyz * pyz)
            div2 = -gp.D1 * delta + gp.D2 * m2v
            if fc.sfmodel == 2:
                div_C = sf._rfft3_local(div2, n_dev, AXIS)
            else:  # ALPT long/short blend (lpt.alpt_psi)
                psilin = -gp.D1 * delta
                arg = 1.0 + (2.0 / 3.0) * psilin
                # double-where against NaN cotangents (see lpt.div_psi_sc)
                safe_arg = jnp.where(arg > 0.0, arg, 1.0)
                div_sc = jnp.where(
                    arg > 0.0, 3.0 * (jnp.sqrt(safe_arg) - 1.0), -3.0)
                K = jnp.exp(-k2 * (fc.slength * fc.slength) / 2.0)
                div_C = (K * sf._rfft3_local(div2, n_dev, AXIS)
                         + (1.0 - K) * sf._rfft3_local(div_sc, n_dev, AXIS))
        base = (-1j) * div_C * inv_k2 * (mx * my * mz)
        psi_x = sf._irfft3_local(base * kx, n_dev, g.N3, AXIS)
        psi_y = sf._irfft3_local(base * ky, n_dev, g.N3, AXIS)
        psi_z = sf._irfft3_local(base * kz, n_dev, g.N3, AXIS)
        psi = jnp.stack([psi_x, psi_y, psi_z])
        if fc.sfmodel == 3:
            # cellbound half-cell average (lpt.cellbound); the +1 x-roll
            # crosses slab boundaries via a ppermute ring
            psi = 0.5 * (psi + _roll_x1(jnp.roll(psi, (1, 1), axis=(2, 3))))
        # --- particles + optional RSD ---
        pos = _local_positions_x(g, n_dev, dev, delta.dtype) + psi
        L = jnp.asarray([g.L1, g.L2, g.L3], delta.dtype).reshape(3, 1, 1, 1)
        pos = jnp.mod(pos, L)
        if fc.rsd:
            f1 = gp.cpecvel / (gp.hubble * gp.ascale)
            pos = pos.at[2].set(jnp.mod(pos[2] + f1 * psi[2], g.L3))
        # --- halo deposit ---
        if use_pallas:
            ext = pallas_dep(pos, dev.astype(jnp.float32))
            rho = _halo_exchange_add(ext, halo)
        else:
            rho = _deposit_local(pos, g, fc, halo, n_dev, dev)
        if mk == "sph_ft":
            W4 = _w4_sharded(g, n_dev, dev, h)
            Fr = sf._rfft3_local(rho, n_dev, AXIS)
            rho = sf._irfft3_local(W4 * Fr, n_dev, g.N3, AXIS)
        # --- overdensity with global mean ---
        mean = jax.lax.pmean(jnp.mean(rho), AXIS)
        delta_x = rho / mean - 1.0
        # --- likelihood + prior (global sums) ---
        obs_loc = ObsData(nobs=nobs, window=window, noise=noise, power=0.0)
        psi_like = likelihoods.likelihood_psi(likelihood, delta_x, obs_loc)
        Fd = sf._rfft3_local(delta, n_dev, AXIS)
        inv_p = jnp.where(power_f > 0, (g.vol / g.N) / jnp.where(power_f > 0, power_f, 1.0), 0.0)
        Sinv_d = sf._irfft3_local(inv_p * Fd, n_dev, g.N3, AXIS)
        psi_prior = 0.5 * jnp.sum(delta * Sinv_d)
        # global sums; the (prior, like) split feeds the 12-column perflog
        # (HMC.cc:40-60) exactly as the dense posterior.make_psi_force does
        pp = jax.lax.psum(psi_prior, AXIS)
        pl = jax.lax.psum(psi_like, AXIS)
        return pp + pl, (pp, pl)

    return psi_local


def _roll_x1(v, axis_name: str = AXIS):
    """roll(+1) along the slab-sharded x axis (axis 1 of a stacked field):
    each device's last x-row becomes the right neighbour's first row."""
    n_dev = jax.lax.axis_size(axis_name)
    recv = jax.lax.ppermute(v[:, -1:], axis_name,
                            [(i, (i + 1) % n_dev) for i in range(n_dev)])
    return jnp.concatenate([recv, v[:, :-1]], axis=1)


def _check_halo(g: GridSpec, fc: ForwardConfig, n_dev: int, halo):
    assert fc.sfmodel in (1, 2, 3), f"unknown sfmodel {fc.sfmodel}"
    halo = halo if halo is not None else suggest_halo(g)
    assert halo <= g.N1 // n_dev, (
        f"halo ({halo}) must not exceed the slab width ({g.N1 // n_dev}): "
        "the ring exchange only reaches adjacent slabs")
    return halo


def make_sharded_psi(g: GridSpec, fc: ForwardConfig, gp: GrowthParams,
                     likelihood: int, mesh: Mesh, halo: int | None = None):
    """psi(delta_slab, obs_slabs) -> scalar, fully sharded; and its grad.

    delta and the obs fields are x-slab-sharded; obs.power must be provided
    in the *sharded Fourier layout* (x full, ky-sharded — use
    power_to_sharded_layout).  sfmodel 1/2/3 (Zel'dovich / 2LPT / ALPT blend
    incl. the ppermute cellbound average); masskernel 'tsc' or 'sph_ft'
    (or their input.par integer codes 2/'sph_ft').
    """
    n_dev = mesh.devices.size
    halo = _check_halo(g, fc, n_dev, halo)
    psi_local = _make_psi_local(g, fc, gp, likelihood, halo, n_dev)
    x_spec = P(AXIS, None, None)
    f_spec = P(None, AXIS, None)

    # check_vma=False: the fft transpose rule rejects varying-over-mesh-axis
    # cotangent annotations (JAX 0.9), which blocks jax.grad through the
    # sharded spectral pipeline otherwise
    shmapped = jax.shard_map(
        lambda *a: psi_local(*a)[0], mesh=mesh,
        in_specs=(x_spec, x_spec, x_spec, x_spec, f_spec),
        out_specs=P(), check_vma=False)

    def psi_fn(delta, obs: ObsData):
        return shmapped(delta, obs.nobs, obs.window, obs.noise, obs.power)

    psi_jit = jax.jit(psi_fn)
    grad_jit = jax.jit(jax.grad(psi_fn))
    return psi_jit, grad_jit


def make_sharded_psi_vg_chains(g: GridSpec, fc: ForwardConfig, gp: GrowthParams,
                               likelihood: int, mesh: Mesh,
                               halo: int | None = None):
    """Per-chain (psi values, grads) over a 2-axis ('chains', 'grid') mesh:
    data parallelism across chains composed with slab (sequence-style)
    parallelism across the grid — the dp x sp composition of SURVEY.md §5.8.

    Input delta_batch is (n_chains,) + grid shape, sharded
    P('chains', 'grid', None, None); obs fields are replicated over 'chains'
    and slab-sharded over 'grid' (shard_obs_chains).  Chains are independent:
    grad of sum(psi) gives each chain its own gradient.
    """
    n_dev = mesh.shape[AXIS]
    halo = _check_halo(g, fc, n_dev, halo)
    psi_local = _make_psi_local(g, fc, gp, likelihood, halo, n_dev)

    def local(delta_c, nobs, window, noise, power_f):
        # delta_c: (nc_local, n1_local, N2, N3); chains batch via vmap, the
        # 'grid' collectives broadcast over it
        def one(d):
            psi, (pp, pl) = psi_local(d, nobs, window, noise, power_f)
            return psi, pp, pl
        return jax.vmap(one)(delta_c)

    shmapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("chains", AXIS, None, None), P(AXIS, None, None),
                  P(AXIS, None, None), P(AXIS, None, None),
                  P(None, AXIS, None)),
        out_specs=(P("chains"), P("chains"), P("chains")), check_vma=False)

    def vg_fn(delta_batch, obs: ObsData):
        def f(d):
            vals, pp, pl = shmapped(d, obs.nobs, obs.window, obs.noise,
                                    obs.power)
            return vals.sum(), (vals, (pp, pl))
        (_, (vals, aux)), grads = jax.value_and_grad(f, has_aux=True)(delta_batch)
        return (vals, aux), grads

    return jax.jit(vg_fn)


def shard_obs_chains(obs: ObsData, mesh: Mesh):
    """Observation layout for the ('chains','grid') mesh: fields slab-sharded
    over 'grid', replicated over 'chains'."""
    xs = NamedSharding(mesh, P(AXIS, None, None))
    fs = NamedSharding(mesh, P(None, AXIS, None))
    return ObsData(
        nobs=jax.device_put(obs.nobs, xs),
        window=jax.device_put(obs.window, xs),
        noise=jax.device_put(obs.noise, xs),
        power=jax.device_put(obs.power, fs),
        rho_c=obs.rho_c, biasP=obs.biasP, biasE=obs.biasE,
        delta_min=obs.delta_min,
    )


def _w4_sharded(g: GridSpec, n_dev: int, dev, h: float):
    """Closed-form W4 transform on the sharded Fourier layout (f32-safe:
    small-kappa Taylor limit instead of the cancelling closed form)."""
    kx, ky, kz = sf.kvec_sharded(g, n_dev, dev)
    kap = jnp.sqrt(kx * kx + ky * ky + kz * kz) * h
    safe = jnp.where(kap > 1.0, kap, 2.0)
    ksink = safe * jnp.sin(safe)
    closed = 24.0 * (3.0 + jnp.cos(2 * safe) - ksink
                     + jnp.cos(safe) * (ksink - 4.0)) / safe**6
    # small-kappa expansion from the kernel moments I2n = int q^2n w(q) dq:
    # W = 1 - (I4/I2) k^2/6 + (I6/I2) k^4/120 - (I8/I2) k^6/5040,
    # I2 = 1/4, I4 = 0.225, I6 = 0.303571, I8 = 0.516667
    # (accurate to ~1e-5 at kappa = 1, where the f32 closed form is safe)
    k2 = kap * kap
    taylor = 1.0 - 0.15 * k2 + 0.0101190 * k2 * k2 - 4.1005e-4 * k2 * k2 * k2
    return jnp.where(kap > 1.0, closed, taylor)


def power_to_sharded_layout(power_rfft_full, mesh: Mesh):
    """Shard a full half-complex P(k) grid along its ky axis."""
    return jax.device_put(power_rfft_full, NamedSharding(mesh, P(None, AXIS, None)))


def shard_obs(obs: ObsData, mesh: Mesh):
    """x-slab-shard the observation fields; power goes to the Fourier layout."""
    xs = NamedSharding(mesh, P(AXIS, None, None))
    return ObsData(
        nobs=jax.device_put(obs.nobs, xs),
        window=jax.device_put(obs.window, xs),
        noise=jax.device_put(obs.noise, xs),
        power=power_to_sharded_layout(obs.power, mesh),
        rho_c=obs.rho_c, biasP=obs.biasP, biasE=obs.biasE,
        delta_min=obs.delta_min,
    )
