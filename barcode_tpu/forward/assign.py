"""Mass assignment (particle -> grid deposit) and grid -> particle gathers.

TPU-native redesign of /root/reference/barlib/src/massFunctions.cc and
interpolate_grid.cpp.  The reference scatters with OpenMP atomics (documented
run-to-run nondeterminism, main.cc:86-90); here deposits are deterministic
and differentiable.

The TPU trick: a stencil deposit writes w_o(q) to cell base(q) + o for a
*static* offset o, and scatter commutes with static shifts:

    scatter_add(w at base + o)  ==  roll(scatter_add(w at base), shift=o)

so the whole K-point stencil collapses to ONE windowed scatter-add of
K-vectors at the base cell (a single index lookup per particle, contiguous
K-wide updates — the layout XLA's TPU scatter handles well) followed by K
static rolls.  Measured ~10x faster than K separate scatter-adds on v5e;
gathers use the mirrored trick (K static rolls stacked, one windowed
gather).  jax.grad maps the scatter to the gather automatically, so the
adjoint inherits the fast path.

Particles are implicit: one per cell, carried as position arrays of grid
shape (from forward.particles).  All deposits assume unit masses unless a
`weights` grid is given, and periodic boundary conditions.

Kernels (input.par `masskernel`): 0 NGP, 1 CIC, 2 TSC, 3 SPH (Monaghan W4
spline, radius 2h) — plus 'sph_ft': TSC deposit convolved with the
closed-form Fourier W4, the deposit whose exact adjoint is the reference's
own fast gradient path (calc_h=3, HMC_models_testing.cpp:54-188).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as _np

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier


def _stencil_deposit(base, channel_weights, offsets, g: GridSpec):
    """One windowed scatter-add at `base` + static rolls.

    base: int32 (3, N1, N2, N3) cell indices already wrapped into range;
    channel_weights: [K, N1, N2, N3] weight per stencil offset;
    offsets: static list of K (ox, oy, oz).
    """
    K = len(offsets)
    flat_base = ((base[0] * g.N2 + base[1]) * g.N3 + base[2]).reshape(-1)
    vals = jnp.stack([w.reshape(-1) for w in channel_weights], axis=-1)  # [N, K]
    ch = jnp.zeros((g.N, K), vals.dtype).at[flat_base].add(vals)
    out = 0.0
    for k, off in enumerate(offsets):
        out = out + jnp.roll(ch[:, k].reshape(g.shape), shift=off, axis=(0, 1, 2))
    return out


def _stencil_gather_multi(field, base, weight_sets, offsets, g: GridSpec):
    """K-offset gather shared across M weight sets: the rolled stack is built
    and gathered ONCE, then contracted with each weight set — row count /M
    versus M separate gathers (the gather row rate is the TPU bottleneck,
    see PLAN.md)."""
    flat_base = ((base[0] * g.N2 + base[1]) * g.N3 + base[2]).reshape(-1)
    rolled = jnp.stack(
        [jnp.roll(field, shift=tuple(-o for o in off), axis=(0, 1, 2)).reshape(-1)
         for off in offsets], axis=-1)  # [N, K]
    picked = rolled[flat_base]  # [n_particles, K]
    outs = []
    for channel_weights in weight_sets:
        w = jnp.stack([w.reshape(-1) for w in channel_weights], axis=-1)
        # particle layout need not match the grid (e.g. upsampled gathers)
        outs.append(jnp.sum(picked * w, axis=-1).reshape(base.shape[1:]))
    return outs


def _stencil_gather(field, base, channel_weights, offsets, g: GridSpec):
    """Mirror of _stencil_deposit: out(q) = sum_o w_o(q) field(base_q + o)."""
    return _stencil_gather_multi(field, base, [channel_weights], offsets, g)[0]


def _wrap_base(base, g: GridSpec):
    n = jnp.asarray([g.N1, g.N2, g.N3]).reshape(3, 1, 1, 1)
    return jnp.remainder(base, n)


# ---------------------------------------------------------------------------
# NGP
# ---------------------------------------------------------------------------

def ngp_deposit(pos, g: GridSpec, weights=None):
    """Nearest grid point (getDensity_NGP, massFunctions.cc:49-98)."""
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    base = _wrap_base(jnp.floor(pos / d).astype(jnp.int32), g)
    w = jnp.ones(g.shape, pos.dtype) if weights is None else weights
    return _stencil_deposit(base, [w], [(0, 0, 0)], g)


# ---------------------------------------------------------------------------
# CIC
# ---------------------------------------------------------------------------

_CIC_OFFSETS = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]


def _cic_base_frac(pos, g: GridSpec):
    """Cell convention of getCICcells: base = floor(x/d - 1/2)
    (interpolate_grid.cpp:27-79)."""
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    v = pos / d - 0.5
    base = jnp.floor(v)
    return _wrap_base(base.astype(jnp.int32), g), v - base


def _cic_weights(frac):
    out = []
    for off in _CIC_OFFSETS:
        w = 1.0
        for a in range(3):
            w = w * jnp.where(off[a] == 0, 1.0 - frac[a], frac[a])
        out.append(w)
    return out


def cic_deposit(pos, g: GridSpec, weights=None):
    """Cloud-in-cell, 8-point (getDensity_CIC, massFunctions.cc:100-164)."""
    base, frac = _cic_base_frac(pos, g)
    ws = _cic_weights(frac)
    if weights is not None:
        ws = [w * weights for w in ws]
    return _stencil_deposit(base, ws, _CIC_OFFSETS, g)


def cic_gather(field, pos, g: GridSpec):
    """CIC interpolation of a grid field at particle positions
    (interpolate_CIC, interpolate_grid.cpp:82-120)."""
    base, frac = _cic_base_frac(pos, g)
    return _stencil_gather(field, base, _cic_weights(frac), _CIC_OFFSETS, g)


# ---------------------------------------------------------------------------
# TSC
# ---------------------------------------------------------------------------

_TSC_OFFSETS = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]


def _tsc_axis_weight(dx, s):
    """TSC per-axis weight for offset s in {-1,0,1}; dx = distance from the
    containing cell's center in cell units, |dx| <= 1/2.  The distance from
    the particle to the offset cell's center is |dx - s|, so
    w = 0.5*(1.5 - |dx - s|)^2 (interpolate_grid.cpp:163-168, where the
    reference's s=+1 weights accidentally use dz for all axes — fixed here)."""
    if s == 0:
        return 0.75 - dx * dx
    return 0.5 * (1.5 - jnp.abs(dx - s)) ** 2


def _tsc_base_frac(pos, g: GridSpec):
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    u = pos / d
    base = jnp.floor(u)
    return _wrap_base(base.astype(jnp.int32), g), u - base - 0.5


def _tsc_weights(dx):
    wx = {s: _tsc_axis_weight(dx[0], s) for s in (-1, 0, 1)}
    wy = {s: _tsc_axis_weight(dx[1], s) for s in (-1, 0, 1)}
    wz = {s: _tsc_axis_weight(dx[2], s) for s in (-1, 0, 1)}
    return [wx[o[0]] * wy[o[1]] * wz[o[2]] for o in _TSC_OFFSETS]


def tsc_deposit(pos, g: GridSpec, weights=None):
    """Triangular-shaped-cloud, 27-point (getDensity_TSC,
    massFunctions.cc:167-364)."""
    base, dx = _tsc_base_frac(pos, g)
    ws = _tsc_weights(dx)
    if weights is not None:
        ws = [w * weights for w in ws]
    return _stencil_deposit(base, ws, _TSC_OFFSETS, g)


def tsc_gather(field, pos, g: GridSpec):
    """TSC interpolation at particle positions (interpolate_TSC,
    interpolate_grid.cpp:134-202, with the wx[2]/wy[2] dz bug fixed)."""
    base, dx = _tsc_base_frac(pos, g)
    return _stencil_gather(field, base, _tsc_weights(dx), _TSC_OFFSETS, g)


def _tsc_axis_dweight(dx, s, d):
    """d/dpos of the per-axis TSC weight (1/d from dx = pos/d - ...)."""
    if s == 0:
        return -2.0 * dx / d
    return -(1.5 - jnp.abs(dx - s)) * jnp.sign(dx - s) / d


def tsc_weight_grad_gather(cot, pos, g: GridSpec):
    """V_i(p) = sum_o d(w_o)/d(pos_i) * cot(base_p + o): the position-adjoint
    of the TSC deposit.  The 27-offset rolled stack is gathered once and
    contracted with the three derivative weight sets (one gather, not three)."""
    base, dx = _tsc_base_frac(pos, g)
    d = g.cell
    weight_sets = []
    for i in range(3):
        ws = []
        for off in _TSC_OFFSETS:
            w = 1.0
            for a in range(3):
                term = (_tsc_axis_dweight(dx[a], off[a], d[a]) if a == i
                        else _tsc_axis_weight(dx[a], off[a]))
                w = w * term
            ws.append(w)
        weight_sets.append(ws)
    return jnp.stack(_stencil_gather_multi(cot, base, weight_sets, _TSC_OFFSETS, g))


# deposit VMEM gate: the (16,16) block's working set must leave headroom
# under the 16 MB scoped-VMEM limit (Mosaic needs slack for spills/copies;
# 17.4 MB OOMs at compile time at 256^3/halo 12)
_DEP_VMEM_BUDGET = 10 << 20


def auto_block_dep(g: GridSpec, halo, block: tuple) -> tuple:
    """Deposit-kernel block auto-selection: (16,16) is the hardware optimum
    at 128^3 (sweep_r3_kernels.json) but its working set
    (pallas_deposit.deposit_working_set_bytes — particle window + one-hot
    sub-tile + accumulator) must stay under ~10 MB of scoped VMEM, so large
    grids fall back to `block` (the (8,8) gather optimum, which compiles and
    runs at 256^3) unless the streamed-window kernel variant fits (it frees
    the window term by streaming x-row chunks; pallas_deposit._stream_rows)."""
    if g.N1 % 16 or g.N2 % 16:
        return block
    from barcode_tpu.forward import pallas_deposit as _p
    if _p.deposit_working_set_bytes(g, halo, (16, 16)) <= _DEP_VMEM_BUDGET:
        return (16, 16)
    if _p.deposit_working_set_bytes(g, halo, (16, 16),
                                    streamed=True) <= _DEP_VMEM_BUDGET:
        return (16, 16)
    return block


# ---------------------------------------------------------------------------
# Halo-tail split (round 4): both Pallas kernels pay MACs/VPU work
# proportional to the x/y window area (B+2h)^2, sized by the WORST-CASE
# displacement, although typical displacements are far smaller
# (probe_r4_tail.json).  With a tail split the kernels run at a small halo
# covering ~all particles; the rare violators are compacted with lax.top_k
# and handled exactly through a K-row XLA scatter/gather.  Exactness: a
# violator's in-kernel contribution is zeroed through the weighted deposit
# channel (a violator can otherwise deposit PARTIAL mass — one-hot rows
# tx+o can land in range while tx is out), and its gather-kernel gradient
# is masked for the same reason; the tail path then adds the full 27-point
# deposit/adjoint for exactly those rows.
# ---------------------------------------------------------------------------

def _halo_excess(pos, g: GridSpec, hx: int, hy: int):
    """Per-particle violation excess of the x/y halo contract
    |base - q| <= h - 1 (min-image, cells): > 0 iff the particle breaks
    the contract on either axis.  Matches pallas_deposit.deposit_violations."""
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    base = jnp.floor(pos / d)
    qx = jnp.arange(g.N1, dtype=pos.dtype).reshape(g.N1, 1, 1)
    qy = jnp.arange(g.N2, dtype=pos.dtype).reshape(1, g.N2, 1)
    offx = jnp.mod(base[0] - qx + g.N1 / 2.0, g.N1) - g.N1 / 2.0
    offy = jnp.mod(base[1] - qy + g.N2 / 2.0, g.N2) - g.N2 / 2.0
    return jnp.maximum(jnp.abs(offx) - (hx - 1), jnp.abs(offy) - (hy - 1))


def _compact_topk(m, k: int, rounds: int = 12):
    """Approximate top-k compaction tuned for this backend: lax.top_k costs
    ~44 ms at 16.7M rows here (probe_r4_tail.json — it would eat the tail
    split's entire saving), so instead take `rounds` rounds of per-class
    argmax over k//rounds STRIDED classes (row r belongs to class r % C;
    striding decorrelates the spatially clustered violators, which are
    adjacent in the x-major flattening).  Each round is one cheap reduction
    pass; returns (vals, idx) of k = C*rounds candidate rows.  Exact
    whenever every class holds <= `rounds` violators — at the capacity
    headroom the runner enforces (violators <= k/2) the per-class Poisson
    load makes a miss ~1e-9/class/call at rounds=12; overflow degrades to
    the bounded-loss drop and is watched by the runner's violation
    monitor."""
    n = m.shape[0]
    c = max(-(-k // rounds), 1)  # ceil: capacity c*rounds >= k, never less
    L = -(-n // c)  # ceil
    pad = c * L - n
    mp = jnp.pad(m, (0, pad), constant_values=-jnp.inf)
    # strided classes: column j of row i is element i*c + j -> class j
    mv = mp.reshape(L, c)
    idx_all, val_all = [], []
    for _ in range(rounds):
        i = jnp.argmax(mv, axis=0)                     # (c,)
        v = jnp.take_along_axis(mv, i[None, :], axis=0)[0]
        rows = i * c + jnp.arange(c)
        idx_all.append(rows)
        val_all.append(v)
        mv = mv.at[i, jnp.arange(c)].set(-jnp.inf)
    idx = jnp.concatenate(idx_all)
    # padded rows carry -inf and never rank as violators; clamp their index
    idx = jnp.minimum(idx, n - 1)
    return jnp.concatenate(val_all), idx


def _tail_base_weights(pos_k, valid, g: GridSpec):
    """Wrapped flat cell indices (27, K) and TSC weights (27, K) for K
    explicit tail particles; invalid rows carry zero weight."""
    d = jnp.asarray(g.cell, dtype=pos_k.dtype).reshape(3, 1)
    u = pos_k / d
    base = jnp.floor(u)
    fr = u - base - 0.5
    n = jnp.asarray([g.N1, g.N2, g.N3]).reshape(3, 1)
    base = jnp.remainder(base.astype(jnp.int32), n)
    wx = {s: _tsc_axis_weight(fr[0], s) for s in (-1, 0, 1)}
    wy = {s: _tsc_axis_weight(fr[1], s) for s in (-1, 0, 1)}
    wz = {s: _tsc_axis_weight(fr[2], s) for s in (-1, 0, 1)}
    v = valid.astype(pos_k.dtype)
    idx, w = [], []
    for (ox, oy, oz) in _TSC_OFFSETS:
        ix = jnp.remainder(base[0] + ox, g.N1)
        iy = jnp.remainder(base[1] + oy, g.N2)
        iz = jnp.remainder(base[2] + oz, g.N3)
        idx.append((ix * g.N2 + iy) * g.N3 + iz)
        w.append(wx[ox] * wy[oy] * wz[oz] * v)
    return jnp.stack(idx), jnp.stack(w), fr, d


def _tail_deposit(pos_k, valid, g: GridSpec):
    """Exact 27-point TSC deposit of K tail particles: one 27K-row
    scatter-add (cheap for K << N^3)."""
    idx, w, _, _ = _tail_base_weights(pos_k, valid, g)
    return jnp.zeros(g.N, pos_k.dtype).at[idx.ravel()].add(
        w.ravel()).reshape(g.shape)


def _tail_weight_grad(cot, pos_k, valid, g: GridSpec):
    """(3, K) position-gradients of the tail deposit: 27K-row gather of the
    cotangent contracted with the TSC weight derivatives."""
    idx, _, fr, d = _tail_base_weights(pos_k, valid, g)
    c = cot.ravel()[idx]  # (27, K)
    wx = {s: _tsc_axis_weight(fr[0], s) for s in (-1, 0, 1)}
    wy = {s: _tsc_axis_weight(fr[1], s) for s in (-1, 0, 1)}
    wz = {s: _tsc_axis_weight(fr[2], s) for s in (-1, 0, 1)}
    dwx = {s: _tsc_axis_dweight(fr[0], s, d[0, 0]) for s in (-1, 0, 1)}
    dwy = {s: _tsc_axis_dweight(fr[1], s, d[1, 0]) for s in (-1, 0, 1)}
    dwz = {s: _tsc_axis_dweight(fr[2], s, d[2, 0]) for s in (-1, 0, 1)}
    v = valid.astype(cot.dtype)
    out = [jnp.zeros(pos_k.shape[1], cot.dtype) for _ in range(3)]
    for k, (ox, oy, oz) in enumerate(_TSC_OFFSETS):
        out[0] += dwx[ox] * wy[oy] * wz[oz] * c[k]
        out[1] += wx[ox] * dwy[oy] * wz[oz] * c[k]
        out[2] += wx[ox] * wy[oy] * dwz[oz] * c[k]
    return jnp.stack(out) * v


def _slab_halo_excess(pos, g: GridSpec, n1_loc: int, devf, h: int):
    """Per-particle violation excess of the SLAB kernel halo contract
    |off| <= h - 1 cells (x offset relative to the particle's own local
    row, y global min-image) — the slab twin of _halo_excess, matching
    pallas_deposit._slab_channels' coordinate convention."""
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    base = jnp.floor(pos / d)
    qx = jnp.arange(n1_loc, dtype=pos.dtype).reshape(n1_loc, 1, 1)
    qy = jnp.arange(g.N2, dtype=pos.dtype).reshape(1, g.N2, 1)
    offx = jnp.mod(base[0] - (devf * n1_loc + qx) + g.N1 / 2.0,
                   g.N1) - g.N1 / 2.0
    offy = jnp.mod(base[1] - qy + g.N2 / 2.0, g.N2) - g.N2 / 2.0
    return jnp.maximum(jnp.abs(offx) - (h - 1), jnp.abs(offy) - (h - 1))


def _tail_base_weights_slab(pos_k, row_k, valid, g: GridSpec, n1_loc: int,
                            h_x: int, slab_startf):
    """Extended-buffer flat indices (27, K) + TSC weights for K slab tail
    particles.  x follows the slab kernels' unwrapped convention: ext row =
    own local row + min-image offset + h_x (no x wrap — the worst-case
    exchange margin h_x covers every physical displacement; rows that still
    fall outside are zero-weighted).  y/z wrap periodically as in the
    non-extended axes of the ext buffer."""
    n1_ext = n1_loc + 2 * h_x
    d = jnp.asarray(g.cell, dtype=pos_k.dtype).reshape(3, 1)
    u = pos_k / d
    base = jnp.floor(u)
    fr = u - base - 0.5
    offx = jnp.mod(base[0] - (slab_startf + row_k) + g.N1 / 2.0,
                   g.N1) - g.N1 / 2.0
    bx = (row_k + offx).astype(jnp.int32) + h_x
    by = jnp.remainder(base[1].astype(jnp.int32), g.N2)
    bz = jnp.remainder(base[2].astype(jnp.int32), g.N3)
    wx = {s: _tsc_axis_weight(fr[0], s) for s in (-1, 0, 1)}
    wy = {s: _tsc_axis_weight(fr[1], s) for s in (-1, 0, 1)}
    wz = {s: _tsc_axis_weight(fr[2], s) for s in (-1, 0, 1)}
    v = valid.astype(pos_k.dtype)
    idx, w = [], []
    for (ox, oy, oz) in _TSC_OFFSETS:
        ix = bx + ox
        in_range = ((ix >= 0) & (ix < n1_ext)).astype(pos_k.dtype)
        ix_c = jnp.clip(ix, 0, n1_ext - 1)
        iy = jnp.remainder(by + oy, g.N2)
        iz = jnp.remainder(bz + oz, g.N3)
        idx.append((ix_c * g.N2 + iy) * g.N3 + iz)
        w.append(wx[ox] * wy[oy] * wz[oz] * v * in_range)
    return jnp.stack(idx), jnp.stack(w), fr, d, bx


def _tail_deposit_slab(pos_k, row_k, valid, g: GridSpec, n1_loc: int,
                       h_x: int, slab_startf):
    """Exact 27-point TSC deposit of K slab tail particles into the
    (n1_loc + 2*h_x, N2, N3) extended buffer."""
    idx, w, _, _, _ = _tail_base_weights_slab(pos_k, row_k, valid, g,
                                              n1_loc, h_x, slab_startf)
    n1_ext = n1_loc + 2 * h_x
    return jnp.zeros(n1_ext * g.N2 * g.N3, pos_k.dtype).at[idx.ravel()].add(
        w.ravel()).reshape(n1_ext, g.N2, g.N3)


def _tail_weight_grad_slab(cot_ext, pos_k, row_k, valid, g: GridSpec,
                           n1_loc: int, h_x: int, slab_startf):
    """(3, K) position-gradients of the slab tail deposit against the
    extended-buffer cotangent."""
    idx, _, fr, d, bx = _tail_base_weights_slab(pos_k, row_k, valid, g,
                                                n1_loc, h_x, slab_startf)
    c = cot_ext.ravel()[idx]  # (27, K)
    wx = {s: _tsc_axis_weight(fr[0], s) for s in (-1, 0, 1)}
    wy = {s: _tsc_axis_weight(fr[1], s) for s in (-1, 0, 1)}
    wz = {s: _tsc_axis_weight(fr[2], s) for s in (-1, 0, 1)}
    dwx = {s: _tsc_axis_dweight(fr[0], s, d[0, 0]) for s in (-1, 0, 1)}
    dwy = {s: _tsc_axis_dweight(fr[1], s, d[1, 0]) for s in (-1, 0, 1)}
    dwz = {s: _tsc_axis_dweight(fr[2], s, d[2, 0]) for s in (-1, 0, 1)}
    # x-range mask per offset (matches the zero-weighted deposit rows)
    n1_ext = n1_loc + 2 * h_x
    v = valid.astype(cot_ext.dtype)
    out = [jnp.zeros(pos_k.shape[1], cot_ext.dtype) for _ in range(3)]
    for k, (ox, oy, oz) in enumerate(_TSC_OFFSETS):
        in_r = ((bx + ox >= 0) & (bx + ox < n1_ext)).astype(cot_ext.dtype)
        ck = c[k] * in_r
        out[0] += dwx[ox] * wy[oy] * wz[oz] * ck
        out[1] += wx[ox] * dwy[oy] * wz[oz] * ck
        out[2] += wx[ox] * wy[oy] * dwz[oz] * ck
    return jnp.stack(out) * v


def make_tsc_deposit_fast(g: GridSpec, halo: int = 8, block: tuple = (8, 8),
                          interpret: bool | None = None, pallas_bwd: bool = True,
                          bf16_fwd: bool = False, bf16_bwd: bool = False,
                          block_dep: tuple | None = None, tail_k: int = 0):
    """Unit-mass TSC deposit: Pallas block-kernel forward with an exact
    custom VJP — the backward is the windowed Pallas gather kernel
    (pallas_bwd=True) or the XLA weight-grad gather.

    interpret=None auto-selects: Mosaic on TPU, interpret mode elsewhere
    (so CPU tests of the pallas_deposit config run unchanged).

    The two kernels want different output blocks (hardware sweep,
    artifacts/sweep_r3_kernels.json at 128^3, halo 6): the deposit's VPU
    one-hot construction scales with the window redundancy WX*WY/(BX*BY),
    which larger blocks amortize — (16,16) runs 4.84 ms vs 6.49 at (8,8) —
    while the gather's MXU MACs per particle scale with the window area
    itself, so it keeps the smallest legal block ((8,8): 6.8 ms; (16,16):
    11.1).  `block` feeds the gather; `block_dep` the deposit, defaulting
    to (16,16) when the grid divides it and `block` otherwise.

    Requires the halo contract |base - q| <= halo - 1 in x/y (see
    forward/pallas_deposit.py); monitor pallas_deposit.deposit_violations.

    tail_k > 0 enables the halo-tail split: `halo` may then be a small
    quantile bound instead of the worst case — up to tail_k contract
    violators per call are compacted (lax.top_k on the violation excess)
    and deposited/differentiated exactly through the 27-point XLA tail
    path, while their (partial, wrong) kernel contributions are zeroed via
    the weighted deposit channel and the masked gather.  More than tail_k
    violators lose mass exactly as in the tail_k=0 case — keep the
    deposit_violations monitor running against tail_k.
    """
    from barcode_tpu.forward import pallas_deposit as _pd

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_dep is None:
        block_dep = auto_block_dep(g, halo, block)
    hx, hy = _pd._halo_pair(halo)

    @jax.custom_vjp
    def dep(pos):
        if tail_k == 0:
            return _pd.tsc_deposit_pallas(pos, g, halo=halo, block=block_dep,
                                          interpret=interpret, bf16=bf16_fwd)
        excess = _halo_excess(pos, g, hx, hy)
        ok = (excess <= 0.0).astype(pos.dtype)
        rho = _pd.tsc_deposit_pallas(pos, g, halo=halo, block=block_dep,
                                     interpret=interpret, bf16=bf16_fwd,
                                     weights=ok)
        vals, idx = _compact_topk(excess.ravel(), tail_k)
        pos_k = pos.reshape(3, -1)[:, idx]
        return rho + _tail_deposit(pos_k, vals > 0.0, g)

    def dep_fwd(pos):
        return dep(pos), pos

    def dep_bwd(pos, cot):
        if pallas_bwd:
            out = _pd.tsc_gather_grads_pallas(cot, pos, g, halo=halo,
                                              block=block, interpret=interpret,
                                              bf16=bf16_bwd, want_value=False)
        else:
            out = tsc_weight_grad_gather(cot, pos, g)
        if tail_k == 0:
            return (out,)
        excess = _halo_excess(pos, g, hx, hy)
        ok = (excess <= 0.0).astype(cot.dtype)
        vals, idx = _compact_topk(excess.ravel(), tail_k)
        pos_k = pos.reshape(3, -1)[:, idx]
        vk = _tail_weight_grad(cot, pos_k, vals > 0.0, g)
        outf = (out * ok[None]).reshape(3, -1).at[:, idx].add(vk)
        return (outf.reshape((3,) + g.shape),)

    dep.defvjp(dep_fwd, dep_bwd)
    return dep


# ---------------------------------------------------------------------------
# SPH (Monaghan W4 cubic spline, kernel radius 2h)
# ---------------------------------------------------------------------------

def w4(q):
    """Monaghan W4 spline (unnormalized shape; the 1/(pi h^3) norm is applied
    by callers).  Parity: SPH_kernel_3D, massFunctions.cc:366-385."""
    q = jnp.abs(q)
    inner = 1.0 - 1.5 * q * q + 0.75 * q * q * q
    outer = 0.25 * jnp.maximum(2.0 - q, 0.0) ** 3
    return jnp.where(q <= 1.0, inner, jnp.where(q <= 2.0, outer, 0.0))


def sph_stencil(g: GridSpec, h: float):
    """Static list of cell offsets within kernel reach 2h (+half-cell margin),
    as in SPH_kernel_3D_cells (/root/reference/barlib/src/SPH_kernel.cpp:
    62-102)."""
    d1, d2, d3 = g.cell
    reach = 2.0 * h
    r1 = int(reach / d1) + 1
    r2 = int(reach / d2) + 1
    r3 = int(reach / d3) + 1
    out = []
    for i in range(-r1, r1 + 1):
        for j in range(-r2, r2 + 1):
            for k in range(-r3, r3 + 1):
                dx = (abs(i) - 0.5) * d1
                dy = (abs(j) - 0.5) * d2
                dz = (abs(k) - 0.5) * d3
                if dx * dx + dy * dy + dz * dz <= reach * reach:
                    out.append((i, j, k))
    return out


def sph_deposit(pos, g: GridSpec, h: float, weights=None):
    """Exact SPH scatter: rho(c) = sum_p m_p W4(|x_p - x_c|/h)/(pi h^3) over
    the static stencil (getDensity_SPH, massFunctions.cc:391-495)."""
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    u = pos / d
    base_f = jnp.floor(u)
    base = _wrap_base(base_f.astype(jnp.int32), g)
    norm = 1.0 / (math.pi * h**3)
    offsets = sph_stencil(g, h)
    ws = []
    for off in offsets:
        o = jnp.asarray(off, dtype=pos.dtype).reshape(3, 1, 1, 1)
        # distance from particle to that cell's center (no wrap needed:
        # |off * d| <= 2h + d/2 << L/2)
        diff = pos - (base_f + o + 0.5) * d
        r2 = diff[0] ** 2 + diff[1] ** 2 + diff[2] ** 2
        # sqrt(0) has an undefined autodiff derivative; W4 is smooth with
        # zero slope at r=0, so guard the branch (a particle sits exactly on
        # a cell center whenever the displacement is zero there)
        r = jnp.where(r2 > 0, jnp.sqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
        w = w4(r / h) * norm
        if weights is not None:
            w = w * weights
        ws.append(w)
    return _stencil_deposit(base, ws, offsets, g)


@functools.lru_cache(maxsize=32)
def _w4_fourier_host(g: GridSpec, h: float):
    """Closed-form 3D Fourier transform of the normalized W4 kernel on the
    half-complex grid, normalized to 1 at k=0.

    Parity: the SPH_kernel_F expression of likelihood_calc_V_SPH_fourier_TSC
    (/root/reference/barlib/src/HMC_models_testing.cpp:100-111), with
    kappa = |k| h:
        W4_hat = 24/kappa^6 * (3 + cos(2kappa) - kappa sin kappa
                               + cos kappa (kappa sin kappa - 4))
    which -> 1 as kappa -> 0 (verified against a numerical radial transform
    in tests/test_forward.py).

    The numerator cancels to O(kappa^6) from O(1) terms, so this must be
    evaluated in float64; the grid is static, so it is computed once on the
    host and baked into the jitted computation as a constant.
    """
    def freqs(n, L):
        return 2.0 * _np.pi * _np.fft.fftfreq(n, d=L / n)

    kx = freqs(g.N1, g.L1)[:, None, None]
    ky = freqs(g.N2, g.L2)[None, :, None]
    kz = (2.0 * _np.pi * _np.fft.rfftfreq(g.N3, d=g.L3 / g.N3))[None, None, :]
    kap = _np.sqrt(kx * kx + ky * ky + kz * kz) * h
    kap_safe = _np.where(kap > 1e-8, kap, 1.0)
    ksink = kap_safe * _np.sin(kap_safe)
    W = 24.0 * (3.0 + _np.cos(2 * kap_safe) - ksink
                + _np.cos(kap_safe) * (ksink - 4.0)) / kap_safe**6
    W = _np.where(kap > 1e-8, W, 1.0)
    return _np.asarray(W, _np.float32)


def w4_fourier(g: GridSpec, h: float):
    return jnp.asarray(_w4_fourier_host(g, float(h)))


def sph_ft_deposit(pos, g: GridSpec, h: float, weights=None):
    """Fast SPH: TSC deposit convolved with the closed-form W4 transform.

    This is the deposit whose exact jax.grad adjoint reproduces the
    reference's fast gradient (calc_h=3: W4-convolve then TSC-gather,
    HMC_models_testing.cpp:54-188).  2 extra FFTs instead of a ~57-cell
    scatter stencil.
    """
    rho = tsc_deposit(pos, g, weights)
    return fourier.irfft3(w4_fourier(g, h) * fourier.rfft3(rho), g)


# ---------------------------------------------------------------------------
# dispatch + overdensity
# ---------------------------------------------------------------------------

def deposit(pos, g: GridSpec, masskernel, h: float = 0.0, weights=None):
    """masskernel: 0/'ngp', 1/'cic', 2/'tsc', 3/'sph', 'sph_ft'."""
    mk = {0: "ngp", 1: "cic", 2: "tsc", 3: "sph"}.get(masskernel, masskernel)
    if mk == "ngp":
        return ngp_deposit(pos, g, weights)
    if mk == "cic":
        return cic_deposit(pos, g, weights)
    if mk == "tsc":
        return tsc_deposit(pos, g, weights)
    if mk == "sph":
        return sph_deposit(pos, g, h, weights)
    if mk == "sph_ft":
        return sph_ft_deposit(pos, g, h, weights)
    raise ValueError(f"unknown masskernel {masskernel}")


def overdens(rho):
    """delta = rho/mean(rho) - 1 (overdens, massFunctions.cc:30-47)."""
    return rho / jnp.mean(rho) - 1.0
