"""Pallas TPU deposit kernel: bin-free block accumulation on the MXU.

Replaces the XLA scatter-add in the TSC deposit, whose ~50M rows/s row rate
is the sampler's bottleneck (PLAN.md).  Key idea: with displacements bounded
by `halo` cells, the particles that can touch an output xy-block form a
DENSE window of the Lagrangian particle grid — no sorting or binning.  Each
program reads its (overlapping, Element-indexed) window, builds masked
one-hot weight matrices, and contracts them on the MXU:

    acc[BX*BY, N3] += A^T[BX*BY, T] @ B[T, N3]

where, for a tile of T particles (one x-row of the window),
    A[t, xy] = sum_{ox,oy} wx_ox(t) wy_oy(t) [xy == local_target(t,ox,oy)]
    B[t, z]  = sum_{oz}    wz_oz(t)          [z  == (bz(t)+oz) mod N3]

Particles whose target falls outside the block are masked automatically
(their one-hot never matches), so window overlap never double-counts.  The
periodic x/y wrap is absorbed into the Phase-A padding, which shifts the
wrapped copies' cell indices by ±N so the kernel needs no modulo in x/y.

Halo contract (cf. parallel/sharded_forward): |base - q| <= halo - 1 cells
per x/y axis.  `deposit_violations` counts breaches (breached particles
lose their contribution instead of corrupting memory).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element

from barcode_tpu.grid.spec import GridSpec


def _phase_a(pos, g: GridSpec, halo_x: int, halo_y: int, weights=None):
    """Per-particle base cells (x/y adjusted-padded, z raw) and fracs,
    stacked as one (6, N1+2Hx, N2+2Hy, N3) float32 array — 7 channels when
    per-particle `weights` (grid shape) are given (channel 6 = weight).
    The halos may differ per axis: Mosaic's divisibility constraint only
    binds one window axis per kernel (see _round_halo), so the other axis
    keeps the tight measured halo."""
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    u = pos / d
    base = jnp.floor(u)
    frac = (u - base - 0.5).astype(jnp.float32)
    # x/y base cells in *unwrapped* coordinates relative to the particle's
    # Lagrangian cell (q + min-image offset): a particle that wrapped across
    # the box boundary keeps a base near its own row (possibly negative or
    # >= N), which is what the kernel's local-target arithmetic — and the
    # +-N pad adjustment below — require.
    qx = jnp.arange(g.N1, dtype=pos.dtype)[:, None, None]
    qy = jnp.arange(g.N2, dtype=pos.dtype)[None, :, None]

    def unwrap(b, q, n):
        off = jnp.mod(b - q + n / 2.0, n) - n / 2.0
        return (q + off).astype(jnp.float32)

    bx = unwrap(base[0], qx, g.N1)
    by = unwrap(base[1], qy, g.N2)
    bz = jnp.mod(base[2], g.N3).astype(jnp.float32)

    chans = [bx, by, bz, frac[0], frac[1], frac[2]]
    if weights is not None:
        chans.append(weights.astype(jnp.float32))
    nc = len(chans)
    stack = jnp.stack(chans)

    # wrapped copies carry adjusted base coords (+-N) so the kernel's
    # local-target arithmetic needs no modulo in x/y
    adj_x = jnp.zeros(nc, jnp.float32).at[0].set(g.N1).reshape(nc, 1, 1, 1)
    stack = jnp.concatenate(
        [stack[:, -halo_x:] - adj_x, stack, stack[:, :halo_x] + adj_x], axis=1)
    adj_y = jnp.zeros(nc, jnp.float32).at[1].set(g.N2).reshape(nc, 1, 1, 1)
    stack = jnp.concatenate(
        [stack[:, :, -halo_y:] - adj_y, stack, stack[:, :, :halo_y] + adj_y],
        axis=2)
    return stack


def _halo_pair(halo):
    """Accept an int (same contract both axes) or an (hx, hy) pair."""
    if isinstance(halo, (tuple, list)):
        hx, hy = halo
        return int(hx), int(hy)
    return int(halo), int(halo)


def deposit_violations(pos, g: GridSpec, halo):
    """Number of particles whose deposit support breaks the halo contract
    (per-axis when halo is an (hx, hy) pair)."""
    hx, hy = _halo_pair(halo)
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    base = jnp.floor(pos / d)
    q = jnp.stack(jnp.meshgrid(jnp.arange(g.N1), jnp.arange(g.N2),
                               jnp.arange(g.N3), indexing="ij")).astype(pos.dtype)
    off = base - q
    L = jnp.asarray([g.N1, g.N2, g.N3], pos.dtype).reshape(3, 1, 1, 1)
    off = jnp.mod(off + L / 2, L) - L / 2  # min-image
    lim = jnp.asarray([hx - 1, hy - 1], pos.dtype).reshape(2, 1, 1, 1)
    return jnp.sum((jnp.abs(off[:2]) > lim).any(axis=0))


def _tsc_w(dx, s):
    if s == 0:
        return 0.75 - dx * dx
    return 0.5 * (1.5 - jnp.abs(dx - s)) ** 2


def _round_halo(halo: int, B: int) -> int:
    """Smallest h >= halo with (B + 2h) % 8 == 0 — Mosaic requires the
    second-to-last block dim to divide 8, and the window dim that lands
    there is B + 2h (WX for the deposit's particle stack, WY for the
    gather's field window).  With B = 8 this is the old round-to-mult-of-4;
    with B = 4 halos of 2 mod 4 become legal, which matters because the
    window area (and the kernels' MXU MACs) scales with (B + 2h)^2."""
    h = halo
    while (B + 2 * h) % 8:
        h += 1
    return h


def _sub_tile(T: int, weight: int, budget_bytes: int = 6 << 20) -> int:
    """Largest divisor of T whose one-hot working set (weight rows of f32)
    fits the VMEM budget; keeps the kernels inside the 16 MB scoped-VMEM
    limit at any N3 (a 256^3 block overflowed it by 12 KB otherwise)."""
    t = T
    while t > 1 and weight * t * 4 > budget_bytes:
        # T = WY * N3 with power-of-two-ish factors; halving always divides
        t //= 2
    return max(t, 1)


# scoped-VMEM budget for the deposit kernel's working set: the hardware
# limit is 16 MB; 10 MB leaves headroom for Mosaic spills/copies (17.4 MB
# OOMed at compile time at 256^3/halo 12, the empirical gate since round 3)
DEP_VMEM_BUDGET = 10 << 20
# streamed-window mode: particle-window rows per grid step (sublane-aligned;
# WX is always a multiple of 8 by _round_halo, so RS=8 divides it)
STREAM_RS = 8
# experimental: build the z one-hots as ONE center compare + two sublane
# rolls (pltpu.roll absorbs the periodic wrap) instead of 3 masked passes
# with explicit wrap arithmetic — A/B flag for the hardware probe
Z_ROLL = False


def deposit_working_set_bytes(g: GridSpec, halo, block_dep: tuple,
                              weighted: bool = False,
                              streamed: bool = False) -> int:
    """Scoped-VMEM working set of tsc_deposit_pallas for this config: the
    Element-indexed particle window (all channels resident; with
    streamed=True only 2 x STREAM_RS rows — the x-row chunk + its pipeline
    double buffer), one sub-tile's one-hot matrices (AT (BX*BY, TS) +
    BT (N3, TS)) and the f32 accumulator.  Derived from the same
    _round_halo/_sub_tile arithmetic _make_kernel and tsc_deposit_pallas
    use, so the auto_block_dep gate cannot drift from the kernel (ADVICE
    r3)."""
    BX, BY = block_dep
    hx, hy = _halo_pair(halo)
    hx = _round_halo(hx, BX)          # as tsc_deposit_pallas
    WX, WY = BX + 2 * hx, BY + 2 * hy
    nc = 7 if weighted else 6
    nxy = BX * BY
    rows = min(2 * STREAM_RS, WX) if streamed else WX
    window = nc * rows * WY * g.N3 * 4
    TS = _sub_tile(WY * g.N3, g.N3 + nxy)
    onehots = TS * (g.N3 + nxy) * 4
    acc = nxy * g.N3 * 4
    return window + onehots + acc


def _deposit_rows(p_ref, n_rows, x0, y0, BX, BY, N3, TS, n_sub, weighted,
                  dot_dt, acc0):
    """Accumulate n_rows window x-rows of particles from `p_ref` (a VMEM ref
    or view shaped (nc, n_rows, WY*N3)) into the (BX*BY, N3) accumulator.

    One-hots are built TRANSPOSED (targets on sublanes, particles on lanes):
    a (T,) lane vector broadcasts to (n, T) for free, whereas (T,) -> (T, 1)
    is a lane->sublane relayout Mosaic refuses to lower.  The xy one-hot is
    SEPARABLE: per-axis X (BX, TS) and Y (BY, TS) one-hots with 3 masked
    passes each, composed as the outer product X[x,t]*Y[y,t] — one broadcast
    multiply instead of 9 full-size masked passes (the VPU construction work
    was the kernel's dominant cost, not the MXU dot: profile_step.json).
    Out-of-block targets fall off the per-axis iota range naturally, so no
    bounds sentinel is needed (flat-index aliasing is impossible)."""
    nxy = BX * BY
    x_ids = jax.lax.broadcasted_iota(jnp.int32, (BX, TS), 0)
    y_ids = jax.lax.broadcasted_iota(jnp.int32, (BY, TS), 0)
    z_ids = jax.lax.broadcasted_iota(jnp.int32, (N3, TS), 0)

    def tile_acc(r, s, acc):
        sl = slice(s * TS, (s + 1) * TS)
        bx = p_ref[0, r, sl].reshape(TS)
        by = p_ref[1, r, sl].reshape(TS)
        bz = p_ref[2, r, sl].reshape(TS)
        fx = p_ref[3, r, sl].reshape(TS)
        fy = p_ref[4, r, sl].reshape(TS)
        fz = p_ref[5, r, sl].reshape(TS)
        tx = bx.astype(jnp.int32) - x0
        ty = by.astype(jnp.int32) - y0
        tzi = bz.astype(jnp.int32)

        X = jnp.zeros((BX, TS), jnp.float32)
        Y = jnp.zeros((BY, TS), jnp.float32)
        for o in (-1, 0, 1):
            X = X + jnp.where(x_ids == (tx + o)[None, :],
                              _tsc_w(fx, o)[None, :], 0.0)
            Y = Y + jnp.where(y_ids == (ty + o)[None, :],
                              _tsc_w(fy, o)[None, :], 0.0)
        AT = (X.reshape(BX, 1, TS) * Y.reshape(1, BY, TS)).reshape(nxy, TS)

        wm = p_ref[6, r, sl].reshape(TS) if weighted else 1.0
        if Z_ROLL:
            H = jnp.where(z_ids == tzi[None, :], 1.0, 0.0)
            BT = (H * (wm * _tsc_w(fz, 0))[None, :]
                  + pltpu.roll(H, N3 - 1, 0) * (wm * _tsc_w(fz, -1))[None, :]
                  + pltpu.roll(H, 1, 0) * (wm * _tsc_w(fz, 1))[None, :])
        else:
            BT = jnp.zeros((N3, TS), jnp.float32)
            for oz in (-1, 0, 1):
                # per-particle mass folds into the z one-hot (one multiply)
                w = wm * _tsc_w(fz, oz)
                t = tzi + oz
                t = jnp.where(t < 0, t + N3, jnp.where(t >= N3, t - N3, t))
                BT = BT + jnp.where(z_ids == t[None, :], w[None, :], 0.0)

        # acc[xy, z] += sum_t AT[xy, t] BT[z, t]  (the Q K^T MXU pattern)
        # bf16 operands run the MXU at full rate (~4x fp32); rounding is
        # ~2^-9 relative on the TSC weights — opt-in via `bf16`
        return acc + jax.lax.dot_general(
            AT.astype(dot_dt), BT.astype(dot_dt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def row_body(r, acc):
        for s in range(n_sub):
            acc = tile_acc(r, s, acc)
        return acc

    return jax.lax.fori_loop(0, n_rows, row_body, acc0)


def _make_kernel(BX, BY, N3, WX, WY, weighted: bool = False,
                 bf16: bool = False):
    """Sub-tiling stays an in-kernel loop here (unlike the gather, whose
    sub-tile is a grid dimension): the deposit's overlapping particle
    windows need Element-indexed blocks, and Mosaic cannot prove lane
    alignment of the two-term Element offset j*BY*N3 + s*TS a grid-dim
    version needs.  The in-kernel p_ref[c, r, sl] load (dynamic sublane +
    possibly nonzero lane offset) lowers fine in every reachable deposit
    config: n_sub >= 2 only occurs at 256^3 under shard_map, and vmapped
    chains only fit on a chip at n_sub == 1 scales."""
    nxy = BX * BY
    T = WY * N3  # particles per x-row tile of the window
    TS = _sub_tile(T, N3 + nxy)
    assert T % TS == 0, (T, TS)  # odd-factor T would drop the tail silently
    n_sub = T // TS
    dot_dt = jnp.bfloat16 if bf16 else jnp.float32

    def body(p_ref, out_ref):
        # p_ref block is (6, WX, WY*N3): the (y, z) axes are pre-flattened by
        # the caller because Mosaic cannot lower a sublane+lane merging
        # reshape like (WY, N3) -> (WY*N3,) inside the kernel
        I = pl.program_id(0)
        J = pl.program_id(1)
        acc = _deposit_rows(p_ref, WX, I * BX, J * BY, BX, BY, N3, TS, n_sub,
                            weighted, dot_dt,
                            jnp.zeros((nxy, N3), jnp.float32))
        out_ref[...] = acc.reshape(BX, BY, N3)

    return body


def _make_kernel_dma(BX, BY, N3, WX, WY, RS, weighted: bool = False,
                     bf16: bool = False):
    """Streamed-window deposit body: the particle stack stays in HBM
    (memory_space=ANY) and the kernel DMAs x-row chunks of RS rows into a
    double-buffered VMEM scratch, accumulating per chunk.  This bounds the
    VMEM window term nc*WX*WY*N3 -> 2*nc*RS*WY*N3 bytes, which is what lets
    the (16,16) block compile at 256^3 (VERDICT r3 #1 — grid-dimension
    streaming variants all crash Mosaic on the two-term Element offset /
    revisited-output patterns; in-kernel DMA sidesteps both).

    The chunk loop is a static Python unroll (n_chunks = WX/RS is small) so
    buffer slots and chunk ids stay compile-time constants; only the DMA
    source offsets are dynamic, which DMAs support natively."""
    nxy = BX * BY
    T = WY * N3
    TS = _sub_tile(T, N3 + nxy)
    assert T % TS == 0, (T, TS)
    n_sub = T // TS
    assert WX % RS == 0, (WX, RS)
    n_chunks = WX // RS
    dot_dt = jnp.bfloat16 if bf16 else jnp.float32
    nc = 7 if weighted else 6

    def body(p_hbm, out_ref, scratch, sem):
        # p_hbm: full (nc, N1+2Hx, (N2+2Hy)*N3) stack in HBM;
        # scratch: (2, nc, RS, WY*N3) VMEM; sem: 2 DMA semaphores
        I = pl.program_id(0)
        J = pl.program_id(1)
        x0 = I * BX
        y0 = J * BY

        def dma(slot, c):
            return pltpu.make_async_copy(
                p_hbm.at[:, pl.ds(I * BX + c * RS, RS),
                         pl.ds(J * BY * N3, T)],
                scratch.at[slot], sem.at[slot])

        dma(0, 0).start()
        acc = jnp.zeros((nxy, N3), jnp.float32)
        for c in range(n_chunks):
            slot = c % 2
            if c + 1 < n_chunks:
                dma(1 - slot, c + 1).start()
            dma(slot, c).wait()
            acc = _deposit_rows(scratch.at[slot], RS, x0, y0, BX, BY, N3,
                                TS, n_sub, weighted, dot_dt, acc)
        out_ref[...] = acc.reshape(BX, BY, N3)

    return body


def _make_gather_kernel_zfirst(BX, BY, N3, WX, WY, halo_x, halo_y, TS,
                               bf16: bool = False, want_value: bool = True):
    """z-first gather kernel: contract the z one-hots on the MXU FIRST —
        F[xy, t] = sum_z win[xy, z] B[z, t]          (2 dots: B_val, B_dz)
    — then fold the small per-axis x/y one-hots in on the VPU:
        out[t] = sum_x X[x, t] * sum_y Y[y, t] * F[(x, y), t].

    vs the xy-first kernel (_make_gather_kernel): 2 MXU dots instead of 3
    (-33% MACs — the dots dominate: per particle each dot costs WX*WY*N3
    MACs), contraction dim N3 = a full MXU tile instead of WXY, and the xy
    stage becomes cheap VPU broadcast-multiply reductions (~3*WXY*TS flops).
    Hardware A/B at 128^3/halo 6: 6.81 -> 4.77 ms (sweep_r3_kernels.json).
    """
    WXY = WX * WY
    dot_dt = jnp.bfloat16 if bf16 else jnp.float32
    cg = 1 if want_value else 0

    def body(p_ref, f_ref, out_ref):
        I = pl.program_id(0)
        J = pl.program_id(1)
        wx0 = I * BX - halo_x
        wy0 = J * BY - halo_y

        win = f_ref[...].reshape(WXY, N3)
        win_d = win.astype(dot_dt)
        x_ids = jax.lax.broadcasted_iota(jnp.int32, (WX, TS), 0)
        y_ids = jax.lax.broadcasted_iota(jnp.int32, (WY, TS), 0)
        z_ids = jax.lax.broadcasted_iota(jnp.int32, (N3, TS), 0)

        def row_body(r, _):
            bx = p_ref[0, r, :].reshape(TS)
            by = p_ref[1, r, :].reshape(TS)
            bz = p_ref[2, r, :].reshape(TS)
            fx = p_ref[3, r, :].reshape(TS)
            fy = p_ref[4, r, :].reshape(TS)
            fz = p_ref[5, r, :].reshape(TS)
            tx = bx.astype(jnp.int32) - wx0
            ty = by.astype(jnp.int32) - wy0
            tzi = bz.astype(jnp.int32)

            X_val = jnp.zeros((WX, TS), jnp.float32)
            X_dx = jnp.zeros((WX, TS), jnp.float32)
            Y_val = jnp.zeros((WY, TS), jnp.float32)
            Y_dy = jnp.zeros((WY, TS), jnp.float32)
            for o in (-1, 0, 1):
                hx = x_ids == (tx + o)[None, :]
                X_val = X_val + jnp.where(hx, _tsc_w(fx, o)[None, :], 0.0)
                X_dx = X_dx + jnp.where(hx, _tsc_dw(fx, o)[None, :], 0.0)
                hy = y_ids == (ty + o)[None, :]
                Y_val = Y_val + jnp.where(hy, _tsc_w(fy, o)[None, :], 0.0)
                Y_dy = Y_dy + jnp.where(hy, _tsc_dw(fy, o)[None, :], 0.0)

            if Z_ROLL:
                H = jnp.where(z_ids == tzi[None, :], 1.0, 0.0)
                Hm = pltpu.roll(H, N3 - 1, 0)
                Hp = pltpu.roll(H, 1, 0)
                B_val = (H * _tsc_w(fz, 0)[None, :]
                         + Hm * _tsc_w(fz, -1)[None, :]
                         + Hp * _tsc_w(fz, 1)[None, :])
                B_dz = (H * _tsc_dw(fz, 0)[None, :]
                        + Hm * _tsc_dw(fz, -1)[None, :]
                        + Hp * _tsc_dw(fz, 1)[None, :])
            else:
                B_val = jnp.zeros((N3, TS), jnp.float32)
                B_dz = jnp.zeros((N3, TS), jnp.float32)
                for oz in (-1, 0, 1):
                    t = tzi + oz
                    t = jnp.where(t < 0, t + N3, jnp.where(t >= N3, t - N3, t))
                    hit = z_ids == t[None, :]
                    B_val = B_val + jnp.where(hit, _tsc_w(fz, oz)[None, :], 0.0)
                    B_dz = B_dz + jnp.where(hit, _tsc_dw(fz, oz)[None, :], 0.0)

            # F[xy, t] = sum_z win[xy, z] B[z, t] — contraction dim N3
            dot = lambda B: jax.lax.dot_general(
                win_d, B.astype(dot_dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # (WXY, TS) -> (WX, WY, TS): leading-dim split, Mosaic-legal
            F_val = dot(B_val).reshape(WX, WY, TS)
            F_dz = dot(B_dz).reshape(WX, WY, TS)

            G_val = (F_val * Y_val[None]).sum(1)   # (WX, TS)
            G_dy = (F_val * Y_dy[None]).sum(1)
            G_dz = (F_dz * Y_val[None]).sum(1)

            if want_value:
                out_ref[0, r, :] = (G_val * X_val).sum(0)
            out_ref[cg + 0, r, :] = (G_val * X_dx).sum(0)
            out_ref[cg + 1, r, :] = (G_dy * X_val).sum(0)
            out_ref[cg + 2, r, :] = (G_dz * X_val).sum(0)
            return 0

        jax.lax.fori_loop(0, BX, row_body, 0)

    return body


def _make_gather_kernel(BX, BY, N3, WX, WY, halo_x, halo_y, TS,
                        bf16: bool = False, want_value: bool = True):
    """Program owns a (BX, BY) block of *particles*; reads the (WX, WY, N3)
    field window around it; emits (4, BX, BY, N3):
        [0] value gather  sum_o w_o field(base+o)           (interpolate_TSC)
        [1..3] d/dpos_i   sum_o dw_o/dpos_i field(base+o)   (deposit adjoint)
    With want_value=False the value channel is dropped (3, BX, BY, N3) —
    the deposit VJP only consumes the position gradients.

    bf16=True casts the dot operands to bfloat16 (full-rate MXU, ~4x fp32;
    ~2^-9 relative rounding).  Safe on the *force* path: leapfrog with any
    deterministic force stays volume-preserving and reversible, and the MH
    accept uses the exact f32 psi, so the sampled measure is unchanged —
    bf16 force error only costs a marginal bit of acceptance rate.
    """
    WXY = WX * WY
    dot_dt = jnp.bfloat16 if bf16 else jnp.float32
    cg = 1 if want_value else 0  # gradient-channel offset

    def body(p_ref, f_ref, out_ref):
        # p_ref and out_ref have (y, z) pre-flattened (Mosaic reshape limits,
        # see _make_kernel) and carry one TS-wide sub-tile (the innermost
        # grid dim, see _make_kernel); f_ref stays 3-D — its
        # (WX, WY, N3) -> (WXY, N3) reshape merges leading dims only, which
        # Mosaic lowers fine
        I = pl.program_id(0)
        J = pl.program_id(1)
        # window origin in unwrapped cell coords (per-axis halos)
        wx0 = I * BX - halo_x
        wy0 = J * BY - halo_y

        win = f_ref[...].reshape(WXY, N3)
        win_d = win.astype(dot_dt)  # cast once per block, not per tile
        # per-axis transposed one-hots (see _make_kernel): the flat (WXY, TS)
        # weight matrices are outer products of small X (WX, TS) and Y
        # (WY, TS) factors — 3 masked passes per axis + 3 broadcast
        # multiplies, instead of 9 full-size masked passes per output
        # channel.  A halo-contract-violating particle's txo/tyo falls off
        # the per-axis iota range, so it loses its forward AND backward
        # contribution with no explicit bounds mask (the flat-index aliasing
        # that required one is structurally impossible here).
        x_ids = jax.lax.broadcasted_iota(jnp.int32, (WX, TS), 0)
        y_ids = jax.lax.broadcasted_iota(jnp.int32, (WY, TS), 0)
        z_ids = jax.lax.broadcasted_iota(jnp.int32, (N3, TS), 0)

        def row_body(r, _):
            bx = p_ref[0, r, :].reshape(TS)
            by = p_ref[1, r, :].reshape(TS)
            bz = p_ref[2, r, :].reshape(TS)
            fx = p_ref[3, r, :].reshape(TS)
            fy = p_ref[4, r, :].reshape(TS)
            fz = p_ref[5, r, :].reshape(TS)
            tx = bx.astype(jnp.int32) - wx0   # in [1, WX-2] by the contract
            ty = by.astype(jnp.int32) - wy0
            tzi = bz.astype(jnp.int32)

            X_val = jnp.zeros((WX, TS), jnp.float32)
            X_dx = jnp.zeros((WX, TS), jnp.float32)
            Y_val = jnp.zeros((WY, TS), jnp.float32)
            Y_dy = jnp.zeros((WY, TS), jnp.float32)
            for o in (-1, 0, 1):
                hx = x_ids == (tx + o)[None, :]
                X_val = X_val + jnp.where(hx, _tsc_w(fx, o)[None, :], 0.0)
                X_dx = X_dx + jnp.where(hx, _tsc_dw(fx, o)[None, :], 0.0)
                hy = y_ids == (ty + o)[None, :]
                Y_val = Y_val + jnp.where(hy, _tsc_w(fy, o)[None, :], 0.0)
                Y_dy = Y_dy + jnp.where(hy, _tsc_dw(fy, o)[None, :], 0.0)

            outer = lambda X, Y: (X.reshape(WX, 1, TS) *
                                  Y.reshape(1, WY, TS)).reshape(WXY, TS)

            B_val = jnp.zeros((N3, TS), jnp.float32)
            B_dz = jnp.zeros((N3, TS), jnp.float32)
            for oz in (-1, 0, 1):
                t = tzi + oz
                t = jnp.where(t < 0, t + N3, jnp.where(t >= N3, t - N3, t))
                hit = z_ids == t[None, :]
                B_val = B_val + jnp.where(hit, _tsc_w(fz, oz)[None, :], 0.0)
                B_dz = B_dz + jnp.where(hit, _tsc_dw(fz, oz)[None, :], 0.0)

            # MT[z, t] = sum_c win[c, z] A[c, t]  (transposed-lhs contraction)
            dot = lambda A: jax.lax.dot_general(
                win_d, A.astype(dot_dt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            MT_val = dot(outer(X_val, Y_val))   # [N3, TS]
            MT_dx = dot(outer(X_dx, Y_val))
            MT_dy = dot(outer(X_val, Y_dy))

            if want_value:
                out_ref[0, r, :] = (MT_val * B_val).sum(0)
            out_ref[cg + 0, r, :] = (MT_dx * B_val).sum(0)
            out_ref[cg + 1, r, :] = (MT_dy * B_val).sum(0)
            out_ref[cg + 2, r, :] = (MT_val * B_dz).sum(0)
            return 0

        jax.lax.fori_loop(0, BX, row_body, 0)

    return body


def _tsc_dw(dx, s):
    """d/d(dx) of the per-axis TSC weight (cell units; callers divide by d)."""
    if s == 0:
        return -2.0 * dx
    return -(1.5 - jnp.abs(dx - s)) * jnp.sign(dx - s)


def tsc_gather_grads_pallas(field, pos, g: GridSpec, halo: int = 4,
                            block: tuple = (8, 8), interpret: bool = False,
                            bf16: bool = False, want_value: bool = True,
                            zfirst: bool = True):
    """(value, dV/dx, dV/dy, dV/dz) gathers at particle positions via the
    windowed block kernel; shape (4,) + grid.  With want_value=False only
    the 3 position gradients are computed, shape (3,) + grid (the deposit
    VJP path).  Gradients are per *physical* position (divided by the cell
    size).

    `halo` may be an (hx, hy) pair; Mosaic's 8-divisibility only binds the
    y window here (WY = BY + 2*hy is the field block's sublane dim), so hy
    is rounded up while hx stays at the tight measured contract."""
    BX, BY = block
    assert g.N1 % BX == 0 and g.N2 % BY == 0
    hx, hy = _halo_pair(halo)
    assert hx > 0 and hy > 0, "pallas gather needs a resolved halo > 0"
    hy = _round_halo(hy, BY)  # Mosaic: WY = BY + 2*hy must divide by 8
    WX, WY = BX + 2 * hx, BY + 2 * hy
    nch = 4 if want_value else 3
    part = _phase_a(pos, g, hx, hy)
    # field window needs no coordinate adjustment — plain wrap padding
    fpad = jnp.concatenate([field[-hx:], field, field[:hx]], axis=0)
    fpad = jnp.concatenate([fpad[:, -hy:], fpad, fpad[:, :hy]], axis=1)

    # the particle data here is the *unpadded* center block: slice the padded
    # stack back (cheaper than recomputing), then flatten (y, z) — Mosaic
    # cannot merge sublane+lane inside the kernel (see _make_kernel)
    part_c = part[:, hx:-hx, hy:-hy].reshape(6, g.N1, g.N2 * g.N3)

    # working set per sub-tile: 3 A outer products (WXY rows) + 2 B one-hots
    # (N3) + 3 MT dot results (N3) + bf16/copy slack (~WXY); sub-tiles are
    # the innermost grid dim (see _make_kernel on why)
    WXY = WX * WY
    T = BY * g.N3
    TS = _sub_tile(T, 4 * WXY + 5 * g.N3)
    # with sub-tile as a grid dim, a non-divisor TS would silently misalign
    # every j>0 block (offset j*n_sub + s) — fail loudly instead
    assert T % TS == 0, (T, TS)
    n_sub = T // TS
    grid = (g.N1 // BX, g.N2 // BY, n_sub)
    mk = _make_gather_kernel_zfirst if zfirst else _make_gather_kernel
    out = pl.pallas_call(
        mk(BX, BY, g.N3, WX, WY, hx, hy, TS, bf16=bf16,
           want_value=want_value),
        out_shape=jax.ShapeDtypeStruct((nch, g.N1, g.N2 * g.N3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, BX, TS), lambda i, j, s: (0, i, j * n_sub + s)),
            pl.BlockSpec((Element(WX), Element(WY), Element(g.N3)),
                         index_map=lambda i, j, s: (i * BX, j * BY, 0)),
        ],
        out_specs=pl.BlockSpec((nch, BX, TS),
                               lambda i, j, s: (0, i, j * n_sub + s)),
        interpret=interpret,
    )(part_c, fpad)
    out = out.reshape((nch,) + g.shape)
    d = jnp.asarray(g.cell, jnp.float32).reshape(3, 1, 1, 1)
    return out.at[nch - 3:].divide(d)


def _offset_histogram(delta, g: GridSpec, fc, gp):
    """bincount of max(|x off|, |y off|) cells of the lag2eul particle map
    for `delta` (dense; rsd/Pallas forced off — the x/y halo contract is
    RSD-free)."""
    import dataclasses

    from barcode_tpu.forward.lag2eul import lag2eul

    fc_norsd = dataclasses.replace(fc, rsd=False, pallas_deposit=False)

    @jax.jit
    def hist(s):
        _, pos = lag2eul(s, g, fc_norsd, gp, return_pos=True)
        d = jnp.asarray(g.cell, pos.dtype).reshape(3, 1, 1, 1)
        base = jnp.floor(pos / d)
        q = jnp.stack(jnp.meshgrid(
            jnp.arange(g.N1), jnp.arange(g.N2), jnp.arange(g.N3),
            indexing="ij")).astype(pos.dtype)
        off = base - q
        L = jnp.asarray([g.N1, g.N2, g.N3], pos.dtype).reshape(3, 1, 1, 1)
        off = jnp.mod(off + L / 2, L) - L / 2
        m = jnp.maximum(jnp.abs(off[0]), jnp.abs(off[1]))
        # full min-image range: |off| <= N/2, so no offset can fall outside
        # the histogram (jnp.bincount silently DROPS out-of-range values,
        # which would understate the halo contract and drop deposit mass)
        return jnp.bincount(m.astype(jnp.int32).ravel(),
                            length=max(g.N1, g.N2) // 2 + 1)

    import numpy as np
    return np.asarray(hist(delta))


def displacement_bound_cells(delta, g: GridSpec, fc, gp) -> int:
    """Measured halo contract: max |x/y cell offset| of the lag2eul particle
    map for `delta`, + TSC reach + sampling margin.  Run once at setup on
    the mock truth (dense; fc is forced to rsd=False, XLA deposit).  The
    4-sigma a-priori formula oversizes the kernel halo ~2.5x (PLAN.md)."""
    h = _offset_histogram(delta, g, fc, gp)
    return int(max(k for k, c in enumerate(h) if c > 0)) + 4  # + reach/margin


def displacement_halo_quantile(delta, g: GridSpec, fc, gp,
                               tail_k: int) -> int:
    """Quantile halo for the halo-tail split (assign.make_tsc_deposit_fast):
    the smallest halo whose contract-violator count fits the tail capacity
    with 4x headroom (drifting positions only add exactly-handled violators,
    so no sampling slack is added and the halo stays on the kernels'
    mult-of-4 quantization sweet spot)."""
    h = _offset_histogram(delta, g, fc, gp)
    viol = h[::-1].cumsum()[::-1]  # viol[k] = #particles with off >= k
    for k in range(1, len(viol)):
        if viol[k] <= tail_k // 4:
            return k
    return int(max(k for k, c in enumerate(h) if c > 0)) + 2


# ---------------------------------------------------------------------------
# Slab variants (sharded forward model, parallel/sharded_forward.py)
# ---------------------------------------------------------------------------

def _slab_channels(pos, g: GridSpec, n1_loc: int, devf, weights=None):
    """Per-particle channels for slab-local particles: bx in *slab-local*
    unwrapped coords (own row + min-image offset, may be negative or beyond
    n1_loc near the edges), by global-unwrapped, bz wrapped, fracs.  `devf`
    is the device's 'grid' axis index as a float scalar (traced inside
    shard_map)."""
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    u = pos / d
    base = jnp.floor(u)
    frac = (u - base - 0.5).astype(jnp.float32)
    qx = jnp.arange(n1_loc, dtype=pos.dtype)[:, None, None]
    offx = jnp.mod(base[0] - (devf * n1_loc + qx) + g.N1 / 2.0,
                   g.N1) - g.N1 / 2.0
    bx = (qx + offx).astype(jnp.float32)
    qy = jnp.arange(g.N2, dtype=pos.dtype)[None, :, None]
    offy = jnp.mod(base[1] - qy + g.N2 / 2.0, g.N2) - g.N2 / 2.0
    by = (qy + offy).astype(jnp.float32)
    bz = jnp.mod(base[2], g.N3).astype(jnp.float32)
    chans = [bx, by, bz, frac[0], frac[1], frac[2]]
    if weights is not None:
        chans.append(weights.astype(jnp.float32))
    return jnp.stack(chans)


def tsc_deposit_pallas_slab(pos, g: GridSpec, n1_loc: int, devf, halo: int,
                            block: tuple = (8, 8), interpret: bool = False,
                            weights=None, bf16: bool = False):
    """TSC deposit of slab-local particles into an *extended* x buffer
    [halo + n1_loc + halo, N2, N3]; fold the margins into the neighbours with
    a ppermute halo exchange afterwards (sharded_forward._halo_exchange_add).

    Reuses the full-grid block kernel: output blocks tile the extended
    buffer; the particle window is the same stack padded with DEAD rows in x
    (their bx sentinel never matches a block target) and periodic copies in
    y.  Halo contract as in tsc_deposit_pallas: |base - q| <= halo - 1.
    """
    BX, BY = block
    assert halo % 4 == 0 and halo > 0, "slab pallas halo: positive, mult of 4"
    n1_ext = n1_loc + 2 * halo
    assert n1_ext % BX == 0 and g.N2 % BY == 0, (n1_ext, BX, g.N2, BY)
    WX, WY = BX + 2 * halo, BY + 2 * halo
    stack = _slab_channels(pos, g, n1_loc, devf, weights)
    nc = stack.shape[0]
    # bx -> extended-buffer coords (local row r lives at ext row r + halo)
    stack = stack.at[0].add(float(halo))
    # x: dead padding — 2*halo rows each side so window [I*BX, I*BX+WX) of
    # the padded array covers exactly the contributing local rows
    dead = jnp.zeros((nc, 2 * halo, g.N2, g.N3), jnp.float32).at[0].set(-1e6)
    stack = jnp.concatenate([dead, stack, dead], axis=1)
    # y: periodic copies with +-N2 base adjustment (as _phase_a)
    adj_y = jnp.zeros(nc, jnp.float32).at[1].set(g.N2).reshape(nc, 1, 1, 1)
    stack = jnp.concatenate(
        [stack[:, :, -halo:] - adj_y, stack, stack[:, :, :halo] + adj_y],
        axis=2)
    part = stack.reshape(nc, stack.shape[1], -1)

    nxy = BX * BY
    stream = (nc * WX * WY * g.N3 * 4 +
              _sub_tile(WY * g.N3, g.N3 + nxy) * (g.N3 + nxy) * 4 +
              nxy * g.N3 * 4) > DEP_VMEM_BUDGET and WX % STREAM_RS == 0
    grid = (n1_ext // BX, g.N2 // BY)
    out_spec = pl.BlockSpec((BX, BY, g.N3), lambda i, j: (i, j, 0))
    if stream:
        kern = _make_kernel_dma(BX, BY, g.N3, WX, WY, STREAM_RS,
                                weighted=weights is not None, bf16=bf16)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n1_ext, g.N2, g.N3), jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((2, nc, STREAM_RS, WY * g.N3), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(part)
    kern = _make_kernel(BX, BY, g.N3, WX, WY, weighted=weights is not None,
                        bf16=bf16)
    in_spec = pl.BlockSpec(
        (Element(nc), Element(WX), Element(WY * g.N3)),
        index_map=lambda i, j: (0, i * BX, j * BY * g.N3),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n1_ext, g.N2, g.N3), jnp.float32),
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(part)


def tsc_gather_grads_pallas_slab(ext_field, pos, g: GridSpec, n1_loc: int,
                                 devf, halo: int, block: tuple = (8, 8),
                                 interpret: bool = False, bf16: bool = False,
                                 want_value: bool = True, zfirst: bool = True):
    """(value, dV/dx, dV/dy, dV/dz) gathers of an extended-slab field at
    slab-local particle positions — the exact adjoint of
    tsc_deposit_pallas_slab w.r.t. the extended buffer.  Shape
    (4, n1_loc, N2, N3), or (3, ...) gradients only with want_value=False;
    gradients are per physical position."""
    BX, BY = block
    assert halo % 4 == 0 and halo > 0
    assert n1_loc % BX == 0 and g.N2 % BY == 0
    WX, WY = BX + 2 * halo, BY + 2 * halo
    nch = 4 if want_value else 3
    part = _slab_channels(pos, g, n1_loc, devf)
    part = part.reshape(6, n1_loc, g.N2 * g.N3)
    # field is the extended buffer: x margins already present; y wraps
    fpad = jnp.concatenate(
        [ext_field[:, -halo:], ext_field, ext_field[:, :halo]], axis=1)

    T = BY * g.N3
    TS = _sub_tile(T, 4 * WX * WY + 5 * g.N3)
    assert T % TS == 0, (T, TS)  # see tsc_gather_grads_pallas
    n_sub = T // TS
    grid = (n1_loc // BX, g.N2 // BY, n_sub)
    mk = _make_gather_kernel_zfirst if zfirst else _make_gather_kernel
    out = pl.pallas_call(
        mk(BX, BY, g.N3, WX, WY, halo, halo, TS, bf16=bf16,
           want_value=want_value),
        out_shape=jax.ShapeDtypeStruct((nch, n1_loc, g.N2 * g.N3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, BX, TS), lambda i, j, s: (0, i, j * n_sub + s)),
            pl.BlockSpec((Element(WX), Element(WY), Element(g.N3)),
                         index_map=lambda i, j, s: (i * BX, j * BY, 0)),
        ],
        out_specs=pl.BlockSpec((nch, BX, TS),
                               lambda i, j, s: (0, i, j * n_sub + s)),
        interpret=interpret,
    )(part, fpad)
    out = out.reshape((nch, n1_loc, g.N2, g.N3))
    d = jnp.asarray(g.cell, jnp.float32).reshape(3, 1, 1, 1)
    return out.at[nch - 3:].divide(d)


def tsc_deposit_pallas(pos, g: GridSpec, halo: int = 4, block: tuple = (8, 8),
                       interpret: bool = False, weights=None,
                       bf16: bool = False, stream: bool | None = None):
    """TSC deposit via the Pallas block kernel; optional per-particle
    `weights` (grid shape — particle masses, getDensity_* mass arrays, or
    gather-adjoint cotangents).

    Requires |base - q| <= halo - 1 cells in x and y per particle (check
    with `deposit_violations`); breached particles are dropped.

    `halo` may be an (hx, hy) pair; Mosaic's 8-divisibility only binds the
    x window here (WX = BX + 2*hx is the particle stack's sublane dim), so
    hx is rounded up while hy stays at the tight measured contract.

    stream: None auto-selects the streamed-window kernel when the full
    window would overflow DEP_VMEM_BUDGET (see _make_kernel's stream_rs);
    True/False forces it for sweeps.
    """
    BX, BY = block
    assert g.N1 % BX == 0 and g.N2 % BY == 0
    hx, hy = _halo_pair(halo)
    assert hx > 0 and hy > 0, "pallas deposit needs a resolved halo > 0"
    # Mosaic requires the second-to-last block dim (the particle stack's
    # WX) to divide by 8; WY only enters via the lane dim WY*N3
    hx = _round_halo(hx, BX)
    WX, WY = BX + 2 * hx, BY + 2 * hy
    if stream is None:
        stream = deposit_working_set_bytes(
            g, (hx, hy), block, weighted=weights is not None) > DEP_VMEM_BUDGET
    part = _phase_a(pos, g, hx, hy, weights)  # (6|7, N1+2Hx, N2+2Hy, N3)
    nc = part.shape[0]
    # flatten (y, z) so the kernel's per-row tiles are 1-D without any
    # Mosaic-unsupported sublane+lane merge inside the kernel
    part = part.reshape(nc, part.shape[1], -1)

    grid = (g.N1 // BX, g.N2 // BY)
    out_spec = pl.BlockSpec((BX, BY, g.N3), lambda i, j: (i, j, 0))
    if stream:
        kern = _make_kernel_dma(BX, BY, g.N3, WX, WY, STREAM_RS,
                                weighted=weights is not None, bf16=bf16)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(g.shape, jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((2, nc, STREAM_RS, WY * g.N3), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(part)
    kern = _make_kernel(BX, BY, g.N3, WX, WY, weighted=weights is not None,
                        bf16=bf16)
    # Mosaic: all dims must be Element when any is
    in_spec = pl.BlockSpec(
        (Element(nc), Element(WX), Element(WY * g.N3)),
        index_map=lambda i, j: (0, i * BX, j * BY * g.N3),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(g.shape, jnp.float32),
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(part)
