"""Spectral operators on the periodic grid.

TPU-native replacement for the reference's FFT engine + k-space kernels
(/root/reference/barlib/src/fftwrapper.cc, scale_space.cpp, gradient.cpp,
convolution.cpp).  XLA compiles and caches FFT plans, so the reference's
entire plan_pkg plumbing layer disappears; all operators here are pure
functions that fuse into surrounding elementwise work.

Conventions (FOURIER_DEF_2, the reference default — Options.cmake:140-236):
  * forward FFT is the plain unnormalized DFT sum (FFTW_FORWARD),
  * backward FFT carries the 1/N factor (fftwrapper.cc:62-79).
  This matches numpy/jax's default "backward" normalization exactly, so
  `rfftn`/`irfftn` are drop-in.
  * k-vectors are 2*pi/L * signed integer frequency (scale_space.cpp:16-63).
  * odd-order spectral derivatives zero the Nyquist planes
    (gradient.cpp:22-79 and the fft-deriv.pdf note in the reference).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec


def kvec(g: GridSpec, rfft: bool = True, dtype=jnp.float32):
    """Broadcastable (kx, ky, kz) along the three axes.

    kx has shape (N1,1,1), ky (1,N2,1), kz (1,1,N3h or N3).
    Matches calc_ki of the reference (scale_space.cpp:41-51); for even N the
    Nyquist frequency sign differs (numpy uses -N/2, reference +N/2) which is
    irrelevant everywhere it is used (k^2, or zeroed Nyquist planes).
    """
    kx = (2 * jnp.pi) * jnp.fft.fftfreq(g.N1, d=g.L1 / g.N1).astype(dtype)
    ky = (2 * jnp.pi) * jnp.fft.fftfreq(g.N2, d=g.L2 / g.N2).astype(dtype)
    if rfft:
        kz = (2 * jnp.pi) * jnp.fft.rfftfreq(g.N3, d=g.L3 / g.N3).astype(dtype)
    else:
        kz = (2 * jnp.pi) * jnp.fft.fftfreq(g.N3, d=g.L3 / g.N3).astype(dtype)
    return kx[:, None, None], ky[None, :, None], kz[None, None, :]


def k_squared(g: GridSpec, rfft: bool = True, dtype=jnp.float32):
    kx, ky, kz = kvec(g, rfft=rfft, dtype=dtype)
    return kx * kx + ky * ky + kz * kz


def nyquist_mask(g: GridSpec, rfft: bool = True, dtype=jnp.float32):
    """1.0 away from any Nyquist plane, 0.0 on them (for odd derivatives)."""
    def axis_mask(n, m, half_only):
        i = jnp.arange(m)
        if n % 2 == 0:
            return jnp.where(i == n // 2, 0.0, 1.0).astype(dtype)
        return jnp.ones((m,), dtype)

    mx = axis_mask(g.N1, g.N1, False)[:, None, None]
    my = axis_mask(g.N2, g.N2, False)[None, :, None]
    nz = g.N3 // 2 + 1 if rfft else g.N3
    mz = axis_mask(g.N3, nz, True)[None, None, :]
    return mx * my * mz


def rfft3(x):
    """Real-to-half-complex 3D FFT (unnormalized forward, = fftR2C).

    (The forward transform measured exact at 256^3 on the axon backend —
    real AND imaginary parts to ~4e-7 vs f64 — so unlike irfft3 it needs
    no decomposition workaround; a barriered per-axis variant was tried
    and did not move the residual dense-program error either.)
    """
    return jnp.fft.rfftn(x, axes=(-3, -2, -1))


def irfft3(X, g: GridSpec):
    """Half-complex-to-real 3D FFT with 1/N (= fftC2R).

    On the TPU backend the inverse is decomposed into per-axis 1-D
    transforms with optimization barriers between the stages.  Round-5
    finding (pinned on hardware, artifacts/probe_dense_vs_slab.log +
    probe_dense_vs_slab_{128,256}.json): the axon backend MISCOMPILES
    3-stage inverse-FFT chains at 256^3 — `irfftn` (and the barrier-free
    per-axis chain) returns 19-35% relative error vs f64, varying BETWEEN
    CALLS of the same compiled program, while the forward `rfftn`, every
    1- and 2-stage inverse chain, the barriered 3-stage chain, and the
    shard_map-compiled slab pipeline are all exact to ~4e-7; 128^3 is
    unaffected.  The barriers only stop a miscompiling fusion between
    library FFT calls, so the cost is ~zero; the math is unchanged.
    """
    if jax.default_backend() == "tpu":
        f = jnp.fft.ifft(X, axis=-3)
        f = jax.lax.optimization_barrier(f)
        f = jnp.fft.ifft(f, axis=-2)
        f = jax.lax.optimization_barrier(f)
        return jnp.fft.irfft(f, n=g.shape[2], axis=-1)
    return jnp.fft.irfftn(X, s=g.shape, axes=(-3, -2, -1))


def gradfft(x, g: GridSpec, axis: int):
    """Spectral gradient along `axis` (0,1,2), Nyquist planes zeroed.

    Parity: gradfft, /root/reference/barlib/src/gradient.cpp:22-79.
    """
    X = rfft3(x)
    kx, ky, kz = kvec(g)
    kl = (kx, ky, kz)[axis]
    X = (1j * kl) * X * nyquist_mask(g)
    return irfft3(X, g)


def gradfindif(x, g: GridSpec, axis: int):
    """4th-order central finite-difference gradient with periodic wrap:
    f' = [ (4/3)(f_{+1} - f_{-1}) - (1/6)(f_{+2} - f_{-2}) ] / (2 d).

    Parity: gradfindif, /root/reference/barlib/src/gradient.cpp:81-155
    (the GFINDIFF alternative to the spectral gradient, selectable for the
    2LPT source term, EqSolvers.cc:399-412).  Periodic wrap via jnp.roll.
    """
    d = (g.L1 / g.N1, g.L2 / g.N2, g.L3 / g.N3)[axis]
    r = lambda s: jnp.roll(x, shift=-s, axis=axis)  # f(x + s)
    return ((4.0 / 3.0) * (r(1) - r(-1)) - (1.0 / 6.0) * (r(2) - r(-2))) / (2.0 * d)


def grad_inv_lap_C(X, g: GridSpec, axis: int):
    """Multiply a half-complex field by -i*k_axis/k^2, Nyquist zeroed.

    Parity: grad_inv_lap_FS, /root/reference/barlib/src/gradient.cpp:157-211.
    """
    kx, ky, kz = kvec(g)
    k2 = kx * kx + ky * ky + kz * kz
    kl = (kx, ky, kz)[axis]
    fac = jnp.where(k2 > 0, kl / jnp.where(k2 > 0, k2, 1.0), 0.0)
    return (-1j) * fac * X * nyquist_mask(g)


def poisson_inv_C(X, g: GridSpec):
    """Multiply half-complex by -1/k^2 (inverse Laplacian), DC zeroed.

    Parity: PoissonSolver kernel, /root/reference/barlib/src/EqSolvers.cc:29-64.
    """
    k2 = k_squared(g)
    fac = jnp.where(k2 > 0, -1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    return fac * X


def poisson_solve(delta, g: GridSpec):
    """phi with lap(phi) = delta (spectral -1/k^2)."""
    return irfft3(poisson_inv_C(rfft3(delta), g), g)


def displacement_from_phi(phi, g: GridSpec):
    """Psi_i = d/dx_i (inv-laplacian phi): one rfft + three irfft.

    The half-complex multiplier is -i*k_i/k^2 with eps-guard and Nyquist
    zeroing, matching theta2vel (/root/reference/barlib/src/EqSolvers.cc:
    168-277).  Returns an array of shape (3,) + grid shape.
    """
    X = rfft3(phi)
    kx, ky, kz = kvec(g)
    k2 = kx * kx + ky * ky + kz * kz
    guard = k2 > 1e-14
    inv_k2 = jnp.where(guard, 1.0 / jnp.where(guard, k2, 1.0), 0.0)
    mask = nyquist_mask(g)
    base = (-1j) * X * inv_k2 * mask
    return irfft3(jnp.stack([kx * base, ky * base, kz * base]), g)


def hermitian_mult(g: GridSpec, dtype=jnp.float32):
    """Multiplicity of each half-complex mode in the full complex grid:
    2 for 0 < kz < N3/2, else 1 (the z-axis Hermitian pairing)."""
    n3h = g.N3 // 2 + 1
    iz = jnp.arange(n3h)
    mult_z = jnp.where((iz > 0) & ~((g.N3 % 2 == 0) & (iz == g.N3 // 2)),
                       2.0, 1.0).astype(dtype)
    return mult_z[None, None, :]


def inv_corr_quadratic_C(X, g: GridSpec, corr_rfft):
    """1/2 x . IFFT[(V/N)/C(k) FFT(x)] evaluated directly in Fourier space
    via Parseval: (1/2N) sum_k mult_k (V/N)/C(k) |X_k|^2, zero where C <= 0.

    Mathematically identical to 0.5*sum(x * convolve_inv_corr(x, g, C)) but
    costs no transforms when X = rfft3(x) is already available — the round-5
    FFT-chain dedupe (the prior energy and the LPT solve share one
    rfft3(delta) per psi evaluation; see model/posterior.make_psi).
    """
    norm_fs = g.vol / g.N
    fac = jnp.where(corr_rfft > 0.0,
                    norm_fs / jnp.where(corr_rfft > 0.0, corr_rfft, 1.0), 0.0)
    p_mode = X.real * X.real + X.imag * X.imag
    return 0.5 / g.N * jnp.sum(hermitian_mult(g, p_mode.dtype) * fac * p_mode)


def convolve_inv_corr(x, g: GridSpec, corr_rfft):
    """out = IFFT[ (V/N) / C(k) * FFT(x) ], zero where C <= 0.

    The FS mass / inverse-covariance application of the reference
    (convolveInvCorrFuncWithSignal, /root/reference/barlib/src/HMC_help.cc:
    16-64, FOURIER_DEF_2 normFS = vol/N).  `corr_rfft` is a real array in the
    half-complex layout (e.g. P(k) or mass_f sampled on the rfft grid).
    """
    norm_fs = g.vol / g.N
    X = rfft3(x)
    fac = jnp.where(corr_rfft > 0.0, norm_fs / jnp.where(corr_rfft > 0.0, corr_rfft, 1.0), 0.0)
    return irfft3(fac * X, g)


def apply_corr(x, g: GridSpec, corr_rfft):
    """out = IFFT[ (N/V) * C(k) * FFT(x) ] — the inverse of convolve_inv_corr."""
    X = rfft3(x)
    return irfft3((g.N / g.vol) * corr_rfft * X, g)


def smooth(x, g: GridSpec, scale: float, filtertype: int = 1):
    """Fourier-space smoothing: 1 Gaussian exp(-k^2 r^2/2), 2 top-hat(k<kcut),
    3 erfc transition.

    Parity: kernelcomp/convcomp (/root/reference/barlib/src/convolution.cpp:
    224-377) without the disk round-trip — the normalized real-space kernel's
    FFT reduces to exactly these multipliers (kernel sums to K(k=0)=1).
    """
    k2 = k_squared(g)
    if filtertype == 1:
        K = jnp.exp(-k2 * (scale * scale) / 2.0)
    elif filtertype == 2:
        K = (jnp.sqrt(k2) <= scale).astype(x.dtype)
    elif filtertype == 3:
        sigma = 0.3
        u = (jnp.sqrt(k2) - scale) / (jnp.sqrt(2.0) * sigma)
        K = jax_erfc(u)
    else:
        raise ValueError(f"unknown filtertype {filtertype}")
    return irfft3(K * rfft3(x), g)


def jax_erfc(u):
    import jax.scipy.special as jsp

    return jsp.erfc(u)


def smooth_zeropad(x, g: GridSpec, scale: float, filtertype: int = 1):
    """Smoothing with 2x zero-padding — the reference's `zeropad` branch for
    non-periodic convolution (convolve, convolution.cpp:23-221: field copied
    into the center of a doubled box, kernel built with the doubled L/N).
    """
    gz = GridSpec(2 * g.N1, 2 * g.N2, 2 * g.N3, 2 * g.L1, 2 * g.L2, 2 * g.L3)
    big = jnp.zeros(gz.shape, x.dtype)
    big = big.at[g.N1 // 2: g.N1 // 2 + g.N1,
                 g.N2 // 2: g.N2 // 2 + g.N2,
                 g.N3 // 2: g.N3 // 2 + g.N3].set(x)
    sm = smooth(big, gz, scale, filtertype)
    return sm[g.N1 // 2: g.N1 // 2 + g.N1,
              g.N2 // 2: g.N2 // 2 + g.N2,
              g.N3 // 2: g.N3 // 2 + g.N3]


def fft_upsample(x, g: GridSpec, factor: int):
    """Band-limited upsampling by Fourier zero-padding (the FFT-interpolation
    mode of tools/2D_corr_fct_interp.cc:35-433).  Preserves the mean and all
    existing modes; new modes are zero."""
    X = rfft3(x)
    g2 = GridSpec(factor * g.N1, factor * g.N2, factor * g.N3, g.L1, g.L2, g.L3)
    big = jnp.zeros(g2.rshape, X.dtype)

    n1, n2, n3h = g.rshape
    h1, h2 = g.N1 // 2, g.N2 // 2
    # copy the four (x,y) frequency corners; z is already low-first in rfft
    big = big.at[:h1, :h2, :n3h].set(X[:h1, :h2, :])
    big = big.at[:h1, -(n2 - h2):, :n3h].set(X[:h1, h2:, :])
    big = big.at[-(n1 - h1):, :h2, :n3h].set(X[h1:, :h2, :])
    big = big.at[-(n1 - h1):, -(n2 - h2):, :n3h].set(X[h1:, h2:, :])
    return irfft3(big, g2) * (factor**3)


# ---------------------------------------------------------------------------
# Power-spectrum measurement
# ---------------------------------------------------------------------------

def _shell_bins(g: GridSpec, nbin: int):
    """Per-rfft-mode (bin index, multiplicity, |k|) for spherical binning."""
    kk = jnp.sqrt(k_squared(g))
    dk = g.kmax / nbin
    nbin_ix = jnp.floor(kk / dk).astype(jnp.int32)
    # modes with bin >= nbin are dropped, like the reference
    # (field_statistics.cpp:50-54)
    nbin_ix = jnp.where(nbin_ix < nbin, nbin_ix, nbin)
    # multiplicity of each half-complex mode in the full complex grid:
    # 2 for 0 < kz < N3/2, else 1
    n3h = g.N3 // 2 + 1
    iz = jnp.arange(n3h)
    mult_z = jnp.where((iz > 0) & ~((g.N3 % 2 == 0) & (iz == g.N3 // 2)), 2.0, 1.0)
    mult = jnp.broadcast_to(mult_z[None, None, :], g.rshape)
    return nbin_ix, mult, kk


def measure_spectrum(x, g: GridSpec, nbin: int):
    """Spherically binned P(k) with the FOURIER_DEF_2 norm V/N^2.

    Parity: measure_spectrum, /root/reference/barlib/src/field_statistics.cpp:
    20-90 (which loops the full complex grid; here each half-complex mode is
    weighted by its Hermitian multiplicity).  Returns (kmode, power, nmode).
    """
    X = rfft3(x)
    p_mode = (X.real * X.real + X.imag * X.imag)
    bins, mult, kk = _shell_bins(g, nbin)
    flat_bins = bins.reshape(-1)
    seg = lambda v: jnp.zeros(nbin + 1, v.dtype).at[flat_bins].add(v.reshape(-1))[:nbin]
    nmode = seg(mult)
    ksum = seg(mult * kk)
    psum = seg(mult * p_mode)
    norm = g.vol / (float(g.N) * float(g.N))
    good = nmode > 0
    kmode = jnp.where(good, ksum / jnp.where(good, nmode, 1.0), 0.0)
    power = jnp.where(good, psum / jnp.where(good, nmode, 1.0) * norm, 0.0)
    return kmode, power, nmode


def rfft_grid_to_full(x, g: GridSpec):
    """Expand a real-valued half-complex-layout grid (N1,N2,N3/2+1) to the
    full (N1,N2,N3) grid via the Hermitian mirror kz -> min(kz, N3-kz).

    Used for file parity with the reference, which stores |k|-indexed grids
    (e.g. observational->Power) in full N^3 layout
    (/root/reference/barcode/main.cc:156-168, calc_power.cc:31-108).
    """
    n3 = g.shape[2]
    kz = jnp.arange(n3)
    idx = jnp.minimum(kz, n3 - kz)
    return jnp.take(x, idx, axis=2)


def power_table_to_rfft_grid(k_table, p_table, g: GridSpec, dtype=jnp.float32):
    """Interpolate a tabulated P(k) (e.g. CAMB 2-column ascii) onto the
    half-complex |k| grid; DC mode zeroed.

    Parity: readtab, /root/reference/barlib/src/calc_power.cc:31-108
    (GSL linear interpolation -> jnp.interp).
    """
    kk = jnp.sqrt(k_squared(g, dtype=jnp.float64 if k_table.dtype == jnp.float64 else jnp.float32))
    P = jnp.interp(kk, jnp.asarray(k_table), jnp.asarray(p_table))
    P = P.at[0, 0, 0].set(0.0)
    return P.astype(dtype)
