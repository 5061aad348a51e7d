"""Forward-model tests: deposits, adjointness, LPT, RSD, Lag2Eul."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields as rf
from barcode_tpu.forward import assign, lpt, particles
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul

G = GridSpec.cube(12, 120.0)
GP = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.0, hubble=100.0)


def random_positions(key, g):
    u = jax.random.uniform(key, (3,) + g.shape)
    L = jnp.asarray([g.L1, g.L2, g.L3]).reshape(3, 1, 1, 1)
    return u * L


@pytest.mark.parametrize("mk", ["ngp", "cic", "tsc", "sph"])
def test_deposit_mass_conservation(mk):
    """Total deposited mass equals particle count (W4 integral: the SPH
    spline sampled on the grid sums to ~V_cell^-1 * norm; CIC/TSC/NGP exact)."""
    pos = random_positions(jax.random.key(0), G)
    h = G.cell_avg
    rho = assign.deposit(pos, G, mk, h)
    total = float(rho.sum())
    if mk == "sph":
        # SPH deposit returns rho = sum_p W (units 1/volume): the grid sum
        # approximates N_particles / cell_volume (integral of W is 1)
        d1, d2, d3 = G.cell
        np.testing.assert_allclose(total, G.N / (d1 * d2 * d3), rtol=0.02)
    else:
        np.testing.assert_allclose(total, G.N, rtol=1e-4)


def test_cic_deposit_known_position():
    """A particle exactly at a cell center deposits all mass there."""
    pos = particles.lagrangian_positions(G)
    rho = assign.cic_deposit(pos, G)
    np.testing.assert_allclose(np.asarray(rho), 1.0, atol=1e-5)
    rho = assign.tsc_deposit(pos, G)
    # TSC at cell center: w = (0.75, 0.25/2...) -> still sums to 1, peak 0.75^3
    np.testing.assert_allclose(float(rho.sum()), G.N, rtol=1e-5)
    np.testing.assert_allclose(float(rho[0, 0, 0]), 1.0, atol=1e-5)  # symmetric


def test_cic_scatter_gather_adjoint():
    """<gather(f), w> == <f, scatter(w)> — the CIC gather is the exact
    transpose of the CIC deposit (SURVEY.md §4: 'CIC adjoint identity')."""
    key = jax.random.key(1)
    pos = random_positions(key, G)
    f = jax.random.normal(jax.random.key(2), G.shape)
    w = jax.random.normal(jax.random.key(3), G.shape)
    lhs = float(jnp.sum(assign.cic_gather(f, pos, G) * w))
    rhs = float(jnp.sum(f * assign.cic_deposit(pos, G, weights=w)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_tsc_scatter_gather_adjoint():
    pos = random_positions(jax.random.key(4), G)
    f = jax.random.normal(jax.random.key(5), G.shape)
    w = jax.random.normal(jax.random.key(6), G.shape)
    lhs = float(jnp.sum(assign.tsc_gather(f, pos, G) * w))
    rhs = float(jnp.sum(f * assign.tsc_deposit(pos, G, weights=w)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_w4_fourier_matches_numerical_transform():
    """Closed-form W4 transform vs the FFT of the grid-sampled kernel."""
    g = GridSpec.cube(64, 64.0)  # d=1
    h = 2.0
    # center kernel at origin (cell 0 corner): sample W(|x|) with periodic min-image
    idx = np.arange(64)
    x = np.minimum(idx, 64 - idx).astype(np.float64)  # distance in cells
    rx, ry, rz = np.meshgrid(x, x, x, indexing="ij")
    r = np.sqrt(rx**2 + ry**2 + rz**2)
    Wr = np.asarray(assign.w4(jnp.asarray(r / h))) / (math.pi * h**3)
    What_num = np.fft.rfftn(Wr).real  # kernel is even -> real transform
    What_closed = np.asarray(assign.w4_fourier(g, h))
    # compare where the kernel is well-resolved (low k)
    k = np.sqrt(np.asarray(fourier.k_squared(g)))
    sel = (k > 0) & (k * h < 2.0)
    np.testing.assert_allclose(What_num[sel], What_closed[sel], atol=2e-3)
    np.testing.assert_allclose(What_num[0, 0, 0], 1.0, atol=2e-3)


@pytest.mark.parametrize("mk", ["cic", "tsc", "sph", "sph_ft"])
def test_deposit_directional_response(mk):
    """Moving one particle +0.3 cells in x must raise the density in the +x
    neighbor and lower it in the -x neighbor (regression for weight-sign
    bugs; the reference itself has one in interpolate_TSC)."""
    pos = particles.lagrangian_positions(G)
    d1 = G.cell[0]
    pos0 = pos
    pos1 = pos.at[0, 0, 0, 0].add(0.3 * d1)
    h = G.cell_avg
    rho0 = np.asarray(assign.deposit(pos0, G, mk, h))
    rho1 = np.asarray(assign.deposit(pos1, G, mk, h))
    diff = rho1 - rho0
    assert diff[1, 0, 0] > 0, diff[1, 0, 0]
    assert diff[0, 0, 0] < 0, diff[0, 0, 0]
    if mk != "cic":  # CIC's 2-point stencil never reaches the -x neighbor
        assert diff[-1, 0, 0] < 0, diff[-1, 0, 0]


def test_zeldovich_single_mode_displacement():
    """delta = A cos(kx) => psi_x = -D1 * (A/k) sin(kx) (flow with
    div = -D1 delta)."""
    m, A, D1 = 2, 0.01, 0.8
    i = np.arange(G.N1)
    delta = A * np.cos(2 * np.pi * m * i / G.N1)
    delta3 = jnp.asarray(np.broadcast_to(delta[:, None, None], G.shape))
    psi = lpt.zeldovich_psi(delta3, G, D1)
    k = 2 * np.pi * m / G.L1
    expected = -D1 * (A / k) * np.sin(2 * np.pi * m * i / G.N1)
    np.testing.assert_allclose(np.asarray(psi[0, :, 0, 0]), expected, atol=1e-6)
    np.testing.assert_allclose(np.asarray(psi[1]), 0.0, atol=1e-6)


def test_2lpt_reduces_to_zeldovich():
    delta = 0.02 * rf.grf(jax.random.key(0), G, jnp.ones(G.rshape).at[0, 0, 0].set(0.0))
    za = lpt.zeldovich_psi(delta, G, 1.0)
    two = lpt.two_lpt_psi(delta, G, 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(two), np.asarray(za), atol=1e-6)


def test_alpt_limits():
    """slength -> 0: K -> 1 everywhere except high k... use large slength:
    K -> only DC, so ALPT -> spherical collapse part."""
    P = jnp.ones(G.rshape).at[0, 0, 0].set(0.0)
    delta = 0.05 * rf.grf(jax.random.key(1), G, P)
    alpt_long = lpt.alpt_psi(delta, G, 1.0, -3.0 / 7.0, 1e4, apply_cellbound=False)
    div_sc = lpt.spherical_collapse_div_psi(delta, G, 1.0)
    psi_sc = lpt._psi_from_div_C(fourier.rfft3(div_sc), G)
    np.testing.assert_allclose(np.asarray(alpt_long), np.asarray(psi_sc), atol=1e-4)
    # tiny slength: ALPT -> 2LPT
    alpt_short = lpt.alpt_psi(delta, G, 1.0, -3.0 / 7.0, 1e-4, apply_cellbound=False)
    two = lpt.two_lpt_psi(delta, G, 1.0, -3.0 / 7.0)
    np.testing.assert_allclose(np.asarray(alpt_short), np.asarray(two), atol=1e-4)


def test_spherical_collapse_grad_finite_at_collapsed_cells():
    """delta >= 1.5 puts cells on the clipped (-3) branch of div Psi_SC;
    the gradient there must be 0, not NaN (double-where guard — the NaN
    cotangent of sqrt(0) poisoned every 256^3 ALPT gradient on hardware)."""
    P = jnp.ones(G.rshape).at[0, 0, 0].set(0.0)
    delta = 0.05 * rf.grf(jax.random.key(1), G, P)
    delta = delta.at[3, 4, 5].set(3.0)  # arg = 1 - 2/3*D1*3 < 0

    def f(d):
        return jnp.sum(lpt.spherical_collapse_div_psi(d, G, 1.0) ** 2)

    grad = jax.grad(f)(delta)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(grad[3, 4, 5]) == 0.0


def test_spherical_collapse_linear_limit():
    """For small delta, div Psi_SC ~ psi_lin = -D1 delta."""
    delta = jnp.asarray(np.random.default_rng(0).normal(size=G.shape) * 1e-3, jnp.float32)
    div = lpt.spherical_collapse_div_psi(delta, G, 1.0)
    np.testing.assert_allclose(np.asarray(div), np.asarray(-delta), atol=1e-5)


def test_lag2eul_zero_input():
    """Zero Lagrangian field -> particles stay at cell centers -> delta_eul=0."""
    for mk in ["ngp", "cic", "tsc", "sph", "sph_ft"]:
        fc = ForwardConfig(sfmodel=1, masskernel=mk)
        de = lag2eul(jnp.zeros(G.shape), G, fc, GP)
        np.testing.assert_allclose(np.asarray(de), 0.0, atol=1e-4)


def test_lag2eul_mean_zero():
    P = jnp.ones(G.rshape).at[0, 0, 0].set(0.0)
    delta = 0.5 * rf.grf(jax.random.key(2), G, P)
    for sf in (1, 2, 3):
        fc = ForwardConfig(sfmodel=sf, masskernel="cic")
        de = lag2eul(delta, G, fc, GP)
        assert abs(float(de.mean())) < 1e-5


def test_rsd_plane_parallel_shift():
    g = G
    pos = particles.lagrangian_positions(g)
    vz = jnp.full(g.shape, 100.0)  # km/s
    newpos = particles.rsd_plane_parallel(pos, vz, g, ascale=1.0, hubble=100.0)
    np.testing.assert_allclose(
        np.asarray(newpos[2]), np.asarray((pos[2] + 1.0) % g.L3), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(newpos[:2]), np.asarray(pos[:2]))


def test_sph_ft_close_to_sph():
    """The Fourier/TSC SPH deposit approximates the exact SPH deposit
    (the reference accepts the same approximation for its fast gradient,
    input.par:10 'less accurate, much faster')."""
    P = jnp.ones(G.rshape).at[0, 0, 0].set(0.0)
    delta = 0.2 * rf.grf(jax.random.key(3), G, P)
    fc_a = ForwardConfig(sfmodel=1, masskernel="sph")
    fc_b = ForwardConfig(sfmodel=1, masskernel="sph_ft")
    da = lag2eul(delta, G, fc_a, GP)
    db = lag2eul(delta, G, fc_b, GP)
    corr = np.corrcoef(np.asarray(da).ravel(), np.asarray(db).ravel())[0, 1]
    assert corr > 0.9, corr


def test_gradfindif_fourth_order_and_2lpt_scheme():
    """gradfindif (gradient.cpp:81-155) matches the analytic derivative of a
    smooth mode to 4th order, and the GFINDIFF 2LPT source stays close to
    the spectral one."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from barcode_tpu.grid.spec import GridSpec
    from barcode_tpu.grid import fourier
    from barcode_tpu.forward import lpt

    g = GridSpec.cube(32, 64.0)
    x = jnp.arange(g.N1) * g.cell[0]
    kx = 2 * jnp.pi / g.L1  # fundamental: smooth, tiny truncation error
    f = jnp.sin(kx * x)[:, None, None] * jnp.ones(g.shape)
    df = jax.jit(lambda a: fourier.gradfindif(a, g, 0))(f)
    exact = kx * jnp.cos(kx * x)[:, None, None] * jnp.ones(g.shape)
    np.testing.assert_allclose(np.asarray(df), np.asarray(exact),
                               atol=2e-4 * float(kx))

    key = jax.random.key(0)
    delta = jax.jit(lambda k: 0.05 * jax.random.normal(k, g.shape))(key)
    psi_fft = jax.jit(lambda d: lpt.two_lpt_psi(d, g, 1.0, -3.0 / 7.0))(delta)
    psi_fd = jax.jit(lambda d: lpt.two_lpt_psi(d, g, 1.0, -3.0 / 7.0,
                                               deriv_scheme="findif"))(delta)
    # schemes agree on the smooth part; findif is a consistent discretization
    num = float(jnp.sqrt(jnp.mean((psi_fft - psi_fd) ** 2)))
    den = float(jnp.sqrt(jnp.mean(psi_fft ** 2)))
    assert num / den < 0.05


def test_rsd_radial_matches_plane_parallel_for_distant_observer():
    """A very distant observer on the z-axis makes the radial mapping
    converge to the plane-parallel one (rsd.cc:37-57); also reachable from
    ForwardConfig(rsd_planepar=False, observer=...)."""
    import dataclasses as _dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    from barcode_tpu.grid.spec import GridSpec
    from barcode_tpu.forward import particles
    from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
    from barcode_tpu import random_fields as rf

    g = GridSpec.cube(16, 32.0)
    gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.0,
                      hubble=100.0)
    P = jnp.full(g.rshape, 0.5).at[0, 0, 0].set(0.0)
    delta = rf.grf(jax.random.key(0), g, P)

    fc_pp = ForwardConfig(sfmodel=1, masskernel="tsc", rsd=True,
                          periodic=False)
    # observer distance: far enough for the plane-parallel limit, close
    # enough that f32 r+dr keeps ~3 digits of the shift (r*eps << shift)
    fc_rad = _dc.replace(fc_pp, rsd_planepar=False,
                         observer=(g.L1 / 2, g.L2 / 2, -1e4))
    _, pos_pp = lag2eul(delta, g, fc_pp, gp, return_pos=True)
    _, pos_rad = lag2eul(delta, g, fc_rad, gp, return_pos=True)
    np.testing.assert_allclose(np.asarray(pos_rad[2]), np.asarray(pos_pp[2]),
                               atol=6e-3)
    # x/y unchanged up to the tiny transverse component (~ shift * L/(2 r))
    np.testing.assert_allclose(np.asarray(pos_rad[:2]), np.asarray(pos_pp[:2]),
                               atol=6e-3)


def test_rsd_radial_origin_offset():
    """ForwardConfig.origin (xllc/yllc/zllc) shifts the radial-RSD observer
    frame: observer o with origin c == observer o - c with origin 0
    (positions here are box-relative; init_par.cc:124, rsd.cc:36)."""
    import dataclasses as _dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    from barcode_tpu.grid.spec import GridSpec
    from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
    from barcode_tpu import random_fields as rf

    g = GridSpec.cube(16, 32.0)
    gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.0,
                      hubble=100.0)
    P = jnp.full(g.rshape, 0.5).at[0, 0, 0].set(0.0)
    delta = rf.grf(jax.random.key(0), g, P)
    fc0 = ForwardConfig(sfmodel=1, masskernel="tsc", rsd=True,
                        rsd_planepar=False, periodic=False,
                        observer=(6.0, -4.0, -50.0))
    fc_shift = _dc.replace(fc0, observer=(16.0, 16.0, -30.0),
                           origin=(10.0, 20.0, 20.0))
    _, pos0 = lag2eul(delta, g, fc0, gp, return_pos=True)
    _, pos1 = lag2eul(delta, g, fc_shift, gp, return_pos=True)
    np.testing.assert_allclose(np.asarray(pos1), np.asarray(pos0), atol=1e-5)


def test_lag2eul_transfer_kernels():
    """TRANSF build (Lag2Eul.cc:174-191): FS kernels convolved into the
    linear field / 2LPT source on the non-Zel'dovich path."""
    delta = rf.grf(jax.random.key(11), G, jnp.full(G.rshape, 20.0))
    ones = jnp.ones(G.rshape)
    base = lpt.two_lpt_div_psi(delta, G, 1.0, -3.0 / 7.0)
    same = lpt.two_lpt_div_psi(delta, G, 1.0, -3.0 / 7.0,
                               transfer=(ones, ones))
    np.testing.assert_allclose(np.asarray(same), np.asarray(base),
                               rtol=1e-5, atol=1e-6)
    # t_zeld = 0.5 scales only the linear term: div' = div + 0.5*D1*delta
    half = lpt.two_lpt_div_psi(delta, G, 1.0, -3.0 / 7.0,
                               transfer=(0.5 * ones, None))
    np.testing.assert_allclose(np.asarray(half),
                               np.asarray(base + 0.5 * delta),
                               rtol=1e-4, atol=1e-5)


def test_alpt_transf_feeds_spherical_collapse():
    """TRANSF data flow on the ALPT path (Lag2Eul.cc:156-212): auxtransfzeld
    replaces delta1 BEFORE the SC term, so psilin = -D1 * (t_zeld o delta1),
    while m2v comes from the raw delta1.  Pin with a constant kernel c: the
    transferred run must equal a manual rebuild with delta1 -> c*delta1 in
    the linear + SC terms only."""
    delta = 0.3 * rf.grf(jax.random.key(12), G, jnp.full(G.rshape, 20.0))
    c = 0.5
    ones = jnp.ones(G.rshape)
    D1, D2, sl = 1.0, -3.0 / 7.0, G.L1 / G.N1 * 2.0
    got = lpt.alpt_psi(delta, G, D1, D2, sl, transfer=(c * ones, None))
    # manual composition mirroring the reference ordering
    m2v = lpt._second_order_source(fourier.rfft3(delta), G)
    div2 = -D1 * (c * delta) + D2 * m2v
    divsc = lpt.spherical_collapse_div_psi(c * delta, G, D1)
    K = jnp.exp(-fourier.k_squared(G) * sl * sl / 2.0)
    want = lpt.cellbound(lpt._psi_from_div_C(
        K * fourier.rfft3(div2) + (1.0 - K) * fourier.rfft3(divsc), G))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)
