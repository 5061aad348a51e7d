"""HMC engine tests (SURVEY.md §4 plan): |dH| -> 0 as eps -> 0, leapfrog
reversibility, E[kinetic] = N/2, acceptance behavior, mass types, and a
short posterior-recovery smoke run (the reference's random_test as the
de-facto integration fixture)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields as rf
from barcode_tpu.config import HMCConfig
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
from barcode_tpu.model import posterior
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.hmc import adapt, mass as mass_mod, sampler
from barcode_tpu.hmc.state import MassState

# Unit cell size (L = N): with the inverse-P FS mass every prior mode
# oscillates at omega = V/N = d^3 (the mass isochronizes the prior), so
# d = 1 keeps the leapfrog stability threshold at eps ~ O(1) and the tests
# can use readable step sizes.
G = GridSpec.cube(8, 8.0)
GP = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.0, hubble=100.0)
FC = ForwardConfig(sfmodel=1, masskernel="tsc")
MC = posterior.ModelConfig(likelihood=1, forward=FC)


def setup(key=0, likelihood=1):
    P = jnp.full(G.rshape, 0.2).at[0, 0, 0].set(0.0)
    truth = rf.grf(jax.random.key(key), G, P)
    d_eul = lag2eul(truth, G, FC, GP)
    nobs = 1.0 + d_eul + 0.5 * jax.random.normal(jax.random.key(key + 1), G.shape)
    obs = ObsData(nobs=nobs, window=jnp.ones(G.shape),
                  noise=jnp.full(G.shape, 0.5), power=P)
    return truth, obs


def vag_minv(obs, mass_type=1, mass=None):
    psi_fn = posterior.make_psi(G, MC, GP, obs)
    vag = jax.value_and_grad(psi_fn, has_aux=True)
    if mass is None:
        mass = mass_mod.compute_mass(G, mass_type, obs.power)
    minv = lambda p: mass_mod.apply_minv(p, G, mass_type, mass)
    return vag, minv, mass


def test_kinetic_energy_expectation():
    """p ~ N(0,M) => E[1/2 p M^-1 p] = N/2 for FS and RS masses."""
    _, obs = setup()
    for mt in (0, 1, 4):
        mass = mass_mod.compute_mass(G, mt, obs.power)
        vals = [
            float(mass_mod.kinetic(
                mass_mod.draw_momenta(jax.random.key(i), G, mt, mass), G, mt, mass))
            for i in range(24)
        ]
        expect = (G.N - 1) / 2.0 if mt in (1, 4) else G.N / 2.0
        np.testing.assert_allclose(np.mean(vals), expect, rtol=0.08,
                                   err_msg=f"mass_type {mt}")


def test_leapfrog_reversibility():
    truth, obs = setup()
    vag, minv, mass = vag_minv(obs)
    s0 = 0.3 * truth
    (psi0, (pp0, pl0)), g0 = vag(s0)
    p0 = mass_mod.draw_momenta(jax.random.key(9), G, 1, mass)
    eps, n = 0.05, 6
    fwd = sampler.leapfrog(vag, minv, (s0, psi0, pp0, pl0, g0, p0), eps, n, n)
    s1, psi1, pp1, pl1, g1, p1 = fwd
    back = sampler.leapfrog(vag, minv, (s1, psi1, pp1, pl1, g1, -p1), eps, n, n)
    s2, _, _, _, _, p2 = back
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(-p2), np.asarray(p0), atol=2e-2)


def test_dH_scaling_with_eps():
    """|dH| ~ O(eps^2) per unit time: halving eps (same trajectory time)
    should shrink |dH| by ~4x; at least strongly decrease."""
    truth, obs = setup()
    vag, minv, mass = vag_minv(obs)
    s0 = 0.3 * truth
    (psi0, (pp0, pl0)), g0 = vag(s0)
    p0 = mass_mod.draw_momenta(jax.random.key(10), G, 1, mass)
    K0 = mass_mod.kinetic(p0, G, 1, mass)

    def dH_for(eps, n):
        out = sampler.leapfrog(vag, minv, (s0, psi0, pp0, pl0, g0, p0), eps, n, n)
        _, psi1, _, _, _, p1 = out
        return abs(float(mass_mod.kinetic(p1, G, 1, mass) + psi1 - (K0 + psi0)))

    d1 = dH_for(0.2, 4)
    d2 = dH_for(0.1, 8)
    d3 = dH_for(0.05, 16)
    assert d2 < d1, (d1, d2)
    assert d3 < d2 * 0.7, (d2, d3)


def test_masked_leapfrog_matches_exact_length():
    """Neps < n_max with masking == unmasked run of Neps steps."""
    truth, obs = setup()
    vag, minv, mass = vag_minv(obs)
    s0 = 0.2 * truth
    (psi0, (pp0, pl0)), g0 = vag(s0)
    p0 = mass_mod.draw_momenta(jax.random.key(11), G, 1, mass)
    a = sampler.leapfrog(vag, minv, (s0, psi0, pp0, pl0, g0, p0), 0.1, 3, 8)
    b = sampler.leapfrog(vag, minv, (s0, psi0, pp0, pl0, g0, p0), 0.1, 3, 3)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)


def test_attempt_runs_and_updates_state():
    truth, obs = setup()
    hc = HMCConfig(eps_fac=0.3, eps_fac_update_type=0, mass_type=1)
    init = sampler.make_init(G, MC, GP, hc)
    st = init(jax.random.key(0), jnp.zeros(G.shape), obs)
    mass = mass_mod.compute_mass(G, 1, obs.power)
    attempt = sampler.make_attempt(G, MC, GP, hc)
    st2, stats = jax.jit(attempt)(st, obs, mass)
    assert int(st2.count_attempts) == 1
    assert np.isfinite(float(stats.dH))
    assert int(st2.accepted) + int(st2.rejections) == 1


def test_sampler_batch_acceptance_reasonable():
    """With the heuristic eps target, acceptance over a few dozen attempts
    should be neither 0 nor 1 (sanity, not a statistical test)."""
    truth, obs = setup()
    hc = HMCConfig(eps_fac=0.0, eps_fac_update_type=3, mass_type=1,
                   N_a_eps_update=20)
    n_chains = 4
    init = sampler.make_init(G, MC, GP, hc)
    keys = jax.random.split(jax.random.key(1), n_chains)
    states = jax.vmap(lambda k: init(k, jnp.zeros(G.shape), obs))(keys)
    mass = mass_mod.compute_mass(G, 1, obs.power)
    run = sampler.make_sampler(G, MC, GP, hc, n_attempts_per_call=40)
    states, stats = run(states, obs, mass)
    acc = np.asarray(stats.accepted)  # [40, 4]
    rate = acc.mean()
    assert 0.05 < rate <= 1.0, rate
    assert np.isfinite(np.asarray(stats.dH)).all()


def test_acceptance_adapts_into_window():
    """The type-3 controller should bring the recent acceptance rate into or
    above [acc_min, acc_max] and keep dH finite, starting from eps_fac=2."""
    truth, obs = setup(key=3)
    hc = HMCConfig(eps_fac=0.0, eps_fac_update_type=3, mass_type=1,
                   N_a_eps_update=20)
    init = sampler.make_init(G, MC, GP, hc)
    keys = jax.random.split(jax.random.key(2), 2)
    states = jax.vmap(lambda k: init(k, jnp.zeros(G.shape), obs))(keys)
    mass = mass_mod.compute_mass(G, 1, obs.power)
    run = sampler.make_sampler(G, MC, GP, hc, n_attempts_per_call=50)
    for _ in range(4):
        states, stats = run(states, obs, mass)
    last_rate = float(np.asarray(stats.accepted)[-20:].mean())
    assert 0.4 < last_rate <= 1.0, last_rate
    assert np.isfinite(np.asarray(stats.dH)).all()
    # chains equilibrate: psi_like near its posterior expectation ~ N/2
    assert 0.7 * G.N / 2 < float(states.psi_like.mean()) < 1.5 * G.N / 2


def test_posterior_recovery_wiener():
    """Gold-standard conventions test: for the GRF likelihood (linear
    Gaussian model, no dynamics) the posterior is exactly Gaussian and the
    sampled mean must match the Wiener filter
        m = IFFT[ FFT(nobs/sigma^2) / ((V/N)/P + 1/sigma^2) ].
    This pins every Fourier normalization in the prior, mass, momenta and
    leapfrog at once (SURVEY.md hard-part #2)."""
    P = jnp.full(G.rshape, 0.5).at[0, 0, 0].set(0.0)
    truth = rf.grf(jax.random.key(30), G, P)
    sigma = 0.4
    nobs = truth + sigma * jax.random.normal(jax.random.key(31), G.shape)
    obs = ObsData(nobs=nobs, window=jnp.ones(G.shape),
                  noise=jnp.full(G.shape, sigma), power=P)
    mc3 = posterior.ModelConfig(likelihood=3, forward=FC)
    hc = HMCConfig(eps_fac=0.0, eps_fac_update_type=3, mass_type=1,
                   N_a_eps_update=20, N_eps_fac=8)
    init = sampler.make_init(G, mc3, GP, hc)
    n_chains = 8
    keys = jax.random.split(jax.random.key(32), n_chains)
    states = jax.vmap(lambda k: init(k, jnp.zeros(G.shape), obs))(keys)
    mass = mass_mod.compute_mass(G, 1, obs.power)
    run = sampler.make_sampler(G, mc3, GP, hc, n_attempts_per_call=60)
    # burn-in
    states, _ = run(states, obs, mass)
    # accumulate posterior mean over attempts x chains
    total = jnp.zeros(G.shape)
    n_acc = 0
    for _ in range(5):
        states, stats = run(states, obs, mass)
        total = total + states.delta.sum(axis=0)
        n_acc += n_chains
    post_mean = np.asarray(total / n_acc)

    A = (G.vol / G.N) * jnp.where(P > 0, 1.0 / jnp.where(P > 0, P, 1.0), 0.0) + 1.0 / sigma**2
    W = fourier.rfft3(nobs / sigma**2) / A
    # modes with P = 0 (DC) have zero mass -> frozen at the initial guess 0,
    # in both this sampler and the reference (convolveInvCorrFuncWithSignal
    # zeroes them); exclude from the comparison
    W = W.at[0, 0, 0].set(0.0)
    wiener = np.asarray(fourier.irfft3(W, G))
    # MC error of the mean is a few % of the field std; compare loosely
    resid = np.sqrt(np.mean((post_mean - wiener) ** 2)) / np.std(wiener)
    assert resid < 0.35, resid
    corr = np.corrcoef(post_mean.ravel(), wiener.ravel())[0, 1]
    assert corr > 0.95, corr


def test_pooled_adaptation_shares_eps_across_chains():
    """With pool_adaptation, all chains see the same pooled window, so their
    eps_fac trajectories coincide once the controller fires."""
    truth, obs = setup(key=5)
    hc = HMCConfig(eps_fac=0.8, eps_fac_update_type=2, mass_type=1,
                   N_a_eps_update=10, pool_adaptation=True)
    init = sampler.make_init(G, MC, GP, hc)
    keys = jax.random.split(jax.random.key(6), 4)
    states = jax.vmap(lambda k: init(k, jnp.zeros(G.shape), obs))(keys)
    mass = mass_mod.compute_mass(G, 1, obs.power)
    run = sampler.make_sampler(G, MC, GP, hc, n_attempts_per_call=25)
    states, stats = run(states, obs, mass)
    eps = np.asarray(states.eps_fac)
    np.testing.assert_allclose(eps, eps[0], rtol=1e-6)
    assert not np.allclose(eps[0], 0.8)  # the controller actually fired


def test_adapt_power_mean():
    np.testing.assert_allclose(float(adapt.power_mean(2.0, 8.0, 0)), 4.0)
    np.testing.assert_allclose(float(adapt.power_mean(2.0, 8.0, 2.0)),
                               np.sqrt((4 + 64) / 2))


def test_adapt_downward_picks_crossing():
    """Synthetic window: low eps always accepted, high eps always rejected
    -> new eps_fac should land near the boundary epsilon."""
    hc = HMCConfig(N_a_eps_update=20, acc_min=0.6, acc_max=0.7, eps_down_smooth=2)
    eps_table = jnp.linspace(0.1, 2.0, 20)
    acc_flags = (eps_table < 0.8).astype(jnp.int32)  # accept below 0.8
    new = float(adapt._downward(jnp.asarray(1.5), acc_flags, eps_table, hc))
    assert 0.4 < new < 1.3, new


def test_adapt_fires_only_on_cadence():
    hc = HMCConfig(eps_fac_update_type=2, N_a_eps_update=10)
    eps_table = jnp.full(10, 0.5)
    acc = jnp.ones(10, jnp.int32)  # 100% acceptance -> upward when firing
    e1 = float(adapt.update_eps_fac(jnp.asarray(0.5), jnp.asarray(7), 0, True,
                                    acc, eps_table, hc, G.N))
    np.testing.assert_allclose(e1, 0.5)  # not a multiple of 10 -> no change
    e2 = float(adapt.update_eps_fac(jnp.asarray(0.5), jnp.asarray(10), 0, True,
                                    acc, eps_table, hc, G.N))
    assert e2 > 0.5  # fired upward


def test_adapt_type1_power_mean_decay():
    """Type-1: eps_fac moves toward the target by power-mean every
    s_eps_total attempts (time_step.cpp:165-180)."""
    hc = HMCConfig(eps_fac_update_type=1, eps_fac=0.01, eps_fac_initial=0.5,
                   eps_fac_power=2.0)
    s_tot = hc.s_eps_total(G.N)
    eps = jnp.asarray(0.5)
    # off-cadence: no change
    e1 = float(adapt.update_eps_fac(eps, jnp.asarray(s_tot - 1), 0, True,
                                    jnp.zeros(10, jnp.int32), jnp.full(10, 0.5),
                                    hc, G.N))
    np.testing.assert_allclose(e1, 0.5)
    # on-cadence: power-mean toward the target 0.01
    e2 = float(adapt.update_eps_fac(eps, jnp.asarray(s_tot), 0, True,
                                    jnp.zeros(10, jnp.int32), jnp.full(10, 0.5),
                                    hc, G.N))
    expected = float(adapt.power_mean(0.5, 0.01, 2.0))
    np.testing.assert_allclose(e2, expected, rtol=1e-6)
    assert e2 < 0.5


def test_adapt_type3_halves_before_first_accept():
    hc = HMCConfig(eps_fac_update_type=3, N_a_eps_update=10)
    eps_table = jnp.full(10, 2.0)
    acc = jnp.zeros(10, jnp.int32)
    e = float(adapt.update_eps_fac(jnp.asarray(2.0), jnp.asarray(3), 3, False,
                                   acc, eps_table, hc, G.N))
    np.testing.assert_allclose(e, 1.0)


@pytest.mark.parametrize("mt", [0, 1, 2, 3, 4, 5, 6, 60])
def test_mass_types_build(mt):
    _, obs = setup()
    force = jax.random.normal(jax.random.key(0), G.shape)
    m = mass_mod.compute_mass(G, mt, obs.power, likeli_force=force,
                              window=obs.window, noise=obs.noise,
                              kernel_h=G.cell_avg)
    p = mass_mod.draw_momenta(jax.random.key(1), G, mt, m)
    k = float(mass_mod.kinetic(p, G, mt, m))
    assert np.isfinite(k) and k > 0


def test_jasche_mass_matches_direct_sum():
    """The 2-FFT convolution form equals the direct lattice sum
    C(q) = sum_l w_l/sigma_l^2 G(q-l)^2 (tiny grid, numpy rolls)."""
    _, obs = setup()
    h = G.cell_avg
    Gk = np.asarray(mass_mod.jasche_response_kernel(G, h))
    w = np.asarray(obs.window) / np.asarray(obs.noise) ** 2
    direct = np.zeros(G.shape, np.float64)
    G2 = (Gk**2).astype(np.float64)
    for i in range(G.N1):
        for j in range(G.N2):
            for k in range(G.N3):
                if w[i, j, k] != 0.0:
                    direct += w[i, j, k] * np.roll(G2, (i, j, k), (0, 1, 2))
    direct *= (G.vol / G.N) ** 2
    fast = np.asarray(mass_mod.jasche_diagonal_mass(G, obs.window, obs.noise, h))
    np.testing.assert_allclose(fast, direct, rtol=2e-2, atol=1e-3 * direct.max())


def test_minimal_norm_integrator_reversible_and_more_accurate():
    """The 2-stage minimal-norm integrator (sampler.LAMBDA_MN2) is exactly
    reversible and has a much smaller |dH| than leapfrog at the same eps."""
    truth, obs = setup()
    vag, minv, mass = vag_minv(obs)
    s0 = 0.3 * truth
    (psi0, (pp0, pl0)), g0 = vag(s0)
    p0 = mass_mod.draw_momenta(jax.random.key(12), G, 1, mass)
    K0 = mass_mod.kinetic(p0, G, 1, mass)
    eps, n = 0.2, 4

    run = lambda carry, p, scheme: sampler.leapfrog(
        vag, minv, carry, eps, n, n, integrator=scheme)
    fwd = run((s0, psi0, pp0, pl0, g0, p0), p0, "minimal_norm_2")
    s1, psi1, pp1, pl1, g1, p1 = fwd
    back = run((s1, psi1, pp1, pl1, g1, -p1), -p1, "minimal_norm_2")
    s2, _, _, _, _, p2 = back
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s0), atol=2e-4)

    def dH(scheme):
        out = run((s0, psi0, pp0, pl0, g0, p0), p0, scheme)
        _, psi_f, _, _, _, p_f = out
        return abs(float(mass_mod.kinetic(p_f, G, 1, mass) + psi_f - (K0 + psi0)))

    assert dH("minimal_norm_2") < 0.5 * dH("leapfrog")


def test_sampler_with_minimal_norm_integrator():
    """End-to-end attempt batch with integrator='minimal_norm_2' accepts."""
    truth, obs = setup()
    hc = HMCConfig(eps_fac=0.4, eps_fac_update_type=0, mass_type=1,
                   integrator="minimal_norm_2")
    mc = MC
    init = sampler.make_init(G, mc, GP, hc)
    state = jax.jit(lambda k: init(k, 0.2 * truth, obs))(jax.random.key(3))
    mass = mass_mod.compute_mass(G, hc.mass_type, obs.power)
    run = sampler.make_sampler(G, mc, GP, hc, n_attempts_per_call=16)
    states = jax.tree_util.tree_map(lambda x: x[None], state)
    states, stats = run(states, obs, mass)
    assert np.isfinite(np.asarray(stats.dH)).all()
    assert int(states.accepted[0]) >= 1
