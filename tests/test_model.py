"""Statistical model tests: likelihood values vs closed-form numpy, autodiff
gradient vs finite differences (SURVEY.md §4: 'verify grad log pi against
JAX autodiff of log pi')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu import random_fields as rf
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams
from barcode_tpu.model import likelihoods, posterior
from barcode_tpu.model.likelihoods import ObsData

G = GridSpec.cube(8, 80.0)
GP = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.0, hubble=100.0)


def make_obs(key, likelihood=1):
    P = jnp.full(G.rshape, 30.0).at[0, 0, 0].set(0.0)
    kd, kn = jax.random.split(key)
    delta = jnp.abs(rf.grf(kd, G, P)) * 0.1
    if likelihood == 0:
        nobs = jax.random.poisson(kn, 1.0 + delta).astype(jnp.float32)
    else:
        nobs = 1.0 + delta + 0.1 * jax.random.normal(kn, G.shape)
    return ObsData(
        nobs=nobs,
        window=jnp.ones(G.shape),
        noise=jnp.ones(G.shape),
        power=P,
    )


def test_gaussian_psi_value():
    obs = make_obs(jax.random.key(0))
    dx = 0.1 * jax.random.normal(jax.random.key(1), G.shape)
    got = float(likelihoods.gaussian_psi(dx, obs))
    lam = np.asarray(obs.window) * 1.0 * (1.0 + np.asarray(dx))
    valid = lam > 0
    expected = 0.5 * np.sum(((lam - np.asarray(obs.nobs))[valid]) ** 2)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_poisson_psi_value():
    obs = make_obs(jax.random.key(2), likelihood=0)
    dx = 0.1 * jax.random.normal(jax.random.key(3), G.shape)
    got = float(likelihoods.poisson_psi(dx, obs))
    lam = (1.0 + np.asarray(dx))
    valid = lam > 0
    expected = np.sum(lam[valid] - np.asarray(obs.nobs)[valid] * np.log(lam[valid]))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_lognormal_psi_value():
    obs = make_obs(jax.random.key(4))
    dx = 0.1 * jax.random.normal(jax.random.key(5), G.shape)
    got = float(likelihoods.lognormal_psi(dx, obs))
    dclip = np.maximum(np.asarray(dx), -0.999)
    lam = np.log(1.0 + dclip)
    expected = 0.5 * np.sum((lam - np.asarray(obs.nobs)) ** 2)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_partial_f_delta_x_matches_autodiff():
    """The reimplemented analytic partials equal jax.grad of psi(delta_x)."""
    obs = make_obs(jax.random.key(6))
    dx = 0.05 * jax.random.normal(jax.random.key(7), G.shape)
    for lk in (0, 1, 2):
        obs_l = make_obs(jax.random.key(6), likelihood=lk)
        auto = jax.grad(lambda d: likelihoods.likelihood_psi(lk, d, obs_l))(dx)
        analytic = likelihoods.partial_f_delta_x(lk, dx, obs_l)
        np.testing.assert_allclose(
            np.asarray(auto), np.asarray(analytic), atol=1e-4,
            err_msg=f"likelihood {lk}",
        )


@pytest.mark.parametrize("likelihood", [0, 1, 2, 3])
@pytest.mark.parametrize("sfmodel", [1, 3])
def test_posterior_grad_vs_finite_diff(likelihood, sfmodel):
    """jax.grad of the full psi (prior + likelihood o Lag2Eul) vs central
    finite differences along random directions."""
    obs = make_obs(jax.random.key(8), likelihood=likelihood)
    if likelihood == 2:
        obs = ObsData(nobs=jnp.log(jnp.maximum(obs.nobs, 0.1)), window=obs.window,
                      noise=obs.noise, power=obs.power)
    # TSC is C^1 in positions; CIC's weight kinks sit exactly at cell centers,
    # where zero-displacement particles live, making FD ill-posed there.
    fc = ForwardConfig(sfmodel=sfmodel, masskernel="tsc")
    mc = posterior.ModelConfig(likelihood=likelihood, forward=fc)
    psi_fn = posterior.make_psi(G, mc, GP, obs)
    vag = jax.jit(jax.value_and_grad(lambda d: psi_fn(d)[0]))
    # amplitude chosen so displacements are a sizable fraction of a cell
    s = 0.6 * rf.grf(jax.random.key(9), G, obs.power)
    _, grad = vag(s)
    rng = np.random.default_rng(0)
    for _ in range(3):
        v = jnp.asarray(rng.normal(size=G.shape), jnp.float32)
        v = v / jnp.linalg.norm(v)
        eps = 1e-2  # small enough for linearity, large enough to beat f32 noise
        fp = float(psi_fn(s + eps * v)[0])
        fm = float(psi_fn(s - eps * v)[0])
        fd = (fp - fm) / (2 * eps)
        ad = float(jnp.sum(grad * v))
        np.testing.assert_allclose(ad, fd, rtol=8e-2, atol=1e-2)


def test_grf_likelihood_bypasses_forward():
    obs = make_obs(jax.random.key(10))
    mc = posterior.ModelConfig(likelihood=3)
    psi_fn = posterior.make_psi(G, mc, GP, obs)
    s = 0.1 * jax.random.normal(jax.random.key(11), G.shape)
    total, (pp, pl) = psi_fn(s)
    expected_like = float(likelihoods.grf_psi(s, obs))
    np.testing.assert_allclose(float(pl), expected_like, rtol=1e-5)


def test_psi_force_scaling_knobs():
    """grad_psi_{prior,likeli}_factor + correct_delta scale only the force
    (HMC.cc:164-175, HMC_models.cc:458-470): psi value stays exact, the
    gradient is f_p*grad(prior) + f_l*D1*grad(like)."""
    obs = make_obs(jax.random.key(20))
    s = 0.1 * jax.random.normal(jax.random.key(21), G.shape)
    gp = GrowthParams(D1=0.8, D2=-3.0 / 7.0 * 0.64, ascale=1.0,
                      cpecvel=52.0, hubble=100.0)
    base = posterior.ModelConfig(likelihood=1)
    (v0, (pp0, pl0)), _ = posterior.make_psi_force(G, base, gp, obs)(s)
    gp_only = jax.grad(lambda d: posterior.make_psi(
        G, base, gp, obs)(d)[1][0])(s)
    gl_only = jax.grad(lambda d: posterior.make_psi(
        G, base, gp, obs)(d)[1][1])(s)

    mc = posterior.ModelConfig(likelihood=1, grad_prior_factor=2.0,
                               grad_likeli_factor=0.5, correct_delta=True)
    (v1, (pp1, pl1)), grad1 = posterior.make_psi_force(G, mc, gp, obs)(s)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)  # psi exact
    np.testing.assert_allclose(float(pp1), float(pp0), rtol=1e-6)
    np.testing.assert_allclose(float(pl1), float(pl0), rtol=1e-6)
    want = 2.0 * np.asarray(gp_only) + 0.5 * gp.D1 * np.asarray(gl_only)
    np.testing.assert_allclose(np.asarray(grad1), want,
                               atol=3e-5 * np.abs(want).max())


def test_config_testing_block_keys(tmp_path):
    """input.par Testing-block keys land in ModelConfig/ForwardConfig."""
    from barcode_tpu.config import RunConfig
    par = tmp_path / "t.par"
    par.write_text("""
Nx = 8
Lx = 80.0
grad_psi_prior_factor = 2.0
grad_psi_likeli_factor = 0.5
correct_delta = true
calc_h = 2
xllc = 1.0
yllc = 2.0
zllc = 3.0
particle_kernel = 0
""")
    conf = RunConfig.from_input_par(par)
    assert conf.model.grad_prior_factor == 2.0
    assert conf.model.grad_likeli_factor == 0.5
    assert conf.model.correct_delta is True
    assert conf.model.calc_h == 2
    assert conf.model.forward.origin == (1.0, 2.0, 3.0)
    par.write_text("Nx = 8\nLx = 80.0\nparticle_kernel = 1\n")
    with pytest.raises(ValueError):
        RunConfig.from_input_par(par)


def test_prior_psi_C_matches_real_space():
    """Round-5 FFT dedupe: the Parseval-form prior energy equals the
    real-space form 1/2 s.S^-1 s exactly (fourier.inv_corr_quadratic_C)."""
    from barcode_tpu.grid import fourier

    # odd-N3 grid too: the Hermitian multiplicity differs at the Nyquist
    for g in (G, GridSpec(8, 6, 10, 80.0, 60.0, 100.0),
              GridSpec(8, 8, 9, 80.0, 80.0, 90.0)):
        P = jnp.full(g.rshape, 30.0).at[0, 0, 0].set(0.0)
        obs = ObsData(nobs=jnp.zeros(g.shape), window=jnp.ones(g.shape),
                      noise=jnp.ones(g.shape), power=P)
        s = jax.random.normal(jax.random.key(7), g.shape)
        want = float(likelihoods.prior_psi(s, g, obs))
        got = float(likelihoods.prior_psi_C(fourier.rfft3(s), g, obs))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_make_psi_shared_rfft_matches_split_evaluation():
    """make_psi (shared-transform form) == prior_psi + likelihood(lag2eul)
    computed independently, for every sfmodel; gradients agree too."""
    from barcode_tpu.forward.lag2eul import lag2eul

    obs = make_obs(jax.random.key(4))
    s = 0.1 * jax.random.normal(jax.random.key(5), G.shape)
    for sfmodel in (1, 2, 3):
        mc = posterior.ModelConfig(
            likelihood=1, forward=ForwardConfig(sfmodel=sfmodel, masskernel=2),
            deltaQ_factor=1.25)
        psi_fn = posterior.make_psi(G, mc, GP, obs)
        (tot, (pp, pl)) = psi_fn(s)
        pp_ref = likelihoods.prior_psi(s, G, obs)
        dx = lag2eul(1.25 * s, G, mc.forward, GP)
        pl_ref = likelihoods.gaussian_psi(dx, obs)
        np.testing.assert_allclose(float(pp), float(pp_ref), rtol=1e-5)
        np.testing.assert_allclose(float(pl), float(pl_ref), rtol=1e-5)

        def split(d):
            return (likelihoods.prior_psi(d, G, obs)
                    + likelihoods.gaussian_psi(
                        lag2eul(1.25 * d, G, mc.forward, GP), obs))

        g_shared = jax.grad(lambda d: psi_fn(d)[0])(s)
        g_split = jax.grad(split)(s)
        np.testing.assert_allclose(np.asarray(g_shared), np.asarray(g_split),
                                   rtol=2e-4, atol=2e-4)
