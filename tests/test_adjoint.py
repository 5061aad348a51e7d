"""Analytic h-term vs autodiff: the two independent derivations of the
likelihood gradient must agree (SURVEY.md §4: 'the reference hand-codes the
adjoint — in JAX both paths exist and must agree')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu import random_fields as rf
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
from barcode_tpu.model import adjoint, likelihoods
from barcode_tpu.model.likelihoods import ObsData

G = GridSpec.cube(12, 120.0)
GP = GrowthParams(D1=0.9, D2=-0.4, ascale=1.0, cpecvel=52.85, hubble=100.0)


@pytest.mark.parametrize("likelihood", [0, 1])
@pytest.mark.parametrize("rsd", [False, True])
@pytest.mark.parametrize("sfmodel", [1, 2, 3])
def test_analytic_adjoint_matches_autodiff(likelihood, rsd, sfmodel):
    fc = ForwardConfig(sfmodel=sfmodel, masskernel="sph_ft", rsd=rsd)
    P = jnp.full(G.rshape, 30.0).at[0, 0, 0].set(0.0)
    truth = rf.grf(jax.random.key(0), G, P)
    d_eul = lag2eul(truth, G, fc, GP)
    if likelihood == 0:
        nobs = jax.random.poisson(jax.random.key(1), jnp.maximum(1.0 + d_eul, 0.0)).astype(jnp.float32)
    else:
        nobs = 1.0 + d_eul + 0.3 * jax.random.normal(jax.random.key(1), G.shape)
    obs = ObsData(nobs=nobs, window=jnp.ones(G.shape),
                  noise=jnp.full(G.shape, 0.5), power=P)

    s = 0.7 * truth

    def psi_like(s):
        dx = lag2eul(s, G, fc, GP)
        return likelihoods.likelihood_psi(likelihood, dx, obs)

    auto = jax.jit(jax.grad(psi_like))(s)
    ana = jax.jit(lambda s: adjoint.grad_log_like_analytic(
        s, G, fc, GP, obs, likelihood))(s)
    a, b = np.asarray(auto), np.asarray(ana)
    denom = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=2e-3 * denom)
