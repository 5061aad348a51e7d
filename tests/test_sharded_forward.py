"""Fully sharded forward model + posterior vs the dense implementation
(8-virtual-device CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu import random_fields as rf
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
from barcode_tpu.model import posterior
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.parallel import sharded_forward as sfw

G = GridSpec.cube(16, 160.0)
GP = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85, hubble=100.0)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8
    return Mesh(np.asarray(devs[:8]), axis_names=(sfw.AXIS,))


def build_problem(key=0, mk="tsc", rsd=False):
    P_ = jnp.full(G.rshape, 20.0).at[0, 0, 0].set(0.0)
    truth = rf.grf(jax.random.key(key), G, P_)
    fc = ForwardConfig(sfmodel=1, masskernel=mk, rsd=rsd)
    d_eul = lag2eul(truth, G, fc, GP)
    nobs = 1.0 + d_eul + 0.4 * jax.random.normal(jax.random.key(key + 1), G.shape)
    obs = ObsData(nobs=nobs, window=jnp.ones(G.shape),
                  noise=jnp.full(G.shape, 0.4), power=P_)
    return truth, fc, obs


@pytest.mark.parametrize("mk,rsd", [("tsc", False), ("sph_ft", False), ("tsc", True)])
def test_sharded_psi_matches_dense(mesh, mk, rsd):
    truth, fc, obs = build_problem(mk=mk, rsd=rsd)
    mc = posterior.ModelConfig(likelihood=1, forward=fc)
    dense_psi = posterior.make_psi(G, mc, GP, obs)
    s = 0.5 * truth

    psi_sh, grad_sh = sfw.make_sharded_psi(G, fc, GP, likelihood=1, mesh=mesh,
                                           halo=2)
    obs_sh = sfw.shard_obs(obs, mesh)
    s_sh = jax.device_put(s, NamedSharding(mesh, P(sfw.AXIS, None, None)))

    dense_val = float(dense_psi(s)[0])
    sh_val = float(psi_sh(s_sh, obs_sh))
    np.testing.assert_allclose(sh_val, dense_val, rtol=3e-4)


def test_sharded_grad_matches_dense(mesh):
    truth, fc, obs = build_problem(mk="tsc")
    mc = posterior.ModelConfig(likelihood=1, forward=fc)
    dense_grad = jax.grad(lambda d: posterior.make_psi(G, mc, GP, obs)(d)[0])
    s = 0.5 * truth
    psi_sh, grad_sh = sfw.make_sharded_psi(G, fc, GP, likelihood=1, mesh=mesh,
                                           halo=2)
    obs_sh = sfw.shard_obs(obs, mesh)
    s_sh = jax.device_put(s, NamedSharding(mesh, P(sfw.AXIS, None, None)))
    gd = np.asarray(dense_grad(s))
    gs = np.asarray(grad_sh(s_sh, obs_sh))
    np.testing.assert_allclose(gs, gd, atol=3e-3 * np.abs(gd).max())


def test_w4_sharded_matches_host_kernel(mesh):
    """The f32-safe sharded W4 (closed form + Taylor) equals the f64 host
    precompute on the dense layout."""
    from barcode_tpu.forward import assign

    h = G.cell_avg
    dense = np.asarray(assign.w4_fourier(G, h))

    def local(_):
        import jax as _j
        dev = _j.lax.axis_index(sfw.AXIS)
        return sfw._w4_sharded(G, 8, dev, h)

    W = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(P(sfw.AXIS),),
                              out_specs=P(None, sfw.AXIS, None)))(
        jnp.zeros(8))
    np.testing.assert_allclose(np.asarray(W), dense, atol=2e-4)


def test_chains_grid_mesh_psi_and_grad():
    """dp x sp composition: 4 chains x 2 grid slabs on the 8-device mesh;
    per-chain psi/grad match the dense single-device values."""
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2 = Mesh(devs, axis_names=("chains", sfw.AXIS))
    truth, fc, obs = build_problem(mk="sph_ft")
    mc = posterior.ModelConfig(likelihood=1, forward=fc)
    dense_psi = posterior.make_psi(G, mc, GP, obs)
    dense_vg = jax.jit(jax.value_and_grad(lambda d: dense_psi(d)[0]))

    batch = jnp.stack([0.5 * truth, -0.3 * truth, 0.1 * truth,
                       jnp.zeros(G.shape)])
    vg = sfw.make_sharded_psi_vg_chains(G, fc, GP, likelihood=1, mesh=mesh2,
                                        halo=2)
    obs_sh = sfw.shard_obs_chains(obs, mesh2)
    batch_sh = jax.device_put(
        batch, NamedSharding(mesh2, P("chains", sfw.AXIS, None, None)))
    (vals, _), grads = vg(batch_sh, obs_sh)
    for c in range(4):
        v_ref, g_ref = dense_vg(batch[c])
        np.testing.assert_allclose(float(vals[c]), float(v_ref), rtol=3e-4)
        g_ref = np.asarray(g_ref)
        np.testing.assert_allclose(np.asarray(grads[c]), g_ref,
                                   atol=3e-3 * np.abs(g_ref).max())


@pytest.mark.parametrize("sfmodel,mk,rsd", [(1, "tsc", False), (1, "tsc", True),
                                            (3, "sph_ft", False)])
def test_sharded_pallas_deposit_matches_dense(sfmodel, mk, rsd):
    """Pallas slab deposit (interpret mode on CPU) inside the sharded
    posterior: psi and grad match the dense path.  32^3 over 4 slabs so the
    rounded halo (4) fits the slab width (8) and the extended buffer (16)
    tiles by the 8-row blocks."""
    G32 = GridSpec.cube(32, 320.0)
    P_ = jnp.full(G32.rshape, 20.0).at[0, 0, 0].set(0.0)
    truth = rf.grf(jax.random.key(0), G32, P_)
    fc_d = ForwardConfig(sfmodel=sfmodel, masskernel=mk, slength=20.0, rsd=rsd)
    fc = ForwardConfig(sfmodel=sfmodel, masskernel=mk, slength=20.0, rsd=rsd,
                       pallas_deposit=True, pallas_halo=4)
    d_eul = lag2eul(truth, G32, fc_d, GP)
    nobs = 1.0 + d_eul + 0.4 * jax.random.normal(jax.random.key(1), G32.shape)
    obs = ObsData(nobs=nobs, window=jnp.ones(G32.shape),
                  noise=jnp.full(G32.shape, 0.4), power=P_)
    mc = posterior.ModelConfig(likelihood=1, forward=fc_d)
    dense_vg = jax.jit(jax.value_and_grad(
        lambda d: posterior.make_psi(G32, mc, GP, obs)(d)[0]))
    s = 0.5 * truth
    v_ref, g_ref = dense_vg(s)
    g_ref = np.asarray(g_ref)

    mesh4 = Mesh(np.asarray(jax.devices()[:4]), axis_names=(sfw.AXIS,))
    psi_sh, grad_sh = sfw.make_sharded_psi(G32, fc, GP, likelihood=1,
                                           mesh=mesh4, halo=4)
    obs_sh = sfw.shard_obs(obs, mesh4)
    s_sh = jax.device_put(s, NamedSharding(mesh4, P(sfw.AXIS, None, None)))
    np.testing.assert_allclose(float(psi_sh(s_sh, obs_sh)), float(v_ref),
                               rtol=3e-5)
    np.testing.assert_allclose(np.asarray(grad_sh(s_sh, obs_sh)), g_ref,
                               atol=3e-5 * np.abs(g_ref).max())


def test_sharded_pallas_chains_grid_mesh():
    """Pallas slab deposit vmapped over chains on the ('chains','grid')
    mesh: per-chain psi/grad match the dense values."""
    G32 = GridSpec.cube(32, 320.0)
    P_ = jnp.full(G32.rshape, 20.0).at[0, 0, 0].set(0.0)
    truth = rf.grf(jax.random.key(0), G32, P_)
    fc_d = ForwardConfig(sfmodel=1, masskernel="tsc")
    fc = ForwardConfig(sfmodel=1, masskernel="tsc", pallas_deposit=True,
                       pallas_halo=4)
    d_eul = lag2eul(truth, G32, fc_d, GP)
    nobs = 1.0 + d_eul + 0.4 * jax.random.normal(jax.random.key(1), G32.shape)
    obs = ObsData(nobs=nobs, window=jnp.ones(G32.shape),
                  noise=jnp.full(G32.shape, 0.4), power=P_)
    mc = posterior.ModelConfig(likelihood=1, forward=fc_d)
    dense_vg = jax.jit(jax.value_and_grad(
        lambda d: posterior.make_psi(G32, mc, GP, obs)(d)[0]))

    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                 axis_names=("chains", sfw.AXIS))
    vg = sfw.make_sharded_psi_vg_chains(G32, fc, GP, likelihood=1, mesh=mesh2,
                                        halo=4)
    obs_sh = sfw.shard_obs_chains(obs, mesh2)
    batch = jnp.stack([0.5 * truth, -0.3 * truth])
    batch_sh = jax.device_put(
        batch, NamedSharding(mesh2, P("chains", sfw.AXIS, None, None)))
    (vals, _), grads = vg(batch_sh, obs_sh)
    for c in range(2):
        v_ref, g_ref = dense_vg(batch[c])
        g_ref = np.asarray(g_ref)
        np.testing.assert_allclose(float(vals[c]), float(v_ref), rtol=3e-5)
        np.testing.assert_allclose(np.asarray(grads[c]), g_ref,
                                   atol=3e-5 * np.abs(g_ref).max())


@pytest.mark.parametrize("sfmodel", [2, 3])
def test_sharded_2lpt_alpt_matches_dense(mesh, sfmodel):
    """Sharded 2LPT/ALPT posterior (+grad) == dense, unlocking config 5
    (256^3 ALPT) across the 'grid' axis."""
    P_ = jnp.full(G.rshape, 8.0).at[0, 0, 0].set(0.0)
    truth = rf.grf(jax.random.key(3), G, P_)
    fc = ForwardConfig(sfmodel=sfmodel, masskernel="sph_ft", slength=20.0)
    d_eul = lag2eul(truth, G, fc, GP)
    nobs = 1.0 + d_eul + 0.4 * jax.random.normal(jax.random.key(4), G.shape)
    obs = ObsData(nobs=nobs, window=jnp.ones(G.shape),
                  noise=jnp.full(G.shape, 0.4), power=P_)
    mc = posterior.ModelConfig(likelihood=1, forward=fc)
    dense_vg = jax.jit(jax.value_and_grad(
        lambda d: posterior.make_psi(G, mc, GP, obs)(d)[0]))
    s = 0.5 * truth

    psi_sh, grad_sh = sfw.make_sharded_psi(G, fc, GP, likelihood=1, mesh=mesh,
                                           halo=2)
    obs_sh = sfw.shard_obs(obs, mesh)
    s_sh = jax.device_put(s, NamedSharding(mesh, P(sfw.AXIS, None, None)))
    v_ref, g_ref = dense_vg(s)
    np.testing.assert_allclose(float(psi_sh(s_sh, obs_sh)), float(v_ref),
                               rtol=5e-4)
    g_ref = np.asarray(g_ref)
    np.testing.assert_allclose(np.asarray(grad_sh(s_sh, obs_sh)), g_ref,
                               atol=5e-3 * np.abs(g_ref).max())


def test_sharded_one_device_mesh_matches_dense():
    """Regression for the per-row min-image fix in _deposit_local: on a
    1-device ('grid',) mesh the slab spans the WHOLE box, so a min-image
    offset computed from the slab start would fold far particles wrongly.
    The sharded psi/grad must match dense exactly in this degenerate case."""
    truth, fc, obs = build_problem(mk="tsc")
    mc = posterior.ModelConfig(likelihood=1, forward=fc)
    dense_vg = jax.jit(jax.value_and_grad(
        lambda d: posterior.make_psi(G, mc, GP, obs)(d)[0]))
    s = 0.5 * truth
    v_ref, g_ref = dense_vg(s)
    g_ref = np.asarray(g_ref)

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), axis_names=(sfw.AXIS,))
    psi_sh, grad_sh = sfw.make_sharded_psi(G, fc, GP, likelihood=1,
                                           mesh=mesh1, halo=2)
    obs_sh = sfw.shard_obs(obs, mesh1)
    s_sh = jax.device_put(s, NamedSharding(mesh1, P(sfw.AXIS, None, None)))
    np.testing.assert_allclose(float(psi_sh(s_sh, obs_sh)), float(v_ref),
                               rtol=3e-4)
    np.testing.assert_allclose(np.asarray(grad_sh(s_sh, obs_sh)), g_ref,
                               atol=3e-3 * np.abs(g_ref).max())


def test_sharded_int_masskernel_routes_pallas(monkeypatch):
    """input.par encodes masskernel as an int (TSC=2); the pallas_deposit
    gate must normalize it, or .par/CLI-driven sharded runs silently fall
    back to the XLA scatter path."""
    called = {}
    orig = sfw._make_pallas_slab_deposit

    def spy(*a, **k):
        called["pallas"] = True
        return orig(*a, **k)

    monkeypatch.setattr(sfw, "_make_pallas_slab_deposit", spy)
    G32 = GridSpec.cube(32, 320.0)
    P_ = jnp.full(G32.rshape, 20.0).at[0, 0, 0].set(0.0)
    truth = rf.grf(jax.random.key(0), G32, P_)
    fc_d = ForwardConfig(sfmodel=1, masskernel=2)
    fc = ForwardConfig(sfmodel=1, masskernel=2, pallas_deposit=True,
                       pallas_halo=4)
    d_eul = lag2eul(truth, G32, fc_d, GP)
    nobs = 1.0 + d_eul + 0.4 * jax.random.normal(jax.random.key(1), G32.shape)
    obs = ObsData(nobs=nobs, window=jnp.ones(G32.shape),
                  noise=jnp.full(G32.shape, 0.4), power=P_)
    mc = posterior.ModelConfig(likelihood=1, forward=fc_d)
    dense_psi = posterior.make_psi(G32, mc, GP, obs)

    mesh4 = Mesh(np.asarray(jax.devices()[:4]), axis_names=(sfw.AXIS,))
    psi_sh, _ = sfw.make_sharded_psi(G32, fc, GP, likelihood=1,
                                     mesh=mesh4, halo=4)
    assert called.get("pallas"), "int masskernel must route to the Pallas path"
    obs_sh = sfw.shard_obs(obs, mesh4)
    s = 0.5 * truth
    s_sh = jax.device_put(s, NamedSharding(mesh4, P(sfw.AXIS, None, None)))
    np.testing.assert_allclose(float(psi_sh(s_sh, obs_sh)),
                               float(dense_psi(s)[0]), rtol=3e-5)


# ---------------------------------------------------------------------------
# Slab halo-tail split (round 5): kernels at the quantile halo, worst-case
# ppermute exchange margin, violators exact through the 27-point XLA tail
# (sharded_forward._make_pallas_slab_deposit, assign._tail_deposit_slab)
# ---------------------------------------------------------------------------

def _tail_problem(scale=30.0):
    """32^3 problem whose displacements BREAK the kernel halo-4 contract
    (62 violators at scale 30; none breach the worst-case margin 8)."""
    G32 = GridSpec.cube(32, 320.0)
    P_ = jnp.full(G32.rshape, 20.0).at[0, 0, 0].set(0.0)
    truth = scale * rf.grf(jax.random.key(0), G32, P_)
    fc_d = ForwardConfig(sfmodel=1, masskernel="tsc")
    d_eul = lag2eul(truth, G32, fc_d, GP)
    nobs = 1.0 + d_eul + 0.4 * jax.random.normal(jax.random.key(1), G32.shape)
    obs = ObsData(nobs=nobs, window=jnp.ones(G32.shape),
                  noise=jnp.full(G32.shape, 0.4), power=P_)
    return G32, truth, fc_d, obs


def test_slab_tail_split_psi_grad_match_dense():
    from barcode_tpu.forward import assign, pallas_deposit as _pd

    G32, truth, fc_d, obs = _tail_problem()
    s = truth  # strong displacements: real kernel-halo violators
    _, pos = lag2eul(s, G32, fc_d, GP, return_pos=True)
    nviol = int(_pd.deposit_violations(pos, G32, 4))
    assert nviol > 0, "test must exercise the tail path"
    assert nviol < 256 // 2
    assert int(_pd.deposit_violations(pos, G32, 8)) == 0  # margin holds all

    mc = posterior.ModelConfig(likelihood=1, forward=fc_d)
    dense_vg = jax.jit(jax.value_and_grad(
        lambda d: posterior.make_psi(G32, mc, GP, obs)(d)[0]))
    v_ref, g_ref = dense_vg(s)
    g_ref = np.asarray(g_ref)

    fc = ForwardConfig(sfmodel=1, masskernel="tsc", pallas_deposit=True,
                       pallas_halo=4, pallas_tail_k=256)
    mesh4 = Mesh(np.asarray(jax.devices()[:4]), axis_names=(sfw.AXIS,))
    psi_sh, grad_sh = sfw.make_sharded_psi(G32, fc, GP, likelihood=1,
                                           mesh=mesh4, halo=8)
    obs_sh = sfw.shard_obs(obs, mesh4)
    s_sh = jax.device_put(s, NamedSharding(mesh4, P(sfw.AXIS, None, None)))
    np.testing.assert_allclose(float(psi_sh(s_sh, obs_sh)), float(v_ref),
                               rtol=3e-5)
    np.testing.assert_allclose(np.asarray(grad_sh(s_sh, obs_sh)), g_ref,
                               atol=3e-5 * np.abs(g_ref).max())


def test_slab_tail_split_without_tail_drops_mass():
    """Same problem at kernel halo 4 WITHOUT the tail: violators lose mass,
    so psi deviates — proves the split test above is non-trivial."""
    G32, truth, fc_d, obs = _tail_problem()
    s = truth
    mc = posterior.ModelConfig(likelihood=1, forward=fc_d)
    v_ref = float(posterior.make_psi(G32, mc, GP, obs)(s)[0])
    fc = ForwardConfig(sfmodel=1, masskernel="tsc", pallas_deposit=True,
                       pallas_halo=4, pallas_tail_k=0)
    mesh4 = Mesh(np.asarray(jax.devices()[:4]), axis_names=(sfw.AXIS,))
    psi_sh, _ = sfw.make_sharded_psi(G32, fc, GP, likelihood=1, mesh=mesh4,
                                     halo=4)
    obs_sh = sfw.shard_obs(obs, mesh4)
    s_sh = jax.device_put(s, NamedSharding(mesh4, P(sfw.AXIS, None, None)))
    # 62 dropped unit-mass particles perturb psi by O(1..100) absolute —
    # small against psi ~ 1.6e5 but far above the 3e-5-relative agreement
    # the tail-split test demands
    assert abs(float(psi_sh(s_sh, obs_sh)) - v_ref) > 1.0


def test_slab_tail_split_chains_grid_mesh():
    """Tail split composes with the ('chains','grid') 2-axis mesh."""
    G32, truth, fc_d, obs = _tail_problem()
    mc = posterior.ModelConfig(likelihood=1, forward=fc_d)
    dense_vg = jax.jit(jax.value_and_grad(
        lambda d: posterior.make_psi(G32, mc, GP, obs)(d)[0]))
    fc = ForwardConfig(sfmodel=1, masskernel="tsc", pallas_deposit=True,
                       pallas_halo=4, pallas_tail_k=256)
    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                 axis_names=("chains", sfw.AXIS))
    vg = sfw.make_sharded_psi_vg_chains(G32, fc, GP, likelihood=1, mesh=mesh2,
                                        halo=8)
    obs_sh = sfw.shard_obs_chains(obs, mesh2)
    batch = jnp.stack([truth, -0.8 * truth])
    batch_sh = jax.device_put(
        batch, NamedSharding(mesh2, P("chains", sfw.AXIS, None, None)))
    (vals, _), grads = vg(batch_sh, obs_sh)
    for c in range(2):
        v_ref, g_ref = dense_vg(batch[c])
        g_ref = np.asarray(g_ref)
        np.testing.assert_allclose(float(vals[c]), float(v_ref), rtol=3e-5)
        np.testing.assert_allclose(np.asarray(grads[c]), g_ref,
                                   atol=3e-5 * np.abs(g_ref).max())
