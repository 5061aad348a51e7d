"""Pin the hardware-only dense-vs-sharded psi discrepancy (round 5, open
item from sharded_tail_hw_256.json: all sharded configs agree mutually to
4e-5 but differ from the dense evaluation by 2.6-3.3% ON TPU, while CPU
agrees to 4e-6; chaos ruled out by perturbation probe).

Stage-by-stage comparison on ONE device (identity collectives) of the
dense pipeline vs the slab-composed pipeline at N^3:
  0. TPU FFT accuracy anchor: rfft3 on TPU vs numpy f64 (rel L2)
  1. psi (displacement) field: lpt dense vs sharded spectral pipeline
  2. delta_x (Eulerian overdensity), XLA deposits both sides
  3. psi_prior and psi_like scalars
Whichever stage first diverges carries the bug/numerics difference.

Usage:  timeout 1800 python artifacts/probe_dense_vs_slab_tpu.py [N]
"""
import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

signal.signal(signal.SIGALRM, lambda *_: (print("WATCHDOG timeout"), os._exit(3)))
signal.alarm(int(os.environ.get("WATCHDOG_S", "1700")))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields
from barcode_tpu.forward import assign
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul, kernel_h
from barcode_tpu.model import likelihoods
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.parallel import sharded_fft as sf
from barcode_tpu.parallel import sharded_forward as sfw

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BOX = 200.0
g = GridSpec.cube(N, BOX)
gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85,
                  hubble=100.0)
fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0)
mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=(sfw.AXIS,))
AXIS = sfw.AXIS
n_dev = 1
out = {"N": N, "devices": 1}


def rel(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


@jax.jit
def setup():
    kk = jnp.sqrt(fourier.k_squared(g))
    keq = 0.02
    Pk = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5).at[0, 0, 0].set(0.0)
    truth = random_fields.grf(jax.random.key(0), g, Pk)
    d_eul = lag2eul(truth, g, fc, gp)
    nobs = jnp.maximum(1.0 + d_eul
                       + jax.random.normal(jax.random.key(1), g.shape), 0.0)
    return truth, nobs, Pk


truth, nobs, Pk = setup()
s0 = truth * 0.5

# --- 0. TPU FFT accuracy anchor (vs numpy f64 on a small slice budget) ---
# (the axon backend cannot transfer complex arrays to host: fetch re/im)
x_np = np.asarray(s0, np.float64)
F_np = np.fft.rfftn(x_np)
Fri, Fii = jax.jit(lambda x: (fourier.rfft3(x).real, fourier.rfft3(x).imag))(s0)
F_tpu = np.asarray(Fri, np.float64) + 1j * np.asarray(Fii, np.float64)
out["fft_rel_l2_tpu_vs_f64"] = rel(F_tpu, F_np)
print("stage0 fft:", out["fft_rel_l2_tpu_vs_f64"], flush=True)

# --- dense stages (jitted) ---
@jax.jit
def dense_stages(s, nobs_, Pk_):
    from barcode_tpu.forward import lpt, particles
    psi = lpt.lpt_psi(s, g, fc.sfmodel, gp.D1, gp.D2, fc.slength)
    pos = particles.displace(psi, g)
    f1 = gp.cpecvel / (gp.hubble * gp.ascale)
    pos = pos.at[2].set(jnp.mod(pos[2] + f1 * psi[2], g.L3))
    rho = assign.deposit(pos, g, "tsc", kernel_h(fc, g))
    W4 = assign.w4_fourier(g, kernel_h(fc, g))
    rho = fourier.irfft3(W4 * fourier.rfft3(rho), g)
    dx = rho / jnp.mean(rho) - 1.0
    obs_ = ObsData(nobs=nobs_, window=jnp.ones(g.shape),
                   noise=jnp.ones(g.shape), power=Pk_)
    pp = likelihoods.prior_psi(s, g, obs_)
    pl = likelihoods.likelihood_psi(1, dx, obs_)
    return psi, dx, pp, pl


psi_d, dx_d, pp_d, pl_d = dense_stages(s0, nobs, Pk)

# --- slab-composed stages under shard_map (1 device; mirrors
#     sharded_forward._make_psi_local's spectral pipeline + XLA deposit) ---
def slab_stages(delta, nobs_, power_f):
    dev = jax.lax.axis_index(AXIS)
    kx, ky, kz = sf.kvec_sharded(g, n_dev, dev)
    k2 = kx * kx + ky * ky + kz * kz
    guard = k2 > 1e-14
    inv_k2 = jnp.where(guard, 1.0 / jnp.where(guard, k2, 1.0), 0.0)
    n2_loc = g.N2 // n_dev
    mx = jnp.where(jnp.arange(g.N1) == g.N1 // 2, 0.0, 1.0)[:, None, None]
    my = jnp.where(dev * n2_loc + jnp.arange(n2_loc) == g.N2 // 2,
                   0.0, 1.0)[None, :, None]
    mz = jnp.where(jnp.arange(g.N3 // 2 + 1) == g.N3 // 2,
                   0.0, 1.0)[None, None, :]
    Fd = sf._rfft3_local(delta, n_dev, AXIS)
    b2 = Fd * inv_k2
    dd = lambda ka, kb: sf._irfft3_local(ka * kb * b2, n_dev, g.N3, AXIS)
    pxx, pyy, pzz = dd(kx, kx), dd(ky, ky), dd(kz, kz)
    pxy, pxz, pyz = dd(kx, ky), dd(kx, kz), dd(ky, kz)
    m2v = (pxx * pyy - pxy * pxy + pxx * pzz - pxz * pxz + pyy * pzz - pyz * pyz)
    div2 = -gp.D1 * delta + gp.D2 * m2v
    psilin = -gp.D1 * delta
    arg = 1.0 + (2.0 / 3.0) * psilin
    safe_arg = jnp.where(arg > 0.0, arg, 1.0)
    div_sc = jnp.where(arg > 0.0, 3.0 * (jnp.sqrt(safe_arg) - 1.0), -3.0)
    K = jnp.exp(-k2 * (fc.slength * fc.slength) / 2.0)
    div_C = (K * sf._rfft3_local(div2, n_dev, AXIS)
             + (1.0 - K) * sf._rfft3_local(div_sc, n_dev, AXIS))
    base = (-1j) * div_C * inv_k2 * (mx * my * mz)
    psi_x = sf._irfft3_local(base * kx, n_dev, g.N3, AXIS)
    psi_y = sf._irfft3_local(base * ky, n_dev, g.N3, AXIS)
    psi_z = sf._irfft3_local(base * kz, n_dev, g.N3, AXIS)
    psi = jnp.stack([psi_x, psi_y, psi_z])
    psi = 0.5 * (psi + sfw._roll_x1(jnp.roll(psi, (1, 1), axis=(2, 3))))
    pos = sfw._local_positions_x(g, n_dev, dev, delta.dtype) + psi
    L = jnp.asarray([g.L1, g.L2, g.L3], delta.dtype).reshape(3, 1, 1, 1)
    pos = jnp.mod(pos, L)
    f1 = gp.cpecvel / (gp.hubble * gp.ascale)
    pos = pos.at[2].set(jnp.mod(pos[2] + f1 * psi[2], g.L3))
    rho = sfw._deposit_local(pos, g, fc, 16, n_dev, dev)
    h = kernel_h(fc, g)
    W4 = sfw._w4_sharded(g, n_dev, dev, h)
    Fr = sf._rfft3_local(rho, n_dev, AXIS)
    rho = sf._irfft3_local(W4 * Fr, n_dev, g.N3, AXIS)
    mean = jax.lax.pmean(jnp.mean(rho), AXIS)
    dx = rho / mean - 1.0
    obs_loc = ObsData(nobs=nobs_, window=jnp.ones(nobs_.shape),
                      noise=jnp.ones(nobs_.shape), power=0.0)
    pl = jax.lax.psum(likelihoods.likelihood_psi(1, dx, obs_loc), AXIS)
    Fd2 = sf._rfft3_local(delta, n_dev, AXIS)
    inv_p = jnp.where(power_f > 0,
                      (g.vol / g.N) / jnp.where(power_f > 0, power_f, 1.0), 0.0)
    Sinv = sf._irfft3_local(inv_p * Fd2, n_dev, g.N3, AXIS)
    pp = jax.lax.psum(0.5 * jnp.sum(delta * Sinv), AXIS)
    return psi, dx, pp, pl


x_spec = P(AXIS, None, None)
f_spec = P(None, AXIS, None)
sl = jax.jit(jax.shard_map(
    slab_stages, mesh=mesh, in_specs=(x_spec, x_spec, f_spec),
    out_specs=(P(None, AXIS, None, None), x_spec, P(), P()),
    check_vma=False))
s_sh = jax.device_put(s0, NamedSharding(mesh, x_spec))
nobs_sh = jax.device_put(nobs, NamedSharding(mesh, x_spec))
Pk_sh = jax.device_put(Pk, NamedSharding(mesh, f_spec))
psi_s, dx_s, pp_s, pl_s = sl(s_sh, nobs_sh, Pk_sh)

out["stage1_psi_field_rel"] = rel(psi_s, psi_d)
out["stage2_delta_x_rel"] = rel(dx_s, dx_d)
out["stage3_psi_prior_rel"] = abs(float(pp_s) - float(pp_d)) / abs(float(pp_d))
out["stage3_psi_like_rel"] = abs(float(pl_s) - float(pl_d)) / abs(float(pl_d))
print(json.dumps(out, indent=1), flush=True)

path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    f"probe_dense_vs_slab_{N}.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path)
