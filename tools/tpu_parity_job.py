"""On-TPU kernel parity harness (VERDICT r3 next-step #6).

CPU tests run the Pallas kernels in interpret mode, which cannot catch
Mosaic-compile divergence; this job runs the fused single-kernel sweeps
against the pure-XLA engines ON THE REAL CHIP at a production-like shape
and asserts agreement.  Run it through the persistent worker after any
kernel change:

    cp tools/tpu_parity_job.py /tmp/tpu_jobs/
    cat /tmp/tpu_jobs/tpu_parity_job.py.out

Record the PASS line + date in docs/DESIGN.md S3 each round.
"""
import numpy as np
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.io.prepare import prepare_data
from atlasqtl_tpu.ops.sweep import (SweepConsts, block_gram, sweep_complete,
                                    sweep_missing_blocked)
from atlasqtl_tpu.ops.sweep_fused import sweep_complete_fused
from atlasqtl_tpu.ops.sweep_missing_fused import sweep_missing_fused_driver
from atlasqtl_tpu.ops.updates import sig2_beta_update

assert jax.devices()[0].platform != "cpu", "this harness must run on TPU"

n, p, q = 512, 2048, 1024
rng = np.random.default_rng(42)
x = rng.normal(size=(n, p))
beta_t = np.zeros((p, q))
beta_t[:20] = rng.normal(1.0, 0.5, (20, q))
y = x @ beta_t * 0.2 + rng.normal(size=(n, q))
ym = y.copy()
ym[rng.random(y.shape) < 0.15] = np.nan

report = []


def check(name, a, b, rtol):
    """Tolerance is RELATIVE to the comparison array's max magnitude:
    the two engines run the same math in different f32 reduction orders,
    so the honest bound is reduction-order drift (measured ~1e-3 of the
    array scale at this shape), not an absolute epsilon."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = float(np.max(np.abs(a - b)))
    scale = max(float(np.max(np.abs(b))), 1.0)
    ok = np.isfinite(a).all() and np.isfinite(b).all() and d <= rtol * scale
    report.append((name, d, rtol * scale, ok))
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|diff| = {d:.3e} "
          f"(tol {rtol:g} x scale {scale:.3g})", flush=True)
    return ok


# ---------------- complete-data: fused vs XLA scan ----------------
dat = prepare_data(y, x, 0.1, 1000)
p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
cfg = Config(dtype=jnp.float32, block_size=128, shr_fac_inv=float(q_eff))
data = gl.build_data(dat.x, dat.y, cfg, q_pad_to=256)
init = elic.auto_set_init(dat.y, p_eff, (4, 16), float(q_eff), 7)
state = gl.build_state(init, data, cfg)
gram = jax.jit(block_gram, static_argnums=1)(data.x, cfg.block_size)

q_pad = data.y.shape[1]
tau = jnp.asarray(rng.uniform(0.5, 2.0, q_pad), jnp.float32)
sig2_inv_c = jnp.asarray(0.7, jnp.float32)
# sig2_beta MUST satisfy the CAVI relation s2 = 1/(c (n-1+sig2_inv) tau):
# the mean update's contraction factor is c*s2*tau — arbitrary values make
# the Gauss-Seidel recursion genuinely diverge (both engines overflow
# identically; found by this harness's first run)
s2 = sig2_beta_update(data.n, sig2_inv_c, tau, None,
                      jnp.asarray(1.0, jnp.float32))
consts = SweepConsts(sig2_beta=s2, tau=tau, log_tau=jnp.log(tau) - 0.05,
                     log_sig2_inv=jnp.asarray(-0.3, jnp.float32),
                     theta=state.theta, zeta=state.zeta,
                     c=jnp.asarray(1.0, jnp.float32))

g_x, m_x, f_x, zr_x, zc_x = jax.jit(
    sweep_complete, static_argnums=(7,))(
    data.x, data.cp_x_y, gram, state.gam, state.mu_beta, state.fitted,
    consts, cfg.block_size, p_mask=data.p_mask, q_mask=data.q_mask)

q_tile = gl._fused_q_tile(data.x.shape[0], q_pad)
b_f, g_f, m_f, f_f, zr_f, zc_f, _ = sweep_complete_fused(
    data.x, data.cp_x_y, gram, state.gam * state.mu_beta, state.fitted,
    consts, cfg.block_size, p_mask=data.p_mask, q_mask=data.q_mask,
    q_tile=q_tile, sub=gl._fused_sub(data.x.shape[0], cfg),
    qchunk=cfg.sweep_qchunk or gl._fused_qchunk(q_tile))

msk = (np.asarray(data.p_mask)[:, None] * np.asarray(data.q_mask)[None, :])
ok = True
ok &= check("complete gam  (fused vs xla)", g_f, np.asarray(g_x) * msk, 2e-2)
ok &= check("complete beta (fused vs xla)", b_f,
            np.asarray(g_x) * np.asarray(m_x) * msk, 2e-2)
ok &= check("complete fitted", f_f, f_x, 1e-2)
ok &= check("complete z_row", zr_f, zr_x, 5e-3)
ok &= check("complete z_col", zc_f, zc_x, 5e-3)

# ---------------- exact-missing: fused vs blocked ----------------
datm = prepare_data(ym, x, 0.1, 1000)
cfgm = Config(dtype=jnp.float32, block_size=128, mis_block=16,
              shr_fac_inv=float(q_eff))
datam = gl.build_data(datm.x, datm.y, cfgm, q_pad_to=256)
initm = elic.auto_set_init(datm.y, p_eff, (4, 16), float(q_eff), 7)
statem = gl.build_state(initm, datam, cfgm)
sig2_inv = jnp.asarray(0.7, jnp.float32)
s2m = sig2_beta_update(datam.n, sig2_inv, tau, datam.x_norm_sq,
                       jnp.asarray(1.0, jnp.float32))
constsm = SweepConsts(sig2_beta=s2m, tau=tau, log_tau=jnp.log(tau) - 0.05,
                      log_sig2_inv=jnp.asarray(-0.3, jnp.float32),
                      theta=statem.theta, zeta=statem.zeta,
                      c=jnp.asarray(1.0, jnp.float32))

from atlasqtl_tpu.ops.sweep import mis_pair_gram
pair = jax.jit(mis_pair_gram, static_argnums=2)(datam.x, datam.mis_pat, 16)
g_b, m_b, f_b, zr_b, zc_b = sweep_missing_blocked(
    datam.x, datam.cp_x_y, datam.x_norm_sq, datam.mis_pat, pair,
    statem.gam, statem.mu_beta, statem.fitted, constsm, 16,
    p_mask=datam.p_mask, q_mask=datam.q_mask)

qtm = gl._mis_fused_q_tile(datam.x.shape[0], datam.y.shape[1])
g_mf, m_mf, f_mf, zr_mf, zc_mf = sweep_missing_fused_driver(
    datam.x, datam.cp_x_y, datam.x_norm_sq, datam.mis_pat,
    statem.gam, statem.mu_beta, statem.fitted, constsm, sig2_inv,
    cfgm.block_size, p_mask=datam.p_mask, q_mask=datam.q_mask,
    q_tile=qtm, sub=cfgm.mis_sub, wgroup=cfgm.mis_wgroup,
    pair_bf16=cfgm.mis_pair_bf16,
    qchunk=cfgm.sweep_qchunk or gl._fused_qchunk(qtm))

ok &= check("missing gam (fused vs blocked)", g_mf,
            np.asarray(g_b) * msk, 2e-2)
ok &= check("missing fitted", f_mf, f_b, 1e-2)
ok &= check("missing z_row", zr_mf, zr_b, 5e-3)

print(("ALL PASS" if ok else "FAILURES PRESENT"), "| shape n=%d p=%d q=%d"
      % (n, p, q), "| device:", jax.devices()[0])
