"""Subprocess body for the staggered-kernel equivalence check.

Run in its own process because interpret-mode compilation of the staggered
kernel's large cond regions intermittently SEGFAULTS the XLA CPU backend
when run inside the long-lived suite process (observed twice at the same
point; standalone runs pass).  A fresh process avoids the state-dependent
crash and contains it if it happens.

Usage: python _staggered_eq_worker.py <c_anneal:0|1> <emit:0|1>
Exits 0 on bitwise equivalence, 1 on mismatch.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

c_anneal = bool(int(sys.argv[1]))
emit = bool(int(sys.argv[2]))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atlasqtl_tpu.types import Config  # noqa: E402
from atlasqtl_tpu.models import global_local as gl  # noqa: E402
from atlasqtl_tpu.inference import elicitation as elic  # noqa: E402
from atlasqtl_tpu.io.prepare import prepare_data  # noqa: E402
from atlasqtl_tpu.ops.sweep import SweepConsts, block_gram  # noqa: E402
from atlasqtl_tpu.ops.sweep_fused import sweep_complete_fused  # noqa: E402
from atlasqtl_tpu.ops.sweep_staggered import (  # noqa: E402
    sweep_complete_staggered)
from atlasqtl_tpu.ops.updates import sig2_beta_update  # noqa: E402


def simulate_fixture(n=80, p=300, p_act=8, q=256, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.binomial(2, 0.2, size=(n, p)).astype(np.float64)
    beta = np.zeros((p, q))
    beta[:p_act] = rng.normal(1.0, 0.5, size=(p_act, q))
    y = x @ beta + rng.normal(size=(n, q))
    return y, x


y, x = simulate_fixture()
dat = prepare_data(y, x, 0.1, 1000)
p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
cfg = Config(dtype=jnp.float32, block_size=128, shr_fac_inv=float(q_eff))
data = gl.build_data(dat.x, dat.y, cfg, q_pad_to=256)
init = elic.auto_set_init(dat.y, p_eff, (4, 16), float(q_eff), 7)
state = gl.build_state(init, data, cfg)
gram = block_gram(data.x, cfg.block_size)
q_pad = data.y.shape[1]
rng = np.random.default_rng(1)
tau = jnp.asarray(rng.uniform(0.5, 2.0, q_pad), jnp.float32)
c = jnp.asarray(0.5 if c_anneal else 1.0, jnp.float32)
s2 = sig2_beta_update(data.n, jnp.asarray(0.7, jnp.float32), tau, None, c)
consts = SweepConsts(sig2_beta=s2, tau=tau, log_tau=jnp.log(tau),
                     log_sig2_inv=jnp.asarray(-0.3, jnp.float32),
                     theta=state.theta, zeta=state.zeta, c=c)
beta0 = state.gam * state.mu_beta
kw = dict(p_mask=data.p_mask, q_mask=data.q_mask, q_tile=256, sub=8,
          qchunk=128, annealed=c_anneal, emit_gam_mu=emit)
a = sweep_complete_fused(data.x, data.cp_x_y, gram, beta0, state.fitted,
                         consts, 128, **kw)
b = sweep_complete_staggered(data.x, data.cp_x_y, gram, beta0,
                             state.fitted, consts, 128, **kw)
for i, nm in ((0, "beta"), (1, "gam"), (2, "mu"), (3, "fitted"),
              (5, "z_col")):
    if a[i] is None:
        assert b[i] is None
        continue
    np.testing.assert_array_equal(np.asarray(b[i]), np.asarray(a[i]),
                                  err_msg=nm)
np.testing.assert_allclose(np.asarray(b[4]), np.asarray(a[4]),
                           rtol=1e-4, atol=1e-4, err_msg="z_row")
for j in range(3):
    np.testing.assert_allclose(np.asarray(b[6][j]), np.asarray(a[6][j]),
                               rtol=1e-4, atol=1e-4, err_msg=f"cs{j}")
print(f"staggered equivalence OK (c_anneal={c_anneal}, emit={emit})")
