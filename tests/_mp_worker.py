"""Subprocess body for tests/test_multiprocess.py: one of N localhost
processes fitting the shared fixture on a GLOBAL device mesh.

Launched with a scrubbed environment (CPU platform, 4 virtual devices per
process).  Writes the fit outputs to an .npz the parent compares across
processes and against the single-process reference fit.

Usage: python _mp_worker.py <port> <process_id> <num_processes> <out.npz>
       [mesh: 1d|2d]
"""
import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

port, pid, nproc, outfile = sys.argv[1:5]
mesh_kind = sys.argv[5] if len(sys.argv) > 5 else "1d"
maxit = int(sys.argv[6]) if len(sys.argv) > 6 else 1000

# Watchdog: a healthy 2-CPU worker finishes in well under 5 minutes; a
# cross-process collective that wedged (see docs/DESIGN.md §6: XLA-CPU
# Gloo transport race) hangs forever at ~0% CPU.  Dump all-thread Python
# tracebacks and exit non-zero instead, so the parent's retry fires
# quickly WITH a diagnosis in the log.
faulthandler.dump_traceback_later(
    int(os.environ.get("MP_WATCHDOG_S", "300")), exit=True)


def _mark(msg):
    print(f"[mp-worker {pid} +{time.time() - _T0:.1f}s] {msg}", flush=True)


_T0 = time.time()

import jax  # noqa: E402

_mark("initializing jax.distributed")
jax.distributed.initialize(f"localhost:{port}", int(nproc), int(pid),
                           initialization_timeout=120)
_mark("initialized")
assert jax.process_count() == int(nproc), jax.process_count()
assert jax.device_count() == 8, jax.devices()
assert jax.local_device_count() == 4

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import atlasqtl_tpu as aq  # noqa: E402
from atlasqtl_tpu.parallel.mesh import make_mesh  # noqa: E402


def simulate_fixture(n=100, p=75, p_act=10, q=20, seed=123):
    # mirror of tests/conftest.py:simulate_fixture (inlined: importing
    # conftest would fire its env re-exec machinery)
    rng = np.random.default_rng(seed)
    x = rng.binomial(2, 0.2, size=(n, p)).astype(np.float64)
    beta = np.zeros((p, q))
    beta[:p_act] = rng.normal(1.0, 0.5, size=(p_act, q))
    y = x @ beta + rng.normal(size=(n, q))
    return y, x


y, x = simulate_fixture(q=32)
mesh = make_mesh(jax.devices(), p_shards=2 if mesh_kind == "2d" else 1)
_mark(f"mesh built ({mesh_kind}), starting fit (maxit={maxit})")
res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                  user_seed=123, mesh=mesh, maxit=maxit)
_mark("fit done, saving")
np.savez(outfile, gam=res.gam_vb, beta=res.beta_vb, theta=res.theta_vb,
         zeta=res.zeta_vb, lb=res.lb_opt, it=res.it,
         converged=res.converged)
faulthandler.cancel_dump_traceback_later()
print("mp-worker done", pid, res.it, res.lb_opt, flush=True)
