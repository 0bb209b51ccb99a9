"""Device-resident fit loops: the whole annealing ladder and the whole
converged CAVI phase each run as ONE compiled dispatch.

The host driver (driver.py) dispatches one jitted call per CAVI iteration
plus one per ELBO evaluation.  That is the right structure when iterations
cost tens of ms (eQTL scale) and checkpoint/trace hooks need the host, but
for the small BASELINE configs (p*q <= a few 1e6) the per-dispatch latency
of the accelerator tunnel dominates: sim_small measured ~0.74 s/iter of
which <1 ms is compute (VERDICT r3 weak #3).  Here the reference's control
flow (R/atlasqtl_global_local_core.R:125-377) — annealing ladder, adaptive
ELBO thinning, convergence test, monotonicity guard — is restated as
`lax.scan` / `lax.while_loop` so the entire fit is two dispatches.

Semantics are identical to the host loop: same iteration count, same ELBO
evaluation schedule (adaptive thinning), same convergence rule, and the
monotonicity guard still fires — violations are flagged on device and the
host raises `ElboDecreaseError` after the loop from the recorded ELBO
trace (post-hoc rather than at-first-violation; the error carries the same
first offending pair).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# Fixed ELBO-trace capacity so the compiled program is independent of
# cfg.maxit (the bench warm-up runs maxit=3 and must hit the same XLA
# executable as the maxit=1000 production call).  Evaluations beyond the
# capacity overwrite the last slot (the guard flag is computed on device,
# so only the host-side history is truncated).
ELBO_BUF = 2048

_loops = {}


def get_loops(mod):
    """(anneal_scan, converged_loop) jitted callables for a model module
    (models/global_local or models/global_only)."""
    if mod.__name__ not in _loops:
        _loops[mod.__name__] = (_build_anneal(mod), _build_converged(mod))
    return _loops[mod.__name__]


def _build_anneal(mod):
    @partial(jax.jit, static_argnames=("cfg", "mesh"),
             donate_argnames=("state",))
    def anneal_scan(data, hyper, state, gram_blocks, cs, css, *, cfg,
                    mesh=None):
        """All ladder rungs below c=1 in one lax.scan (the host equivalent:
        driver.py anneal_one)."""
        def body(st, c_pair):
            c, c_s = c_pair
            st = mod.cavi_iteration(data, hyper, st, gram_blocks, c, c_s,
                                    cfg=cfg, annealed=True, mesh=mesh,
                                    lite=True)
            return st, None
        state, _ = jax.lax.scan(body, state, (cs, css))
        return state
    return anneal_scan


def _build_converged(mod):
    @partial(jax.jit, static_argnames=("cfg", "mesh"),
             donate_argnames=("state",))
    def converged_loop(data, hyper, state, gram_blocks, it0, it_init, maxit,
                       times_sched, batch_sched, *, cfg, mesh=None):
        """Converged CAVI phase as one lax.while_loop.

        Mirrors driver.py's host loop exactly: iteration `it` runs lite
        unless its result feeds an ELBO evaluation or it is the last
        possible iteration; evaluations follow the reference's adaptive
        thinning schedule (R/atlasqtl_global_local_core.R:87-97, 342-377).

        Returns (state, it, lb, converged, diff_lb, n_eval, elbo_buf,
        it_buf, mono_bad).
        """
        dt = cfg.dtype
        edt = cfg.elbo_dtype if jax.config.jax_enable_x64 else cfg.dtype
        eps = float(np.finfo(np.float64).eps) ** 0.5
        # scale-aware arithmetic allowance + convergence noise floor —
        # must mirror the host driver exactly (see driver.py:eps_rel)
        eps_rel = 64.0 * float(jnp.finfo(edt).eps)
        one = jnp.asarray(1.0, dt)

        def one_iter(st, lite):
            return mod.cavi_iteration(data, hyper, st, gram_blocks, one, one,
                                      cfg=cfg, annealed=False, mesh=mesh,
                                      lite=lite)

        def cond(carry):
            it, conv = carry[1], carry[3]
            return jnp.logical_and(jnp.logical_not(conv), it < maxit)

        def body(carry):
            (st, it, lb_prev, conv, ibc, bc, nev, ebuf, ibuf, mono,
             dlb) = carry
            it = it + 1
            will_eval = (it <= it_init + 1) | (it % bc == 0) | (it % bc == 1)
            need_full = will_eval | (it >= maxit)
            st = jax.lax.cond(need_full,
                              lambda s: one_iter(s, False),
                              lambda s: one_iter(s, True), st)

            def do_eval(op):
                st, lb_prev, conv, ibc, bc, nev, ebuf, ibuf, mono, dlb = op
                lb = jnp.asarray(mod.compute_elbo(data, hyper, st, cfg=cfg),
                                 edt)
                idx = jnp.minimum(nev, ELBO_BUF - 1)
                ebuf = ebuf.at[idx].set(lb)
                ibuf = ibuf.at[idx].set(it)
                # NaN compares False against everything: flag non-finite
                # ELBO explicitly (the host raises from the recorded trace)
                # and never declare convergence on it
                had_prev = jnp.isfinite(lb_prev)
                mono = mono | (had_prev
                               & (lb + eps + eps_rel * jnp.abs(lb_prev)
                                  < lb_prev)) | ~jnp.isfinite(lb)
                diff = jnp.abs(lb - lb_prev)
                exceed = jnp.sum((diff > times_sched * cfg.tol)
                                 .astype(jnp.int32), dtype=jnp.int32)
                conv = ((exceed == 0) | (diff <= eps_rel * jnp.abs(lb))) \
                    & jnp.isfinite(lb)
                upd = (exceed > 0) & (ibc > exceed)
                ibc = jnp.where(upd, exceed, ibc)
                bc = jnp.where(upd, batch_sched[jnp.maximum(ibc - 1, 0)], bc)
                return st, lb, conv, ibc, bc, nev + 1, ebuf, ibuf, mono, diff

            (st, lb_prev, conv, ibc, bc, nev, ebuf, ibuf, mono,
             dlb) = jax.lax.cond(
                will_eval, do_eval, lambda op: op,
                (st, lb_prev, conv, ibc, bc, nev, ebuf, ibuf, mono, dlb))
            return (st, it, lb_prev, conv, ibc, bc, nev, ebuf, ibuf, mono,
                    dlb)

        nb = batch_sched.shape[0]
        carry0 = (state, jnp.asarray(it0, jnp.int32),
                  jnp.asarray(-jnp.inf, edt), jnp.asarray(False),
                  jnp.asarray(nb + 1, jnp.int32), jnp.asarray(1, jnp.int32),
                  jnp.asarray(0, jnp.int32),
                  jnp.zeros((ELBO_BUF,), edt),
                  jnp.zeros((ELBO_BUF,), jnp.int32),
                  jnp.asarray(False), jnp.asarray(jnp.inf, edt))
        (st, it, lb, conv, _, _, nev, ebuf, ibuf, mono,
         dlb) = jax.lax.while_loop(cond, body, carry0)
        return st, it, lb, conv, dlb, nev, ebuf, ibuf, mono
    return converged_loop


def eligible(cfg, checkpointer, tracer, verbose, data) -> bool:
    """Auto policy: device-resident loops when no host hook needs to run
    between iterations and the problem is small enough that per-dispatch
    latency dominates compute.  cfg.device_loop = "on"/"off" overrides."""
    if cfg.device_loop == "off":
        return False
    if checkpointer is not None or tracer is not None or verbose == 2:
        return False  # host hooks / per-iteration diagnostics need the host
    if cfg.device_loop == "on":
        return True
    cells = data.x.shape[1] * data.y.shape[1]
    return (jax.devices()[0].platform != "cpu" and cells <= (1 << 25))
