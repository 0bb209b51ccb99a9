"""CAVI driver: annealing schedule, adaptive ELBO thinning, convergence
control, checkpoint/trace hooks.

TPU-native re-design of the iteration-control half of
`atlasqtl_global_local_core_` (R/atlasqtl_global_local_core.R:69-97, 125-132,
318-399).  Device work is one jitted call per iteration (or per annealed
ladder step); control flow, logging, checkpointing and the monotonicity guard
live on host.
"""
from __future__ import annotations

import dataclasses
import logging
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Config, Data, Hyper, VBState
from ..models import global_local as gl
from ..ops.annealing import annealing_ladder
from ..ops.sweep import block_gram

log = logging.getLogger("atlasqtl_tpu")


@dataclasses.dataclass
class FitResult:
    state: VBState
    converged: bool
    it: int
    lb_opt: float
    diff_lb: float
    elbo_history: list


class ElboDecreaseError(RuntimeError):
    """Raised in debug mode when the ELBO decreases beyond tolerance —
    the reference's de-facto correctness oracle
    (R/atlasqtl_global_local_core.R:359-360)."""


def _anneal_replicas_batched(mod, data, hyper, replica_states, gram_blocks,
                             ladder, cfg: Config, mesh, verbose):
    """Annealing replicas as a batched leading device axis (BASELINE north
    star: "annealing ladder -> vmapped replica dimension").

    The m replica states are stacked on a leading axis; every ladder rung
    advances ALL replicas in one compiled call (jax.vmap over the iteration
    on a single device; lax.map per rung under a mesh, where the inner
    shard_map cannot be vmapped), and the best-ELBO replica is selected on
    device.  Replaces the reference-free host loop of round 1 — same math,
    batched device execution.
    """
    m = len(replica_states)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                     *replica_states)

    # data/hyper/gram_blocks are explicit jit arguments (closure capture
    # would bake them into the HLO as multi-GB constants at scale, which
    # bloats compile payloads enough to break the axon tunnel)
    def one_iter(st, dat, hyp, gram, c, c_s, lite):
        return mod.cavi_iteration(dat, hyp, st, gram, c, c_s,
                                  cfg=cfg, annealed=True, mesh=mesh,
                                  lite=lite)

    if mesh is None:
        _rung = jax.jit(
            jax.vmap(one_iter, in_axes=(0, None, None, None, None, None,
                                        None)),
            donate_argnums=(0,), static_argnums=(6,))
    else:
        _rung = jax.jit(
            lambda s, dat, hyp, gram, c, c_s, lite: jax.lax.map(
                lambda st: one_iter(st, dat, hyp, gram, c, c_s, lite), s),
            donate_argnums=(0,), static_argnums=(6,))
    rung = lambda s, c, c_s, lite: _rung(s, data, hyper, gram_blocks, c,
                                         c_s, lite)

    it_local = 0
    n_rungs = len(ladder) - 1
    for c in ladder[:-1]:  # the final rung c = 1 exits annealing mode
        it_local += 1
        c_s = c if cfg.anneal_scale else 1.0
        # the last rung must emit fresh gam/mu: the best-replica selection
        # below evaluates the ELBO on its output
        stacked = rung(stacked, jnp.asarray(c, cfg.dtype),
                       jnp.asarray(c_s, cfg.dtype), it_local < n_rungs)
        if verbose and (it_local == 1 or it_local % 5 == 0):
            log.info("Iteration %d (temperature %.4g, %d replicas)",
                     it_local, 1.0 / c, m)

    elbos = jax.jit(lambda s, dat, hyp: jax.lax.map(
        lambda st: mod.compute_elbo(dat, hyp, st, cfg=cfg), s))(
        stacked, data, hyper)
    best = jnp.argmax(elbos)
    state = jax.tree_util.tree_map(lambda a: a[best], stacked)
    if verbose:
        for r, lb in enumerate(np.asarray(elbos)):
            log.info("Annealing replica %d: ELBO = %.6f", r, lb)
    return state, it_local


def fit_global_local(data: Data, hyper: Hyper, state: VBState, cfg: Config,
                     anneal=None, verbose: int = 1,
                     checkpointer=None, tracer=None,
                     model: str = "global_local",
                     replica_states=None, mesh=None) -> FitResult:
    """Run annealed CAVI to convergence.

    checkpointer: optional callable(it, state, converged, lb_new, lb_old)
    tracer:       optional callable(it, state)
    model: "global_local" (horseshoe, the product path) or "global"
           (global-scale-only variant, R/atlasqtl_global_core.R)
    replica_states: optional list of initial states — each is annealed
           independently (the TPU-native "annealing replica" axis) and the
           replica with the best post-annealing ELBO continues to
           convergence.
    """
    if model == "global_local":
        mod = gl
    elif model == "global":
        from ..models import global_only as mod_go
        mod = mod_go
    else:
        raise ValueError(f"unknown model {model!r}")
    if data.x_norm_sq is None:  # complete-data formulas (incl. VB-impute)
        block = mod.data_block(cfg, data) if hasattr(mod, "data_block") \
            else gl.data_block(cfg, data)
        gram_blocks = jax.jit(block_gram, static_argnums=1)(data.x, block)
    else:
        gram_blocks = jnp.zeros((1, 1, 1), cfg.dtype)

    eps = float(np.finfo(np.float64).eps) ** 0.5
    # Arithmetic-precision allowance for the monotonicity guard and a
    # convergence noise floor: the reference's absolute eps assumes f64
    # end-to-end; a float32 sweep + float32 ELBO (TPU without x64) wiggles
    # by a few ulps OF THE ELBO MAGNITUDE near the optimum (measured
    # ~1.2e-6 relative at |ELBO| ~ 1e5-1e6), which is monotone to the
    # arithmetic's working precision — the strongest certificate f32 can
    # give.  64 ulps keeps 3-5x margin over the measured noise while still
    # catching real update-formula errors (those break monotonicity at
    # tol scale within a few iterations).  In f64 this term is ~1e-14
    # relative — far below eps, so reference semantics are unchanged.
    edt = cfg.elbo_dtype if jax.config.jax_enable_x64 else cfg.dtype
    eps_rel = 64.0 * float(jnp.finfo(edt).eps)

    from .device_loop import ELBO_BUF, eligible, get_loops
    use_dev = eligible(cfg, checkpointer, tracer, verbose, data)

    if cfg.thinned_elbo_eval:
        times_sched = np.array([1.0, 5.0, 10.0, 50.0])
        batch_sched = np.array([1, 10, 25, 50])
    else:
        times_sched = np.array([1.0])
        batch_sched = np.array([1])
    ind_batch_conv = len(batch_sched) + 1
    batch_conv = 1

    it = 0
    lb_new = -math.inf
    converged = False
    elbo_history = []

    # ---------------------------------------------------- annealing phase
    if anneal is not None:
        ladder = annealing_ladder(anneal)
        it_init = int(anneal[2])
        if verbose:
            log.info("** Annealing with %s spacing **",
                     {1: "geometric", 2: "harmonic", 3: "linear"}[int(anneal[0])])

        def anneal_one(st, trace_hook):
            it_local = 0
            for c in ladder[:-1]:  # the final rung c = 1 exits annealing mode
                it_local += 1
                c_s = c if cfg.anneal_scale else 1.0
                # annealing rungs never feed an ELBO evaluation: run lite
                # (the first converged-phase iteration is always full)
                st = mod.cavi_iteration_donated(data, hyper, st, gram_blocks,
                                                c, c_s, cfg=cfg, annealed=True,
                                                mesh=mesh, lite=True)
                if verbose and (it_local == 1 or it_local % 5 == 0):
                    log.info("Iteration %d (temperature %.4g)", it_local,
                             1.0 / c)
                if trace_hook is not None and (it_local == 1
                                               or it_local % 25 == 0):
                    trace_hook(it_local, st)
            return st, it_local

        if replica_states is not None:
            state, it = _anneal_replicas_batched(
                mod, data, hyper, replica_states, gram_blocks, ladder, cfg,
                mesh, verbose)
        elif use_dev:
            anneal_scan, _ = get_loops(mod)
            cs = np.asarray(ladder[:-1], np.float64)
            css = cs if cfg.anneal_scale else np.ones_like(cs)
            state = anneal_scan(data, hyper, state, gram_blocks,
                                jnp.asarray(cs, cfg.dtype),
                                jnp.asarray(css, cfg.dtype), cfg=cfg,
                                mesh=mesh)
            it = len(ladder) - 1
            if verbose:
                log.info("Annealing ladder: %d rungs in one device dispatch",
                         it)
        else:
            state, it = anneal_one(state, tracer)
        if verbose:
            log.info("** Exiting annealing mode. **")
    else:
        it_init = 1

    # ------------------------------------------------- converged CAVI phase
    if use_dev:
        _, converged_loop = get_loops(mod)
        edt = cfg.elbo_dtype if jax.config.jax_enable_x64 else cfg.dtype
        (state, it_d, lb_d, conv_d, dlb_d, nev_d, ebuf, ibuf,
         mono_d) = converged_loop(
            data, hyper, state, gram_blocks,
            jnp.asarray(it, jnp.int32), jnp.asarray(it_init, jnp.int32),
            jnp.asarray(cfg.maxit, jnp.int32),
            jnp.asarray(times_sched, edt),
            jnp.asarray(batch_sched, jnp.int32), cfg=cfg, mesh=mesh)
        it = int(it_d)
        lb_new = float(lb_d)
        converged = bool(conv_d)
        diff_lb = float(dlb_d)
        nev = min(int(nev_d), ELBO_BUF)
        if int(nev_d) > ELBO_BUF:
            log.warning(
                "ELBO trace truncated: %d evaluations exceed the "
                "device-loop buffer (%d); convergence/guard logic ran on "
                "device and is unaffected, but elbo_history drops the "
                "overflow (last slot holds the final evaluation).",
                int(nev_d), ELBO_BUF)
        its_h = np.asarray(ibuf[:nev]).tolist()
        lbs_h = np.asarray(ebuf[:nev], np.float64).tolist()
        elbo_history.extend(zip((int(i) for i in its_h), lbs_h))
        if verbose and nev:
            for it_e, lb_e in elbo_history[-nev:]:
                log.info("Iteration %d: ELBO = %.6f", it_e, lb_e)
        # non-finite ELBO raises on BOTH paths regardless of cfg.debug —
        # the host loop raises unconditionally (below), and a NaN fit must
        # never be returned as a mere non-converged result.  nev == 0 means
        # NO evaluation ever ran (maxit exhausted by the annealing ladder,
        # e.g. a maxit=3 compile warm-up): lb is then the -inf sentinel,
        # not a numerical failure — return non-converged instead of raising
        if nev > 0 and not math.isfinite(lb_new):
            it_bad, lb_bad = it, lb_new
            for k in range(nev):
                if not math.isfinite(lbs_h[k]):
                    it_bad, lb_bad = its_h[k], lbs_h[k]
                    break
            raise ElboDecreaseError(
                f"ELBO became non-finite at iteration {it_bad}: {lb_bad}")
        if cfg.debug and bool(mono_d):
            for k in range(nev):
                if not math.isfinite(lbs_h[k]):
                    raise ElboDecreaseError(
                        f"ELBO became non-finite at iteration {its_h[k]}: "
                        f"{lbs_h[k]}")
            lo, hi, it_bad = math.nan, math.nan, it
            for k in range(1, nev):
                if (lbs_h[k] + eps + eps_rel * abs(lbs_h[k - 1])
                        < lbs_h[k - 1]):
                    lo, hi, it_bad = lbs_h[k - 1], lbs_h[k], its_h[k]
                    break
            raise ElboDecreaseError(
                f"ELBO not increasing monotonically at iteration {it_bad}: "
                f"{lo:.10g} -> {hi:.10g}")
        if verbose:
            if converged:
                log.info("Convergence obtained after %d iterations. "
                         "ELBO = %.6f", it, lb_new)
            else:
                log.warning("Maximal number of iterations reached before "
                            "convergence. Exit.")
        return FitResult(state=state, converged=converged, it=it,
                         lb_opt=lb_new, diff_lb=diff_lb,
                         elbo_history=elbo_history)

    diff_lb_final = math.inf
    ckpt_rate = getattr(checkpointer, "rate", 1) if checkpointer else 0
    while not converged and it < cfg.maxit:
        lb_old = lb_new
        it += 1
        # gam/mu freshness is only needed when this iteration's result feeds
        # an ELBO evaluation, a checkpoint save, or the final output; all
        # other iterations run "lite" (the fused sweep carries beta only)
        will_eval = (it <= it_init + 1 or it % batch_conv == 0
                     or it % batch_conv == 1)
        need_full = (will_eval or it >= cfg.maxit
                     or (ckpt_rate and it % ckpt_rate == 0))
        state = mod.cavi_iteration_donated(data, hyper, state, gram_blocks,
                                           1.0, 1.0, cfg=cfg, annealed=False,
                                           mesh=mesh, lite=not need_full)

        if tracer is not None and (it == 1 or it % 25 == 0):
            tracer(it, state)

        if will_eval:
            lb_new = float(mod.compute_elbo(data, hyper, state, cfg=cfg))
            elbo_history.append((it, lb_new))
            if not math.isfinite(lb_new):
                # NaN compares False against everything, so it would sail
                # through both the monotonicity guard and the convergence
                # test below and report a "converged" garbage fit
                raise ElboDecreaseError(
                    f"ELBO became non-finite at iteration {it}: {lb_new} "
                    f"(previous {lb_old:.10g})")
            if verbose and (it == it_init or it % max(5, batch_conv) == 0):
                log.info("Iteration %d: ELBO = %.6f", it, lb_new)
            if verbose == 2 and (it == it_init
                                 or it % max(5, batch_conv) == 0):
                # per-iteration hotspot-scale diagnostics (reference:
                # R/atlasqtl_global_local_core.R:297-305)
                nu_s0 = float(np.asarray(state.nu_s0_vb))
                rho_s0 = float(np.asarray(state.rho_s0_vb))
                glob = math.sqrt(rho_s0 / max(nu_s0 - 1.0, eps)
                                 / cfg.shr_fac_inv)
                p_t = int(np.asarray(data.p_true))
                lam = np.sqrt(1.0 / np.asarray(state.lam2_inv)[:p_t])
                qs = np.percentile(lam, [0, 25, 50, 75, 100])
                log.info("Variational hotspot propensity global scale: %.3g",
                         glob)
                log.info("Approximate variational hotspot propensity local "
                         "scale: min=%.3g 1stQ=%.3g med=%.3g mean=%.3g "
                         "3rdQ=%.3g max=%.3g", qs[0], qs[1], qs[2],
                         float(lam.mean()), qs[3], qs[4])

            if (cfg.debug and lb_old != -math.inf
                    and lb_new + eps + eps_rel * abs(lb_old) < lb_old):
                raise ElboDecreaseError(
                    f"ELBO not increasing monotonically at iteration {it}: "
                    f"{lb_old:.10g} -> {lb_new:.10g}")

            diff_lb = abs(lb_new - lb_old)
            diff_lb_final = diff_lb
            sum_exceed = int(np.sum(diff_lb > times_sched * cfg.tol))
            if sum_exceed == 0 or diff_lb <= eps_rel * abs(lb_new):
                converged = True
            elif ind_batch_conv > sum_exceed:
                ind_batch_conv = sum_exceed
                batch_conv = int(batch_sched[ind_batch_conv - 1])

        if checkpointer is not None:
            checkpointer(it, state, converged, lb_new, lb_old)

    diff_lb = diff_lb_final
    if verbose:
        if converged:
            log.info("Convergence obtained after %d iterations. ELBO = %.6f",
                     it, lb_new)
        else:
            log.warning("Maximal number of iterations reached before "
                        "convergence. Exit.")
    return FitResult(state=state, converged=converged, it=it, lb_opt=lb_new,
                     diff_lb=diff_lb, elbo_history=elbo_history)
