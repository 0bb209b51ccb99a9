"""Pipelined 2-D (p x q) sharded Gauss-Seidel sweep.

Pod-scale design (BASELINE config 5: n=5k, p=300k, q=30k, multi-host): the
q-axis shards traits as before (responses are independent given theta/zeta,
SURVEY §2.3), and the p-axis shards predictors — X (n, p), the diagonal Gram
blocks, and every (p, .) tensor — which the 1-D design had to replicate
(6 GB X + 1.2 MB p-vectors per chip at pod shape).

The sweep is strictly sequential over predictors (the reference's flat
Gauss-Seidel order, src/coreLoop.cpp:58-85), so p-shards cannot run
concurrently on the SAME response tile.  Instead the local q-shard is cut
into T tiles that flow through the P predictor stages as a software
pipeline: at pipeline step s, stage d processes tile t = s - d and then
passes the updated fitted-matrix tile to stage d+1 over ICI (ppermute).
Stage d only ever touches tile t after stages < d finished it, so the
global update order is EXACTLY the single-device order — the pipeline is a
scheduling device, not an approximation.  Utilization is T/(P+T-1).

Cross-shard communication per iteration: (P+T-1) ppermutes of one
(n, q_tile) tile per q-row, one (n, q_local) psum over p to broadcast the
finished fitted matrix, and O(q_local + p_local) psums for the Z/column
statistics.  Everything else is local.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.global_local import _fused_sub as _fsub
from ..ops.sweep import SweepConsts, sweep_complete


# Per-pipeline-step fixed overhead in q-columns-of-tile-compute, measured
# on a real v5e chip at the pod per-chip shard shape (r5,
# tools/tpu_stage_timing.py: stage(qt) ~= 7.71 ms + 0.00397 ms/qcol at
# n=5k, p_local=37.5k -> A = a/b ~= 1940 qcols).  The fixed part is the
# per-stage x_local streaming + the serial-dependency cost of the fused
# sweep over p_local — it dwarfs the per-qcol compute, so real-hardware
# pipelines want LARGE tiles (T ~= 2-4), not the asymptotic T >= 2P rule
# (which the dispatch-bound CPU-mesh numbers of r3/r4 could not see).
TPU_STEP_OVERHEAD_QCOLS = 1940.0


def resolve_step_overhead(cfg_value: float, on_accel: bool) -> float:
    """cfg.pipeline_step_overhead_qcols == 0 means auto: the measured TPU
    constant on accelerators, the asymptotic rule (0) on CPU meshes."""
    if cfg_value > 0.0:
        return cfg_value
    return TPU_STEP_OVERHEAD_QCOLS if on_accel else 0.0


def pick_q_tile(q_local: int, p_shards: int, n: int, prefer_fused: bool,
                step_overhead_qcols: float = 0.0):
    """Tile width: divides q_local; the fused kernel additionally wants
    128-multiples and an F tile within ~6 MB of VMEM.

    Cost model (measured, tools/measure_pipeline.py → docs/DESIGN.md S6):
    one iteration costs (P + T - 1) pipeline steps of
    (tile compute  +  fixed per-step overhead), i.e.

        time(T) ∝ (P + T - 1) * (q_local / T  +  A)

    with A = `step_overhead_qcols` the per-step overhead expressed in
    q-columns-of-tile-compute.  Larger T shrinks the (P-1)-step fill/drain
    bubble but pays A more often — the r3 observation that T=8 ran slower
    than T=4 on the CPU mesh is exactly this tradeoff (A_cpu ~ 15 qcols).
    With A > 0 the candidate minimizing the model is chosen; A = 0 keeps
    the asymptotic rule T >= 2P (valid when overhead << tile compute,
    i.e. real ICI at production tiles)."""
    if prefer_fused:
        cands = [c for c in (1024, 512, 256, 128)
                 if c <= max(128, int(6e6 / (4 * n)) // 128 * 128)]
    else:
        cands = [1024, 512, 256, 128, 64, 32, 16, 8]
    divisors = [c for c in cands if q_local % c == 0]
    if not divisors:
        return None
    if step_overhead_qcols > 0.0:
        model = lambda c: ((p_shards + q_local // c - 1)
                           * (c + step_overhead_qcols))
        return min(divisors, key=model)
    for c in divisors:
        if q_local // c >= 2 * p_shards:
            return c
    return divisors[-1]


def _tile_sweep_xla(x_l, cp_t, gram_l, gam_t, mu_t, beta_t, f_t, consts_t,
                    block, pm_l, qm_t):
    """One-tile processor via the XLA scan sweep (CPU tests / f64 parity).
    beta_t is unused: this processor never follows a lite iteration (lite
    requires the fused processor), so gam/mu are always fresh."""
    del beta_t
    gam_n, mu_n, f_n, zr, zc = sweep_complete(
        x_l, cp_t, gram_l, gam_t, mu_t, f_t, consts_t, block,
        p_mask=pm_l, q_mask=qm_t)
    gam_n = gam_n * pm_l[:, None] * qm_t[None, :]
    mu_n = mu_n * pm_l[:, None] * qm_t[None, :]
    beta = gam_n * mu_n
    gcol = jnp.sum(gam_n, axis=0)
    m2g = jnp.einsum("pq,pq->q", mu_n * mu_n, gam_n)
    b2 = jnp.einsum("pq,pq->q", beta, beta)
    return gam_n, mu_n, f_n, zr, zc, gcol, m2g, b2


def _tile_sweep_fused(x_l, cp_t, gram_l, gam_t, mu_t, beta_t, f_t, consts_t,
                      block, pm_l, qm_t, *, q_tile, sub, qchunk, mxu_bf16,
                      annealed):
    """One-tile processor via the fused Pallas kernel (qtiles = 1).

    The kernel carries beta_t = the CARRIED product from the previous
    iteration (gam_t * mu_t would be wrong after a lite iteration, whose
    gam/mu are stale — only beta is current)."""
    del gam_t, mu_t
    from ..ops.sweep_fused import sweep_complete_fused
    _b, gam_n, mu_n, f_n, zr, zc, (gcol, m2g, b2) = sweep_complete_fused(
        x_l, cp_t, gram_l, beta_t, f_t, consts_t, block,
        p_mask=pm_l, q_mask=qm_t, q_tile=q_tile, sub=sub,
        qchunk=qchunk, mxu_bf16=mxu_bf16,
        emit_gam_mu=True, annealed=annealed)
    return gam_n, mu_n, f_n, zr, zc, gcol, m2g, b2


def _tile_sweep_fused_lite(x_l, cp_t, gram_l, beta_t, f_t, consts_t, block,
                           pm_l, qm_t, *, q_tile, sub, qchunk, mxu_bf16,
                           annealed):
    """Lite one-tile processor: reads/writes only beta = gam * mu (the
    pod-scale steady-state variant — 2 of the 4 (p, q) tile streams)."""
    from ..ops.sweep_fused import sweep_complete_fused
    beta_n, _g, _m, f_n, zr, zc, (gcol, m2g, b2) = sweep_complete_fused(
        x_l, cp_t, gram_l, beta_t, f_t, consts_t, block,
        p_mask=pm_l, q_mask=qm_t, q_tile=q_tile, sub=sub,
        qchunk=qchunk, mxu_bf16=mxu_bf16,
        emit_gam_mu=False, annealed=annealed)
    return beta_n, f_n, zr, zc, gcol, m2g, b2


def pipelined_sweep_2d(mesh, cfg, data, state, beta_carry, gram_blocks,
                       cp_x_y, consts, block, emit_gam_mu=True,
                       annealed=False):
    """shard_map wrapper: run the exact sweep over a ("p", "q") mesh.

    Returns (beta, gam, mu, fitted, z_row, z_col, (gcol, m2gcol, b2col))
    with the same global values as the single-device sweep.

    emit_gam_mu=False ("lite", fused tile processor only): the pipeline
    carries and updates ONLY beta = gam * mu — the returned gam/mu are the
    (stale) inputs, exactly like the single-device lite path.  Per
    iteration this halves the (p, q) tile streams (beta in/out instead of
    gam+mu in/out) — the pod-scale steady-state optimization.
    """
    pax, qax = cfg.p_axis, cfg.q_axis
    P_sh = mesh.shape[pax]
    Q_sh = mesh.shape[qax]
    n = data.x.shape[0]
    q_local = data.y.shape[1] // Q_sh
    on_accel = jax.devices()[0].platform != "cpu"
    # cfg.sweep == "fused" forces the fused tile processor even on CPU
    # (interpret mode) so the lite pipeline is testable off-chip
    use_fused = (cfg.dtype == jnp.float32 and cfg.sweep in ("auto", "fused")
                 and (on_accel or cfg.sweep == "fused"))
    qt = pick_q_tile(q_local, P_sh, n, use_fused,
                     resolve_step_overhead(
                         cfg.pipeline_step_overhead_qcols, on_accel))
    assert qt is not None, (q_local, P_sh)
    T = q_local // qt
    lite = use_fused and not emit_gam_mu

    if use_fused:
        tile_fn = partial(
            _tile_sweep_fused_lite if lite else _tile_sweep_fused,
            q_tile=qt, sub=_fsub(n, cfg),
            qchunk=cfg.sweep_qchunk or 512,
            mxu_bf16=cfg.mxu_bf16, annealed=annealed)
    else:
        tile_fn = _tile_sweep_xla

    if lite:
        return _pipeline_2d_lite(mesh, cfg, data, state, beta_carry,
                                 gram_blocks, cp_x_y, consts, block,
                                 tile_fn, qt, T, n, q_local, pax, qax, P_sh)

    def local(x_l, cp_l, gam_l, mu_l, beta_l, fitted_l, gram_l, theta_l,
              pm_l, s2, tau, logtau, zeta, qm_l, c, log_sig2_inv):
        pid = jax.lax.axis_index(pax)
        dt = gam_l.dtype
        p_l = gam_l.shape[0]

        def step(s, carry):
            gam_l, mu_l, fcur, fout, zrow, zcol, gcol, m2g, b2 = carry
            t = s - pid
            active = jnp.logical_and(t >= 0, t < T)
            t_c = jnp.clip(t, 0, T - 1)
            col = (t_c * qt).astype(jnp.int32)
            z0 = jnp.zeros((), jnp.int32)
            # stage 0 injects the tile from the carried fitted matrix
            finj = jax.lax.dynamic_slice(fitted_l, (z0, col), (n, qt))
            fin = jnp.where(pid == 0, finj, fcur)
            gam_t = jax.lax.dynamic_slice(gam_l, (z0, col), (p_l, qt))
            mu_t = jax.lax.dynamic_slice(mu_l, (z0, col), (p_l, qt))
            beta_t = jax.lax.dynamic_slice(beta_l, (z0, col), (p_l, qt))
            cp_t = jax.lax.dynamic_slice(cp_l, (z0, col), (p_l, qt))
            sl = lambda v: jax.lax.dynamic_slice(v, (col,), (qt,))
            consts_t = SweepConsts(
                sig2_beta=sl(s2), tau=sl(tau), log_tau=sl(logtau),
                log_sig2_inv=log_sig2_inv, theta=theta_l, zeta=sl(zeta), c=c)

            def do(_):
                return tile_fn(x_l, cp_t, gram_l, gam_t, mu_t, beta_t, fin,
                               consts_t, block, pm_l, sl(qm_l))

            def skip(_):
                zq = jnp.zeros((qt,), dt)
                return (gam_t, mu_t, fin, jnp.zeros((p_l,), dt), zq, zq, zq,
                        zq)

            gam_n, mu_n, f_n, zr, zc, gc, mg, bb = jax.lax.cond(
                active, do, skip, 0)
            gam_l = jax.lax.dynamic_update_slice(gam_l, gam_n, (z0, col))
            mu_l = jax.lax.dynamic_update_slice(mu_l, mu_n, (z0, col))
            zrow = zrow + zr

            def upd(acc, v):
                # inactive steps carry a clipped tile index — keep the slot
                cur = jax.lax.dynamic_slice(acc, (col,), (qt,))
                return jax.lax.dynamic_update_slice(
                    acc, jnp.where(active, v, cur), (col,))

            zcol, gcol, m2g, b2 = upd(zcol, zc), upd(gcol, gc), \
                upd(m2g, mg), upd(b2, bb)
            # finished tiles land on the last stage
            f_keep = jnp.where(jnp.logical_and(active, pid == P_sh - 1),
                               f_n, jax.lax.dynamic_slice(
                                   fout, (z0, col), (n, qt)))
            fout = jax.lax.dynamic_update_slice(fout, f_keep, (z0, col))
            # rotate the tile to the next stage (ICI ring)
            fnext = jax.lax.ppermute(
                f_n, pax, [(i, (i + 1) % P_sh) for i in range(P_sh)])
            return (gam_l, mu_l, fnext, fout, zrow, zcol, gcol, m2g, b2)

        zq = jnp.zeros((q_local,), dt)
        carry = (gam_l, mu_l, jnp.zeros((n, qt), dt),
                 jnp.zeros((n, q_local), dt), jnp.zeros((p_l,), dt),
                 zq, zq, zq, zq)
        carry = jax.lax.fori_loop(0, P_sh + T - 1, step, carry)
        gam_l, mu_l, _, fout, zrow, zcol, gcol, m2g, b2 = carry

        fitted = jax.lax.psum(fout, pax)      # only the last stage is nonzero
        zrow = jax.lax.psum(zrow, qax)        # theta needs the full q row sum
        zcol = jax.lax.psum(zcol, pax)
        gcol = jax.lax.psum(gcol, pax)
        m2g = jax.lax.psum(m2g, pax)
        b2 = jax.lax.psum(b2, pax)
        return gam_l, mu_l, gam_l * mu_l, fitted, zrow, zcol, gcol, m2g, b2

    pq = P(pax, qax)
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, pax), pq, pq, pq, pq, P(None, qax), P(pax),
                  P(pax), P(pax), P(qax), P(qax), P(qax), P(qax), P(qax),
                  P(), P()),
        out_specs=(pq, pq, pq, P(None, qax), P(pax), P(qax), P(qax), P(qax),
                   P(qax)),
        check_vma=False,
    )(data.x, cp_x_y, state.gam, state.mu_beta, beta_carry, state.fitted,
      gram_blocks, consts.theta, data.p_mask, consts.sig2_beta, consts.tau,
      consts.log_tau, consts.zeta, data.q_mask, consts.c,
      consts.log_sig2_inv)
    gam, mu, beta, fitted, zrow, zcol, gcol, m2g, b2 = out
    return beta, gam, mu, fitted, zrow, zcol, (gcol, m2g, b2)


def _pipeline_2d_lite(mesh, cfg, data, state, beta_carry, gram_blocks,
                      cp_x_y, consts, block, tile_fn, qt, T, n, q_local,
                      pax, qax, P_sh):
    """Lite 2-D pipeline body: identical schedule to `pipelined_sweep_2d`
    but the tiles carry beta = gam * mu only (see its docstring)."""

    def local(x_l, cp_l, beta_l, fitted_l, gram_l, theta_l, pm_l,
              s2, tau, logtau, zeta, qm_l, c, log_sig2_inv):
        pid = jax.lax.axis_index(pax)
        dt = beta_l.dtype
        p_l = beta_l.shape[0]

        def step(s, carry):
            beta_l, fcur, fout, zrow, zcol, gcol, m2g, b2 = carry
            t = s - pid
            active = jnp.logical_and(t >= 0, t < T)
            t_c = jnp.clip(t, 0, T - 1)
            col = (t_c * qt).astype(jnp.int32)
            z0 = jnp.zeros((), jnp.int32)
            finj = jax.lax.dynamic_slice(fitted_l, (z0, col), (n, qt))
            fin = jnp.where(pid == 0, finj, fcur)
            beta_t = jax.lax.dynamic_slice(beta_l, (z0, col), (p_l, qt))
            cp_t = jax.lax.dynamic_slice(cp_l, (z0, col), (p_l, qt))
            sl = lambda v: jax.lax.dynamic_slice(v, (col,), (qt,))
            consts_t = SweepConsts(
                sig2_beta=sl(s2), tau=sl(tau), log_tau=sl(logtau),
                log_sig2_inv=log_sig2_inv, theta=theta_l, zeta=sl(zeta), c=c)

            def do(_):
                return tile_fn(x_l, cp_t, gram_l, beta_t, fin, consts_t,
                               block, pm_l, sl(qm_l))

            def skip(_):
                zq = jnp.zeros((qt,), dt)
                return (beta_t, fin, jnp.zeros((p_l,), dt), zq, zq, zq, zq)

            beta_n, f_n, zr, zc, gc, mg, bb = jax.lax.cond(
                active, do, skip, 0)
            beta_l = jax.lax.dynamic_update_slice(beta_l, beta_n, (z0, col))
            zrow = zrow + zr

            def upd(acc, v):
                cur = jax.lax.dynamic_slice(acc, (col,), (qt,))
                return jax.lax.dynamic_update_slice(
                    acc, jnp.where(active, v, cur), (col,))

            zcol, gcol, m2g, b2 = upd(zcol, zc), upd(gcol, gc), \
                upd(m2g, mg), upd(b2, bb)
            f_keep = jnp.where(jnp.logical_and(active, pid == P_sh - 1),
                               f_n, jax.lax.dynamic_slice(
                                   fout, (z0, col), (n, qt)))
            fout = jax.lax.dynamic_update_slice(fout, f_keep, (z0, col))
            fnext = jax.lax.ppermute(
                f_n, pax, [(i, (i + 1) % P_sh) for i in range(P_sh)])
            return (beta_l, fnext, fout, zrow, zcol, gcol, m2g, b2)

        zq = jnp.zeros((q_local,), dt)
        carry = (beta_l, jnp.zeros((n, qt), dt),
                 jnp.zeros((n, q_local), dt), jnp.zeros((p_l,), dt),
                 zq, zq, zq, zq)
        carry = jax.lax.fori_loop(0, P_sh + T - 1, step, carry)
        beta_l, _, fout, zrow, zcol, gcol, m2g, b2 = carry

        fitted = jax.lax.psum(fout, pax)
        zrow = jax.lax.psum(zrow, qax)
        zcol = jax.lax.psum(zcol, pax)
        gcol = jax.lax.psum(gcol, pax)
        m2g = jax.lax.psum(m2g, pax)
        b2 = jax.lax.psum(b2, pax)
        return beta_l, fitted, zrow, zcol, gcol, m2g, b2

    pq = P(pax, qax)
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, pax), pq, pq, P(None, qax), P(pax), P(pax),
                  P(pax), P(qax), P(qax), P(qax), P(qax), P(qax), P(), P()),
        out_specs=(pq, P(None, qax), P(pax), P(qax), P(qax), P(qax),
                   P(qax)),
        check_vma=False,
    )(data.x, cp_x_y, beta_carry, state.fitted, gram_blocks,
      consts.theta, data.p_mask, consts.sig2_beta, consts.tau,
      consts.log_tau, consts.zeta, data.q_mask, consts.c,
      consts.log_sig2_inv)
    beta, fitted, zrow, zcol, gcol, m2g, b2 = out
    # gam/mu stay (stale) as on the single-device lite path
    return beta, state.gam, state.mu_beta, fitted, zrow, zcol, \
        (gcol, m2g, b2)


def pipelined_sweep_missing_2d(mesh, cfg, data, state, consts, block):
    """Exact-missing sweep over a ("p", "q") mesh (closes the last
    feature x parallelism hole, VERDICT r2 #4).

    Same pipeline schedule as `pipelined_sweep_2d` — q-tiles of the MASKED
    fitted matrix Fm = mis_pat * (X beta) flow through the p-stages — with
    the missing-data tile processor `sweep_missing_blocked` (per-(j, k)
    slab variances, per-response pair-Gram corrections, reference
    coreDualMisLoop math, src/coreLoop.cpp:91-138).  The rank updates each
    stage applies to a tile are masked by mis_pat, and masking is
    idempotent across stages, so the carried tile stays exact and the
    global update order equals the single-device order.

    Returns (gam, mu, fitted_masked, z_row, z_col) — column statistics for
    the (p, q)-variance path are recomputed outside the sweep as on a
    single device.
    """
    pax, qax = cfg.p_axis, cfg.q_axis
    P_sh = mesh.shape[pax]
    Q_sh = mesh.shape[qax]
    n = data.x.shape[0]
    q_local = data.y.shape[1] // Q_sh
    qt = pick_q_tile(q_local, P_sh, n, False,
                     resolve_step_overhead(
                         cfg.pipeline_step_overhead_qcols,
                         jax.devices()[0].platform != "cpu"))
    assert qt is not None, (q_local, P_sh)
    T = q_local // qt
    mis_block = (cfg.mis_block if data.mis_pair_gram is not None else 1)

    from ..ops.sweep import sweep_missing_blocked

    def local(x_l, cp_l, xns_l, mp_l, pg_l, gam_l, mu_l, fm_l, theta_l,
              pm_l, s2_l, tau, logtau, zeta, qm_l, c, log_sig2_inv):
        pid = jax.lax.axis_index(pax)
        dt = gam_l.dtype
        p_l = gam_l.shape[0]

        def step(s, carry):
            gam_l, mu_l, fcur, fout, zrow, zcol = carry
            t = s - pid
            active = jnp.logical_and(t >= 0, t < T)
            t_c = jnp.clip(t, 0, T - 1)
            col = (t_c * qt).astype(jnp.int32)
            z0 = jnp.zeros((), jnp.int32)
            finj = jax.lax.dynamic_slice(fm_l, (z0, col), (n, qt))
            fin = jnp.where(pid == 0, finj, fcur)
            sl2 = lambda v: jax.lax.dynamic_slice(v, (z0, col), (p_l, qt))
            sln = lambda v: jax.lax.dynamic_slice(v, (z0, col), (n, qt))
            sl = lambda v: jax.lax.dynamic_slice(v, (col,), (qt,))
            gam_t, mu_t = sl2(gam_l), sl2(mu_l)
            consts_t = SweepConsts(
                sig2_beta=sl2(s2_l), tau=sl(tau), log_tau=sl(logtau),
                log_sig2_inv=log_sig2_inv, theta=theta_l, zeta=sl(zeta), c=c)
            pg_t = jax.lax.dynamic_slice(
                pg_l, (z0, z0, col), (pg_l.shape[0], pg_l.shape[1], qt))

            def do(_):
                return sweep_missing_blocked(
                    x_l, sl2(cp_l), sl2(xns_l), sln(mp_l), pg_t, gam_t,
                    mu_t, fin, consts_t, mis_block, p_mask=pm_l,
                    q_mask=sl(qm_l))

            def skip(_):
                return (gam_t, mu_t, fin, jnp.zeros((p_l,), dt),
                        jnp.zeros((qt,), dt))

            gam_n, mu_n, f_n, zr, zc = jax.lax.cond(active, do, skip, 0)
            gam_l = jax.lax.dynamic_update_slice(gam_l, gam_n, (z0, col))
            mu_l = jax.lax.dynamic_update_slice(mu_l, mu_n, (z0, col))
            zrow = zrow + zr
            cur = jax.lax.dynamic_slice(zcol, (col,), (qt,))
            zcol = jax.lax.dynamic_update_slice(
                zcol, jnp.where(active, zc, cur), (col,))
            f_keep = jnp.where(jnp.logical_and(active, pid == P_sh - 1),
                               f_n, jax.lax.dynamic_slice(
                                   fout, (z0, col), (n, qt)))
            fout = jax.lax.dynamic_update_slice(fout, f_keep, (z0, col))
            fnext = jax.lax.ppermute(
                f_n, pax, [(i, (i + 1) % P_sh) for i in range(P_sh)])
            return (gam_l, mu_l, fnext, fout, zrow, zcol)

        carry = (gam_l, mu_l, jnp.zeros((n, qt), dt),
                 jnp.zeros((n, q_local), dt), jnp.zeros((p_l,), dt),
                 jnp.zeros((q_local,), dt))
        carry = jax.lax.fori_loop(0, P_sh + T - 1, step, carry)
        gam_l, mu_l, _, fout, zrow, zcol = carry
        fitted = jax.lax.psum(fout, pax)      # only the last stage is nonzero
        zrow = jax.lax.psum(zrow, qax)
        zcol = jax.lax.psum(zcol, pax)
        return gam_l, mu_l, fitted, zrow, zcol

    if data.mis_pair_gram is not None:
        pair_gram = data.mis_pair_gram
    else:  # per-coordinate fallback: blocked sweep at B = 1 needs no pairs
        nb_l = data.x.shape[1] // 1
        pair_gram = jnp.zeros((nb_l, 0, data.y.shape[1]), cfg.dtype)

    pq = P(pax, qax)
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, pax), pq, pq, P(None, qax), P(pax, None, qax),
                  pq, pq, P(None, qax), P(pax), P(pax),
                  pq, P(qax), P(qax), P(qax), P(qax), P(), P()),
        out_specs=(pq, pq, P(None, qax), P(pax), P(qax)),
        check_vma=False,
    )(data.x, data.cp_x_y, data.x_norm_sq, data.mis_pat, pair_gram,
      state.gam, state.mu_beta, state.fitted, consts.theta, data.p_mask,
      consts.sig2_beta, consts.tau, consts.log_tau, consts.zeta,
      data.q_mask, consts.c, consts.log_sig2_inv)
    return out
