"""Fully-fused Pallas sweep: the entire Gauss-Seidel pass in one kernel.

Fifth-generation TPU design of the reference's C++ hot loop
(src/coreLoop.cpp:38-86).  Relative to the hybrid XLA+Pallas sweep
(ops/sweep_pallas.py) this kernel:

- inverts the loop nest — grid (response-tiles OUTER, predictor-blocks
  INNER) — so the fitted matrix F = X beta lives in VMEM scratch across all
  predictor blocks and touches HBM exactly twice per iteration instead of
  once per block;
- carries the single (p, q) array beta = gam * mu_beta between iterations
  instead of the (gam, mu_beta) pair: the sequential chain only ever needs
  the product (beta_old), so steady-state iterations read beta and write
  beta — 2 x 4 GB/iter less HBM traffic at the eQTL bench shape.  The full
  gam/mu matrices are emitted (``emit_gam_mu=True``) only on iterations
  whose results feed an ELBO evaluation, a checkpoint, or the final output
  (the driver schedules those);
- evaluates the probit inclusion-logit and inverse-Mills tiles by
  *Chebyshev interpolation on the MXU* (ops/interp.py): all three tiles
  are smooth functions of the rank-1 outer sum u = theta_j + zeta_k, so
  one (block, r) @ (r, q_tile) matmul against per-iteration node values
  replaces the per-element transcendental pass that used to bound the
  kernel (the VPU is issue-limited at ~1 vector op/cycle; the erfcx->
  exp->log chain cost ~25 ops per element).  Only the shared analytic
  base sqrt(u^2 + K) — which carries the functions' unbounded growth so
  the float32 interpolation error stays at round-off grade — is computed
  per element (~8 ops);
- runs the strictly-sequential within-block updates sub-blocked with
  *left-looking* deferred corrections across windows: before window s, ONE
  deep MXU contraction (sub x (s*sub)) @ ((s*sub) x q_tile) applies every
  previous window's rank updates; within the window each coordinate pushes
  its rank-1 correction to the remaining rows as one broadcast FMA
  (right-looking — the additions land on every row in the same j-ascending
  order as the flat sweep, so the result is bitwise identical).  The chain
  is chunked along q so the per-row live vectors fit the vector register
  file.  Update order — and the math — equals the reference's flat k-major
  Gauss-Seidel exactly;
- accumulates the Z-moment reductions (reference R/update_vb.R:217-234)
  and the three column statistics feeding the next iteration's
  nu/rho/eta/kappa updates in-kernel while the tiles are in VMEM;
- optionally (``mxu_bf16=True``) runs the two large MXU contractions with
  bfloat16 inputs and float32 accumulation.  The sequential-chain
  corrections and the interpolation dots always stay f32.

Per grid step (t, b):
  r0    = x_b^T F_t                  (MXU)
  ad/imrd/imr0u = L_b @ N_t + base   (MXU + ~8 VPU ops/element)
  sub-blocked Gauss-Seidel           (VPU + deep left-looking MXU)
  tile stats + Z reduction           (VPU)
  F_t  += x_b delta                  (MXU)
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interp import K_BASE, tail_interp_operands

_LOG_SQRT_2PI = 0.9189385332046727


def _fused_kernel(scal_ref, x_ref, g_ref, l_ref, n_ref, cp_ref, beta_ref,
                  s2_ref, tau_ref, zeta_ref, theta_ref, pm_ref,
                  qm_ref, f_hbm_ref, *rest,
                  nb: int, qtiles: int, sub: int, qchunk: int,
                  mxu_bf16: bool, emit: bool, row_major: bool = False,
                  push_aligned: bool = True, chain_regs: bool = True,
                  c_one: bool = False, lookahead: bool = False,
                  interleave: bool = False, probe: str = "none"):
    # unpack (the lookahead variant carries two extra inputs and one extra
    # scratch buffer; pallas passes inputs, then outputs, then scratch)
    if lookahead:
        (xn_ref, goff_ref,
         beta_out_ref, gam_out_ref, mu_out_ref, f_out_ref,
         zrow_ref, zcol_ref, gcol_ref, m2gcol_ref, b2col_ref,
         f_scr, r_scr, delta_scr, gam_scr, mu_scr, zrow_scr,
         ad_scr, imrd_scr, imr0u_scr, rn_scr, dma_sem) = rest
    else:
        (beta_out_ref, gam_out_ref, mu_out_ref, f_out_ref,
         zrow_ref, zcol_ref, gcol_ref, m2gcol_ref, b2col_ref,
         f_scr, r_scr, delta_scr, gam_scr, mu_scr, zrow_scr,
         ad_scr, imrd_scr, imr0u_scr, dma_sem) = rest
    t = pl.program_id(0)
    b = pl.program_id(1)
    qt = r_scr.shape[1]
    bsz = r_scr.shape[0]

    c = scal_ref[0]
    # Gram diagonal: exactly n-1 for standardized X; padded predictor
    # columns are all-zero so beta_old is identically 0 there and the wrong
    # diagonal multiplies zero
    d_diag = scal_ref[1]
    kz = scal_ref[2]          # K/c for the Z-moment base (interp.py)

    s2 = s2_ref[0, :]
    ct = c * s2 * tau_ref[0, :]
    c_inv_2s2 = c * 0.5 / s2
    zeta = zeta_ref[0, :]                   # (QT,)
    theta = theta_ref[0, 0, :]              # (B,)
    pm = pm_ref[0, 0, :]                    # (B,)
    qm = qm_ref[0, :]                       # (QT,)

    u = theta[:, None] + zeta[None, :]      # (B, QT)
    # Probit logit + inverse-Mills tiles: MXU interpolation dots against
    # the per-iteration Chebyshev node values (ops/interp.py) plus the
    # shared per-element sqrt base.  gam = sigmoid(ad + mu^2 * c/(2 s2));
    # the logit stays in log space throughout — an odds-ratio form would
    # need Phi(-u)/Phi(u) * exp(-m), which silently collapses to
    # 0*inf / 1-instead-of-0 in the double-extreme corner.
    if probe not in ("jacobi_min", "nomxu", "chain_only"):
        l_blk = l_ref[:, :]                 # (B, r+2)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=r_scr.dtype)
        u2 = u * u
        s_d = jnp.sqrt(u2 + K_BASE)
        h = 0.5 * u
        if c_one:
            # converged phase (c == 1, the vast majority of iterations):
            # kz == K_BASE so s_z == s_d — one sqrt and the c-multiplies
            # disappear (~3 fewer full-tile passes)
            ad_scr[:, :] = h * s_d + dot(l_blk, n_ref[0])
            hsd = 0.5 * s_d
            imrd_scr[:, :] = s_d + dot(l_blk, n_ref[1])
            imr0u_scr[:, :] = dot(l_blk, n_ref[2]) - hsd - h
        else:
            ad_scr[:, :] = c * (h * s_d) + dot(l_blk, n_ref[0])
            s_z = jnp.sqrt(u2 + kz)
            imrd_scr[:, :] = s_z + dot(l_blk, n_ref[1])
            imr0u_scr[:, :] = dot(l_blk, n_ref[2]) - 0.5 * s_z - h
    else:  # PERF PROBE: skip the probit tiles (wrong math)
        ad_scr[:, :] = u

    # ---- fetch the F tile into VMEM at the first predictor block ----
    @pl.when(b == 0)
    def _():
        dma = pltpu.make_async_copy(
            f_hbm_ref.at[:, pl.ds(t * qt, qt)], f_scr, dma_sem)
        dma.start()
        dma.wait()

    # ---- residual projections for this block (MXU) ----
    def _proj(lhs_ref):
        if mxu_bf16:
            return jax.lax.dot_general(
                lhs_ref[:, :].astype(jnp.bfloat16),
                f_scr[:, :].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=r_scr.dtype)
        return jax.lax.dot_general(
            lhs_ref[:, :], f_scr[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=r_scr.dtype)

    if probe in ("nomxu", "nor0", "chain_only"):
        # PERF PROBE: no r0 projection dot (wrong math).  "nor0" keeps the
        # chain + F advance to isolate just the deep x^T F contraction.
        r_scr[:, :] = cp_ref[:, :]
    elif lookahead:
        # One-block-lookahead schedule: block b's raw projection was
        # computed DURING block b-1 (from F advanced through b-2, plus
        # the exact off-diagonal Gram correction x_b^T x_{b-1} delta_{b-1}
        # applied at the end of that step), so this step's only fresh
        # projection is for block b+1 — issued now, against the current F,
        # and it overlaps the sequential chain below instead of
        # serializing MXU across the step boundary (advance -> r0).
        @pl.when(b == 0)
        def _():
            r_scr[:, :] = _proj(x_ref)

        @pl.when(b != 0)
        def _():
            r_scr[:, :] = rn_scr[:, :]

        @pl.when(b != nb - 1)
        def _():
            rn_scr[:, :] = _proj(xn_ref)
    else:
        r_scr[:, :] = _proj(x_ref)

    # remove each coordinate's own diagonal contribution once, as a tile op
    # (beta_ref holds the pre-sweep values every row's update subtracts)
    if probe not in ("nomxu", "nor0", "chain_only"):
        r_scr[:, :] = r_scr[:, :] - beta_ref[:, :] * d_diag

    # ---- sub-blocked sequential Gauss-Seidel --------------------------
    if probe in ("jacobi", "jacobi_min", "nomxu"):
        # PERF PROBE ONLY (wrong math): full-tile Jacobi update with no
        # sequential corrections — measures the kernel's floor without the
        # per-row chain.  Never selected by production code.
        beta_old_blk = beta_ref[:, :]
        r_adj = r_scr[:, :]   # diagonal contribution already removed above
        if probe == "nomxu":
            r_adj = r_adj - beta_old_blk * d_diag
        mu_blk = ct[None, :] * (cp_ref[:, :] - r_adj)
        gam_blk = jax.nn.sigmoid(ad_scr[:, :]
                                 + mu_blk * mu_blk * c_inv_2s2[None, :])
        delta_scr[:, :] = gam_blk * mu_blk - beta_old_blk
        gam_scr[:, :] = gam_blk
        mu_scr[:, :] = mu_blk
    n_sub = (bsz // sub
             if probe in ("none", "exact_noz", "noseq", "nosig", "norank",
                          "dmalite", "noadv", "nor0", "chain_only")
             else 0)
    # The per-row chain values are (1, q) vectors of 128-lane vregs; at the
    # full tile width (~16 vregs each, ~6 live per row) they blow past the
    # vector register file and Mosaic spills every row.  Chunking the chain
    # along q keeps the working set in registers; q-chunks are independent
    # (every cross-row correction is columnwise), so the update order per
    # column — and hence the math — is unchanged.
    qch = min(qchunk, qt)
    nqc = qt // qch

    def _chain_row(row, ql, width):
        """One coordinate update on columns [ql, ql+width) — the exact
        per-coordinate CAVI maximizer (src/coreLoop.cpp:47-77)."""
        r_i = r_scr[row, ql:ql + width]
        mu_new = ct[ql:ql + width] * (cp_ref[row, ql:ql + width] - r_i)
        logit = (ad_scr[row, ql:ql + width]
                 + mu_new * mu_new * c_inv_2s2[ql:ql + width])
        if probe == "nosig":  # PERF PROBE: no transcendental (wrong)
            gam_new = jnp.clip(logit, 0.0, 1.0)
        else:
            gam_new = jax.nn.sigmoid(logit)
        delta_i = gam_new * mu_new - beta_ref[row, ql:ql + width]
        delta_scr[row, ql:ql + width] = delta_i
        gam_scr[row, ql:ql + width] = gam_new
        mu_scr[row, ql:ql + width] = mu_new
        return delta_i

    def _push(row, lo, delta_i, ql, width):
        # right-looking: push this coordinate's rank-1 correction to the
        # rest of the window now — ONE broadcast FMA against the Gram
        # column (the additions land on each row in the same j-ascending
        # order as the flat sweep, so the result is bitwise identical)
        if push_aligned:
            # widen the slab down to the previous 8-row (sublane) boundary
            # so the FMA is always sublane-aligned; rows <= i get a
            # trace-time-zero Gram weight, making their add a +0.0 no-op
            # (exact: x + 0.0 == x for all finite x and the residuals are
            # finite by the monotonicity guard's invariant)
            i = row - lo
            start = lo + ((i + 1) // 8) * 8
            rows = lo + sub - start
            idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) \
                + (start - lo)
            gcol = jnp.where(idx > i, g_ref[start:lo + sub, row][:, None],
                             jnp.zeros((), r_scr.dtype))
            r_scr[start:lo + sub, ql:ql + width] = (
                r_scr[start:lo + sub, ql:ql + width]
                + gcol * delta_i[None, :])
        else:
            gcol = g_ref[row + 1:lo + sub, row]
            r_scr[row + 1:lo + sub, ql:ql + width] = (
                r_scr[row + 1:lo + sub, ql:ql + width]
                + gcol[:, None] * delta_i[None, :])

    for s in range(n_sub):
        lo = s * sub
        if lo > 0 and probe != "norank":
            # deferred corrections from every previous window (deep MXU,
            # full tile width)
            corr = jax.lax.dot_general(
                g_ref[lo:lo + sub, 0:lo], delta_scr[0:lo, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=r_scr.dtype)
            r_scr[lo:lo + sub, :] = r_scr[lo:lo + sub, :] + corr
        if chain_regs and interleave and nqc > 1:
            # Interleaved register-carried chains: the q-chunks are fully
            # independent (every cross-row correction is columnwise), so
            # running their per-row ops CHUNK-INNER gives Mosaic's
            # scheduler nqc independent instruction streams per coordinate
            # to hide the serial chain's op latency (mu -> logit ->
            # sigmoid -> delta -> push is one dependency chain per chunk).
            # Per column the op sequence — and hence the f32 result — is
            # bitwise identical to the chunk-outer order below.
            rblks = [r_scr[lo:lo + sub, qc * qch:(qc + 1) * qch]
                     for qc in range(nqc)]
            for i in range(sub):
                row = lo + i
                deltas = []
                for qc in range(nqc):
                    ql = qc * qch
                    mu_new = ct[ql:ql + qch] * (cp_ref[row, ql:ql + qch]
                                                - rblks[qc][i])
                    logit = (ad_scr[row, ql:ql + qch]
                             + mu_new * mu_new * c_inv_2s2[ql:ql + qch])
                    if probe == "nosig":  # PERF PROBE (wrong math)
                        gam_new = jnp.clip(logit, 0.0, 1.0)
                    else:
                        gam_new = jax.nn.sigmoid(logit)
                    delta_i = gam_new * mu_new - beta_ref[row, ql:ql + qch]
                    delta_scr[row, ql:ql + qch] = delta_i
                    gam_scr[row, ql:ql + qch] = gam_new
                    mu_scr[row, ql:ql + qch] = mu_new
                    deltas.append(delta_i)
                if i < sub - 1 and probe != "noseq":
                    gcol = g_ref[lo:lo + sub, row][:, None]
                    rblks = [rblks[qc] + gcol * deltas[qc][None, :]
                             for qc in range(nqc)]
        elif chain_regs:
            # register-carried window chain: the window's residual block
            # lives as ONE (sub, qch) SSA value — a (16, 512) f32 value is
            # just 8 full-density vregs — so every right-looking push is a
            # pure register FMA instead of a load+FMA+store against the
            # r_scr ref.  The push deliberately updates ALL sub rows with
            # the raw Gram column: rows <= i were already consumed (their
            # r was extracted before the push), so their garbage values
            # are dead — live rows receive exactly the same adds in the
            # same order as the flat sweep (bitwise identical).
            for qc in range(nqc):
                ql = qc * qch
                ct_c = ct[ql:ql + qch]
                k_c = c_inv_2s2[ql:ql + qch]
                rblk = r_scr[lo:lo + sub, ql:ql + qch]
                for i in range(sub):
                    row = lo + i
                    mu_new = ct_c * (cp_ref[row, ql:ql + qch] - rblk[i])
                    logit = (ad_scr[row, ql:ql + qch]
                             + mu_new * mu_new * k_c)
                    if probe == "nosig":  # PERF PROBE (wrong math)
                        gam_new = jnp.clip(logit, 0.0, 1.0)
                    else:
                        gam_new = jax.nn.sigmoid(logit)
                    delta_i = gam_new * mu_new - beta_ref[row, ql:ql + qch]
                    delta_scr[row, ql:ql + qch] = delta_i
                    gam_scr[row, ql:ql + qch] = gam_new
                    mu_scr[row, ql:ql + qch] = mu_new
                    if i < sub - 1 and probe != "noseq":
                        rblk = (rblk + g_ref[lo:lo + sub, row][:, None]
                                * delta_i[None, :])
        elif row_major:
            # row-outer / q-chunk-inner: the nqc independent chunk chains
            # interleave at every coordinate, hiding each other's VPU op
            # latency (the per-chunk chain is a serial dependency).  Column
            # update order is unchanged — the math is identical.
            for i in range(sub):
                row = lo + i
                deltas = [_chain_row(row, qc * qch, qch)
                          for qc in range(nqc)]
                if i < sub - 1 and probe != "noseq":
                    for qc in range(nqc):
                        _push(row, lo, deltas[qc], qc * qch, qch)
        else:
            for qc in range(nqc):
                ql = qc * qch
                for i in range(sub):
                    row = lo + i
                    delta_i = _chain_row(row, ql, qch)
                    if i < sub - 1 and probe != "noseq":
                        _push(row, lo, delta_i, ql, qch)

    # ---- advance the resident F tile (MXU) ----
    if probe in ("nomxu", "noadv", "chain_only"):
        # PERF PROBE: no F advance (wrong math).  "noadv" keeps everything
        # else to isolate just the (n, B) @ (B, QT) advance dot + its
        # VMEM read-modify-write of the resident F tile.
        pass
    elif mxu_bf16:
        f_scr[:, :] = f_scr[:, :] + jax.lax.dot_general(
            x_ref[:, :].astype(jnp.bfloat16),
            delta_scr[:, :].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f_scr.dtype)
    else:
        f_scr[:, :] = f_scr[:, :] + jax.lax.dot_general(
            x_ref[:, :], delta_scr[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f_scr.dtype)

    if lookahead and probe != "nomxu":
        # exact off-diagonal Gram correction: the lookahead projection for
        # block b+1 was taken before this block's deltas landed in F;
        # rn += (x_{b+1}^T x_b) @ delta_b restores equality with
        # x_{b+1}^T F_advanced (same algebra, different f32 rounding)
        @pl.when(b != nb - 1)
        def _():
            rn_scr[:, :] = rn_scr[:, :] + jax.lax.dot_general(
                goff_ref[0], delta_scr[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=r_scr.dtype)

    # ---- mask at write time + fused column statistics ----
    # The masks ride the reduction dots: pm/qm are 0/1 and idempotent, so
    # e.g. sum_j (gam*msk)_jk = qm_k * sum_j pm_j gam_jk — the pm weight
    # becomes the lhs of a (1, B) @ (B, QT) MXU dot and the qm factor a
    # (1, QT) vector op, replacing ~7 VPU passes over the tile.
    msk = pm[:, None] * qm[None, :]
    t_bm = gam_scr[:, :] * mu_scr[:, :]              # unmasked beta
    beta_m = t_bm * msk
    beta_out_ref[:, :] = beta_m
    if emit:
        gam_out_ref[:, :] = gam_scr[:, :] * msk
        mu_out_ref[:, :] = mu_scr[:, :] * msk
    pm_row = pm.reshape(1, bsz)
    rdot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=r_scr.dtype)
    gcol = rdot(pm_row, gam_scr[:, :])[0] * qm               # (QT,)
    m2gcol = rdot(pm_row, t_bm * mu_scr[:, :])[0] * qm
    b2col = rdot(pm_row, t_bm * t_bm)[0] * qm

    @pl.when(b == 0)
    def _():
        gcol_ref[0, :] = gcol
        m2gcol_ref[0, :] = m2gcol
        b2col_ref[0, :] = b2col

    @pl.when(b != 0)
    def _():
        gcol_ref[0, :] = gcol_ref[0, :] + gcol
        m2gcol_ref[0, :] = m2gcol_ref[0, :] + m2gcol
        b2col_ref[0, :] = b2col_ref[0, :] + b2col

    # ---- Z-moment tile reduction (reference: R/update_vb.R:217-234) ----
    # z = gam*(imr1 - imr0) + imr0 + u at uc = sqrt(c) u, rescaled by
    # 1/sqrt(c) — all folded into the interpolated imrd/imr0u tiles
    # (ops/interp.py), so annealed and converged phases share this line.
    # masked z = msk*(gam_m*imrd + imr0u) = msk*(gam*imrd + imr0u) since
    # msk^2 = msk, so the sums take the same pm-dot / qm-scale route.
    if probe in ("exact_noz", "jacobi_min", "nomxu", "noseq", "nosig",
                 "norank", "chain_only"):
        z_raw = gam_scr[:, :]  # PERF PROBE: skip the Z Mills (wrong math)
    else:
        z_raw = gam_scr[:, :] * imrd_scr[:, :] + imr0u_scr[:, :]

    z_qm = z_raw * qm[None, :]
    zr = jnp.sum(z_qm, axis=1) * pm         # (B,)
    zc = rdot(pm_row, z_qm)[0]              # (QT,)

    @pl.when(t == 0)
    def _():
        zrow_scr[0, pl.ds(b * bsz, bsz)] = zr

    @pl.when(t != 0)
    def _():
        zrow_scr[0, pl.ds(b * bsz, bsz)] = (
            zrow_scr[0, pl.ds(b * bsz, bsz)] + zr)

    @pl.when(b == 0)
    def _():
        zcol_ref[0, :] = zc

    @pl.when(b != 0)
    def _():
        zcol_ref[0, :] = zcol_ref[0, :] + zc

    # ---- write-backs at the boundaries ----
    @pl.when(b == nb - 1)
    def _():
        dma = pltpu.make_async_copy(
            f_scr, f_out_ref.at[:, pl.ds(t * qt, qt)], dma_sem)
        dma.start()
        dma.wait()

    @pl.when(jnp.logical_and(t == qtiles - 1, b == nb - 1))
    def _():
        zrow_ref[0, :] = zrow_scr[0, :]


@functools.partial(jax.jit,
                   static_argnames=("block_size", "q_tile", "sub", "qchunk",
                                    "mxu_bf16", "emit_gam_mu", "row_major",
                                    "push_aligned", "chain_regs", "c_one",
                                    "lookahead", "interleave", "probe"))
def sweep_fused(x, cp_x_y, gram_flat, l_aug, n_stack, beta, fitted, theta8,
                pm8, zeta, q_mask, sig2_beta, tau, c, kz,
                block_size: int = 128, q_tile: int = 1024, sub: int = 16,
                qchunk: int = 512,
                mxu_bf16: bool = False, emit_gam_mu: bool = True,
                row_major: bool = False, push_aligned: bool = True,
                chain_regs: bool = True, c_one: bool = False,
                lookahead: bool = False, interleave: bool = False,
                probe: str = "none"):
    """One full Gauss-Seidel sweep (+ fused Z/column reductions) as a single
    pallas_call.

    x: (n, p); cp_x_y/beta: (p, q); fitted: (n, q);
    gram_flat: (p, B) stacked diagonal Gram blocks;
    l_aug: (p, r+2) Lagrange basis; n_stack: (3, r+2, q) node values
    (ops/interp.py:tail_interp_operands);
    theta8/pm8: (nb, 8, B) sublane-padded per-block theta / predictor mask.
    Returns (beta', gam'|None, mu'|None, fitted', z_row (p,), z_col (q,),
    (colsum gam, colsum mu^2 gam, colsum beta^2)).
    """
    n, p = x.shape
    q = beta.shape[1]
    nb = p // block_size
    qtiles = q // q_tile
    dt = beta.dtype
    r_aug = l_aug.shape[1]
    sub = min(sub, block_size)
    assert block_size % sub == 0, (block_size, sub)
    interpret = jax.devices()[0].platform == "cpu"

    scal = jnp.stack([jnp.asarray(c, dt), jnp.asarray(n - 1.0, dt),
                      jnp.asarray(kz, dt)])

    tile = lambda: pl.BlockSpec((block_size, q_tile), lambda t, b: (b, t),
                                memory_space=pltpu.VMEM)
    # PERF PROBE "dmalite" (wrong math): pin the x/cp blocks to index 0 so
    # their HBM streams collapse to one block — isolates how much of the
    # kernel time is un-overlapped input DMA.
    tile0 = lambda: pl.BlockSpec((block_size, q_tile), lambda t, b: (0, 0),
                                 memory_space=pltpu.VMEM)
    xspec = (pl.BlockSpec((n, block_size), lambda t, b: (0, 0),
                          memory_space=pltpu.VMEM)
             if probe == "dmalite" else
             pl.BlockSpec((n, block_size), lambda t, b: (0, b),
                          memory_space=pltpu.VMEM))
    cpspec = tile0() if probe == "dmalite" else tile()
    vec = lambda: pl.BlockSpec((1, q_tile), lambda t, b: (0, t),
                               memory_space=pltpu.VMEM)
    bvec = lambda: pl.BlockSpec((1, 8, block_size), lambda t, b: (b, 0, 0),
                                memory_space=pltpu.VMEM)

    if emit_gam_mu:
        gm_specs = [tile(), tile()]
        gm_shapes = [jax.ShapeDtypeStruct((p, q), dt),
                     jax.ShapeDtypeStruct((p, q), dt)]
    else:
        # vestigial 1-block outputs (Mosaic requires a ref; never written)
        gm_specs = [pl.BlockSpec((block_size, q_tile), lambda t, b: (0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(2)]
        gm_shapes = [jax.ShapeDtypeStruct((block_size, q_tile), dt)
                     for _ in range(2)]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # scal
        xspec,                                                    # x
        pl.BlockSpec((block_size, block_size), lambda t, b: (b, 0),
                     memory_space=pltpu.VMEM),                    # gram
        pl.BlockSpec((block_size, r_aug), lambda t, b: (b, 0),
                     memory_space=pltpu.VMEM),                    # l_aug
        pl.BlockSpec((3, r_aug, q_tile), lambda t, b: (0, 0, t),
                     memory_space=pltpu.VMEM),                    # nodes
        cpspec, tile(),                          # cp, beta
        vec(), vec(), vec(),                     # s2, tau, zeta
        bvec(), bvec(),                          # theta8, pm8
        vec(),                                   # q_mask
        pl.BlockSpec(memory_space=pl.ANY),       # fitted (HBM)
    ]
    operands = [scal, x, gram_flat, l_aug, n_stack, cp_x_y, beta,
                sig2_beta[None, :], tau[None, :], zeta[None, :],
                theta8, pm8, q_mask[None, :], fitted]
    scratch = [
        pltpu.VMEM((n, q_tile), dt),            # F tile
        pltpu.VMEM((block_size, q_tile), dt),   # residual projections
        pltpu.VMEM((block_size, q_tile), dt),   # delta
        pltpu.VMEM((block_size, q_tile), dt),   # gam values
        pltpu.VMEM((block_size, q_tile), dt),   # mu values
        pltpu.VMEM((1, p), dt),                 # z_row accumulator
        pltpu.VMEM((block_size, q_tile), dt),   # folded logit constant
        pltpu.VMEM((block_size, q_tile), dt),   # interp imrd tile
        pltpu.VMEM((block_size, q_tile), dt),   # interp imr0u tile
    ]
    if lookahead:
        # x again under a shifted index map (block b+1; clamped at the
        # last block, whose lookahead is masked off) + the off-diagonal
        # Gram blocks goff[b] = x_{b+1}^T x_b
        xr = x.reshape(n, nb, block_size)
        goff = jnp.einsum("nkj,nki->kji", xr[:, 1:], xr[:, :-1],
                          preferred_element_type=dt)
        goff = jnp.concatenate(
            [goff, jnp.zeros((1, block_size, block_size), dt)], axis=0)
        in_specs += [
            pl.BlockSpec((n, block_size),
                         lambda t, b: (0, jnp.minimum(b + 1, nb - 1)),
                         memory_space=pltpu.VMEM),                # x_next
            pl.BlockSpec((1, block_size, block_size),
                         lambda t, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # goff
        ]
        operands += [x, goff]
        scratch = scratch + [pltpu.VMEM((block_size, q_tile), dt)]  # rn

    out = pl.pallas_call(
        functools.partial(_fused_kernel, nb=nb, qtiles=qtiles, sub=sub,
                          qchunk=qchunk, mxu_bf16=mxu_bf16, emit=emit_gam_mu,
                          row_major=row_major, push_aligned=push_aligned,
                          chain_regs=chain_regs, c_one=c_one,
                          lookahead=lookahead, interleave=interleave,
                          probe=probe),
        grid=(qtiles, nb),
        in_specs=in_specs,
        out_specs=(tile(), *gm_specs,
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, p), lambda t, b: (0, 0),
                                memory_space=pltpu.VMEM),
                   vec(), vec(), vec(), vec()),
        out_shape=(
            jax.ShapeDtypeStruct((p, q), dt),        # beta'
            *gm_shapes,                              # gam', mu'
            jax.ShapeDtypeStruct((n, q), dt),        # fitted'
            jax.ShapeDtypeStruct((1, p), dt),        # z_row
            jax.ShapeDtypeStruct((1, q), dt),        # z_col
            jax.ShapeDtypeStruct((1, q), dt),
            jax.ShapeDtypeStruct((1, q), dt),
            jax.ShapeDtypeStruct((1, q), dt),
        ),
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA],
        input_output_aliases={6: 0, 13: 3},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the bf16 staging copies of the F tile / x block push the
            # scoped-vmem stack past the 16 MB default
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    beta_out, gam_out, mu_out, f_out, zrow, zcol, gcol, m2gcol, b2col = out
    if emit_gam_mu:
        gam_out_r, mu_out_r = gam_out, mu_out
    else:
        gam_out_r = mu_out_r = None  # vestigial buffers, never written
    return (beta_out, gam_out_r, mu_out_r, f_out, zrow[0], zcol[0],
            (gcol[0], m2gcol[0], b2col[0]))


def sweep_complete_fused(x, cp_x_y, gram_blocks, beta, fitted,
                         consts, block_size, p_mask=None, q_mask=None,
                         q_tile: int = 1024, sub: int = 16,
                         qchunk: int = 512, interp_r: int = 40,
                         mxu_bf16: bool = False, emit_gam_mu: bool = True,
                         row_major: bool = False, push_aligned: bool = True,
                         chain_regs: bool = True, annealed: bool = False,
                         lookahead: bool = False, interleave: bool = False,
                         probe: str = "none"):
    """Driver-facing wrapper matching ops/sweep.py:sweep_complete, carrying
    beta = gam * mu_beta (see module docstring).  annealed=False asserts
    the converged phase, where the driver always passes c == 1 — the
    kernel specializes on that (one shared sqrt base, no c multiplies);
    annealed=True takes the general tempered path for any consts.c."""
    n, p = x.shape
    q = beta.shape[1]
    nb = p // block_size
    gram_flat = gram_blocks.reshape(nb * block_size, block_size)
    if p_mask is None:
        p_mask = jnp.ones((p,), beta.dtype)
    if q_mask is None:
        q_mask = jnp.ones((q,), beta.dtype)
    theta8 = jnp.broadcast_to(
        consts.theta.reshape(nb, 1, block_size), (nb, 8, block_size))
    pm8 = jnp.broadcast_to(
        p_mask.reshape(nb, 1, block_size), (nb, 8, block_size))

    # folded logit constant: ad = c*(d(u) - cst) with
    # cst = -log(tau sig2_inv s2)/2 (reference src/coreLoop.cpp:52-57)
    cst = -0.5 * (consts.log_tau + consts.log_sig2_inv
                  + jnp.log(consts.sig2_beta))
    l_aug, n_stack, kz = tail_interp_operands(
        consts.theta, consts.zeta, cst, consts.c, p_mask, r=interp_r)

    return sweep_fused(
        x, cp_x_y, gram_flat, l_aug, n_stack, beta, fitted, theta8, pm8,
        consts.zeta, q_mask, consts.sig2_beta, consts.tau, consts.c, kz,
        block_size=block_size, q_tile=q_tile, sub=sub,
        qchunk=qchunk, mxu_bf16=mxu_bf16, emit_gam_mu=emit_gam_mu,
        row_major=row_major, push_aligned=push_aligned,
        chain_regs=chain_regs, c_one=not annealed,
        lookahead=lookahead and probe == "none", interleave=interleave,
        probe=probe)
