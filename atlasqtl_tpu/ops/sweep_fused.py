"""Fully-fused Pallas sweep: the entire Gauss-Seidel pass in one kernel.

Third-generation TPU design of the reference's C++ hot loop
(src/coreLoop.cpp:38-86).  Relative to the hybrid XLA+Pallas sweep
(ops/sweep_pallas.py) this kernel:

- inverts the loop nest — grid (response-tiles OUTER, predictor-blocks
  INNER) — so the fitted matrix F = X beta lives in VMEM scratch across all
  predictor blocks and touches HBM exactly twice per iteration instead of
  once per block (the dominant HBM traffic at production shapes);
- computes the probit log-Phi tails in-kernel with the fast erfcx form
  (ops/special.py:log_ndtr_both_fast), removing the O(pq) XLA
  pre-materialization of two log-Phi matrices;
- accumulates the Z-moment reductions (rowSums/colSums of the truncated
  normal posterior means, reference R/update_vb.R:217-234) in-kernel right
  after each block's coordinate updates, removing the separate O(pq) XLA
  pass;
- applies the padding masks to gam/mu at write time and accumulates the
  three column statistics the next iteration needs (colsum gam,
  colsum mu^2 gam, colsum (gam mu)^2 — feeding the nu/rho/eta/kappa updates,
  reference R/atlasqtl_global_local_core.R:134-145) while the tiles are
  still in VMEM, removing ~8 GB/iteration of XLA mask/einsum passes over
  the p x q state at the eQTL bench shape;
- runs the strictly-sequential within-block updates sub-blocked: the S-row
  window is fully unrolled (static indices) and each coordinate *lazily*
  gathers the rank-1 corrections of its in-window predecessors (triangular:
  i scalar-broadcast FMAs for coordinate i, no window-wide writes), then the
  corrections propagate to the remaining rows once per sub-block as a rank-S
  MXU update.  Update order — and the math — equals the reference's flat
  k-major Gauss-Seidel exactly;
- optionally (``mxu_bf16=True``) runs the two large MXU contractions
  (residual projection x_b^T F_t and the F_t advance) with bfloat16 inputs
  and float32 accumulation — ~3x MXU throughput on v5e.  Gated by the ELBO
  monotonicity guard: the tempered coordinate updates remain ascent steps
  under the ~2^-9 relative input rounding at annealing scales; validated
  empirically (tests/test_e2e.py) before being the f32 default.

Per grid step (t, b):
  r0    = x_b^T F_t                  (MXU)
  inner sub-blocked Gauss-Seidel     (VPU + rank-S MXU)
  z-tile reduction                   (VPU)
  F_t  += x_b delta                  (MXU)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .special import log_ndtr_both_fast

_LOG_SQRT_2PI = 0.9189385332046727


def _fused_kernel(scal_ref, x_ref, g_ref, cp_ref, gam_in_ref, mu_in_ref,
                  s2_ref, tau_ref, logtau_ref, zeta_ref, theta_ref, pm_ref,
                  qm_ref, f_hbm_ref, gam_out_ref, mu_out_ref, f_out_ref,
                  zrow_ref, zcol_ref, gcol_ref, m2gcol_ref, b2col_ref,
                  f_scr, r_scr, delta_scr, zrow_scr,
                  logp_scr, log1p_scr, dma_sem, *, nb: int, qtiles: int,
                  sub: int, mxu_bf16: bool, probe: str = "none"):
    t = pl.program_id(0)
    b = pl.program_id(1)
    qt = r_scr.shape[1]
    bsz = r_scr.shape[0]

    c = scal_ref[0]
    log_sig2_inv = scal_ref[1]
    # Gram diagonal: exactly n-1 for standardized X; padded predictor
    # columns are all-zero so beta_old is identically 0 there and the wrong
    # diagonal multiplies zero
    d_diag = scal_ref[2]
    sqrt_c = scal_ref[3]

    s2 = s2_ref[0, :]
    ct = c * s2 * tau_ref[0, :]
    cst = -(logtau_ref[0, :] + log_sig2_inv + jnp.log(s2)) / 2.0
    inv_2s2 = 0.5 / s2
    zeta = zeta_ref[0, :]                   # (QT,)
    theta = theta_ref[0, 0, :]              # (B,)
    pm = pm_ref[0, 0, :]                    # (B,)
    qm = qm_ref[0, :]                       # (QT,)

    u = theta[:, None] + zeta[None, :]      # (B, QT)
    # materialize the log-Phi tails in scratch: the sequential loop below
    # reads them row-by-row with a dynamic index, which Mosaic only supports
    # through a ref
    if probe != "jacobi_min":
        lp, l1p = log_ndtr_both_fast(u)
        logp_scr[:, :] = lp
        log1p_scr[:, :] = l1p
    else:  # PERF PROBE: skip the log-Phi tails (wrong math)
        logp_scr[:, :] = u
        log1p_scr[:, :] = -u

    # ---- fetch the F tile into VMEM at the first predictor block ----
    @pl.when(b == 0)
    def _():
        dma = pltpu.make_async_copy(
            f_hbm_ref.at[:, pl.ds(t * qt, qt)], f_scr, dma_sem)
        dma.start()
        dma.wait()

    # ---- residual projections for this block (MXU) ----
    if mxu_bf16:
        r_scr[:, :] = jax.lax.dot_general(
            x_ref[:, :].astype(jnp.bfloat16),
            f_scr[:, :].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=r_scr.dtype)
    else:
        r_scr[:, :] = jax.lax.dot_general(
            x_ref[:, :], f_scr[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=r_scr.dtype)

    # ---- sub-blocked sequential Gauss-Seidel (unrolled, lazy triangular) --
    # Coordinate i gathers the corrections of its in-window predecessors
    # (i scalar-broadcast FMAs, registers only) instead of eagerly writing
    # the whole S-row window per coordinate: ~2x less VPU work + no VMEM
    # window write traffic, identical update order and math.
    if probe in ("jacobi", "jacobi_min"):
        # PERF PROBE ONLY (wrong math): full-tile Jacobi update with no
        # sequential corrections — measures the kernel's floor without the
        # per-row chain.  Never selected by production code.
        beta_old_blk = gam_in_ref[:, :] * mu_in_ref[:, :]
        r_adj = r_scr[:, :] - beta_old_blk * d_diag
        mu_blk = ct[None, :] * (cp_ref[:, :] - r_adj)
        logit_blk = c * (log1p_scr[:, :] - logp_scr[:, :]
                         - mu_blk * mu_blk * inv_2s2[None, :]
                         + cst[None, :])
        gam_blk = jax.nn.sigmoid(-logit_blk)
        delta_scr[:, :] = gam_blk * mu_blk - beta_old_blk
        gam_out_ref[:, :] = gam_blk
        mu_out_ref[:, :] = mu_blk
    n_sub = bsz // sub if probe in ("none", "exact_noz") else 0
    for s in range(n_sub):
        lo = s * sub
        for i in range(sub):
            row = lo + i
            beta_old = gam_in_ref[row, :] * mu_in_ref[row, :]
            r_i = r_scr[row, :]
            for j in range(i):
                r_i = r_i + g_ref[row, lo + j] * delta_scr[lo + j, :]
            r_i = r_i - beta_old * d_diag
            mu_new = ct * (cp_ref[row, :] - r_i)
            logit = c * (log1p_scr[row, :] - logp_scr[row, :]
                         - mu_new * mu_new * inv_2s2 + cst)
            gam_new = jax.nn.sigmoid(-logit)
            delta_scr[row, :] = gam_new * mu_new - beta_old
            gam_out_ref[row, :] = gam_new
            mu_out_ref[row, :] = mu_new

        if lo + sub < bsz:
            g_rest = g_ref[lo + sub:, lo:lo + sub]
            r_scr[lo + sub:, :] = r_scr[lo + sub:, :] + jnp.dot(
                g_rest, delta_scr[lo:lo + sub, :],
                preferred_element_type=r_scr.dtype)

    # ---- advance the resident F tile (MXU) ----
    if mxu_bf16:
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

    # ---- mask at write time + fused column statistics ----
    msk = pm[:, None] * qm[None, :]
    gam_m = gam_out_ref[:, :] * msk
    mu_m = mu_out_ref[:, :] * msk
    gam_out_ref[:, :] = gam_m
    mu_out_ref[:, :] = mu_m
    beta_m = gam_m * mu_m
    gcol = jnp.sum(gam_m, axis=0)                    # (QT,)
    m2gcol = jnp.sum(mu_m * mu_m * gam_m, axis=0)
    b2col = jnp.sum(beta_m * beta_m, axis=0)

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
    if probe in ("exact_noz", "jacobi_min"):
        z = gam_m  # PERF PROBE: skip the Z transcendentals (wrong math)
    else:
        uc = sqrt_c * u
        log_p_c, log_1p_c = log_ndtr_both_fast(uc)
        pdf_term = -0.5 * uc * uc - _LOG_SQRT_2PI
        imr1 = jnp.maximum(jnp.exp(pdf_term - log_p_c), -uc)
        imr0 = jnp.minimum(-jnp.exp(pdf_term - log_1p_c), -uc)
        z = ((gam_m * (imr1 - imr0) + imr0) / sqrt_c + u)
        z = z * msk

    zr = jnp.sum(z, axis=1)                 # (B,)
    zc = jnp.sum(z, axis=0)                 # (QT,)

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
                   static_argnames=("block_size", "q_tile", "sub",
                                    "mxu_bf16", "probe"))
def sweep_fused(x, cp_x_y, gram_flat, gam, mu_beta, fitted, theta8, pm8,
                zeta, q_mask, sig2_beta, tau, log_tau, c, log_sig2_inv,
                block_size: int = 128, q_tile: int = 1024, sub: int = 16,
                mxu_bf16: bool = False, probe: str = "none"):
    """One full Gauss-Seidel sweep (+ fused Z reductions) as a single
    pallas_call.

    x: (n, p); cp_x_y/gam/mu_beta: (p, q); fitted: (n, q);
    gram_flat: (p, B) stacked diagonal Gram blocks;
    theta8/pm8: (nb, 8, B) sublane-padded per-block theta / predictor mask.
    Returns (gam', mu', fitted', z_row (p,), z_col (q,)).
    """
    n, p = x.shape
    q = gam.shape[1]
    nb = p // block_size
    qtiles = q // q_tile
    dt = gam.dtype
    sub = min(sub, block_size)
    assert block_size % sub == 0, (block_size, sub)
    interpret = jax.devices()[0].platform == "cpu"

    scal = jnp.stack([jnp.asarray(c, dt), jnp.asarray(log_sig2_inv, dt),
                      jnp.asarray(n - 1.0, dt),
                      jnp.sqrt(jnp.asarray(c, dt))])

    tile = lambda: pl.BlockSpec((block_size, q_tile), lambda t, b: (b, t),
                                memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec((1, q_tile), lambda t, b: (0, t),
                               memory_space=pltpu.VMEM)
    bvec = lambda: pl.BlockSpec((1, 8, block_size), lambda t, b: (b, 0, 0),
                                memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, nb=nb, qtiles=qtiles, sub=sub,
                          mxu_bf16=mxu_bf16, probe=probe),
        grid=(qtiles, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # scal
            pl.BlockSpec((n, block_size), lambda t, b: (0, b),
                         memory_space=pltpu.VMEM),                    # x
            pl.BlockSpec((block_size, block_size), lambda t, b: (b, 0),
                         memory_space=pltpu.VMEM),                    # gram
            tile(), tile(), tile(),                  # cp, gam, mu
            vec(), vec(), vec(), vec(),              # s2, tau, logtau, zeta
            bvec(), bvec(),                          # theta8, pm8
            vec(),                                   # q_mask
            pl.BlockSpec(memory_space=pl.ANY),       # fitted (HBM)
        ],
        out_specs=(tile(), tile(),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, p), lambda t, b: (0, 0),
                                memory_space=pltpu.VMEM),
                   vec(), vec(), vec(), vec()),
        out_shape=(
            jax.ShapeDtypeStruct((p, q), dt),
            jax.ShapeDtypeStruct((p, q), dt),
            jax.ShapeDtypeStruct((n, q), dt),
            jax.ShapeDtypeStruct((1, p), dt),
            jax.ShapeDtypeStruct((1, q), dt),
            jax.ShapeDtypeStruct((1, q), dt),
            jax.ShapeDtypeStruct((1, q), dt),
            jax.ShapeDtypeStruct((1, q), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, q_tile), dt),            # F tile
            pltpu.VMEM((block_size, q_tile), dt),   # residual projections
            pltpu.VMEM((block_size, q_tile), dt),   # delta
            pltpu.VMEM((1, p), dt),                 # z_row accumulator
            pltpu.VMEM((block_size, q_tile), dt),   # log Phi
            pltpu.VMEM((block_size, q_tile), dt),   # log (1-Phi)
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={4: 0, 5: 1, 13: 2},   # gam/mu/fitted in place
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the bf16 staging copies of the F tile / x block push the
            # scoped-vmem stack past the 16 MB default
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scal, x, gram_flat, cp_x_y, gam, mu_beta,
      sig2_beta[None, :], tau[None, :], log_tau[None, :], zeta[None, :],
      theta8, pm8, q_mask[None, :], fitted)
    gam_out, mu_out, f_out, zrow, zcol, gcol, m2gcol, b2col = out
    return (gam_out, mu_out, f_out, zrow[0], zcol[0],
            (gcol[0], m2gcol[0], b2col[0]))


def sweep_complete_fused(x, cp_x_y, gram_blocks, gam, mu_beta, fitted,
                         consts, block_size, p_mask=None, q_mask=None,
                         q_tile: int = 1024, sub: int = 16,
                         mxu_bf16: bool = False, probe: str = "none"):
    """Driver-facing wrapper matching ops/sweep.py:sweep_complete."""
    n, p = x.shape
    q = gam.shape[1]
    nb = p // block_size
    gram_flat = gram_blocks.reshape(nb * block_size, block_size)
    if p_mask is None:
        p_mask = jnp.ones((p,), gam.dtype)
    if q_mask is None:
        q_mask = jnp.ones((q,), gam.dtype)
    theta8 = jnp.broadcast_to(
        consts.theta.reshape(nb, 1, block_size), (nb, 8, block_size))
    pm8 = jnp.broadcast_to(
        p_mask.reshape(nb, 1, block_size), (nb, 8, block_size))

    gam_out, mu_out, f_out, z_row, z_col, colstats = sweep_fused(
        x, cp_x_y, gram_flat, gam, mu_beta, fitted, theta8, pm8, consts.zeta,
        q_mask, consts.sig2_beta, consts.tau, consts.log_tau, consts.c,
        consts.log_sig2_inv, block_size=block_size, q_tile=q_tile, sub=sub,
        mxu_bf16=mxu_bf16, probe=probe)
    return gam_out, mu_out, f_out, z_row, z_col, colstats