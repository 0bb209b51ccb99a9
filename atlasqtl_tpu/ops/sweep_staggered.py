"""Staggered dual-half fused sweep: overlap the MXU dots with the chain.

The r5 pod-shape probe campaign (docs/DESIGN.md §3, tools/tpu_probe_pod.py)
showed the fused kernel at deep n is bound by the SERIAL dependency
r0 -> chain -> advance: the two big MXU contractions cost ~37 ms/iter and
the sequential chain ~14 ms, yet with the dots removed the chain costs only
~2 ms over a Jacobi pass — MXU and VPU idle waiting on each other, and the
one-block-lookahead attempt to overlap them across grid steps serialized
Mosaic's pipeline instead (r4 dead end).

This kernel overlaps them WITHIN a grid step: the q-tile is split into
independent column halves A and B, with B lagging half a step.  Per grid
step b (steady state):

    R1: advance_A(b-1) [MXU]  ||  chain_B(b-1)        [VPU]
    R2: r0_A(b)        [MXU]  (+ its probit half-tiles)
    R3: advance_B(b-1) [MXU]  ||  chain_A(b)          [VPU]
    R4: r0_B(b)        [MXU]  ||  emit(b-1) + buffer  [VPU]

Every operand is ready when issued: advance_A needs chain_A(b-1) [prev
R3], chain_B needs r0_B(b-1) [prev R4], r0_A needs advance_A, advance_B
needs chain_B, chain_A needs r0_A, r0_B needs advance_B.  Each region
pairs at most one large dot with dependency-free VPU work, and EVERY
per-half scratch buffer is a physically separate ref (r_A/r_B, delta_A/
delta_B, ...) so the pairing carries no false memory dependencies — the
first two revisions of this kernel measured SLOWER than baseline because
(rev 1) each op sat in its own cond region the scheduler cannot
interleave across, and (rev 2) one giant region blew the register
allocator; both also shared sliced scratch between the halves.

All per-column op sequences are IDENTICAL to the baseline kernel
(ops/sweep_fused.py) — outputs bitwise equal per column (pinned by
tests/test_pallas.py).  Block b-1's outputs complete at step b (the A
half's gam/mu/Z are buffered one step), so output index maps shift by one
block and the grid gains one drain step.

Reference for the math: src/coreLoop.cpp:38-86 (same flat k-major
Gauss-Seidel as the baseline kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interp import K_BASE, tail_interp_operands


def _stag_kernel(scal_ref, x_ref, xp_ref, g_ref, gp_ref, l_ref, lp_ref,
                 n_ref, cp_ref, cpp_ref, beta_ref, betap_ref,
                 s2_ref, tau_ref, zeta_ref, theta_ref, thetap_ref,
                 pm_ref, pmp_ref, qm_ref, f_hbm_ref,
                 # outputs (windows at block b-1)
                 beta_out_ref, gam_out_ref, mu_out_ref, f_out_ref,
                 zrow_ref, zcol_ref, gcol_ref, m2gcol_ref, b2col_ref,
                 # scratch (per-half refs are physically separate)
                 f_scr,
                 rA, dA, gA, mA, adA, imA, i0A,
                 rB, dB, gB, mB, adB, imB, i0B,
                 gamAb, muAb, zAb, zrow_scr, dma_sem,
                 *, nb: int, qtiles: int, sub: int, qchunk: int,
                 emit: bool, c_one: bool):
    t = pl.program_id(0)
    b = pl.program_id(1)          # 0 .. nb inclusive (one drain step)
    h = rA.shape[1]
    qt = 2 * h
    bsz = rA.shape[0]

    c = scal_ref[0]
    d_diag = scal_ref[1]
    kz = scal_ref[2]

    s2 = s2_ref[0, :]
    ct_full = c * s2 * tau_ref[0, :]
    k_full = c * 0.5 / s2
    zeta = zeta_ref[0, :]
    qm = qm_ref[0, :]

    first = b == 0
    last = b == nb

    @pl.when(first)
    def _():
        dma = pltpu.make_async_copy(
            f_hbm_ref.at[:, pl.ds(t * qt, qt)], f_scr, dma_sem)
        dma.start()
        dma.wait()

    ldot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=rA.dtype)

    def probit_half(theta_blk, l_blk, lo, ad_x, im_x, i0_x):
        """ad/imrd/imr0u half-tiles — same math as the baseline kernel."""
        # slice-then-newaxis: the combined zeta[None, lo:lo+h] form lowers
        # as a rank-3 gather, which Mosaic rejects
        u = theta_blk[:, None] + zeta[lo:lo + h][None, :]
        u2 = u * u
        s_d = jnp.sqrt(u2 + K_BASE)
        hu = 0.5 * u
        nA_ = n_ref[0][:, lo:lo + h]
        nB_ = n_ref[1][:, lo:lo + h]
        nC_ = n_ref[2][:, lo:lo + h]
        if c_one:
            ad_x[:, :] = hu * s_d + ldot(l_blk, nA_)
            im_x[:, :] = s_d + ldot(l_blk, nB_)
            i0_x[:, :] = ldot(l_blk, nC_) - 0.5 * s_d - hu
        else:
            ad_x[:, :] = c * (hu * s_d) + ldot(l_blk, nA_)
            s_z = jnp.sqrt(u2 + kz)
            im_x[:, :] = s_z + ldot(l_blk, nB_)
            i0_x[:, :] = ldot(l_blk, nC_) - 0.5 * s_z - hu

    def chain_half(g_blk, cp_blk, beta_blk, lo_col, r_x, d_x, g_x, m_x,
                   ad_x):
        """Sequential Gauss-Seidel on one half's own scratch refs —
        identical per-column op order to the baseline kernel
        (register-carried windows; the full-window push FMA's rows <= i
        are dead, live rows get the same adds in the same order)."""
        qch = min(qchunk, h)
        nqc = h // qch
        ct_h = ct_full[lo_col:lo_col + h]
        k_h = k_full[lo_col:lo_col + h]
        for s in range(bsz // sub):
            lo = s * sub
            if lo > 0:
                corr = jax.lax.dot_general(
                    g_blk[lo:lo + sub, 0:lo], d_x[0:lo, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=r_x.dtype)
                r_x[lo:lo + sub, :] = r_x[lo:lo + sub, :] + corr
            for qc in range(nqc):
                ql = qc * qch
                ct_c = ct_h[ql:ql + qch]
                k_c = k_h[ql:ql + qch]
                rblk = r_x[lo:lo + sub, ql:ql + qch]
                for i in range(sub):
                    row = lo + i
                    mu_new = ct_c * (cp_blk[row, lo_col + ql:
                                            lo_col + ql + qch] - rblk[i])
                    logit = ad_x[row, ql:ql + qch] + mu_new * mu_new * k_c
                    gam_new = jax.nn.sigmoid(logit)
                    delta_i = gam_new * mu_new - beta_blk[
                        row, lo_col + ql:lo_col + ql + qch]
                    d_x[row, ql:ql + qch] = delta_i
                    g_x[row, ql:ql + qch] = gam_new
                    m_x[row, ql:ql + qch] = mu_new
                    if i < sub - 1:
                        rblk = (rblk + g_blk[lo:lo + sub, row][:, None]
                                * delta_i[None, :])

    # ---- the schedule's ops as closures; boundary regions instantiate
    # their straight-line subsets ----
    def op1_advance_A():
        f_scr[:, 0:h] = f_scr[:, 0:h] + jax.lax.dot_general(
            xp_ref[:, :], dA[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f_scr.dtype)

    def op2_chain_B():
        probit_half(thetap_ref[0, 0, :], lp_ref[:, :], h, adB, imB, i0B)
        chain_half(gp_ref, cpp_ref, betap_ref, h, rB, dB, gB, mB, adB)

    def op3_r0_A():
        probit_half(theta_ref[0, 0, :], l_ref[:, :], 0, adA, imA, i0A)
        r0 = jax.lax.dot_general(
            x_ref[:, :], f_scr[:, 0:h],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=rA.dtype)
        rA[:, :] = r0 - beta_ref[:, 0:h] * d_diag

    def op4_advance_B():
        f_scr[:, h:qt] = f_scr[:, h:qt] + jax.lax.dot_general(
            xp_ref[:, :], dB[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f_scr.dtype)

    def op5_chain_A():
        chain_half(g_ref, cp_ref, beta_ref, 0, rA, dA, gA, mA, adA)

    def op6_r0_B():
        r0 = jax.lax.dot_general(
            x_ref[:, :], f_scr[:, h:qt],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=rB.dtype)
        rB[:, :] = r0 - beta_ref[:, h:qt] * d_diag

    def buffer_A():
        gamAb[:, :] = gA[:, :]
        muAb[:, :] = mA[:, :]
        zAb[:, :] = gA[:, :] * imA[:, :] + i0A[:, :]

    def emit_bm1():
        # emit block b-1 (A half from the one-step buffers, B fresh)
        pm = pmp_ref[0, 0, :]
        pm_row = pm.reshape(1, bsz)
        rdot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=rA.dtype)
        bm1 = b - 1
        for lo, gam_h, mu_h, z_h in (
                (0, gamAb[:, :], muAb[:, :], zAb[:, :]),
                (h, gB[:, :], mB[:, :],
                 gB[:, :] * imB[:, :] + i0B[:, :])):
            qm_h = qm[lo:lo + h]
            msk = pm[:, None] * qm_h[None, :]
            t_bm = gam_h * mu_h
            beta_out_ref[:, lo:lo + h] = t_bm * msk
            if emit:
                gam_out_ref[:, lo:lo + h] = gam_h * msk
                mu_out_ref[:, lo:lo + h] = mu_h * msk
            gcol = rdot(pm_row, gam_h)[0] * qm_h
            m2gcol = rdot(pm_row, t_bm * mu_h)[0] * qm_h
            b2col = rdot(pm_row, t_bm * t_bm)[0] * qm_h
            z_qm = z_h * qm_h[None, :]
            zc = rdot(pm_row, z_qm)[0]

            @pl.when(bm1 == 0)
            def _(lo=lo, gcol=gcol, m2gcol=m2gcol, b2col=b2col, zc=zc):
                gcol_ref[0, lo:lo + h] = gcol
                m2gcol_ref[0, lo:lo + h] = m2gcol
                b2col_ref[0, lo:lo + h] = b2col
                zcol_ref[0, lo:lo + h] = zc

            @pl.when(bm1 != 0)
            def _(lo=lo, gcol=gcol, m2gcol=m2gcol, b2col=b2col, zc=zc):
                gcol_ref[0, lo:lo + h] = gcol_ref[0, lo:lo + h] + gcol
                m2gcol_ref[0, lo:lo + h] = (m2gcol_ref[0, lo:lo + h]
                                            + m2gcol)
                b2col_ref[0, lo:lo + h] = b2col_ref[0, lo:lo + h] + b2col
                zcol_ref[0, lo:lo + h] = zcol_ref[0, lo:lo + h] + zc

        qm_a = qm[0:h]
        qm_b = qm[h:qt]
        zr = (jnp.sum(zAb[:, :] * qm_a[None, :], axis=1)
              + jnp.sum((gB[:, :] * imB[:, :] + i0B[:, :])
                        * qm_b[None, :], axis=1)) * pm

        @pl.when(t == 0)
        def _():
            zrow_scr[0, pl.ds(bm1 * bsz, bsz)] = zr

        @pl.when(t != 0)
        def _():
            zrow_scr[0, pl.ds(bm1 * bsz, bsz)] = (
                zrow_scr[0, pl.ds(bm1 * bsz, bsz)] + zr)

    # ---- regions: each pairs at most one large dot with independent VPU
    # work; per-half refs are disjoint so the pairing has no false deps ----
    steady = jnp.logical_and(jnp.logical_not(first), jnp.logical_not(last))

    @pl.when(steady)
    def _():
        op1_advance_A()
        op2_chain_B()

    @pl.when(jnp.logical_not(last))
    def _():
        op3_r0_A()

    @pl.when(steady)
    def _():
        op4_advance_B()
        op5_chain_A()

    @pl.when(first)
    def _():
        op5_chain_A()

    # emit must precede buffer_A: it reads the PREVIOUS step's A buffers,
    # which buffer_A overwrites with this step's chain_A results
    @pl.when(steady)
    def _():
        op6_r0_B()
        emit_bm1()
        buffer_A()

    @pl.when(first)
    def _():
        op6_r0_B()
        buffer_A()

    @pl.when(last)
    def _():
        op1_advance_A()
        op2_chain_B()
        op4_advance_B()
        emit_bm1()

    # ---- write-backs at the boundaries ----
    @pl.when(last)
    def _():
        dma = pltpu.make_async_copy(
            f_scr, f_out_ref.at[:, pl.ds(t * qt, qt)], dma_sem)
        dma.start()
        dma.wait()

    @pl.when(jnp.logical_and(t == qtiles - 1, last))
    def _():
        zrow_ref[0, :] = zrow_scr[0, :]


@functools.partial(jax.jit,
                   static_argnames=("block_size", "q_tile", "sub", "qchunk",
                                    "emit_gam_mu", "c_one"))
def sweep_fused_staggered(x, cp_x_y, gram_flat, l_aug, n_stack, beta, fitted,
                          theta8, pm8, zeta, q_mask, sig2_beta, tau, c, kz,
                          block_size: int = 128, q_tile: int = 1024,
                          sub: int = 16, qchunk: int = 512,
                          emit_gam_mu: bool = True, c_one: bool = True):
    """Staggered sweep as a single pallas_call; same contract as
    ops/sweep_fused.py:sweep_fused (returns beta', gam'|None, mu'|None,
    fitted', z_row, z_col, colstats)."""
    n, p = x.shape
    q = beta.shape[1]
    nb = p // block_size
    qtiles = q // q_tile
    dt = beta.dtype
    r_aug = l_aug.shape[1]
    sub = min(sub, block_size)
    assert block_size % sub == 0, (block_size, sub)
    assert q_tile % 2 == 0 and (q_tile // 2) % 128 == 0, q_tile
    interpret = jax.devices()[0].platform == "cpu"

    scal = jnp.stack([jnp.asarray(c, dt), jnp.asarray(n - 1.0, dt),
                      jnp.asarray(kz, dt)])

    def clamp_cur(fn):
        return lambda t_, b_: fn(t_, jnp.minimum(b_, nb - 1))

    def clamp_prev(fn):
        return lambda t_, b_: fn(t_, jnp.maximum(b_ - 1, 0))

    tile_idx = lambda t_, b_: (b_, t_)
    tile = lambda idx: pl.BlockSpec((block_size, q_tile), idx,
                                    memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec((1, q_tile), lambda t_, b_: (0, t_),
                               memory_space=pltpu.VMEM)
    bvec = lambda idx: pl.BlockSpec((1, 8, block_size), idx,
                                    memory_space=pltpu.VMEM)
    bvec_idx = lambda t_, b_: (b_, 0, 0)
    xspec = lambda idx: pl.BlockSpec((n, block_size), idx,
                                     memory_space=pltpu.VMEM)
    xidx = lambda t_, b_: (0, b_)
    gspec = lambda idx: pl.BlockSpec((block_size, block_size), idx,
                                     memory_space=pltpu.VMEM)
    gidx = lambda t_, b_: (b_, 0)
    lspec = lambda idx: pl.BlockSpec((block_size, r_aug), idx,
                                     memory_space=pltpu.VMEM)

    if emit_gam_mu:
        gm_specs = [tile(clamp_prev(tile_idx)), tile(clamp_prev(tile_idx))]
        gm_shapes = [jax.ShapeDtypeStruct((p, q), dt),
                     jax.ShapeDtypeStruct((p, q), dt)]
    else:
        gm_specs = [pl.BlockSpec((block_size, q_tile),
                                 lambda t_, b_: (0, 0),
                                 memory_space=pltpu.VMEM) for _ in range(2)]
        gm_shapes = [jax.ShapeDtypeStruct((block_size, q_tile), dt)
                     for _ in range(2)]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),          # scal
        xspec(clamp_cur(xidx)),                         # x (block b)
        xspec(clamp_prev(xidx)),                        # x (block b-1)
        gspec(clamp_cur(gidx)),                         # gram (b)
        gspec(clamp_prev(gidx)),                        # gram (b-1)
        lspec(clamp_cur(gidx)),                         # l_aug (b)
        lspec(clamp_prev(gidx)),                        # l_aug (b-1)
        pl.BlockSpec((3, r_aug, q_tile), lambda t_, b_: (0, 0, t_),
                     memory_space=pltpu.VMEM),          # nodes
        tile(clamp_cur(tile_idx)),                      # cp (b)
        tile(clamp_prev(tile_idx)),                     # cp (b-1)
        tile(clamp_cur(tile_idx)),                      # beta (b)
        tile(clamp_prev(tile_idx)),                     # beta (b-1)
        vec(), vec(), vec(),                            # s2, tau, zeta
        bvec(clamp_cur(bvec_idx)),                      # theta8 (b)
        bvec(clamp_prev(bvec_idx)),                     # theta8 (b-1)
        bvec(clamp_cur(bvec_idx)),                      # pm8 (b)
        bvec(clamp_prev(bvec_idx)),                     # pm8 (b-1)
        vec(),                                          # q_mask
        pl.BlockSpec(memory_space=pl.ANY),              # fitted (HBM)
    ]
    operands = [scal, x, x, gram_flat, gram_flat, l_aug, l_aug, n_stack,
                cp_x_y, cp_x_y, beta, beta,
                sig2_beta[None, :], tau[None, :], zeta[None, :],
                theta8, theta8, pm8, pm8, q_mask[None, :], fitted]
    half = q_tile // 2
    hbuf = lambda: pltpu.VMEM((block_size, half), dt)
    scratch = ([pltpu.VMEM((n, q_tile), dt)]          # F tile
               + [hbuf() for _ in range(7)]           # A: r,d,g,m,ad,im,i0
               + [hbuf() for _ in range(7)]           # B: r,d,g,m,ad,im,i0
               + [hbuf() for _ in range(3)]           # gamAb, muAb, zAb
               + [pltpu.VMEM((1, p), dt)])            # z_row accumulator

    out = pl.pallas_call(
        functools.partial(_stag_kernel, nb=nb, qtiles=qtiles, sub=sub,
                          qchunk=qchunk, emit=emit_gam_mu, c_one=c_one),
        grid=(qtiles, nb + 1),
        in_specs=in_specs,
        out_specs=(tile(clamp_prev(tile_idx)), *gm_specs,
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, p), lambda t_, b_: (0, 0),
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
        # fitted aliases f_out (read once at step 0, written at the drain
        # step).  beta is NOT aliased: it is read through two windows (b
        # and b-1) while the output writes block b-1 — aliasing would
        # force XLA to copy the whole array defensively.
        input_output_aliases={20: 3},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    beta_out, gam_out, mu_out, f_out, zrow, zcol, gcol, m2gcol, b2col = out
    if emit_gam_mu:
        gam_out_r, mu_out_r = gam_out, mu_out
    else:
        gam_out_r = mu_out_r = None
    return (beta_out, gam_out_r, mu_out_r, f_out, zrow[0], zcol[0],
            (gcol[0], m2gcol[0], b2col[0]))


def sweep_complete_staggered(x, cp_x_y, gram_blocks, beta, fitted,
                             consts, block_size, p_mask=None, q_mask=None,
                             q_tile: int = 1024, sub: int = 16,
                             qchunk: int = 512, interp_r: int = 40,
                             emit_gam_mu: bool = True,
                             annealed: bool = False):
    """Driver-facing wrapper matching sweep_complete_fused."""
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
    cst = -0.5 * (consts.log_tau + consts.log_sig2_inv
                  + jnp.log(consts.sig2_beta))
    l_aug, n_stack, kz = tail_interp_operands(
        consts.theta, consts.zeta, cst, consts.c, p_mask, r=interp_r)
    return sweep_fused_staggered(
        x, cp_x_y, gram_flat, l_aug, n_stack, beta, fitted, theta8, pm8,
        consts.zeta, q_mask, consts.sig2_beta, consts.tau, consts.c, kz,
        block_size=block_size, q_tile=q_tile, sub=sub, qchunk=qchunk,
        emit_gam_mu=emit_gam_mu, c_one=not annealed)
