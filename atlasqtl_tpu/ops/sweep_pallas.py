"""Pallas TPU kernel for the within-block Gauss-Seidel coordinate sweep.

TPU-native replacement for the reference's C++ hot loop
(src/coreLoop.cpp:38-86): the strictly-sequential B-coordinate update runs
entirely in VMEM on (B, QT) response tiles, with the response grid dimension
embarrassingly parallel (the reference's k-loop carries no cross-k state).
The surrounding per-block MXU matmuls (residual projection X_b^T F and the
fitted-matrix advance F += X_b delta) stay in XLA — see ops/sweep.py for the
algebra and the exactness argument.

The XLA lax.fori_loop version of this inner loop spends ~80% of the sweep in
per-step dispatch overhead (B tiny vector ops per coordinate); fusing it into
one kernel per (block, response-tile) removes that entirely.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _inner_gs_kernel(scal_ref, diag_ref, r0_ref, cp_ref, logp_ref, log1p_ref,
                     g_ref, gam_ref, mu_ref, s2_ref, tau_ref, logtau_ref,
                     gam_out_ref, mu_out_ref, delta_out_ref, r_scr):
    """One (B, QT) tile: sequential Gauss-Seidel over the B coordinates.

    scal_ref (SMEM, (2,)): [c, log_sig2_inv]; diag_ref (SMEM, (B,)): Gram
    diagonal (dynamic scalar reads must go through a ref on Mosaic).
    r0/cp/logp/log1p/gam/mu: (B, QT); g: (B, B); s2/tau/logtau: (1, QT).
    Outputs: updated gam/mu and delta = beta_new - beta_old (B, QT).
    """
    c = scal_ref[0]
    log_sig2_inv = scal_ref[1]

    s2 = s2_ref[0, :]                    # (QT,)
    ct = c * s2 * tau_ref[0, :]          # (QT,)
    cst = -(logtau_ref[0, :] + log_sig2_inv + jnp.log(s2)) / 2.0
    inv_2s2 = 0.5 / s2

    r_scr[:, :] = r0_ref[:, :]
    gam_out_ref[:, :] = gam_ref[:, :]
    mu_out_ref[:, :] = mu_ref[:, :]

    b = r0_ref.shape[0]
    # hierarchical sub-blocking: within a sub-block the rank-1 residual
    # corrections touch only the sub-block's rows (S x QT VPU work per
    # coordinate instead of B x QT); corrections to the remaining rows are
    # applied once per sub-block as a small MXU matmul.  Update order — and
    # therefore the math — is exactly the flat Gauss-Seidel order: rows of a
    # later sub-block are only read after every earlier sub-block's deferred
    # update has landed.
    sub = 32 if (b % 32 == 0 and b > 32) else b
    n_sub = b // sub

    for s in range(n_sub):
        lo = s * sub

        def body(i, _, lo=lo):
            row = lo + i
            gam_i = gam_out_ref[row, :]
            mu_i = mu_out_ref[row, :]
            beta_old = gam_i * mu_i
            # block Gram is symmetric: row == column (dynamic row reads
            # lower cleanly on Mosaic; dynamic column reads do not)
            g_seg = g_ref[row, lo:lo + sub]          # (S,)
            r_i = r_scr[row, :] - beta_old * diag_ref[row]
            mu_new = ct * (cp_ref[row, :] - r_i)
            logit = c * (log1p_ref[row, :] - logp_ref[row, :]
                         - mu_new * mu_new * inv_2s2 + cst)
            gam_new = jax.nn.sigmoid(-logit)
            delta = gam_new * mu_new - beta_old
            r_scr[lo:lo + sub, :] = (r_scr[lo:lo + sub, :]
                                     + g_seg[:, None] * delta[None, :])
            gam_out_ref[row, :] = gam_new
            mu_out_ref[row, :] = mu_new
            delta_out_ref[row, :] = delta
            return 0

        jax.lax.fori_loop(0, sub, body, 0)

        if lo + sub < b:
            # deferred rank-S update of the not-yet-visited rows (MXU)
            g_rest = g_ref[lo + sub:, lo:lo + sub]        # (B-lo-S, S)
            delta_sub = delta_out_ref[lo:lo + sub, :]     # (S, QT)
            r_scr[lo + sub:, :] = r_scr[lo + sub:, :] + jnp.dot(
                g_rest, delta_sub, preferred_element_type=r_scr.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile",))
def inner_gs_pallas(r0, g_b, cp_b, gam_b, mu_b, log_p, log_1p, sig2_beta,
                    tau, log_tau, c, log_sig2_inv, q_tile: int = 512):
    """Pallas-dispatch of the inner sweep for one predictor block.

    r0/cp_b/gam_b/mu_b/log_p/log_1p: (B, q); g_b: (B, B);
    sig2_beta/tau/log_tau: (q,); c/log_sig2_inv: scalars.
    Returns (gam_new, mu_new, delta) each (B, q).
    """
    b, q = r0.shape
    q_tile = min(q_tile, q)
    if q % q_tile != 0:
        # fall back to the largest power-of-two tile dividing q; the caller
        # should pad q to a multiple of 512 (build_data q_pad_to) for best
        # layout
        for cand in (256, 128, 64, 32, 16, 8):
            if q % cand == 0:
                q_tile = cand
                break
        else:
            raise ValueError(
                f"q={q} has no supported tile size; pad q to a multiple "
                "of 512 (build_data(..., q_pad_to=512))")
    grid = (q // q_tile,)
    dt = r0.dtype
    # interpret mode lets the same kernel run in tests on CPU
    interpret = jax.devices()[0].platform == "cpu"

    scal = jnp.stack([jnp.asarray(c, dt), jnp.asarray(log_sig2_inv, dt)])
    diag = jnp.diagonal(g_b)

    tile = lambda: pl.BlockSpec((b, q_tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec((1, q_tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec((b, b), lambda t: (0, 0),
                                memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _inner_gs_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # diag
            tile(), tile(), tile(), tile(),          # r0, cp, logp, log1p
            full(),                                  # g
            tile(), tile(),                          # gam, mu
            vec(), vec(), vec(),                     # s2, tau, logtau
        ],
        out_specs=(tile(), tile(), tile()),
        out_shape=(
            jax.ShapeDtypeStruct((b, q), dt),
            jax.ShapeDtypeStruct((b, q), dt),
            jax.ShapeDtypeStruct((b, q), dt),
        ),
        scratch_shapes=[pltpu.VMEM((b, q_tile), dt)],
        interpret=interpret,
    )(scal, diag, r0, cp_b, log_p, log_1p, g_b, gam_b, mu_b,
      sig2_beta[None, :], tau[None, :], log_tau[None, :])
    return out


def sweep_complete_pallas(x, cp_x_y, gram_blocks, gam, mu_beta, fitted,
                          consts, block_size, q_tile: int = 1024,
                          p_mask=None, q_mask=None):
    """Full sweep with the Pallas inner kernel (complete-data path).
    Same scan structure, math and fused Z-moment reductions as
    ops/sweep.py:sweep_complete."""
    from .special import log_ndtr_both
    from .sweep import _z_block_sums

    n, p = x.shape
    q = gam.shape[1]
    nb = p // block_size
    fuse_z = p_mask is not None
    xt_b = jnp.moveaxis(x.reshape(n, nb, block_size), 1, 0)  # (nb, n, B)
    cp_b = cp_x_y.reshape(nb, block_size, q)
    gam_b = gam.reshape(nb, block_size, q)
    mu_b = mu_beta.reshape(nb, block_size, q)
    theta_b = consts.theta.reshape(nb, block_size)
    pm_b = (p_mask.reshape(nb, block_size) if fuse_z
            else jnp.ones((nb, block_size), gam.dtype))

    def step(carry, inp):
        fitted, z_col = carry
        xb, cpb, gamb, mub, gb, thb, pmb = inp
        u = thb[:, None] + consts.zeta[None, :]
        log_p, log_1p = log_ndtr_both(u)
        r0 = jnp.einsum("ni,nq->iq", xb, fitted,
                        preferred_element_type=fitted.dtype)
        gamb, mub, delta = inner_gs_pallas(
            r0, gb, cpb, gamb, mub, log_p, log_1p, consts.sig2_beta,
            consts.tau, consts.log_tau, consts.c, consts.log_sig2_inv,
            q_tile=q_tile)
        fitted = fitted + jnp.einsum("ni,iq->nq", xb, delta,
                                     preferred_element_type=fitted.dtype)
        if fuse_z:
            masked_gam = gamb * pmb[:, None] * q_mask[None, :]
            zr, zc = _z_block_sums(masked_gam, thb, consts.zeta, pmb, q_mask,
                                   consts.c)
            z_col = z_col + zc
        else:
            zr = jnp.zeros_like(thb)
        return (fitted, z_col), (gamb, mub, zr)

    (fitted, z_col), (gam_out, mu_out, z_rows) = jax.lax.scan(
        step, (fitted, jnp.zeros(q, fitted.dtype)),
        (xt_b, cp_b, gam_b, mu_b, gram_blocks, theta_b, pm_b))
    z_row = z_rows.reshape(p) if fuse_z else None
    return (gam_out.reshape(p, q), mu_out.reshape(p, q), fitted,
            z_row, z_col if fuse_z else None)
