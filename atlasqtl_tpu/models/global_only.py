"""Global-scale-only CAVI variant (no local horseshoe scales).

TPU-native re-design of `atlasqtl_global_core_`
(R/atlasqtl_global_core.R:8-421): conjugate inverse-gamma update for the
hotspot-propensity global scale, Cauchy prior via nu_s0 = rho_s0 = 1/2.  The
reference keeps this path as (dead) code behind the hard-coded hs=TRUE switch
(R/atlasqtl.R:267-270); here it is a first-class model selected with
atlasqtl(..., model="global").

Note the update ordering differs from the global-local path: theta and zeta
are refreshed BEFORE the global scale (R/atlasqtl_global_core.R:229-244),
and sig2_theta uses the previous iteration's sig02_inv.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Config, Data, Hyper, VBState
from ..ops import updates as upd
from ..ops import elbo as elbo_ops
from ..ops.sweep import SweepConsts, sweep_complete, sweep_missing
from ..ops.special import q_approx
from .global_local import _colsum_stats

NU_S0 = 0.5   # Cauchy prior for theta (R/atlasqtl_global_core.R:90)
RHO_S0 = 0.5


def _iteration_impl(data: Data, hyper: Hyper, state: VBState, gram_blocks,
                    c, c_s, *, cfg: Config, annealed: bool,
                    mesh=None, lite: bool = False) -> VBState:
    """One CAVI iteration of the global-only model
    (R/atlasqtl_global_core.R:117-271)."""
    del annealed  # no special-function branch in this variant
    del lite      # the global-only engines always emit fresh gam/mu
    dt = cfg.dtype
    c = jnp.asarray(c, dt)
    c_s = jnp.asarray(c_s, dt)
    shr = jnp.asarray(cfg.shr_fac_inv, dt)

    (gam_colsum, m2b_colsum, m2b, beta2_colsum, yf_colsum, ff_colsum,
     beta) = _colsum_stats(data, state)

    # VB-imputation of missing responses (missing="impute"): fold the
    # q(y_mis) moments into the complete-data sufficient statistics — the
    # same scheme as the global-local engine (models/global_local.py)
    impute = data.mis_pat is not None and data.x_norm_sq is None
    cp_x_y = data.cp_x_y
    y_norm_sq = data.y_norm_sq
    if impute:
        v_mis = 1.0 / (c * state.tau)
        y_eff = data.y + (1.0 - data.mis_pat) * state.fitted
        cp_x_y = jnp.einsum("np,nq->pq", data.x, y_eff,
                            preferred_element_type=dt)
        y_norm_sq = (jnp.einsum("nq,nq->q", y_eff, y_eff)
                     + data.n_mis * v_mis)
        yf_colsum = jnp.einsum("nq,nq->q", y_eff, state.fitted)

    sum_gam = jnp.sum(gam_colsum * data.q_mask)
    nu_vb = upd.nu_update(hyper.nu, sum_gam, c)
    rho_vb = upd.rho_update(hyper.rho, m2b_colsum, state.tau, data.q_mask, c)
    sig2_inv = nu_vb / rho_vb

    eta_vb = upd.eta_update(data.n_eff, hyper.eta, gam_colsum, c)
    if data.x_norm_sq is None:
        kappa_vb = upd.kappa_update(data.n, y_norm_sq, yf_colsum,
                                    ff_colsum, hyper.kappa, m2b_colsum,
                                    beta2_colsum, sig2_inv, c)
    else:
        xns_m2b = jnp.einsum("pq,pq->q", data.x_norm_sq, m2b)
        xns_b2 = jnp.einsum("pq,pq->q", data.x_norm_sq, beta * beta)
        kappa_vb = upd.kappa_update(data.n, data.y_norm_sq, yf_colsum,
                                    ff_colsum, hyper.kappa, m2b_colsum,
                                    beta2_colsum, sig2_inv, c,
                                    x_norm_sq_m2b=xns_m2b,
                                    x_norm_sq_beta2=xns_b2)
    tau = eta_vb / kappa_vb
    sig2_beta = upd.sig2_beta_update(data.n, sig2_inv, tau, data.x_norm_sq, c)
    log_tau = upd.log_gamma_mean(eta_vb, kappa_vb)
    log_sig2_inv = upd.log_gamma_mean(nu_vb, rho_vb)

    consts = SweepConsts(sig2_beta=sig2_beta, tau=tau, log_tau=log_tau,
                         log_sig2_inv=log_sig2_inv, theta=state.theta,
                         zeta=state.zeta, c=c)
    beta_new = colstats = None
    if data.x_norm_sq is None:  # complete data or VB-impute
        block = gram_blocks.shape[1]
        gam_new, mu_new, fitted, z_row, z_col = sweep_complete(
            data.x, cp_x_y, gram_blocks, state.gam, state.mu_beta,
            state.fitted, consts, block,
            p_mask=data.p_mask, q_mask=data.q_mask)
        gam_new = gam_new * data.p_mask[:, None] * data.q_mask[None, :]
        mu_new = mu_new * data.p_mask[:, None] * data.q_mask[None, :]
        # carry the same column statistics / beta product as the
        # global-local engine so the state pytree structure is loop-stable
        # (device-resident scan/while_loop) and the next iteration skips
        # the (p, q) einsums
        beta_new = gam_new * mu_new
        colstats = (jnp.sum(gam_new, axis=0),
                    jnp.einsum("pq,pq->q", mu_new * mu_new, gam_new),
                    jnp.einsum("pq,pq->q", beta_new, beta_new))
    else:
        gam_new, mu_new, fitted = sweep_missing(
            data.x, data.cp_x_y, data.x_norm_sq, data.mis_pat, state.gam,
            state.mu_beta, state.fitted, consts)
        gam_new = gam_new * data.p_mask[:, None] * data.q_mask[None, :]
        mu_new = mu_new * data.p_mask[:, None] * data.q_mask[None, :]
        z_row, z_col = upd.z_moments(gam_new, state.theta, state.zeta,
                                     data.p_mask, data.q_mask, c,
                                     block_size=cfg.block_size)

    # theta/zeta with the PREVIOUS global scale (R/atlasqtl_global_core.R:229-235)
    # (a scalar in the reference — one value for all predictors — broadcast
    # to (p,) so the state layout matches the global-local variant)
    sig2_theta = jnp.broadcast_to(
        upd.sig2_c0_update(data.q_true, 1.0 / (state.sig02_inv * shr), c),
        data.p_mask.shape)
    zeta_sum = jnp.sum(state.zeta * data.q_mask)
    theta = upd.theta_update(z_row, hyper.m0, state.sig02_inv * shr,
                             sig2_theta, zeta_sum, c) * data.p_mask
    sig2_zeta = upd.sig2_c0_update(data.p_true, hyper.t02, c)
    zeta = upd.zeta_update(z_col, jnp.sum(theta), hyper.n0, sig2_zeta,
                           1.0 / hyper.t02, c) * data.q_mask

    # conjugate global-scale update (R/atlasqtl_global_core.R:241-244)
    nu_s0_vb = c_s * (NU_S0 + 0.5 * data.p_true) - c_s + 1.0
    rho_s0_vb = c_s * (RHO_S0 + 0.5 * jnp.sum(
        (sig2_theta + theta * theta) * data.p_mask))
    sig02_inv = nu_s0_vb / rho_s0_vb

    return VBState(
        gam=gam_new, mu_beta=mu_new, sig2_beta=sig2_beta, tau=tau,
        sig2_inv=sig2_inv, theta=theta, zeta=zeta, sig02_inv=sig02_inv,
        lam2_inv=state.lam2_inv, sig2_theta=sig2_theta, fitted=fitted,
        l_vb=state.l_vb, rho_xi_inv=state.rho_xi_inv, nu_s0_vb=nu_s0_vb,
        rho_s0_vb=rho_s0_vb, beta=beta_new,
        gam_colsum=None if colstats is None else colstats[0],
        mu2gam_colsum=None if colstats is None else colstats[1],
        beta2_colsum=None if colstats is None else colstats[2],
    )


cavi_iteration = partial(jax.jit,
                         static_argnames=("cfg", "annealed", "mesh", "lite"))(
    _iteration_impl)
cavi_iteration_donated = jax.jit(_iteration_impl,
                                 static_argnames=("cfg", "annealed", "mesh",
                                                  "lite"),
                                 donate_argnames=("state",))


@partial(jax.jit, static_argnames=("cfg",))
def compute_elbo(data: Data, hyper: Hyper, state: VBState, *,
                 cfg: Config) -> jnp.ndarray:
    """7-term ELBO of the global-only model (elbo_global_,
    R/atlasqtl_global_core.R:372-421)."""
    dt = cfg.elbo_dtype if jax.config.jax_enable_x64 else cfg.dtype
    f = lambda a: jnp.asarray(a, dt)
    shr = jnp.asarray(cfg.shr_fac_inv, dt)

    state64 = jax.tree_util.tree_map(f, state)
    data64 = jax.tree_util.tree_map(lambda a: None if a is None else f(a),
                                    data)
    hyper64 = jax.tree_util.tree_map(f, hyper)

    (gam_colsum, m2b_colsum, m2b, beta2_colsum, yf_colsum, ff_colsum,
     beta) = _colsum_stats(data64, state64, use_cached=False)
    sum_gam = jnp.sum(gam_colsum * data64.q_mask)

    # VB-impute: re-derived q(y_mis) moments + imputation-factor entropy
    # (same family as models/global_local.py:compute_elbo)
    impute = data.mis_pat is not None and data.x_norm_sq is None
    y_norm_sq = data64.y_norm_sq
    entropy_y_mis = jnp.zeros((), dt)
    if impute:
        n_mis = f(data.n_mis)
        v_mis = 1.0 / state64.tau
        y_eff = data64.y + (1.0 - data64.mis_pat) * state64.fitted
        y_norm_sq = jnp.einsum("nq,nq->q", y_eff, y_eff) + n_mis * v_mis
        yf_colsum = jnp.einsum("nq,nq->q", y_eff, state64.fitted)
        entropy_y_mis = 0.5 * jnp.sum(
            n_mis * (jnp.log(2.0 * jnp.pi * v_mis) + 1.0) * data64.q_mask)

    eta_vb = upd.eta_update(data64.n_eff, hyper64.eta, gam_colsum)
    if data64.x_norm_sq is None:
        kappa_vb = upd.kappa_update(data64.n, y_norm_sq, yf_colsum,
                                    ff_colsum, hyper64.kappa, m2b_colsum,
                                    beta2_colsum, state64.sig2_inv)
    else:
        xns_m2b = jnp.einsum("pq,pq->q", data64.x_norm_sq, m2b)
        xns_b2 = jnp.einsum("pq,pq->q", data64.x_norm_sq, beta * beta)
        kappa_vb = upd.kappa_update(data64.n, data64.y_norm_sq, yf_colsum,
                                    ff_colsum, hyper64.kappa, m2b_colsum,
                                    beta2_colsum, state64.sig2_inv,
                                    x_norm_sq_m2b=xns_m2b,
                                    x_norm_sq_beta2=xns_b2)
    nu_vb = upd.nu_update(hyper64.nu, sum_gam)
    rho_vb = upd.rho_update(hyper64.rho, m2b_colsum, state64.tau,
                            data64.q_mask)
    log_tau = upd.log_gamma_mean(eta_vb, kappa_vb)
    log_sig2_inv = upd.log_gamma_mean(nu_vb, rho_vb)
    log_sig02_inv = upd.log_gamma_mean(state64.nu_s0_vb, state64.rho_s0_vb)

    t02_inv = 1.0 / hyper64.t02
    sig2_zeta = 1.0 / (data64.p_true + t02_inv)
    vsld_zeta = -data64.q_true * (jnp.log(hyper64.t02)
                                  + jnp.log(data64.p_true + t02_inv))
    # E log det of the theta prior/posterior covariances
    vsld_theta = data64.p_true * (log_sig02_inv + jnp.log(shr)) \
        + jnp.sum(jnp.log(state64.sig2_theta) * data64.p_mask)

    term_a = elbo_ops.e_y(data64.n_eff, hyper64.kappa, kappa_vb, log_tau,
                          m2b_colsum, state64.sig2_inv, state64.tau,
                          data64.q_mask)

    p_pad, q_pad = state.gam.shape
    from .global_local import divisor_block
    block = divisor_block(cfg.block_size, p_pad)
    nb = p_pad // block

    def bg_block(acc, idx):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * block, block, 0)
        s2b = state64.sig2_beta
        s2_blk = sl(s2b) if s2b.ndim == 2 else jnp.broadcast_to(
            s2b[None, :], (block, q_pad))
        return acc + elbo_ops.e_beta_gamma_blocked(
            sl(state64.gam), sl(state64.mu_beta), sl(state64.theta),
            state64.zeta, log_tau, state64.tau, s2_blk, log_sig2_inv,
            state64.sig2_inv, sig2_zeta, sl(state64.sig2_theta),
            sl(data64.p_mask), data64.q_mask, dt), None

    term_b, _ = jax.lax.scan(bg_block, jnp.zeros((), dt), jnp.arange(nb))

    term_c = elbo_ops.e_theta_global(state64.theta, state64.sig02_inv * shr,
                                     state64.sig2_theta, vsld_theta,
                                     data64.p_mask, data64.p_true)
    term_d = elbo_ops.e_zeta(state64.zeta, hyper64.n0, sig2_zeta, t02_inv,
                             vsld_zeta, data64.q_true, data64.q_mask)
    term_e = elbo_ops.e_tau(hyper64.eta, eta_vb, hyper64.kappa, kappa_vb,
                            log_tau, state64.tau, data64.q_mask)
    term_f = elbo_ops.e_sig2_inv(hyper64.nu, nu_vb, log_sig2_inv, hyper64.rho,
                                 rho_vb, state64.sig2_inv)
    term_g = elbo_ops.e_sig2_inv(jnp.asarray(NU_S0, dt), state64.nu_s0_vb,
                                 log_sig02_inv, jnp.asarray(RHO_S0, dt),
                                 state64.rho_s0_vb, state64.sig02_inv)
    return (term_a + term_b + term_c + term_d + term_e + term_f + term_g
            + entropy_y_mis)
