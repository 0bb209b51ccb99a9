"""Evidence lower bound — 8-term assembly for the global-local model.

TPU-native re-design of R/elbo.R + elbo_global_local_
(R/atlasqtl_global_local_core.R:440-495): the O(pq) terms are evaluated
blockwise with a lax.scan (log-Phi recomputed per block, never materialized at
p x q), reductions accumulate in `elbo_dtype` (float64 by default) so the
monotonicity guard stays meaningful even when the sweep runs in float32.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .special import log_ndtr_both, q_approx
from . import updates as upd
from .horseshoe import log_integral_hs

_EPS_GAM = jnp.finfo(jnp.float64).eps ** 0.75  # reference: R/elbo.R:15


def _xlogx(g):
    # The where-guard keeps XLA's algebraic simplifier from reassociating
    # (1 - g) + eps into (1 + eps) - g and constant-folding 1 + eps -> 1,
    # which turns this into 0 * log(0) = NaN at g == 1 under fusion.
    return g * jnp.log(jnp.where(g > 0, g + _EPS_GAM, _EPS_GAM))


def e_beta_gamma_blocked(gam_b, mu_b, theta_b, zeta, log_tau, tau, sig2_beta,
                         log_sig2_inv, sig2_inv, sig2_zeta, sig2_theta_b,
                         mask_b, q_mask, dtype):
    """Per-block contribution to E log p(beta,gamma|.) - E log q(beta,gamma)
    (reference: R/elbo.R:10-34).  All inputs cast to the accumulation dtype.
    gam_b/mu_b: (B, q); theta_b/sig2_theta_b/mask_b: (B,)."""
    f = lambda a: jnp.asarray(a, dtype)
    gam_b, mu_b = f(gam_b), f(mu_b)
    s2_b = f(sig2_beta)  # (B, q) block of the slab variance
    u = f(theta_b)[:, None] + f(zeta)[None, :]
    log_p, log_1p = log_ndtr_both(u)
    m2_b = (mu_b * mu_b + s2_b) * gam_b
    arg = (
        f(log_sig2_inv) * gam_b / 2.0
        + gam_b * f(log_tau)[None, :] / 2.0
        - m2_b * f(tau)[None, :] * f(sig2_inv) / 2.0
        + gam_b * log_p
        + (1.0 - gam_b) * log_1p
        - f(sig2_zeta) / 2.0
        - _xlogx(gam_b) - _xlogx(1.0 - gam_b)
        - f(sig2_theta_b)[:, None] / 2.0
        + 0.5 * gam_b * (jnp.log(s2_b) + 1.0)
    )
    cell_mask = f(mask_b)[:, None] * f(q_mask)[None, :]
    return jnp.sum(arg * cell_mask)


def e_theta_hs(lam2_inv, l_vb, log_sig02_inv_shr, theta, q_app, sig02_inv_shr,
               sig2_theta, p_mask, df: int):
    """E log p(theta|.) - E log q(theta) under the horseshoe
    (reference: R/elbo.R:85-128; m0 = 0)."""
    quad = sig02_inv_shr * lam2_inv * (theta * theta + sig2_theta) / 2.0
    if df == 1:
        per_j = (log_sig02_inv_shr / 2.0 - quad
                 + (jnp.log(sig2_theta) + 1.0) / 2.0
                 - jnp.log(jnp.pi) + l_vb * lam2_inv + jnp.log(q_app))
    elif df == 3:
        log_b = jnp.log(9.0) - jnp.log(q_app * (1.0 + l_vb) - 1.0)
        per_j = (jnp.log(6.0) + jnp.log(3.0) / 2.0 - jnp.log(jnp.pi) - log_b
                 + df * l_vb * lam2_inv + log_sig02_inv_shr / 2.0 - quad
                 + (jnp.log(sig2_theta) + 1.0) / 2.0)
    else:
        expo = (df + 1) / 2
        log_b = -log_integral_hs(df, l_vb * df, m=expo, n=expo - 1)
        per_j = (-jnp.log(jnp.pi) / 2.0 - gammaln(df / 2.0)
                 + df * jnp.log(float(df)) / 2.0 + gammaln((df - 1) / 2.0 + 1.0)
                 - log_b + df * l_vb * lam2_inv
                 + log_sig02_inv_shr / 2.0 - quad
                 + (jnp.log(sig2_theta) + 1.0) / 2.0)
    return jnp.sum(per_j * p_mask)


def e_sig2_inv(nu, nu_vb, log_sig2_inv_vb, rho, rho_vb, sig2_inv_vb):
    """Generic Gamma-factor KL-style term (reference: R/elbo.R:41-46)."""
    return ((nu - nu_vb) * log_sig2_inv_vb - (rho - rho_vb) * sig2_inv_vb
            + nu * jnp.log(rho) - nu_vb * jnp.log(rho_vb)
            - gammaln(nu) + gammaln(nu_vb))


def e_sig2_inv_hs(xi_inv, nu_s0_vb, log_xi_inv, log_sig02_inv, rho_s0_vb,
                  sig02_inv):
    """Horseshoe global-scale term (reference: R/elbo.R:49-56)."""
    return (-0.5 * log_sig02_inv - xi_inv * sig02_inv + log_xi_inv / 2.0
            - gammaln(0.5) - (nu_s0_vb - 1.0) * log_sig02_inv
            + rho_s0_vb * sig02_inv - nu_s0_vb * jnp.log(rho_s0_vb)
            + gammaln(nu_s0_vb))


def e_tau(eta, eta_vb, kappa, kappa_vb, log_tau_vb, tau_vb, q_mask):
    """Residual-precision term (reference: R/elbo.R:63-68)."""
    per_k = ((eta - eta_vb) * log_tau_vb - (kappa - kappa_vb) * tau_vb
             + eta * jnp.log(kappa) - eta_vb * jnp.log(kappa_vb)
             - gammaln(eta) + gammaln(eta_vb))
    return jnp.sum(per_k * q_mask)


def e_y(n_eff, kappa, kappa_vb, log_tau_vb, m2b_colsum, sig2_inv, tau_vb,
        q_mask):
    """E log p(y|.) (reference: R/elbo.R:135-146); n_eff = n for complete
    data, colSums(mis_pat) otherwise."""
    arg = n_eff * (log_tau_vb - jnp.log(2.0 * jnp.pi)) / 2.0
    per_k = arg - tau_vb * (kappa_vb - m2b_colsum * sig2_inv / 2.0 - kappa)
    return jnp.sum(per_k * q_mask)


def e_zeta(zeta, n0, sig2_zeta, t02_inv, vec_sum_log_det_zeta, q_true, q_mask):
    """Response-propensity term (reference: R/elbo.R:153-161)."""
    ss = jnp.sum((zeta - n0) ** 2 * q_mask)
    return (vec_sum_log_det_zeta - t02_inv * ss
            - q_true * t02_inv * sig2_zeta + q_true) / 2.0


def e_theta_global(theta, sig02_inv_shr, sig2_theta, vec_sum_log_det_theta,
                   p_mask, p_true):
    """Global-only variant theta term (reference: R/elbo.R:75-82; m0 = 0).
    vec_sum_log_det_theta is the summed log-determinant term."""
    ss = jnp.sum(theta * theta * p_mask)
    tr = sig02_inv_shr * jnp.sum(sig2_theta * p_mask)
    return (vec_sum_log_det_theta - sig02_inv_shr * ss - tr + p_true) / 2.0
