"""Closed-form VB updates, vectorized (TPU-native re-design of R/update_vb.R).

Each function mirrors one variational-factor update of the reference; all are
pure, batched over the full (p, q) problem, and jit-safe.  The annealing
inverse temperature `c` enters exactly as in the reference (tempered natural
parameters).

Masking convention: padded predictors/responses carry mask 0 and are excluded
from every reduction, so padding to TPU tile sizes never changes the math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma

from .special import inv_mills_ratio, log_ndtr_both


# -------------------------------------------------------------- beta moments

def beta_mean(gam, mu_beta):
    """E[beta] = gam * mu (reference: R/update_vb.R:17)."""
    return gam * mu_beta


def m2_beta(gam, mu_beta, sig2_beta):
    """E[beta^2] = gam * (mu^2 + sig2) (reference: R/update_vb.R:19-31).
    sig2_beta broadcasts: (q,) or (p, q)."""
    return (mu_beta * mu_beta + sig2_beta) * gam


def sig2_beta_update(n, sig2_inv, tau, x_norm_sq=None, c=1.0):
    """Posterior slab variance (reference: R/update_vb.R:33-50).
    Complete data: 1/(c (n-1+sig2_inv) tau) -> (q,).
    Missing data:  1/(c (X_norm_sq + sig2_inv) tau) -> (p, q)."""
    if x_norm_sq is None:
        return 1.0 / (c * (n - 1.0 + sig2_inv) * tau)
    return 1.0 / (c * (x_norm_sq + sig2_inv) * tau[None, :])


# ------------------------------------------------------------ gamma factors

def nu_update(nu, sum_gam, c=1.0):
    """Slab-precision shape (reference: R/update_vb.R:116)."""
    return c * (nu + 0.5 * sum_gam) - c + 1.0


def rho_update(rho, m2b_colsum, tau, q_mask, c=1.0):
    """Slab-precision rate (reference: R/update_vb.R:118)."""
    return c * (rho + 0.5 * jnp.sum(tau * m2b_colsum * q_mask))


def eta_update(n_eff, eta, gam_colsum, c=1.0):
    """Residual-precision shape; n_eff = colSums(mis_pat) or n
    (reference: R/update_vb.R:127-134)."""
    return c * (eta + 0.5 * n_eff + 0.5 * gam_colsum) - c + 1.0


def kappa_update(n, y_norm_sq, yF_colsum, FF_colsum, kappa, m2b_colsum,
                 beta2_colsum, sig2_inv, c=1.0, x_norm_sq_m2b=None,
                 x_norm_sq_beta2=None):
    """Residual-precision rate (reference: R/update_vb.R:136-157), in the
    n-space formulation:

      colSums(beta * t(cp_Y_X))      == colSums(Y * F)      (yF_colsum)
      colSums(cp_X_Xbeta * beta_vb)  == colSums(F * F)      (FF_colsum)

    where F = X beta (masked when data are missing).  For complete data the
    per-column Gram diagonal is exactly n-1 (X standardized), giving the
    (n - 1 + sig2_inv) term; the missing-data variant substitutes the
    per-(j,k) X_norm_sq reductions.
    """
    if x_norm_sq_m2b is None:
        quad = (n - 1.0 + sig2_inv) * m2b_colsum + FF_colsum \
            - (n - 1.0) * beta2_colsum
    else:
        quad = sig2_inv * m2b_colsum + x_norm_sq_m2b + FF_colsum \
            - x_norm_sq_beta2
    return c * (kappa + 0.5 * (y_norm_sq - 2.0 * yF_colsum + quad))


def log_gamma_mean(shape, rate):
    """E[log g] for g ~ Gamma(shape, rate): digamma(shape) - log(rate)
    (reference: R/update_vb.R:120,159)."""
    return digamma(shape) - jnp.log(rate)


# ----------------------------------------------------------- probit factors

def sig2_c0_update(d, s02, c=1.0):
    """1 / (c (d + 1/s02)) (reference: R/update_vb.R:92)."""
    return 1.0 / (c * (d + 1.0 / s02))


def _z_block(gam_b, theta_b, zeta, p_mask_b, q_mask, sqrt_c):
    u = sqrt_c * (theta_b[:, None] + zeta[None, :])
    log_p, log_1p = log_ndtr_both(u)
    imr0 = inv_mills_ratio(0, u, log_1p, log_p)
    imr1 = inv_mills_ratio(1, u, log_1p, log_p)
    z = ((gam_b * (imr1 - imr0) + imr0) / sqrt_c
         + (theta_b[:, None] + zeta[None, :]))
    z = z * p_mask_b[:, None] * q_mask[None, :]
    return jnp.sum(z, axis=1), jnp.sum(z, axis=0)


def z_moments(gam, theta, zeta, p_mask, q_mask, c=1.0, block_size=None):
    """Row/column sums of the truncated-normal latent posterior mean Z
    (reference: R/update_vb.R:217-234) without materializing the p x q
    matrices of Z or log Phi — recomputed blockwise (lax.scan over predictor
    blocks) and fused into the reductions.  Returns (row_sums (p,),
    col_sums (q,)).

    Under annealing (c != 1) the probit argument is sqrt(c) (theta + zeta) and
    the inverse-Mills term is rescaled by 1/sqrt(c).
    """
    sqrt_c = jnp.sqrt(c)
    p, q = gam.shape
    if block_size is None or p % block_size != 0 or p <= block_size:
        return _z_block(gam, theta, zeta, p_mask, q_mask, sqrt_c)
    nb = p // block_size
    gam_b = gam.reshape(nb, block_size, q)
    theta_b = theta.reshape(nb, block_size)
    pm_b = p_mask.reshape(nb, block_size)

    def step(col_acc, inp):
        g, th, pm = inp
        row, col = _z_block(g, th, zeta, pm, q_mask, sqrt_c)
        return col_acc + col, row

    col_sum, rows = jax.lax.scan(step, jnp.zeros(q, gam.dtype),
                                 (gam_b, theta_b, pm_b))
    return rows.reshape(p), col_sum


def theta_update(z_rowsum, m0, sig02_lam_inv, sig2_theta, zeta_sum, c=1.0):
    """Hotspot propensity posterior mean (reference: R/update_vb.R:166-210,
    diagonal-Sigma_0 branch)."""
    return c * sig2_theta * (z_rowsum + sig02_lam_inv * m0 - zeta_sum)


def zeta_update(z_colsum, theta_sum, n0, sig2_zeta, t02_inv, c=1.0):
    """Response propensity posterior mean (reference: R/update_vb.R:99-110)."""
    return c * sig2_zeta * (z_colsum + t02_inv * n0 - theta_sum)
