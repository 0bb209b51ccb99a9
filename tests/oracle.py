"""Slow, direct NumPy float64 oracle of the reference CAVI math.

Independent per-coordinate transcription of the model's closed-form updates
(derived from the reference equations in R/update_vb.R, src/coreLoop.cpp and
R/atlasqtl_global_local_core.R) used to validate the blocked/vectorized JAX
engine: identical update ordering, Gram-space residual maintenance (the
reference's formulation) so that agreement with the n-space JAX path is a
genuine cross-check of the algebraic identity cp_betaX_X[j,k] = x_j^T F_k.
"""
from __future__ import annotations

import numpy as np
from scipy.special import log_ndtr, digamma, gammaln, exp1, ndtr


def log1pexp(x):
    return np.logaddexp(x, 0.0)


def q_approx(x):
    return exp1(x) * np.exp(x)


def inv_mills(y, u, log_1p, log_p):
    c = -0.5 * u * u - 0.5 * np.log(2 * np.pi)
    if y == 1:
        m = np.exp(c - log_p)
        return np.maximum(m, -u)
    m = -np.exp(c - log_1p)
    return np.minimum(m, -u)


class OracleState:
    def __init__(self, init, x, y, hyper, shr_fac_inv, df=1):
        self.x = x
        self.y0 = np.nan_to_num(y, nan=0.0)
        self.mis = None if not np.isnan(y).any() else (~np.isnan(y)).astype(float)
        self.n, self.p = x.shape
        self.q = y.shape[1]
        self.hyper = hyper
        self.shr = shr_fac_inv
        self.df = df

        self.gam = init.gam_vb.copy()
        self.mu = init.mu_beta_vb.copy()
        self.sig2_beta = init.sig2_beta_vb.copy()   # (q,) or (p, q) later
        self.tau = init.tau_vb.copy()
        self.theta = init.theta_vb.copy()
        self.zeta = init.zeta_vb.copy()
        self.sig02_inv = init.sig02_inv_vb
        self.sig2_theta = init.sig2_theta_vb.copy()
        self.lam2_inv = np.ones(self.p)
        self.sig2_inv = 1e-2

        self.cp_x = x.T @ x
        self.cp_x_y = x.T @ self.y0
        self.y_norm_sq = (self.y0 ** 2).sum(axis=0)
        if self.mis is not None:
            self.x_norm_sq = (x ** 2).T @ self.mis
            self.n_eff = self.mis.sum(axis=0)
            # per-response Gram corrections (the reference's cp_X_rm)
            self.cp_x_rm = [
                (x[self.mis[:, k] == 0].T @ x[self.mis[:, k] == 0])
                for k in range(self.q)
            ]
            self.sig2_beta = np.broadcast_to(
                self.sig2_beta[None, :], (self.p, self.q)).copy()
        else:
            self.x_norm_sq = None
            self.n_eff = np.full(self.q, float(self.n))
            self.cp_x_rm = None

        beta = self.gam * self.mu
        self.cp_x_xbeta = self.cp_x @ beta
        if self.cp_x_rm is not None:
            for k in range(self.q):
                self.cp_x_xbeta[:, k] -= self.cp_x_rm[k] @ beta[:, k]

    # ------------------------------------------------------------------
    def m2_beta(self):
        if self.sig2_beta.ndim == 1:
            return (self.mu ** 2 + self.sig2_beta[None, :]) * self.gam
        return (self.mu ** 2 + self.sig2_beta) * self.gam

    def iterate(self, c=1.0, c_s=None, annealed=False):
        h = self.hyper
        if c_s is None:
            c_s = c
        n, p, q = self.n, self.p, self.q
        beta = self.gam * self.mu
        m2b = self.m2_beta()

        nu_vb = c * (h.nu + self.gam.sum() / 2) - c + 1
        rho_vb = c * (h.rho + (self.tau * m2b.sum(axis=0)).sum() / 2)
        self.sig2_inv = nu_vb / rho_vb

        eta_vb = c * (h.eta + self.n_eff / 2 + self.gam.sum(axis=0) / 2) - c + 1
        diag_cp = (self.cp_x_xbeta * beta).sum(axis=0)
        if self.mis is None:
            quad = ((n - 1 + self.sig2_inv) * m2b.sum(axis=0) + diag_cp
                    - (n - 1) * (beta ** 2).sum(axis=0))
        else:
            quad = (self.sig2_inv * m2b.sum(axis=0)
                    + (self.x_norm_sq * m2b).sum(axis=0) + diag_cp
                    - (self.x_norm_sq * beta ** 2).sum(axis=0))
        kappa_vb = c * (h.kappa + (self.y_norm_sq
                                   - 2 * (beta * self.cp_x_y).sum(axis=0)
                                   + quad) / 2)
        self.tau = eta_vb / kappa_vb
        if self.mis is None:
            self.sig2_beta = 1.0 / (c * (n - 1 + self.sig2_inv) * self.tau)
        else:
            self.sig2_beta = 1.0 / (
                c * (self.x_norm_sq + self.sig2_inv) * self.tau[None, :])
        log_tau = digamma(eta_vb) - np.log(kappa_vb)
        log_sig2_inv = digamma(nu_vb) - np.log(rho_vb)
        self.eta_vb, self.kappa_vb = eta_vb, kappa_vb

        # --- sequential Gauss-Seidel sweep, fixed 0..q-1 x 0..p-1 order
        u = self.theta[:, None] + self.zeta[None, :]
        log_p_mat = log_ndtr(u)
        log_1p_mat = log_ndtr(-u)
        beta = self.gam * self.mu
        for k in range(q):
            cpk = self.cp_x if self.cp_x_rm is None else (
                self.cp_x - self.cp_x_rm[k])
            for j in range(p):
                s2 = (self.sig2_beta[k] if self.sig2_beta.ndim == 1
                      else self.sig2_beta[j, k])
                b_old = beta[j, k]
                r = self.cp_x_xbeta[j, k] - b_old * cpk[j, j]
                self.mu[j, k] = c * s2 * self.tau[k] * (self.cp_x_y[j, k] - r)
                logit = c * (log_1p_mat[j, k] - log_p_mat[j, k]
                             - self.mu[j, k] ** 2 / (2 * s2)
                             - np.log(s2) / 2 - log_tau[k] / 2
                             - log_sig2_inv / 2)
                self.gam[j, k] = np.exp(-log1pexp(logit))
                beta[j, k] = self.gam[j, k] * self.mu[j, k]
                self.cp_x_xbeta[:, k] += (beta[j, k] - b_old) * cpk[:, j]

        # --- probit latent moments
        sqrt_c = np.sqrt(c)
        uc = sqrt_c * u
        lp, l1p = log_ndtr(uc), log_ndtr(-uc)
        imr0 = inv_mills(0, uc, l1p, lp)
        imr1 = inv_mills(1, uc, l1p, lp)
        z = (self.gam * (imr1 - imr0) + imr0) / sqrt_c + u

        # --- horseshoe scales, "keep this order"
        l_vb = (c_s * self.sig02_inv * self.shr
                * (self.theta ** 2 + self.sig2_theta) / 2 / self.df)
        rho_xi_inv = c_s * (h.a2_inv + self.sig02_inv)
        if annealed:
            from scipy.special import gammaincc, gamma as gamma_fn
            g_upper = lambda a, xx: gammaincc(a, xx) * gamma_fn(a)
            self.lam2_inv = (g_upper(2 - c_s, l_vb)
                             / (g_upper(1 - c_s, l_vb) * l_vb) - 1.0)
        else:
            q_app = q_approx(l_vb)
            self.lam2_inv = 1.0 / (q_app * l_vb) - 1.0
            self.q_app = q_app
        xi_inv = 1.0 / rho_xi_inv

        sig02_lam = self.sig02_inv * self.lam2_inv * self.shr
        self.sig2_theta = 1.0 / (c * (q + sig02_lam))
        self.theta = c * self.sig2_theta * (z.sum(axis=1) - self.zeta.sum())

        nu_s0_vb = c_s * (0.5 + p / 2) - c_s + 1
        rho_s0_vb = c_s * (xi_inv + (self.lam2_inv * self.shr
                                     * (self.theta ** 2 + self.sig2_theta)
                                     ).sum() / 2)
        self.sig02_inv = nu_s0_vb / rho_s0_vb

        t02_inv = 1.0 / h.t02
        sig2_zeta = 1.0 / (c * (p + t02_inv))
        self.zeta = c * sig2_zeta * (z.sum(axis=0) + t02_inv * h.n0
                                     - self.theta.sum())
        self.l_vb, self.rho_xi_inv = l_vb, rho_xi_inv
        self.nu_s0_vb, self.rho_s0_vb = nu_s0_vb, rho_s0_vb
        self.sig2_zeta = sig2_zeta

    # ------------------------------------------------------------------
    def elbo(self):
        """8-term ELBO with the re-derived Gamma factors (c=1)."""
        h = self.hyper
        n, p, q = self.n, self.p, self.q
        beta = self.gam * self.mu
        m2b = self.m2_beta()

        eta_vb = h.eta + self.n_eff / 2 + self.gam.sum(axis=0) / 2
        diag_cp = (self.cp_x_xbeta * beta).sum(axis=0)
        if self.mis is None:
            quad = ((n - 1 + self.sig2_inv) * m2b.sum(axis=0) + diag_cp
                    - (n - 1) * (beta ** 2).sum(axis=0))
        else:
            quad = (self.sig2_inv * m2b.sum(axis=0)
                    + (self.x_norm_sq * m2b).sum(axis=0) + diag_cp
                    - (self.x_norm_sq * beta ** 2).sum(axis=0))
        kappa_vb = h.kappa + (self.y_norm_sq
                              - 2 * (beta * self.cp_x_y).sum(axis=0)
                              + quad) / 2
        nu_vb = h.nu + self.gam.sum() / 2
        rho_vb = h.rho + (self.tau * m2b.sum(axis=0)).sum() / 2
        log_tau = digamma(eta_vb) - np.log(kappa_vb)
        log_sig2_inv = digamma(nu_vb) - np.log(rho_vb)
        log_sig02_inv = digamma(self.nu_s0_vb) - np.log(self.rho_s0_vb)
        log_xi_inv = digamma(1.0) - np.log(self.rho_xi_inv)
        xi_inv = 1.0 / self.rho_xi_inv
        t02_inv = 1.0 / h.t02
        sig2_zeta = 1.0 / (p + t02_inv)
        vsld_zeta = -q * (np.log(h.t02) + np.log(p + t02_inv))

        # A: E log p(y | .)
        arg = self.n_eff * (log_tau - np.log(2 * np.pi)) / 2
        term_a = (arg - self.tau * (kappa_vb - m2b.sum(axis=0)
                                    * self.sig2_inv / 2 - h.kappa)).sum()

        # B: beta/gamma
        eps = np.finfo(float).eps ** 0.75
        u = self.theta[:, None] + self.zeta[None, :]
        lp, l1p = log_ndtr(u), log_ndtr(-u)
        s2 = (self.sig2_beta[None, :] if self.sig2_beta.ndim == 1
              else self.sig2_beta)
        arg_b = (log_sig2_inv * self.gam / 2
                 + self.gam * log_tau[None, :] / 2
                 - m2b * self.tau[None, :] * self.sig2_inv / 2
                 + self.gam * lp + (1 - self.gam) * l1p
                 - sig2_zeta / 2
                 - self.gam * np.log(self.gam + eps)
                 - (1 - self.gam) * np.log(1 - self.gam + eps)
                 - self.sig2_theta[:, None] / 2
                 + self.gam * (np.log(s2) + 1) / 2)
        term_b = arg_b.sum()

        # C: theta horseshoe (df = 1)
        q_app = q_approx(self.l_vb)
        term_c = (log_sig02_inv / 2 + np.log(self.shr) / 2
                  - self.sig02_inv * self.shr * self.lam2_inv
                  * (self.theta ** 2 + self.sig2_theta) / 2
                  + (np.log(self.sig2_theta) + 1) / 2
                  - np.log(np.pi) + self.l_vb * self.lam2_inv
                  + np.log(q_app)).sum()

        # D: zeta
        term_d = (vsld_zeta - t02_inv * ((self.zeta - h.n0) ** 2).sum()
                  - q * t02_inv * sig2_zeta + q) / 2

        # E: tau
        term_e = ((h.eta - eta_vb) * log_tau - (h.kappa - kappa_vb) * self.tau
                  + h.eta * np.log(h.kappa) - eta_vb * np.log(kappa_vb)
                  - gammaln(h.eta) + gammaln(eta_vb)).sum()

        # F: sig02 horseshoe
        term_f = (-0.5 * log_sig02_inv - xi_inv * self.sig02_inv
                  + log_xi_inv / 2 - gammaln(0.5)
                  - (self.nu_s0_vb - 1) * log_sig02_inv
                  + self.rho_s0_vb * self.sig02_inv
                  - self.nu_s0_vb * np.log(self.rho_s0_vb)
                  + gammaln(self.nu_s0_vb))

        # G: xi
        term_g = ((0.5 - 1.0) * log_xi_inv
                  - (h.a2_inv - self.rho_xi_inv) * xi_inv
                  + 0.5 * np.log(h.a2_inv) - 1.0 * np.log(self.rho_xi_inv)
                  - gammaln(0.5) + gammaln(1.0))

        # H: sig2_inv
        term_h = ((h.nu - nu_vb) * log_sig2_inv
                  - (h.rho - rho_vb) * self.sig2_inv
                  + h.nu * np.log(h.rho) - nu_vb * np.log(rho_vb)
                  - gammaln(h.nu) + gammaln(nu_vb))

        return (term_a + term_b + term_c + term_d + term_e + term_f + term_g
                + term_h)
