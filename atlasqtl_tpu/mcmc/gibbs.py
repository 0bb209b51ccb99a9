"""Exact blocked Gibbs sampler — the gold-standard cross-check backend.

Samples the SAME joint model the CAVI engine approximates (SURVEY.md §0;
reference model at R/set_hyper_init.R:16-31, 126-128, 183-184):

  y_t | beta, tau_t   ~ N(X beta_.t, tau_t^{-1} I)
  beta_st | gam_st=1  ~ N(0, sig2 / tau_t),  spike at 0 otherwise
  gam_st              ~ Bernoulli(Phi(theta_s + zeta_t))
  theta_s             ~ N(0, sig0^2 lam_s^2 / shr),  lam_s ~ C+(0,1)
  sig0^{-2}           ~ Gamma(1/2, xi^{-1}),  xi^{-1} ~ Gamma(1/2, A^{-2})
  zeta_t              ~ N(n0_t, t0^2);  tau_t ~ Gamma(eta, kappa);
  sig^{-2}            ~ Gamma(nu, rho)

Every conditional is conjugate (probit -> Albert-Chib truncated-normal
latents; half-Cauchy -> inverse-gamma auxiliaries), so the sampler is exact.
It reuses the CAVI engine's TPU structure: the (beta, gam) update is a
sequential Gauss-Seidel sweep over predictor blocks carrying the n-space
fitted matrix F = X beta, vectorized over responses.

Used to validate CAVI posterior inclusion probabilities and hotspot
propensities on small/medium configs (BASELINE.md "NUTS/SMC cross-check").
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtri

from ..types import Config, Data, Hyper
from ..ops.special import log_ndtr_both


class GibbsState(NamedTuple):
    beta: jnp.ndarray       # (p, q)
    gam: jnp.ndarray        # (p, q) in {0., 1.}
    fitted: jnp.ndarray     # (n, q) = X beta (masked if missing)
    tau: jnp.ndarray        # (q,)
    sig2_inv: jnp.ndarray   # scalar
    theta: jnp.ndarray      # (p,)
    zeta: jnp.ndarray       # (q,)
    lam2_inv: jnp.ndarray   # (p,)
    nu_aux: jnp.ndarray     # (p,) half-Cauchy auxiliary for lam
    sig02_inv: jnp.ndarray  # scalar
    xi_inv: jnp.ndarray     # scalar
    key: jnp.ndarray


def init_state(key, data: Data, cfg: Config) -> GibbsState:
    p_pad = data.x.shape[1]
    q_pad = data.y.shape[1]
    dt = cfg.dtype
    k1, key = jax.random.split(key)
    return GibbsState(
        beta=jnp.zeros((p_pad, q_pad), dt),
        gam=jnp.zeros((p_pad, q_pad), dt),
        fitted=jnp.zeros((data.x.shape[0], q_pad), dt),
        tau=jnp.ones((q_pad,), dt),
        sig2_inv=jnp.asarray(1.0, dt),
        theta=jnp.zeros((p_pad,), dt),
        zeta=jnp.full((q_pad,), -1.0, dt),
        lam2_inv=jnp.ones((p_pad,), dt),
        nu_aux=jnp.ones((p_pad,), dt),
        sig02_inv=jnp.asarray(float(np.asarray(data.q_true)), dt),
        xi_inv=jnp.asarray(1.0, dt),
        key=key,
    )


def _sample_gamma(key, shape_param, rate, size=()):
    """Gamma(shape, rate) draw via jax.random.gamma (shape params here are
    O(1)..O(n) — the rejection sampler is fine at these sizes)."""
    return jax.random.gamma(key, shape_param, size) / rate


def _beta_gam_sweep(state: GibbsState, data: Data, gram_blocks, consts,
                    cfg: Config):
    """Sequential (beta, gam) draw: blocked Gauss-Seidel over predictors,
    exact conditional per coordinate (slab mean/variance are the same
    quantities as the CAVI sweep; here gamma is a Bernoulli draw and beta a
    normal draw instead of their expectations)."""
    x = data.x
    n, p = x.shape
    q = state.beta.shape[1]
    block = gram_blocks.shape[1]
    nb = p // block
    s2, tau, log_s2_sig_tau, c_key = consts

    xt_b = jnp.moveaxis(x.reshape(n, nb, block), 1, 0)
    theta_b = state.theta.reshape(nb, block)
    cp_b = data.cp_x_y.reshape(nb, block, q)
    gam_b = state.gam.reshape(nb, block, q)
    beta_b = state.beta.reshape(nb, block, q)
    keys = jax.random.split(c_key, nb)

    pm_b = data.p_mask.reshape(nb, block)

    def step(fitted, inp):
        xb, cpb, gamb, betab, gb, thb, pmb, kb = inp
        ku, kn = jax.random.split(kb)
        unif = jax.random.uniform(ku, (block, q), fitted.dtype,
                                  minval=jnp.finfo(fitted.dtype).tiny)
        norm = jax.random.normal(kn, (block, q), fitted.dtype)
        u = thb[:, None] + state.zeta[None, :]
        log_p, log_1p = log_ndtr_both(u)
        r0 = jnp.einsum("ni,nq->iq", xb, fitted,
                        preferred_element_type=fitted.dtype)
        d = jnp.diagonal(gb)

        def body(i, carry):
            r, gamb, betab = carry
            beta_old = betab[i]
            r_i = r[i] - beta_old * d[i]
            mu_i = s2 * tau * (cpb[i] - r_i)
            logit = (log_p[i] - log_1p[i] + mu_i * mu_i / (2.0 * s2)
                     + log_s2_sig_tau)
            prob1 = jax.nn.sigmoid(logit)
            gam_new = (unif[i] < prob1).astype(fitted.dtype) * pmb[i]
            beta_new = gam_new * (mu_i + jnp.sqrt(s2) * norm[i])
            delta = beta_new - beta_old
            r = r + gb[:, i][:, None] * delta[None, :]
            return (r, gamb.at[i].set(gam_new), betab.at[i].set(beta_new))

        _, gamb, betab_new = jax.lax.fori_loop(
            0, block, body, (r0, gamb, betab))
        fitted = fitted + jnp.einsum(
            "ni,iq->nq", xb, betab_new - betab,
            preferred_element_type=fitted.dtype)
        return fitted, (gamb, betab_new)

    fitted, (gam_out, beta_out) = jax.lax.scan(
        step, state.fitted,
        (xt_b, cp_b, gam_b, beta_b, gram_blocks, theta_b, pm_b, keys))
    qm = data.q_mask[None, :]
    return (gam_out.reshape(p, q) * qm, beta_out.reshape(p, q) * qm, fitted)


def sample_z(key, gam, theta, zeta, p_mask, q_mask, dt):
    """Albert-Chib probit latents: Z | gam, theta, zeta via inverse-CDF
    truncated normals (gam=1 -> Z > 0, gam=0 -> Z < 0)."""
    u_mean = theta[:, None] + zeta[None, :]
    log_p, log_1p = log_ndtr_both(u_mean)
    uz = jax.random.uniform(key, gam.shape, dt, minval=1e-7,
                            maxval=1.0 - 1e-7)
    p_le0 = jnp.exp(log_1p)           # P(Z <= 0) for Z ~ N(u, 1) is Phi(-u)
    v = jnp.where(gam > 0.5, p_le0 + uz * (1.0 - p_le0), uz * p_le0)
    v = jnp.clip(v, 1e-7, 1.0 - 1e-7)
    z = u_mean + ndtri(v)
    return z * p_mask[:, None] * q_mask[None, :]


def sample_tau_sig2(keys, data: Data, hyper: Hyper, gam, beta, fitted,
                    sig2_inv, temper):
    """Conjugate draws of the residual precisions tau and the slab precision
    sig2_inv given (beta, gam, fitted)."""
    resid2 = (data.y_norm_sq - 2.0 * jnp.einsum("nq,nq->q", data.y, fitted)
              + jnp.einsum("nq,nq->q", fitted, fitted))
    beta2_colsum = jnp.einsum("pq,pq->q", beta, beta)
    shape_tau = (hyper.eta + 0.5 * temper * data.n_eff
                 + 0.5 * jnp.sum(gam, axis=0))
    rate_tau = hyper.kappa + 0.5 * (temper * resid2
                                    + sig2_inv * beta2_colsum)
    tau = _sample_gamma(keys[0], shape_tau, rate_tau, shape_tau.shape)
    shape_s = hyper.nu + 0.5 * jnp.sum(gam)
    rate_s = hyper.rho + 0.5 * jnp.sum(tau * beta2_colsum)
    sig2_inv = _sample_gamma(keys[1], shape_s, rate_s)
    return tau, sig2_inv


@partial(jax.jit, static_argnames=("cfg",))
def gibbs_sweep(state: GibbsState, data: Data, hyper: Hyper, gram_blocks, *,
                cfg: Config, temper=1.0) -> GibbsState:
    """One full Gibbs scan over all blocks of conditionals.

    `temper` raises the LIKELIHOOD to the given power (SMC tempering);
    the conjugate conditionals absorb it exactly: the slab posterior
    precision becomes temper*tau*(n-1) + tau*sig2_inv and the tau/residual
    shape/rate terms scale by temper.  temper=1 is the plain sampler."""
    dt = cfg.dtype
    temper = jnp.asarray(temper, dt)
    shr = jnp.asarray(cfg.shr_fac_inv, dt)
    n = data.n
    p_true = data.p_true
    q_true = data.q_true
    key = state.key
    keys = jax.random.split(key, 12)

    # ---- (beta, gam) | rest -------------------------------------------
    # slab variance s2_t = 1 / (tau_t (temper (n - 1) + sig2_inv)) — same
    # expression as the CAVI sig2_beta at temper=1 (complete-data;
    # X standardized)
    s2 = 1.0 / (state.tau * (temper * (n - 1.0) + state.sig2_inv))
    log_s2_sig_tau = 0.5 * (jnp.log(s2) + jnp.log(state.sig2_inv)
                            + jnp.log(state.tau))
    consts = (s2, temper * state.tau, log_s2_sig_tau, keys[0])
    gam, beta, fitted = _beta_gam_sweep(state, data, gram_blocks, consts, cfg)

    # ---- Z | gam, theta, zeta (Albert-Chib truncated normals) ----------
    # and theta, zeta | Z in sequence
    z = sample_z(keys[1], gam, state.theta, state.zeta, data.p_mask,
                 data.q_mask, dt)

    # theta | Z, zeta, scales
    prec_th = q_true + state.sig02_inv * state.lam2_inv * shr
    var_th = 1.0 / prec_th
    mean_th = var_th * (jnp.sum(z, axis=1)
                        - jnp.sum(state.zeta * data.q_mask))
    theta = (mean_th + jnp.sqrt(var_th)
             * jax.random.normal(keys[2], mean_th.shape, dt)) * data.p_mask

    # zeta | Z, theta
    t02_inv = 1.0 / hyper.t02
    prec_ze = p_true + t02_inv
    var_ze = 1.0 / prec_ze
    mean_ze = var_ze * (jnp.sum(z, axis=0) + t02_inv * hyper.n0
                        - jnp.sum(theta))
    zeta = (mean_ze + jnp.sqrt(var_ze)
            * jax.random.normal(keys[3], mean_ze.shape, dt)) * data.q_mask

    # ---- tau, sig2_inv | rest ------------------------------------------
    tau, sig2_inv = sample_tau_sig2((keys[4], keys[5]), data, hyper, gam,
                                    beta, fitted, state.sig2_inv, temper)

    # ---- horseshoe scales ---------------------------------------------
    # lam_s^2 | theta, sig02_inv, nu_aux ~ IG(1, 1/nu_aux + th^2 prec/2)
    quad = state.sig02_inv * shr * theta * theta / 2.0
    rate_lam = 1.0 / state.nu_aux + quad
    lam2_inv = _sample_gamma(keys[6], jnp.asarray(1.0, dt), rate_lam,
                             rate_lam.shape)
    # nu_aux | lam ~ IG(1, 1 + lam^{-2}) -> 1/nu_aux ~ Gamma(1, 1 + lam2_inv)
    inv_nu = _sample_gamma(keys[7], jnp.asarray(1.0, dt), 1.0 + lam2_inv,
                           lam2_inv.shape)
    nu_aux = 1.0 / inv_nu

    # sig0^{-2} | theta, lam, xi
    shape_s0 = 0.5 + 0.5 * p_true
    rate_s0 = state.xi_inv + 0.5 * jnp.sum(
        lam2_inv * shr * theta * theta * data.p_mask)
    sig02_inv = _sample_gamma(keys[8], shape_s0, rate_s0)
    # xi^{-1} | sig0^{-2} ~ Gamma(1, A^{-2} + sig0^{-2})
    xi_inv = _sample_gamma(keys[9], jnp.asarray(1.0, dt),
                           hyper.a2_inv + sig02_inv)

    return GibbsState(beta=beta, gam=gam, fitted=fitted, tau=tau,
                      sig2_inv=sig2_inv, theta=theta, zeta=zeta,
                      lam2_inv=lam2_inv, nu_aux=nu_aux, sig02_inv=sig02_inv,
                      xi_inv=xi_inv, key=keys[11])


def run_gibbs(data: Data, hyper: Hyper, cfg: Config, n_samples: int,
              n_burnin: int, seed: int = 0, thin: int = 1):
    """Run the sampler; returns posterior-mean summaries
    (pip (p,q), beta_mean (p,q), theta_mean (p,), zeta_mean (q,))."""
    from ..ops.sweep import block_gram

    from ..models.global_local import data_block
    block = data_block(cfg, data)
    gram_blocks = jax.jit(block_gram, static_argnums=1)(data.x, block)
    key = jax.random.key(seed, impl="rbg")
    state = init_state(key, data, cfg)

    for _ in range(n_burnin):
        state = gibbs_sweep(state, data, hyper, gram_blocks, cfg=cfg)

    acc_gam = jnp.zeros_like(state.gam)
    acc_beta = jnp.zeros_like(state.beta)
    acc_theta = jnp.zeros_like(state.theta)
    acc_zeta = jnp.zeros_like(state.zeta)
    kept = 0
    for s in range(n_samples):
        state = gibbs_sweep(state, data, hyper, gram_blocks, cfg=cfg)
        if s % thin == 0:
            acc_gam = acc_gam + state.gam
            acc_beta = acc_beta + state.beta
            acc_theta = acc_theta + state.theta
            acc_zeta = acc_zeta + state.zeta
            kept += 1
    return (np.asarray(acc_gam / kept), np.asarray(acc_beta / kept),
            np.asarray(acc_theta / kept), np.asarray(acc_zeta / kept))
