"""NUTS backend — No-U-Turn sampler for the horseshoe hotspot block.

BASELINE north star: "NUTS/HMC and SMC backend" as gold-standard
cross-checks of the CAVI engine (SURVEY.md §7 step 7).  The spike-and-slab
indicators are discrete, so a pure-HMC treatment of the full joint is not
possible; this backend is NUTS-within-Gibbs:

- the conjugate likelihood block — (beta, gamma) blocked Gauss-Seidel draw,
  Albert-Chib probit latents Z, residual/slab precisions — reuses the exact
  Gibbs conditionals (mcmc/gibbs.py), all jitted;
- the horseshoe hotspot-propensity block (theta_s, lambda_s, sigma_0,
  zeta_t) — the funnel geometry where conjugate auxiliaries mix worst — is
  updated by NUTS (Hoffman & Gelman 2014, Algorithm 6 with slice variable
  and dual-averaging step-size adaptation) in the NON-CENTERED
  parameterization

      theta_s = sigma_0 lambda_s eta_s / sqrt(shr),  eta_s ~ N(0, 1),
      w = (eta (p,), log lambda (p,), log sigma_0, zeta_raw (q,)),

  whose potential given Z reduces to O(p + q) sufficient statistics
  (row/column sums of Z), so a leapfrog step costs O(p + q): the tree
  recursion lives on host, every gradient/leapfrog is one jitted call.

The half-Cauchy priors on lambda_s and sigma_0 are used directly in
log-space (the model's Gamma-Gamma mixture marginalizes to them exactly,
reference R/set_hyper_init.R:126-128, 183-184).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Config, Data, Hyper
from .gibbs import (GibbsState, _beta_gam_sweep, _sample_gamma, init_state,
                    sample_tau_sig2, sample_z)

_LOG_2_PI = float(np.log(2.0 / np.pi))


class NutsStats(NamedTuple):
    """O(p+q) sufficient statistics of the hotspot-block potential."""
    zrow: jnp.ndarray    # (p,) row sums of Z over observed responses
    zcol: jnp.ndarray    # (q,) column sums of Z over real predictors
    p_mask: jnp.ndarray
    q_mask: jnp.ndarray
    p_true: jnp.ndarray
    q_true: jnp.ndarray
    n0: jnp.ndarray      # (q,)
    t0: jnp.ndarray      # scalar sqrt(t02)
    shr_sqrt: jnp.ndarray


def _unpack(w, p, q):
    eta = w[:p]
    loglam = w[p:2 * p]
    logsig0 = w[2 * p]
    zeta_raw = w[2 * p + 1:]
    return eta, loglam, logsig0, zeta_raw


def theta_zeta_from_w(w, stats: NutsStats):
    p = stats.zrow.shape[0]
    q = stats.zcol.shape[0]
    eta, loglam, logsig0, zeta_raw = _unpack(w, p, q)
    theta = (jnp.exp(logsig0 + loglam) * eta / stats.shr_sqrt) * stats.p_mask
    zeta = (stats.n0 + stats.t0 * zeta_raw) * stats.q_mask
    return theta, zeta


def potential(w, stats: NutsStats):
    """-log posterior of the hotspot block given Z (up to a constant)."""
    p = stats.zrow.shape[0]
    q = stats.zcol.shape[0]
    eta, loglam, logsig0, zeta_raw = _unpack(w, p, q)
    theta, zeta = theta_zeta_from_w(w, stats)

    # priors (masked coordinates get a pure N(0,1)/C+(0,1) keep-in-place
    # density so they stay bounded and contribute a constant)
    u_eta = 0.5 * jnp.sum(eta * eta)
    lam2 = jnp.exp(2.0 * loglam)
    u_lam = -jnp.sum((_LOG_2_PI + loglam - jnp.log1p(lam2)) * stats.p_mask) \
        - jnp.sum((-0.5 * loglam * loglam) * (1.0 - stats.p_mask))
    sig0sq = jnp.exp(2.0 * logsig0)
    u_sig0 = -(_LOG_2_PI + logsig0 - jnp.log1p(sig0sq))
    u_zeta = 0.5 * jnp.sum(zeta_raw * zeta_raw)

    # likelihood of the probit latents: 0.5 sum_st m_st (z - theta - zeta)^2
    # expanded through the row/col sums (z^2 term is constant in w)
    th_sum = jnp.sum(theta)
    ze_sum = jnp.sum(zeta)
    u_lik = (-jnp.dot(theta, stats.zrow) - jnp.dot(zeta, stats.zcol)
             + 0.5 * stats.q_true * jnp.sum(theta * theta)
             + 0.5 * stats.p_true * jnp.sum(zeta * zeta)
             + th_sum * ze_sum)
    return u_eta + u_lam + u_sig0 + u_zeta + u_lik


_potential_and_grad = jax.jit(jax.value_and_grad(potential))


@jax.jit
def _leapfrog(w, m, eps, stats):
    _, g = _potential_and_grad(w, stats)
    m = m - 0.5 * eps * g
    w = w + eps * m
    u, g = _potential_and_grad(w, stats)
    m = m - 0.5 * eps * g
    return w, m, u


def _hamiltonian(u, m):
    return float(u) + 0.5 * float(jnp.dot(m, m))


class _Tree(NamedTuple):
    w_minus: object
    m_minus: object
    w_plus: object
    m_plus: object
    w_prop: object
    n: int
    s: int
    alpha: float
    n_alpha: int


_DELTA_MAX = 1000.0


def _no_uturn(w_minus, w_plus, m_minus, m_plus):
    dw = w_plus - w_minus
    return (float(jnp.dot(dw, m_minus)) >= 0.0
            and float(jnp.dot(dw, m_plus)) >= 0.0)


def _build_tree(rng, w, m, log_u, v, j, eps, stats, h0):
    """Hoffman & Gelman Algorithm 6 recursion (host control flow, jitted
    leapfrog/gradient).  Returns a _Tree."""
    if j == 0:
        w1, m1, u1 = _leapfrog(w, m, v * eps, stats)
        h1 = _hamiltonian(u1, m1)
        n1 = int(log_u <= -h1)
        s1 = int(log_u < _DELTA_MAX - h1)
        alpha = min(1.0, float(np.exp(min(0.0, h0 - h1))))
        return _Tree(w1, m1, w1, m1, w1, n1, s1, alpha, 1)
    t = _build_tree(rng, w, m, log_u, v, j - 1, eps, stats, h0)
    if t.s == 1:
        if v < 0:
            t2 = _build_tree(rng, t.w_minus, t.m_minus, log_u, v, j - 1, eps,
                             stats, h0)
            w_minus, m_minus = t2.w_minus, t2.m_minus
            w_plus, m_plus = t.w_plus, t.m_plus
        else:
            t2 = _build_tree(rng, t.w_plus, t.m_plus, log_u, v, j - 1, eps,
                             stats, h0)
            w_minus, m_minus = t.w_minus, t.m_minus
            w_plus, m_plus = t2.w_plus, t2.m_plus
        w_prop = t.w_prop
        tot = t.n + t2.n
        if tot > 0 and rng.uniform() < t2.n / tot:
            w_prop = t2.w_prop
        s = t2.s * int(_no_uturn(w_minus, w_plus, m_minus, m_plus))
        return _Tree(w_minus, m_minus, w_plus, m_plus, w_prop, tot, s,
                     t.alpha + t2.alpha, t.n_alpha + t2.n_alpha)
    return t


def nuts_step(rng, w, eps, stats, max_depth: int = 8):
    """One NUTS transition.  Returns (w', mean acceptance statistic)."""
    dim = w.shape[0]
    m0 = jnp.asarray(rng.normal(size=dim), w.dtype)
    u0, _ = _potential_and_grad(w, stats)
    h0 = _hamiltonian(u0, m0)
    log_u = -h0 - rng.exponential()   # log of u ~ U(0, exp(-H0))

    w_minus = w_plus = w_prop = w
    m_minus = m_plus = m0
    j, n, s = 0, 1, 1
    alpha_sum, n_alpha = 0.0, 1
    while s == 1 and j < max_depth:
        v = 1.0 if rng.uniform() < 0.5 else -1.0
        if v < 0:
            t = _build_tree(rng, w_minus, m_minus, log_u, v, j, eps, stats,
                            h0)
            w_minus, m_minus = t.w_minus, t.m_minus
        else:
            t = _build_tree(rng, w_plus, m_plus, log_u, v, j, eps, stats, h0)
            w_plus, m_plus = t.w_plus, t.m_plus
        if t.s == 1 and rng.uniform() < min(1.0, t.n / max(n, 1)):
            w_prop = t.w_prop
        n += t.n
        s = t.s * int(_no_uturn(w_minus, w_plus, m_minus, m_plus))
        j += 1
        alpha_sum, n_alpha = t.alpha, t.n_alpha
    return w_prop, alpha_sum / max(n_alpha, 1)


class DualAveraging:
    """Nesterov dual averaging of log(eps) (Hoffman & Gelman §3.2)."""

    def __init__(self, eps0, target=0.8, gamma=0.05, t0=10.0, kappa=0.75):
        self.mu = np.log(10.0 * eps0)
        self.target, self.gamma, self.t0, self.kappa = target, gamma, t0, kappa
        self.log_eps = np.log(eps0)
        self.log_eps_bar = 0.0
        self.h_bar = 0.0
        self.t = 0

    def update(self, alpha):
        self.t += 1
        frac = 1.0 / (self.t + self.t0)
        self.h_bar = (1 - frac) * self.h_bar + frac * (self.target - alpha)
        self.log_eps = self.mu - np.sqrt(self.t) / self.gamma * self.h_bar
        w = self.t ** (-self.kappa)
        self.log_eps_bar = w * self.log_eps + (1 - w) * self.log_eps_bar
        return np.exp(self.log_eps)

    @property
    def eps_final(self):
        return float(np.exp(self.log_eps_bar))


@partial(jax.jit, static_argnames=("cfg",))
def _likelihood_gibbs(state: GibbsState, data: Data, hyper: Hyper,
                      gram_blocks, *, cfg: Config):
    """Exact conjugate draws of the likelihood block given (theta, zeta):
    (beta, gamma) blocked Gauss-Seidel, Z latents, tau, sig2_inv.  Returns
    the new state plus the Z row/column sums the NUTS potential needs."""
    dt = cfg.dtype
    n = data.n
    keys = jax.random.split(state.key, 6)
    s2 = 1.0 / (state.tau * (n - 1.0 + state.sig2_inv))
    log_s2_sig_tau = 0.5 * (jnp.log(s2) + jnp.log(state.sig2_inv)
                            + jnp.log(state.tau))
    consts = (s2, state.tau, log_s2_sig_tau, keys[0])
    gam, beta, fitted = _beta_gam_sweep(state, data, gram_blocks, consts, cfg)
    z = sample_z(keys[1], gam, state.theta, state.zeta, data.p_mask,
                 data.q_mask, dt)
    tau, sig2_inv = sample_tau_sig2((keys[2], keys[3]), data, hyper, gam,
                                    beta, fitted, state.sig2_inv,
                                    jnp.asarray(1.0, dt))
    new = state._replace(beta=beta, gam=gam, fitted=fitted, tau=tau,
                         sig2_inv=sig2_inv, key=keys[5])
    return new, jnp.sum(z, axis=1), jnp.sum(z, axis=0)


def run_nuts(data: Data, hyper: Hyper, cfg: Config, n_samples: int,
             n_burnin: int, seed: int = 0, thin: int = 1,
             max_depth: int = 8, target_accept: float = 0.8):
    """NUTS-within-Gibbs sampler; returns posterior-mean summaries
    (pip (p,q), beta_mean (p,q), theta_mean (p,), zeta_mean (q,)) like
    run_gibbs, for cross-checking the CAVI posterior."""
    from ..ops.sweep import block_gram

    dt = cfg.dtype
    p_pad = data.x.shape[1]
    q_pad = data.y.shape[1]
    from ..models.global_local import data_block
    block = data_block(cfg, data)
    gram_blocks = jax.jit(block_gram, static_argnums=1)(data.x, block)
    key = jax.random.key(seed, impl="rbg")
    state = init_state(key, data, cfg)
    rng = np.random.default_rng(seed + 1)

    n0_pad = jnp.asarray(hyper.n0, dt)
    stats_fixed = dict(
        p_mask=data.p_mask, q_mask=data.q_mask, p_true=data.p_true,
        q_true=data.q_true, n0=n0_pad,
        t0=jnp.sqrt(jnp.asarray(hyper.t02, dt)),
        shr_sqrt=jnp.sqrt(jnp.asarray(cfg.shr_fac_inv, dt)))

    # non-centered coordinates; start at the prior-ish origin
    w = jnp.concatenate([
        jnp.asarray(rng.normal(size=p_pad) * 0.1, dt),        # eta
        jnp.zeros((p_pad,), dt),                              # log lam
        jnp.asarray([-0.5 * np.log(max(float(np.asarray(data.q_true)), 1.0))],
                    dt),                                      # log sig0
        jnp.zeros((q_pad,), dt),                              # zeta_raw
    ])

    eps = 0.1
    da = DualAveraging(eps, target=target_accept)

    def sync_state(state, w, stats):
        theta, zeta = theta_zeta_from_w(w, stats)
        loglam = w[p_pad:2 * p_pad]
        logsig0 = w[2 * p_pad]
        return state._replace(
            theta=theta, zeta=zeta,
            lam2_inv=jnp.exp(-2.0 * loglam),
            sig02_inv=jnp.exp(-2.0 * logsig0))

    acc_gam = jnp.zeros((p_pad, q_pad), dt)
    acc_beta = jnp.zeros((p_pad, q_pad), dt)
    acc_theta = jnp.zeros((p_pad,), dt)
    acc_zeta = jnp.zeros((q_pad,), dt)
    kept = 0
    for it in range(n_burnin + n_samples):
        state, zrow, zcol = _likelihood_gibbs(state, data, hyper,
                                              gram_blocks, cfg=cfg)
        stats = NutsStats(zrow=zrow, zcol=zcol, **stats_fixed)
        w, alpha = nuts_step(rng, w, eps, stats, max_depth=max_depth)
        if it < n_burnin:
            eps = float(da.update(alpha))
        elif it == n_burnin:
            eps = da.eps_final
        state = sync_state(state, w, stats)
        if it >= n_burnin and (it - n_burnin) % thin == 0:
            acc_gam = acc_gam + state.gam
            acc_beta = acc_beta + state.beta
            acc_theta = acc_theta + state.theta
            acc_zeta = acc_zeta + state.zeta
            kept += 1
    return (np.asarray(acc_gam / kept), np.asarray(acc_beta / kept),
            np.asarray(acc_theta / kept), np.asarray(acc_zeta / kept))
