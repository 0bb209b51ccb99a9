"""Jittable special functions for the horseshoe CAVI updates.

TPU-native equivalents of the reference package's external math dependencies
(reference: R/utils.R:149-203, 346-423; gsl `expint_E1`, `gamma_inc`,
`hyperg_1F1`; PowerTOST `OwensT`).  Everything here is pure JAX, vectorized,
static-shape and safe under jit/vmap/shard_map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, digamma, ndtri  # noqa: F401 (re-export)
from jax.scipy.special import log_ndtr as _log_ndtr
from jax.scipy.special import gammaincc as _gammaincc

_LOG_SQRT_2PI = 0.9189385332046727417803297364056176  # log(sqrt(2*pi))
_EULER_GAMMA = 0.5772156649015328606065120900824024


def log1pexp(x):
    """Overflow-safe log(1 + exp(x)) (reference: R/utils.R:149-155,
    src/coreLoop.cpp:28-33)."""
    return jnp.logaddexp(x, 0.0)


def log_ndtr_both(x):
    """(log Phi(x), log(1 - Phi(x))) — the pair used everywhere for the probit
    inclusion prior (reference: R/atlasqtl_global_local_core.R:61-63).

    float32 inputs use the fast erfcx-based evaluation (~3x cheaper than two
    jax.scipy log_ndtr calls, 1.2e-7 absolute accuracy — beyond f32
    round-off); float64 keeps the reference-grade jax implementation.
    """
    if jnp.asarray(x).dtype == jnp.float32:
        return log_ndtr_both_fast(x)
    return _log_ndtr(x), _log_ndtr(-x)


_NR_ERFC = (-1.26551223, 1.00002368, 0.37409196, 0.09678418, -0.18628806,
            0.27886807, -1.13520398, 1.48851587, -0.82215223, 0.17087277)


def _log_half_erfcx(z):
    """log(0.5 * erfcx(z)) for z >= 0 via the Numerical-Recipes rational fit
    (fractional error < 1.2e-7 uniformly): erfcx(z) = t * exp(poly(t)),
    t = 1/(1 + z/2)."""
    t = 1.0 / (1.0 + 0.5 * z)
    poly = _NR_ERFC[9]
    for coef in _NR_ERFC[8::-1]:
        poly = poly * t + coef
    return jnp.log(0.5 * t) + poly


def log_ndtr_both_fast(x):
    """One-branch evaluation of (log Phi(x), log Phi(-x)):

      log Phi(-|x|) = -x^2/2 + log(0.5 erfcx(|x|/sqrt(2)))
      log Phi(+|x|) = log1p(-exp(log Phi(-|x|)))      (safe: arg <= log 0.5)
    """
    ax = jnp.abs(x)
    z = ax * 0.7071067811865476
    log_lo = -0.5 * ax * ax + _log_half_erfcx(z)   # log Phi(-|x|)
    log_hi = jnp.log1p(-jnp.exp(log_lo))           # log Phi(+|x|)
    log_p = jnp.where(x >= 0, log_hi, log_lo)
    log_1p = jnp.where(x >= 0, log_lo, log_hi)
    return log_p, log_1p


# erfcx(z) ~= P12(t), t = 1/(1+z/2): degree-12 least-squares monomial fit
# on z in [0, 38] (relative error < 1e-8 in f64; a few f32 ulps in f32).
# Exp-free on purpose: the NR form t*exp(poly(t)) costs a transcendental
# per element in the sweep kernel's hot tile pass.
_ERFCX_P12 = (
    -3.3165308299e-08, 2.8209689277e-01, 2.8203939145e-01,
    2.4763853382e-01, 1.6907953642e-01, 1.2618805762e-01,
    -1.7237056852e-01, 3.9533528873e-01, -8.6823027223e-01,
    9.2534894166e-01, -5.2180538714e-01, 1.5311423141e-01,
    -1.8434608331e-02,
)


def _erfcx_nr(z):
    """erfcx(z) for z >= 0, exp-free polynomial fit (see _ERFCX_P12)."""
    t = 1.0 / (1.0 + 0.5 * z)
    poly = _ERFCX_P12[12]
    for coef in _ERFCX_P12[11::-1]:
        poly = poly * t + coef
    return poly


def probit_tail_stats(u):
    """The three probit quantities the fused sweep kernel consumes, via ONE
    erfcx evaluation, ONE exp and ONE log per element (the log-space route
    log_ndtr -> exp(log pdf - log Phi) costs two logs and three exps):

      e = erfcx(|u|/sqrt 2)           so  Phi(-|u|) = 0.5 * e * g
      g = exp(-u^2/2)                 so  pdf(u)    = g / sqrt(2 pi)
      d = log Phi(u) - log Phi(-u)  = sign(u) * log((1 - Phi_lo)/Phi_lo)

    Tail behavior is exact in the limits: when g underflows (|u| > ~13 in
    f32) d overflows to +/-inf and the inclusion logit saturates sigmoid
    to the correct 0/1; the small-side Mills ratio pdf/Phi(-|u|) =
    sqrt(2/pi)/e never touches g at all (see mills_ratios_from_stats).
    """
    au = jnp.abs(u)
    e = _erfcx_nr(au * 0.7071067811865476)
    g = jnp.exp(-0.5 * au * au)
    phi_lo = 0.5 * e * g                       # Phi(-|u|) <= 0.5
    d_abs = -jnp.log(phi_lo / (1.0 - phi_lo))  # >= 0
    d = jnp.where(u >= 0, d_abs, -d_abs)
    return e, g, d


_SQRT_2_OVER_PI = 0.7978845608028654
_INV_SQRT_2PI = 0.3989422804014327


# ---------------------------------------------------------------------------
# Polynomial-only probit fast paths for the fused sweep kernel (float32).
#
# The kernel needs, per (j, k) cell with u = theta_j + zeta_k:
#   d(u)  = log Phi(u) - log Phi(-u)       (the probit inclusion logit)
#   imr1  = pdf(u)/Phi(u), imr0 = -pdf(u)/Phi(-u)   (inverse Mills ratios)
# These are smooth 1-D functions of u, so instead of assembling them from
# erfcx + exp + log + div per element (probit_tail_stats), they are fitted
# directly as Chebyshev-derived minimax polynomials evaluated by Horner in a
# scaled variable (f32-stable).  Accuracy (f32 evaluation, validated in
# tests/test_special.py):
#   d: < 8e-7 absolute for |u| <= 6.5 (where sigmoid(d) is unsaturated) and
#      < 3e-6 for 6.5 < |u| <= 40 (|logit| > 21: sigmoid saturated);
#   imr1/imr0: < 9e-7 absolute over |u| <= 40.
# Both clamp |u| at 40 (logit magnitude 800+; Mills ratio within 1e-7 of
# its asymptote), so no polynomial is ever extrapolated.
#
# Decompositions (a = |u|):
#   d_abs(a)  = a^2/2 + psi(a)  with  psi = log1p(-Phi(-a)) - log Phi(-a)
#               - a^2/2 fitted on [0, 6.5] (deg 16, s = a/3.25 - 1); for
#               a > 6.5 psi(a) = chi(a) = -log(0.5 erfcx(a/sqrt2)) to 5e-11,
#               fitted on [6.5, 40] (deg 12).
#   m_small(a) = pdf(a)/Phi(-a) = a + bounded correction fitted in
#               t = 1/(1 + a/2) on [0, 40] (deg 12).
#   m_large(a) = pdf(a)/Phi(a): Gaussian decay, fitted on [0, 6.5] (deg 16);
#               < 2e-10 beyond, where it is taken as 0.
# ---------------------------------------------------------------------------

_PSI16 = (
    2.1757977912e+00, 8.7238583956e-01, -3.6892018123e-01,
    2.6639334422e-01, -3.0652694159e-01, 3.5548457997e-01,
    -2.6189238628e-01, -2.4213697891e-02, 2.8364683062e-01,
    -1.8458533370e-01, -1.4809996449e-01, 2.0059578844e-01,
    2.6626983370e-02, -1.0002159820e-01, 1.0627602737e-02,
    2.0535995726e-02, -4.6850444672e-03,
)
_CHI12 = (
    4.0670847394e+00, 7.1777561998e-01, -2.5663766034e-01,
    1.2229208453e-01, -6.5470883526e-02, 3.4052325126e-02,
    -1.8544414127e-02, 2.1486756963e-02, -1.5912873977e-02,
    -7.3921800144e-03, 7.0181599787e-03, 9.4303084590e-03,
    -6.7408343426e-03,
)
_MSC12 = (
    3.9501551376e-01, 4.3649747640e-01, 6.9558655886e-03,
    -5.9315123697e-02, 1.6028903291e-02, 9.0810490265e-03,
    -8.6900561279e-03, 1.2751740786e-03, 2.3521225869e-03,
    -1.4029417590e-03, -2.0112653784e-04, 3.2224146215e-04,
    -3.4510945732e-05,
)
_ML16 = (
    2.0303841922e-03, -2.1472235766e-02, 1.0271730111e-01,
    -2.8637921054e-01, 4.9205951297e-01, -4.5959027757e-01,
    -3.7565569484e-02, 7.1528291312e-01, -6.2360501754e-01,
    -4.9158524153e-01, 9.3841426405e-01, 1.4786603581e-01,
    -7.2913628712e-01, 9.6723972682e-03, 3.1196982724e-01,
    -1.2737141303e-02, -5.7942322326e-02,
)


def _horner(coefs, s):
    acc = coefs[-1]
    for c in coefs[-2::-1]:
        acc = acc * s + c
    return acc


def probit_logit_fast(u):
    """d(u) = log Phi(u) - log Phi(-u) as two Horner evaluations — no exp,
    log or division (see block comment above).  float32 kernel path."""
    a = jnp.minimum(jnp.abs(u), 40.0)
    psi_v = _horner(_PSI16, a * (1.0 / 3.25) - 1.0)
    chi_v = _horner(_CHI12, (a - 6.5) * (2.0 / 33.5) - 1.0)
    tail = jnp.where(a > 6.5, chi_v, psi_v)
    d_abs = 0.5 * a * a + tail
    return jnp.where(u >= 0, d_abs, -d_abs)


def mills_fast(u):
    """(imr1, imr0) = (pdf/Phi(u), -pdf/Phi(-u)) with the reference's -u
    clamps (R/utils.R:172-191), polynomial-only except one reciprocal.
    float32 kernel path."""
    a = jnp.minimum(jnp.abs(u), 40.0)
    t = 1.0 / (1.0 + 0.5 * a)
    m_small = a + _horner(_MSC12, (t - 0.047619047619047616)
                          * (2.0 / 0.9523809523809523) - 1.0)
    m_large = jnp.where(a > 6.5, 0.0,
                        _horner(_ML16, a * (1.0 / 3.25) - 1.0))
    pos = u >= 0
    imr1 = jnp.maximum(jnp.where(pos, m_large, m_small), -u)
    imr0 = jnp.minimum(-jnp.where(pos, m_small, m_large), -u)
    return imr1, imr0


def mills_ratios_from_stats(u, e, g):
    """(inverse-Mills ratios) imr1 = pdf(u)/Phi(u), imr0 = -pdf(u)/Phi(-u)
    from probit_tail_stats outputs, clamped at -u as in the reference
    (R/utils.R:172-191).  The small-tail ratio uses sqrt(2/pi)/e, in which
    the underflowing gaussian factor cancels analytically."""
    pdf = _INV_SQRT_2PI * g
    m_small = _SQRT_2_OVER_PI / e              # pdf/Phi(-|u|)
    m_large = pdf / (1.0 - 0.5 * e * g)        # pdf/Phi(+|u|)
    pos = u >= 0
    imr1 = jnp.maximum(jnp.where(pos, m_large, m_small), -u)
    imr0 = jnp.minimum(-jnp.where(pos, m_small, m_large), -u)
    return imr1, imr0


def inv_mills_ratio(y: int, u, log_1_pnorm_u, log_pnorm_u):
    """Inverse Mills ratio for the truncated-normal posterior mean of the
    probit latent variable (reference: R/utils.R:172-191).

    y must be a static Python int in {0, 1}.
    """
    if y == 1:
        m = jnp.exp(-0.5 * u * u - _LOG_SQRT_2PI - log_pnorm_u)
        # reference clamps m at -U elementwise (m[m < -U] <- -U)
        m = jnp.maximum(m, -u)
    else:
        m = -jnp.exp(-0.5 * u * u - _LOG_SQRT_2PI - log_1_pnorm_u)
        m = jnp.minimum(m, -u)
    return m


def _e1_series(x):
    """E1(x) for 0 < x <= 1 via the convergent power series
    E1(x) = -gamma - log x + sum_{k>=1} (-1)^{k+1} x^k / (k * k!)."""
    # 30 terms: remainder < 1/(30*30!) at x=1, far below f64 eps.
    def body(k, carry):
        term, acc = carry
        kf = jnp.asarray(k, x.dtype)
        term = term * (-x) / kf
        acc = acc - term / kf
        return term, acc

    term0 = jnp.ones_like(x)
    acc0 = jnp.zeros_like(x)
    term, acc = jax.lax.fori_loop(1, 31, body, (term0, acc0))
    return -_EULER_GAMMA - jnp.log(x) + acc


def _q_lentz_cf(x, n_iter: int = 80):
    """Q(x) = e^x E1(x) for x > 1 via the modified Lentz continued fraction,
    same recurrence as the reference (R/utils.R:346-423) but with a fixed
    iteration count so it is jittable.  80 iterations drives the update factor
    |Delta - 1| below 1e-14 for all x >= 1."""
    eps1 = jnp.asarray(1e-30, x.dtype)
    f = jnp.full_like(x, eps1)
    C = jnp.full_like(x, eps1)
    D = jnp.zeros_like(x)

    def body(j, carry):
        f, C, D = carry
        jf = jnp.asarray(j, x.dtype)
        a = (jf - 1.0) ** 2
        b = x + 2.0 * jf - 1.0
        D = 1.0 / (b - a * D)
        C = b - a / C
        f = f * (C * D)
        return f, C, D

    f, C, D = jax.lax.fori_loop(2, 2 + n_iter, body, (f, C, D))
    return 1.0 / (x + 1.0 + f)


def q_approx(x):
    """Q(x) = e^x E1(x), the key quantity of the exact df=1 horseshoe
    local-scale update lam2_inv = 1/(Q(L) L) - 1
    (reference: R/utils.R:346-423, R/atlasqtl_global_local_core.R:250-254).

    Series branch for x <= 1, Lentz continued fraction for x > 1.
    """
    x = jnp.asarray(x)
    safe_lo = jnp.maximum(jnp.minimum(x, 1.0), jnp.finfo(x.dtype).tiny)
    safe_hi = jnp.maximum(x, 1.0)
    lo = jnp.exp(safe_lo) * _e1_series(safe_lo)
    hi = _q_lentz_cf(safe_hi)
    return jnp.where(x <= 1.0, lo, hi)


def upper_gamma(a, x):
    """Non-regularized upper incomplete gamma Gamma(a, x) for a > 0
    (reference dep: gsl::gamma_inc at R/update_vb.R:74; only a in (0, 2) is
    exercised by the annealed df=1 local-scale update)."""
    return jnp.exp(jnp.log(_gammaincc(a, x)) + gammaln(a))


def upper_gamma_ratio(c, x):
    """Gamma(2-c, x) / (Gamma(1-c, x) * x) computed via regularized gammas:
    ratio = [P-free] Gamma(2-c,x)/Gamma(1-c,x) = gammaincc(2-c,x)*Gamma(2-c) /
    (gammaincc(1-c,x)*Gamma(1-c)).  Stable in log-space for moderate x.

    Past the dtype's underflow horizon gammaincc is exactly 0 (x ~ 87 in
    f32, ~700 in f64), turning the ratio into log(0)-log(0) = NaN — the
    silent-NaN bug of rounds 2-3 (annealing routinely produces x in the
    tens of thousands at padded rows).  The large-x branch uses the
    Tricomi asymptotic Gamma(a, x) ~ x^{a-1} e^{-x} (1 + (a-1)/x + ...):
    the e^{-x} and leading powers cancel exactly in the ratio, leaving a
    3-term rational correction (relative error (2/x)^4 at the switch:
    ~1e-11 at the f64 threshold 600, ~4e-7 at the f32 threshold 80 —
    both below the dtype's working precision for this update).  The f32
    threshold sits just below the gammaincc underflow horizon (x ~ 87,
    where e^{-x} leaves the normal range), so the exact log-space path
    covers the whole band it can represent."""
    x = jnp.asarray(x)
    thresh = 600.0 if x.dtype == jnp.float64 else 80.0
    x_lo = jnp.minimum(x, thresh)
    log_num = jnp.log(_gammaincc(2.0 - c, x_lo)) + gammaln(2.0 - c)
    log_den = jnp.log(_gammaincc(1.0 - c, x_lo)) + gammaln(1.0 - c)
    exact = jnp.exp(log_num - log_den - jnp.log(x_lo))

    def s3(a):
        t1 = (a - 1.0) / x
        t2 = t1 * (a - 2.0) / x
        t3 = t2 * (a - 3.0) / x
        return 1.0 + t1 + t2 + t3

    asym = s3(2.0 - c) / s3(1.0 - c)
    return jnp.where(x > thresh, asym, exact)


def hyperg_1f1(a, b, x, n_terms: int = 400):
    """Kummer confluent hypergeometric 1F1(a; b; x) by direct series with a
    fixed number of terms (reference dep: gsl::hyperg_1F1 at
    R/update_vb.R:78-81).

    Valid for b not a non-positive integer and |x| <~ 50 (the series
    overflows/cancels beyond that).  The annealed general-df local update no
    longer calls this: it evaluates the mathematically-equal Kummer-U
    integral representation instead (ops/horseshoe.py:lam2_inv_annealed),
    which is stable for all x.  Kept as a tested utility / cross-check.
    """
    x = jnp.asarray(x)
    a = jnp.asarray(a, x.dtype)
    b = jnp.asarray(b, x.dtype)

    def body(n, carry):
        term, acc = carry
        nf = jnp.asarray(n, x.dtype)
        term = term * (a + nf) / (b + nf) * x / (nf + 1.0)
        return term, acc + term

    term0 = jnp.ones_like(x + a + b)
    acc0 = term0
    _, acc = jax.lax.fori_loop(0, n_terms, body, (term0, acc0))
    return acc


def owens_t(h, a, n_nodes: int = 64):
    """Owen's T function T(h, a) = 1/(2*pi) * int_0^a exp(-h^2(1+t^2)/2)/(1+t^2) dt
    via fixed Gauss-Legendre quadrature (reference dep: PowerTOST::OwensT at
    R/utils.R:227).  Used in the (n0, t02) elicitation; accurate to ~1e-14 for
    |a| <= 1 which is the only regime the elicitation exercises
    (a = 1/sqrt(1+2*s2) <= 1)."""
    import numpy as np

    nodes, weights = np.polynomial.legendre.leggauss(n_nodes)
    h = jnp.asarray(h)
    a = jnp.asarray(a)
    # map t in [-1, 1] -> u in [0, a]
    u = 0.5 * a[..., None] * (nodes + 1.0)
    w = 0.5 * a[..., None] * weights
    integrand = jnp.exp(-0.5 * h[..., None] ** 2 * (1.0 + u * u)) / (1.0 + u * u)
    return jnp.sum(w * integrand, axis=-1) / (2.0 * jnp.pi)
