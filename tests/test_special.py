"""Special functions vs SciPy/NumPy oracles."""
import numpy as np
import pytest
import scipy.special as sps

import jax
import jax.numpy as jnp

from atlasqtl_tpu.ops import special as sp


def test_log1pexp():
    x = np.array([-800.0, -30.0, -1.0, 0.0, 1.0, 30.0, 800.0])
    got = np.asarray(sp.log1pexp(jnp.asarray(x)))
    exp = np.logaddexp(x, 0.0)
    np.testing.assert_allclose(got, exp, rtol=1e-14)


def test_log_ndtr_both():
    x = np.linspace(-30, 30, 101)
    lo, hi = sp.log_ndtr_both(jnp.asarray(x))
    # atol covers the far tail where log Phi ~ -1e-7 and jax/scipy round
    # differently at machine precision
    np.testing.assert_allclose(np.asarray(lo), sps.log_ndtr(x), rtol=1e-10,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(hi), sps.log_ndtr(-x), rtol=1e-10,
                               atol=1e-8)


def test_q_approx_vs_scipy():
    # Q(x) = e^x E1(x); check both branches (series x<=1, Lentz CF x>1)
    x = np.concatenate([
        np.geomspace(1e-8, 1.0, 50),
        np.geomspace(1.0 + 1e-8, 500.0, 50),
    ])
    got = np.asarray(sp.q_approx(jnp.asarray(x)))
    exp = sps.exp1(x) * np.exp(x)
    np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_q_approx_large_x_asymptotic():
    # e^x E1(x) ~ (1/x) sum_k (-1)^k k! / x^k for large x
    x = np.geomspace(1e3, 1e8, 20)
    got = np.asarray(sp.q_approx(jnp.asarray(x)))
    acc = np.zeros_like(x)
    term = np.ones_like(x)
    for k in range(8):
        acc = acc + term
        term = term * -(k + 1) / x
    np.testing.assert_allclose(got, acc / x, rtol=1e-10)


def test_inv_mills_ratio():
    u = np.linspace(-8, 8, 33)
    lp, l1p = sps.log_ndtr(u), sps.log_ndtr(-u)
    m1 = np.asarray(sp.inv_mills_ratio(1, jnp.asarray(u), jnp.asarray(l1p),
                                       jnp.asarray(lp)))
    m0 = np.asarray(sp.inv_mills_ratio(0, jnp.asarray(u), jnp.asarray(l1p),
                                       jnp.asarray(lp)))
    exp1_ = np.maximum(np.exp(-u**2/2 - 0.5*np.log(2*np.pi) - lp), -u)
    exp0_ = np.minimum(-np.exp(-u**2/2 - 0.5*np.log(2*np.pi) - l1p), -u)
    np.testing.assert_allclose(m1, exp1_, rtol=1e-10)
    np.testing.assert_allclose(m0, exp0_, rtol=1e-10)


def test_upper_gamma_ratio():
    # the annealed df=1 local-scale update ratio vs scipy (scipy itself is
    # NaN past the f64 underflow horizon x ~ 700; large x is covered by
    # test_upper_gamma_ratio_large_x)
    for c in [0.5, 0.68, 0.9, 0.99]:
        x = np.geomspace(1e-4, 600.0, 40)
        got = np.asarray(sp.upper_gamma_ratio(c, jnp.asarray(x)))
        g = lambda a: sps.gammaincc(a, x) * sps.gamma(a)
        exp = g(2 - c) / (g(1 - c) * x)
        np.testing.assert_allclose(got, exp, rtol=1e-8)


def test_hyperg_1f1_series():
    # moderate arguments against scipy.hyp1f1 (incl. negative non-integer b)
    a, b = 1.3, 2.7
    x = np.linspace(-5, 20, 21)
    got = np.asarray(sp.hyperg_1f1(a, b, jnp.asarray(x)))
    exp = sps.hyp1f1(a, b, x)
    np.testing.assert_allclose(got, exp, rtol=1e-8)
    got2 = np.asarray(sp.hyperg_1f1(0.7, -0.4, jnp.asarray(np.linspace(0.1, 5.0, 10))))
    exp2 = sps.hyp1f1(0.7, -0.4, np.linspace(0.1, 5.0, 10))
    np.testing.assert_allclose(got2, exp2, rtol=1e-7)


def test_owens_t():
    h = np.array([0.1, 0.5, 1.0, 2.0, 4.0])
    a = np.array([0.05, 0.3, 0.7, 0.9, 1.0])
    got = np.asarray(sp.owens_t(jnp.asarray(h), jnp.asarray(a)))
    exp = sps.owens_t(h, a)
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_q_approx_jittable():
    f = jax.jit(sp.q_approx)
    x = jnp.asarray([0.5, 2.0])
    np.testing.assert_allclose(np.asarray(f(x)),
                               sps.exp1(np.asarray(x)) * np.exp(np.asarray(x)),
                               rtol=1e-9)


def test_log_ndtr_both_fast():
    import scipy.special as sps
    x = np.linspace(-35, 35, 2001)
    lo, hi = sp.log_ndtr_both_fast(jnp.asarray(x, jnp.float64))
    np.testing.assert_allclose(np.asarray(lo), sps.log_ndtr(x), atol=2e-7,
                               rtol=2e-7)
    np.testing.assert_allclose(np.asarray(hi), sps.log_ndtr(-x), atol=2e-7,
                               rtol=2e-7)
    # f32 dispatch of log_ndtr_both routes to the fast path and stays finite
    lo32, hi32 = sp.log_ndtr_both(jnp.asarray(x, jnp.float32))
    assert np.isfinite(np.asarray(lo32)).all()
    np.testing.assert_allclose(np.asarray(lo32), sps.log_ndtr(x), atol=3e-5,
                               rtol=1e-5)


def test_probit_tail_stats():
    """The fused-kernel probit stats (one erfcx + one exp + one log per
    element) match scipy: d = log Phi(u) - log Phi(-u), and the Mills
    ratios match phi/Phi with the reference's -u clamps."""
    import scipy.special as sps
    import scipy.stats as sst
    u = np.linspace(-12.5, 12.5, 2001)   # pre-saturation range
    e, g, d = sp.probit_tail_stats(jnp.asarray(u, jnp.float64))
    np.testing.assert_allclose(np.asarray(d),
                               sps.log_ndtr(u) - sps.log_ndtr(-u),
                               atol=4e-7, rtol=4e-7)
    imr1, imr0 = sp.mills_ratios_from_stats(jnp.asarray(u, jnp.float64),
                                            e, g)
    pdf = sst.norm.pdf(u)
    exp1 = np.maximum(pdf / sst.norm.cdf(u), -u)
    exp0 = np.minimum(-pdf / sst.norm.cdf(-u), -u)
    np.testing.assert_allclose(np.asarray(imr1), exp1, atol=2e-6, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(imr0), exp0, atol=2e-6, rtol=2e-6)
    # saturation tails: d overflows to +/-inf with the correct sign (the
    # sigmoid consumer saturates to the exact 0/1 limit), Mills stay finite
    ub = np.array([-40.0, 40.0])
    e, g, d = sp.probit_tail_stats(jnp.asarray(ub, jnp.float32))
    assert np.asarray(d)[0] == -np.inf and np.asarray(d)[1] == np.inf
    imr1, imr0 = sp.mills_ratios_from_stats(jnp.asarray(ub, jnp.float32),
                                            e, g)
    # phi/Phi(-40) = 40 + 1/40 - ... asymptotically; the -u clamp is a floor
    np.testing.assert_allclose(np.asarray(imr1), [40.02497, 0.0],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(imr0), [0.0, -40.02497],
                               atol=1e-3)


def test_probit_logit_fast_and_mills_fast():
    """Polynomial-only kernel paths (fused sweep, float32): accuracy vs
    scipy f64 on exact-f32 inputs, across both fit branches and the clamp."""
    import scipy.stats as sst
    from scipy.special import log_ndtr

    u32 = jnp.asarray(np.concatenate([np.linspace(-36, 36, 50001),
                                      np.linspace(-8, 8, 50001)]),
                      jnp.float32)
    u = np.asarray(u32, np.float64)
    d_ref = log_ndtr(u) - log_ndtr(-u)
    d = np.asarray(sp.probit_logit_fast(u32), np.float64)
    m = np.abs(u) <= 6.5
    # unsaturated region: f32 round-off grade; saturated: |logit| > 21 so
    # 1e-5 absolute is invisible through the sigmoid
    np.testing.assert_allclose(d[m], d_ref[m], atol=3e-6)
    np.testing.assert_allclose(d[~m], d_ref[~m], atol=2e-5)
    # d(0) = 0 and odd symmetry through the sign select
    z = np.asarray(sp.probit_logit_fast(jnp.zeros((), jnp.float32)))
    assert abs(z) < 1e-6

    pdf = sst.norm.pdf(u)
    imr1_ref = np.maximum(pdf / sst.norm.cdf(u), -u)
    imr0_ref = np.minimum(-pdf / sst.norm.cdf(-u), -u)
    i1, i0 = sp.mills_fast(u32)
    np.testing.assert_allclose(np.asarray(i1, np.float64), imr1_ref,
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(i0, np.float64), imr0_ref,
                               atol=3e-6)
    # clamp at |u| = 40: still finite and at the asymptote
    ub = jnp.asarray([-50.0, 50.0], jnp.float32)
    d = np.asarray(sp.probit_logit_fast(ub))
    assert np.isfinite(d).all() and d[0] < -700 and d[1] > 700
    i1, i0 = sp.mills_fast(ub)
    np.testing.assert_allclose(np.asarray(i1), [50.0, 0.0], atol=2e-2)
    np.testing.assert_allclose(np.asarray(i0), [0.0, -50.0], atol=2e-2)


def test_upper_gamma_ratio_large_x():
    """Regression for the silent-NaN bug of rounds 2-3: gammaincc
    underflows to exactly 0 for large x, turning the annealed df=1
    horseshoe ratio into log(0) - log(0) = NaN; the large-x branch must
    agree with SciPy where SciPy is finite and with the Tricomi
    asymptotics beyond."""
    from scipy.special import gammaincc as sgic, gamma as sgam
    from atlasqtl_tpu.ops.special import upper_gamma_ratio

    def ref(c, x):
        return sgic(2 - c, x) * sgam(2 - c) / (sgic(1 - c, x)
                                               * sgam(1 - c)) / x

    for c in (0.3, 0.5, 0.9):
        for x in (0.5, 5.0, 29.0, 31.0, 100.0, 600.0):
            a = float(upper_gamma_ratio(c, jnp.asarray(x, jnp.float64)))
            assert np.isfinite(a)
            assert abs(a - ref(c, x)) / ref(c, x) < 5e-5, (c, x)
        for x in (1e4, 4e4, 1e6):  # Gamma(a, x) == 0.0 in f64 here
            a = float(upper_gamma_ratio(c, jnp.asarray(x, jnp.float64)))
            assert np.isfinite(a)
            assert abs((a - 1.0) - 1.0 / x) < 3.0 / x ** 2, (c, x)
