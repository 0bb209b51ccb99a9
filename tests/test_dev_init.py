"""Device-side random init (models/global_local.py:auto_init_device) must
draw from the SAME sampling distributions as the host path
(inference/elicitation.py:auto_set_init), which itself mirrors the
reference (R/set_hyper_init.R:356-418).  The device path is the default on
accelerators (api.py use_dev_init) but the CPU suite never exercised its
distributions until round 5 — the advisor found sig2_beta off by
(sig2_inv*tau)^2 there.  These are moment tests sized so that the round-4
bug (a ~1e4 multiplicative error) is orders of magnitude outside tolerance
while honest sampling noise is well inside it."""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy.special import digamma

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic


@pytest.fixture(scope="module")
def draws():
    n, p, q = 120, 256, 2048
    rng = np.random.default_rng(7)
    x = rng.binomial(2, 0.3, size=(n, p)).astype(np.float64)
    x = x[:, x.std(0) > 0][:, :p]
    p = x.shape[1]
    y = rng.normal(size=(n, q))
    cfg = Config(dtype=jnp.float64, shr_fac_inv=float(q))
    data = gl.build_data(x, y, cfg)
    dev = gl.auto_init_device(0, data, (5.0, 25.0), float(q), cfg)
    host = elic.auto_set_init(y, p, (5.0, 25.0), float(q), user_seed=1)
    n0, t02 = elic.get_n0_t02(1, p, (5.0, 25.0))
    return data, dev, host, p, q, float(n0[0]), float(t02)


def test_gam_mean_matches(draws):
    data, dev, host, p, q, n0, t02 = draws
    g_dev = np.asarray(dev.gam)[:p, :q]
    # both are pnorm(n0 + (s02+t02) * Z): compare sample means (SE ~ 1e-4)
    assert abs(g_dev.mean() - host.gam_vb.mean()) < 2e-3


def test_sig2_beta_distribution_matches(draws):
    data, dev, host, p, q, n0, t02 = draws
    s_dev = np.asarray(dev.sig2_beta)[:q]
    s_host = host.sig2_beta_vb
    # 1/sig2_beta = g2 * sig2_inv * tau with g2 ~ Gamma(2, 1), so
    # E[log sig2_beta] = -psi(2) - log(sig2_inv * tau).  The round-4 device
    # bug shifted this by 2*log(sig2_inv*tau) ~ -9.2 — far outside the
    # ~0.02 standard error at q=2048.
    tau = float(host.tau_vb[0])
    theory = -float(digamma(2.0)) - np.log(1e-2 * tau)
    assert abs(np.log(s_dev).mean() - theory) < 0.1
    assert abs(np.log(s_host).mean() - theory) < 0.1
    assert abs(np.log(s_dev).mean() - np.log(s_host).mean()) < 0.15
    # second moment: Var[log sig2_beta] = psi'(2) ~ 0.645
    assert abs(np.log(s_dev).var() - 0.6449) < 0.1


def test_tau_matches_host(draws):
    data, dev, host, p, q, n0, t02 = draws
    np.testing.assert_allclose(np.asarray(dev.tau)[:q], host.tau_vb,
                               rtol=1e-6)


def test_zeta_moments(draws):
    data, dev, host, p, q, n0, t02 = draws
    z = np.asarray(dev.zeta)[:q]
    assert abs(z.mean() - n0) < 4 * np.sqrt(t02 / q)
    assert abs(z.var(ddof=1) / t02 - 1.0) < 0.15


def test_theta_scale_consistent(draws):
    data, dev, host, p, q, n0, t02 = draws
    th = np.asarray(dev.theta)[:p]
    s0 = float(np.asarray(dev.sig02_inv))
    # theta ~ N(0, 1/(sig02_inv * shr_fac_inv)) given the drawn sig02_inv
    assert abs(th.var(ddof=1) * s0 * q - 1.0) < 0.5
