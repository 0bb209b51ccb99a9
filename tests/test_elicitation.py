"""Hyperparameter elicitation + init subsystems."""
import numpy as np
import pytest

from atlasqtl_tpu.inference import elicitation as elic


def test_n0_t02_solves_moment_equations():
    p = 500
    for p0 in [(2.0, 10.0), (5.0, 25.0), (1.0, 4.0)]:
        n0, t02 = elic.get_n0_t02(3, p, p0)
        assert n0.shape == (3,)
        mu = elic.get_mu(p0[0], t02, p)
        # E[#active] and V[#active] reproduced
        np.testing.assert_allclose(p * elic.e_phi_x(mu, t02), p0[0],
                                   rtol=1e-6)
        np.testing.assert_allclose(elic.get_v_p_t(mu, t02, p), p0[1],
                                   rtol=1e-5)


def test_n0_t02_infeasible_raises():
    with pytest.raises(ValueError, match="p0"):
        elic.get_n0_t02(1, 50, (25.0, 1e-9))


def test_e_phi_x_2_vs_monte_carlo():
    rng = np.random.default_rng(0)
    mu, s2 = -1.2, 0.7
    draws = rng.normal(mu, np.sqrt(s2), size=2_000_000)
    from scipy.special import ndtr
    mc = (ndtr(draws) ** 2).mean()
    np.testing.assert_allclose(elic.e_phi_x_2(mu, s2), mc, atol=5e-4)


def test_auto_set_hyper_defaults():
    rng = np.random.default_rng(1)
    y = rng.normal(size=(50, 8)) * 2.0
    hs = elic.auto_set_hyper(y, 30, (3, 9))
    assert hs.nu == 1e-2 and hs.rho == 1.0
    np.testing.assert_allclose(hs.eta,
                               1.0 / np.median(np.var(y, axis=0, ddof=1)))
    assert hs.t02 > 0
    assert hs.auto


def test_set_hyper_validation():
    with pytest.raises(ValueError):
        elic.set_hyper(4, 10, eta=-1.0, kappa=1.0, n0=0.0, nu=1.0, rho=1.0,
                       t02=0.1)
    with pytest.raises(ValueError):
        elic.set_hyper(4, 10, eta=np.ones(3), kappa=1.0, n0=0.0, nu=1.0,
                       rho=1.0, t02=0.1)
    hs = elic.set_hyper(4, 10, eta=1.0, kappa=1.0, n0=0.0, nu=1.0, rho=1.0,
                        t02=0.1)
    assert hs.eta.shape == (4,)


def test_set_init_validation():
    p, q = 6, 3
    good = dict(
        gam_vb=np.full((p, q), 0.5), mu_beta_vb=np.zeros((p, q)),
        sig02_inv_vb=1.0, sig2_beta_vb=np.ones(q),
        sig2_theta_vb=np.ones(p), tau_vb=np.ones(q),
        theta_vb=np.zeros(p), zeta_vb=np.zeros(q))
    elic.set_init(q, p, **good)
    bad = dict(good)
    bad["gam_vb"] = np.full((p, q), 1.5)
    with pytest.raises(ValueError):
        elic.set_init(q, p, **bad)


def test_map_hyperprior_elicitation():
    out = elic.map_hyperprior_elicitation((1.0, 10.0), p=100, q=2000,
                                          n_draws=20_000, seed=0)
    assert out["error_E_p"] >= 0 and np.isfinite(out["error_E_p"])
    assert out["error_sd_p"] >= 0 and np.isfinite(out["error_sd_p"])
    with pytest.raises(ValueError):
        elic.map_hyperprior_elicitation((200.0, 10.0), p=100, q=100)
