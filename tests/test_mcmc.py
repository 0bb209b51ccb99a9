"""Gold-standard cross-check: exact Gibbs posterior vs CAVI approximation.

The CAVI engine and the Gibbs sampler target the same joint model; on a
well-separated fixture their posterior inclusion probabilities and hotspot
propensities must agree (CAVI is approximate, so tolerances are statistical,
not numerical)."""
import numpy as np
import pytest
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.io.prepare import prepare_data
from atlasqtl_tpu.mcmc.gibbs import run_gibbs

from conftest import simulate_fixture


@pytest.mark.slow
def test_gibbs_matches_cavi_on_fixture():
    y, x, p_act = simulate_fixture(n=150, p=32, p_act=6, q=12, seed=9)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=16, shr_fac_inv=float(q_eff))
    data = gl.build_data(dat.x, dat.y, cfg)
    hyper_spec = elic.auto_set_hyper(dat.y, p_eff, (4, 16))
    hyper = gl.build_hyper(hyper_spec, data.y.shape[1], cfg)

    # CAVI fit
    import atlasqtl_tpu as aq
    res = aq.atlasqtl(y, x, p0=(4, 16), dtype=jnp.float64, verbose=0,
                      user_seed=3)
    assert res.converged

    # exact posterior via Gibbs
    pip, beta_mean, theta_mean, zeta_mean = run_gibbs(
        data, hyper, cfg, n_samples=800, n_burnin=300, seed=1)
    pip = pip[:p_eff, :q_eff]

    # strong signals: both methods saturate
    assert (pip[:p_act] > 0.9).mean() > 0.9
    assert (res.gam_vb[:p_act] > 0.9).mean() > 0.9
    # nulls: both near zero
    assert pip[p_act:].mean() < 0.1
    assert res.gam_vb[p_act:].mean() < 0.1
    # hotspot propensities ordered the same way (actives above inactives)
    assert theta_mean[:p_act].min() > theta_mean[p_act:p_eff].max() - 0.2
    # PIP agreement within Monte-Carlo/approximation tolerance
    assert np.abs(pip - res.gam_vb).mean() < 0.05


@pytest.mark.slow
def test_gibbs_beta_recovery():
    y, x, p_act = simulate_fixture(n=200, p=24, p_act=4, q=8, seed=4)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=8, shr_fac_inv=float(q_eff))
    data = gl.build_data(dat.x, dat.y, cfg)
    hyper = gl.build_hyper(elic.auto_set_hyper(dat.y, p_eff, (3, 9)),
                           data.y.shape[1], cfg)
    pip, beta_mean, theta_mean, _ = run_gibbs(
        data, hyper, cfg, n_samples=500, n_burnin=200, seed=2)
    # OLS on the active block as the gold effect-size reference
    xa = dat.x[:, :p_act]
    ols = np.linalg.lstsq(xa, dat.y, rcond=None)[0]
    np.testing.assert_allclose(beta_mean[:p_act, :q_eff], ols, atol=0.15)


@pytest.mark.slow
def test_nuts_matches_cavi_and_gibbs_on_fixture():
    """NUTS-within-Gibbs (non-centered horseshoe block, mcmc/nuts.py) must
    agree with both the CAVI approximation and the pure-Gibbs exact sampler
    on a separated fixture — same tolerances as the Gibbs cross-check."""
    from atlasqtl_tpu.mcmc.nuts import run_nuts

    y, x, p_act = simulate_fixture(n=150, p=32, p_act=6, q=12, seed=9)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=16, shr_fac_inv=float(q_eff))
    data = gl.build_data(dat.x, dat.y, cfg)
    hyper = gl.build_hyper(elic.auto_set_hyper(dat.y, p_eff, (4, 16)),
                           data.y.shape[1], cfg)

    pip, beta_mean, theta_mean, zeta_mean = run_nuts(
        data, hyper, cfg, n_samples=400, n_burnin=200, seed=1)
    pip = pip[:p_eff, :q_eff]

    assert (pip[:p_act] > 0.9).mean() > 0.9
    assert pip[p_act:].mean() < 0.1
    # hotspot propensities separate actives from inactives
    assert theta_mean[:p_act].min() > theta_mean[p_act:p_eff].max() - 0.2

    import atlasqtl_tpu as aq
    res = aq.atlasqtl(y, x, p0=(4, 16), dtype=jnp.float64, verbose=0,
                      user_seed=3)
    assert np.abs(pip - res.gam_vb).mean() < 0.05

    # NUTS and Gibbs target the same posterior: tight agreement
    pip_g, _, theta_g, _ = run_gibbs(data, hyper, cfg, n_samples=800,
                                     n_burnin=300, seed=1)
    assert np.abs(pip - pip_g[:p_eff, :q_eff]).mean() < 0.03


@pytest.mark.slow
def test_smc_matches_cavi_on_fixture():
    from atlasqtl_tpu.mcmc.smc import run_smc
    y, x, p_act = simulate_fixture(n=150, p=24, p_act=5, q=8, seed=11)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=8, shr_fac_inv=float(q_eff))
    data = gl.build_data(dat.x, dat.y, cfg)
    hyper = gl.build_hyper(elic.auto_set_hyper(dat.y, p_eff, (3, 9)),
                           data.y.shape[1], cfg)
    pip, beta_mean, theta_mean, zeta_mean, log_ev = run_smc(
        data, hyper, cfg, n_particles=16, n_mutations=2, n_final=150, seed=5)
    pip = pip[:p_eff, :q_eff]
    assert np.isfinite(log_ev)
    assert (pip[:p_act] > 0.5).all()
    assert (pip[:p_act] > 0.9).mean() > 0.8
    assert pip[p_act:].mean() < 0.1

    import atlasqtl_tpu as aq
    res = aq.atlasqtl(y, x, p0=(3, 9), dtype=jnp.float64, verbose=0,
                      user_seed=6)
    assert np.abs(pip - res.gam_vb).mean() < 0.05
