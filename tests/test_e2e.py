"""End-to-end fits (the reference test suite's single assertion — convergence
on the simulated fixture, tests/testthat/test_convergence.R — plus the
stronger invariants the reference enforces implicitly: monotone ELBO in debug
mode and correct hotspot recovery)."""
import numpy as np
import pytest
import jax.numpy as jnp

import atlasqtl_tpu as aq
from conftest import simulate_fixture


def _monotone(history):
    eps = np.finfo(np.float64).eps ** 0.5
    vals = [lb for _, lb in history]
    return all(b + eps >= a for a, b in zip(vals, vals[1:]))


def test_fixture_converges_annealed(fixture_small):
    y, x, p_act = fixture_small
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123)
    assert res.converged
    assert _monotone(res.elbo_history)
    hot = res.hotspot_sizes()
    assert (hot[:p_act] > 10).all()          # true hotspots recovered
    assert hot[p_act:].max() == 0            # no false hotspots


def test_fixture_converges_no_annealing(fixture_small):
    y, x, _ = fixture_small
    res = aq.atlasqtl(y, x, p0=(5, 25), anneal=None, dtype=jnp.float64,
                      verbose=0, user_seed=1)
    assert res.converged
    assert _monotone(res.elbo_history)


def test_missing_data_converges():
    y, x, p_act = simulate_fixture(missing_frac=0.2, seed=5)
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=11, maxit=600)
    assert res.converged
    assert _monotone(res.elbo_history)
    hot = res.hotspot_sizes()
    assert (hot[:p_act] > 5).all()


def test_float32_sweep_converges(fixture_small):
    """f32 compute with f64 ELBO reductions must keep the monotonicity guard
    satisfied on the small fixture (TPU production profile)."""
    y, x, _ = fixture_small
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float32, verbose=0,
                      user_seed=123)
    assert res.converged


def test_constant_and_collinear_columns():
    y, x, _ = simulate_fixture()
    x_aug = np.column_stack([x, np.ones(x.shape[0]), x[:, 0]])
    res = aq.atlasqtl(y, x_aug, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123, add_collinear_back_=True)
    assert res.converged
    assert len(res.rmvd_cst_x) == 1
    assert len(res.rmvd_coll_x) == 1
    # collinear duplicate re-added with its twin's posterior
    p_all = x.shape[1] + 1  # constant col dropped entirely, duplicate re-added
    assert res.gam_vb.shape[0] == p_all
    np.testing.assert_allclose(res.gam_vb[-1], res.gam_vb[0])


def test_user_hyper_init_roundtrip(fixture_small):
    y, x, _ = fixture_small
    n, p = x.shape
    q = y.shape[1]
    hyper = aq.set_hyper(q, p, eta=1.0, kappa=1.0, n0=-2.0, nu=1.0, rho=1.0,
                         t02=0.1)
    rng = np.random.default_rng(0)
    init = aq.set_init(
        q, p,
        gam_vb=rng.beta(1.0, 4.0 * q - 1.0, size=(p, q)),
        mu_beta_vb=rng.normal(size=(p, q)),
        sig02_inv_vb=float(rng.gamma(max(p, q), 1.0)),
        sig2_beta_vb=1.0 / rng.gamma(2.0, 1.0, size=q),
        sig2_theta_vb=1.0 / (q + rng.gamma(2.0, 1.0, size=p)),
        tau_vb=np.ones(q),
        theta_vb=rng.normal(size=p) * 0.1,
        zeta_vb=rng.normal(-2.0, 0.1, size=q),
    )
    res = aq.atlasqtl(y, x, p0=None, list_hyper=hyper, list_init=init,
                      dtype=jnp.float64, verbose=0)
    assert res.converged


def test_checkpoint_and_trace(tmp_path, fixture_small):
    y, x, _ = fixture_small
    ckpt = tmp_path / "ckpt"
    trace = tmp_path / "trace"
    ckpt.mkdir(); trace.mkdir()
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123, maxit=120, tol=1e-9,
                      checkpoint_path=str(ckpt), trace_path=str(trace))
    # run hits maxit (tiny tol) -> snapshots exist (rolling last two)
    snaps = sorted(ckpt.glob("tmp_output_it_*.npz"))
    assert not res.converged
    assert snaps, "checkpoints should remain when not converged"
    assert (trace / "traces_top_local_x_global_parameters.csv").exists()
    # resume from the snapshot
    init = aq.load_checkpoint(snaps[-1])
    res2 = aq.atlasqtl(y, x, p0=(5, 25), anneal=None, list_init=init,
                       dtype=jnp.float64, verbose=0, maxit=500)
    assert res2.converged


def test_global_only_model(fixture_small):
    """Global-scale-only variant (reference: atlasqtl_global_core_) converges
    with a monotone ELBO and recovers the hotspots."""
    y, x, p_act = fixture_small
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123, model="global")
    assert res.converged
    assert _monotone(res.elbo_history)
    hot = res.hotspot_sizes()
    assert (hot[:p_act] > 10).all()
    # without local scales the variant is slightly less selective than the
    # horseshoe: allow isolated borderline calls, no spurious hotspots
    assert hot[p_act:].max() <= 2


def test_global_only_no_annealing(fixture_small):
    y, x, _ = fixture_small
    res = aq.atlasqtl(y, x, p0=(5, 25), anneal=None, dtype=jnp.float64,
                      verbose=0, user_seed=2, model="global")
    assert res.converged
    assert _monotone(res.elbo_history)


def test_df3_horseshoe(fixture_small):
    """Heavier-tailed local prior (df=3) — the reference core supports df as
    a parameter though its entry point pins df=1."""
    y, x, p_act = fixture_small
    res = aq.atlasqtl(y, x, p0=(5, 25), anneal=None, dtype=jnp.float64,
                      verbose=0, user_seed=123, df=3)
    assert res.converged
    assert _monotone(res.elbo_history)
    hot = res.hotspot_sizes()
    assert (hot[:p_act] > 10).all()


def test_anneal_replicas(fixture_small):
    y, x, p_act = fixture_small
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123, anneal_replicas=3)
    assert res.converged
    assert _monotone(res.elbo_history)
    assert (res.hotspot_sizes()[:p_act] > 10).all()


def test_anneal_replicas_batched_equals_sequential(fixture_small):
    """The batched (vmapped) replica rung must advance every replica exactly
    like the independent per-replica loop, and select the best-ELBO one."""
    import jax
    from atlasqtl_tpu.types import Config
    from atlasqtl_tpu.models import global_local as gl
    from atlasqtl_tpu.inference import elicitation as elic
    from atlasqtl_tpu.inference.driver import _anneal_replicas_batched
    from atlasqtl_tpu.io.prepare import prepare_data
    from atlasqtl_tpu.ops.annealing import annealing_ladder
    from atlasqtl_tpu.ops.sweep import block_gram

    y, x, _ = fixture_small
    dat = prepare_data(y, x, 0.1, 100)
    p, q = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=16, shr_fac_inv=float(q))
    data = gl.build_data(dat.x, dat.y, cfg, q_pad_to=8)
    hyper = gl.build_hyper(elic.auto_set_hyper(dat.y, p, (5, 25)),
                           data.y.shape[1], cfg)
    states = [gl.build_state(elic.auto_set_init(dat.y, p, (5, 25), float(q),
                                                seed), data, cfg)
              for seed in (0, 1, 2)]
    gram = block_gram(data.x, cfg.block_size)
    ladder = annealing_ladder(np.array([1.0, 2.0, 5.0]))

    got, _ = _anneal_replicas_batched(gl, data, hyper, states, gram, ladder,
                                      cfg, None, 0)

    # sequential reference
    best_lb, best_st = -np.inf, None
    for st in states:
        for c in ladder[:-1]:
            st = gl.cavi_iteration(data, hyper, st, gram, c, c, cfg=cfg,
                                   annealed=True)
        lb = float(gl.compute_elbo(data, hyper, st, cfg=cfg))
        if lb > best_lb:
            best_lb, best_st = lb, st

    np.testing.assert_allclose(np.asarray(got.gam), np.asarray(best_st.gam),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.theta),
                               np.asarray(best_st.theta), atol=1e-12)


def test_x_beta_vb_output(fixture_small):
    y, x, _ = fixture_small
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123)
    assert res.x_beta_vb.shape == (x.shape[0], y.shape[1])
    # fitted values should correlate strongly with centered y on signal cols
    yc = y - y.mean(0)
    corr = np.corrcoef(res.x_beta_vb[:, 0], yc[:, 0])[0, 1]
    assert corr > 0.8


def test_missing_impute_mode():
    """VB-imputation missing-data path: complete-data kernel + q(y_mis)
    moments; monotone ELBO and posterior close to the exact-marginal path."""
    y, x, p_act = simulate_fixture(missing_frac=0.15, seed=5)
    res_i = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                        user_seed=11, maxit=600, missing="impute")
    assert res_i.converged
    assert _monotone(res_i.elbo_history)
    hot = res_i.hotspot_sizes()
    assert (hot[:p_act] > 5).all()

    res_e = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                        user_seed=11, maxit=600, missing="exact")
    assert np.abs(res_i.gam_vb - res_e.gam_vb).mean() < 0.03


def test_global_model_impute_mode():
    """missing='impute' on the global-scale-only model (surface symmetry
    with the reference's uniform missing handling,
    R/atlasqtl_global_core.R:19-38): monotone ELBO + convergence."""
    y, x, p_act = simulate_fixture(missing_frac=0.15, seed=5)
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=11, maxit=600, missing="impute",
                      model="global")
    assert res.converged
    assert _monotone(res.elbo_history)
    res_e = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                        user_seed=11, maxit=600, missing="exact",
                        model="global")
    assert np.abs(res.gam_vb - res_e.gam_vb).mean() < 0.03


def test_full_output_dict(fixture_small):
    """full_output returns the reference-named internal list
    (R/atlasqtl_global_local_core.R:404-410), unpadded."""
    y, x, _ = fixture_small
    n, p = x.shape
    q = y.shape[1]
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123, full_output=True)
    fo = res.full_output
    expected = {"beta_vb", "eta_vb", "gam_vb", "kappa_vb", "lam2_inv_vb",
                "nu_s0_vb", "nu_vb", "nu_xi_inv_vb", "rho_s0_vb", "rho_vb",
                "rho_xi_inv_vb", "shr_fac_inv", "sig02_inv_vb",
                "sig2_beta_vb", "sig2_inv_vb", "sig2_theta_vb",
                "sig2_zeta_vb", "tau_vb", "theta_vb", "cp_Y_X", "cp_X",
                "cp_X_Xbeta", "xi_inv_vb", "zeta_vb"}
    assert set(fo) == expected
    assert fo["gam_vb"].shape == (p, q)
    assert fo["cp_Y_X"].shape == (q, p)
    assert fo["cp_X"].shape == (p, p)
    assert fo["cp_X_Xbeta"].shape == (p, q)
    np.testing.assert_allclose(fo["gam_vb"], res.gam_vb, atol=1e-12)
    # cp_X_Xbeta == X^T X beta: check against direct dense computation
    xs = (x - x.mean(0)) / x.std(0, ddof=1)
    np.testing.assert_allclose(
        fo["cp_X_Xbeta"], xs.T @ (xs @ fo["beta_vb"]), rtol=1e-8, atol=1e-8)
    # Gamma factors positive, shapes right
    assert fo["eta_vb"].shape == (q,) and (fo["eta_vb"] > 0).all()
    assert fo["kappa_vb"].shape == (q,) and (fo["kappa_vb"] > 0).all()
    assert fo["nu_vb"] > 0 and fo["rho_vb"] > 0
    assert fo["nu_xi_inv_vb"] == 1.0


def test_full_output_dict_global(fixture_small):
    y, x, _ = fixture_small
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123, full_output=True, model="global")
    expected = {"beta_vb", "eta_vb", "gam_vb", "kappa_vb", "nu_s0_vb",
                "nu_vb", "rho_s0_vb", "rho_vb", "shr_fac_inv",
                "sig02_inv_vb", "sig2_beta_vb", "sig2_inv_vb",
                "sig2_theta_vb", "sig2_zeta_vb", "tau_vb", "theta_vb",
                "zeta_vb"}
    assert set(res.full_output) == expected


def test_annealed_fit_large_padded_l_regression():
    """Regression for the silent-NaN bug (rounds 2-3): at p*q large enough
    that sig02_inv ~ Gamma(max(p,q)) makes the PADDED rows' horseshoe L
    overflow the annealed incomplete-gamma update, the whole state went
    NaN during annealing and sailed through both guards as 'converged'.
    The padded-row L is now pinned and the ratio has a large-x branch."""
    y, x, p_act = simulate_fixture(n=100, p=150, p_act=10, q=40, seed=9)
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=9)
    assert res.converged
    assert np.isfinite(res.gam_vb).all()
    assert np.isfinite(res.lb_opt)
    assert _monotone(res.elbo_history)
    hot = res.hotspot_sizes()
    assert (hot[:p_act] > 10).all()
