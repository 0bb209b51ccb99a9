"""Posterior summary utilities (bFDR, hotspot reports, Manhattan data)."""
import numpy as np
import pytest

from atlasqtl_tpu.inference.summarise import assign_bfdr, AtlasQTLResult
from atlasqtl_tpu.ops.annealing import annealing_ladder, check_annealing


def test_assign_bfdr_matches_direct():
    rng = np.random.default_rng(0)
    ppi = rng.uniform(size=(7, 5))
    fdr = assign_bfdr(ppi)
    vec = ppi.ravel(order="F")
    order = np.argsort(-vec, kind="stable")
    direct = np.empty_like(vec)
    direct[order] = np.cumsum(1 - vec[order]) / np.arange(1, vec.size + 1)
    np.testing.assert_allclose(fdr.ravel(order="F"), direct)
    # FDR of the highest-PIP entry equals 1 - its PIP
    jmax = np.unravel_index(np.argmax(ppi), ppi.shape)
    np.testing.assert_allclose(fdr[jmax], 1 - ppi[jmax])


def _dummy_result(gam):
    p, q = gam.shape
    return AtlasQTLResult(
        beta_vb=gam * 0.3, gam_vb=gam, theta_vb=np.zeros(p),
        zeta_vb=np.zeros(q), converged=True, it=10, lb_opt=-1.0, diff_lb=0.01,
        n=50, p=p, q=q, p0=(2.0, 5.0), anneal=(1, 2, 10), tol=0.1, maxit=100,
        rmvd_cst_x=[], rmvd_coll_x={}, names_x=[f"x{j}" for j in range(p)],
        names_y=[f"y{k}" for k in range(q)], elbo_history=[])


def test_summary_and_hotspots():
    gam = np.zeros((6, 4))
    gam[0] = 0.9
    gam[1, :2] = 0.8
    res = _dummy_result(gam)
    s = res.summary()
    assert s["n_pairwise"] == 6
    assert s["n_active_predictors"] == 2
    assert s["top_hotspots"][0] == ("x0", 4)
    pos, sizes = res.manhattan_data()
    assert sizes.tolist() == [4, 2, 0, 0, 0, 0]
    assert res.hotspot_sizes(thres=0.85).tolist() == [4, 0, 0, 0, 0, 0]


def test_repr_paths():
    res = _dummy_result(np.zeros((3, 2)))
    assert "Successful convergence" in repr(res)
    res.converged = False
    assert "Unsuccessful" in repr(res)


def test_annealing_ladders():
    # geometric: ladder[0] = 1/T0, ladder[-1] = 1, geometric spacing
    lad = annealing_ladder((1, 2, 10))
    assert lad.shape == (10,)
    np.testing.assert_allclose(lad[0], 0.5)
    np.testing.assert_allclose(lad[-1], 1.0)
    ratios = lad[1:] / lad[:-1]
    np.testing.assert_allclose(ratios, ratios[0])
    # harmonic: 1/ladder linearly spaced
    lad = annealing_ladder((2, 4, 7))
    np.testing.assert_allclose(lad[0], 0.25)
    np.testing.assert_allclose(np.diff(1.0 / lad), np.diff(1.0 / lad)[0])
    # linear
    lad = annealing_ladder((3, 5, 6))
    np.testing.assert_allclose(lad[0], 0.2)
    np.testing.assert_allclose(np.diff(lad), np.diff(lad)[0])


def test_check_annealing_rejects():
    with pytest.raises(ValueError):
        check_annealing((4, 2, 10))
    with pytest.raises(ValueError):
        check_annealing((1, 1.2, 10))
    with pytest.raises(ValueError):
        check_annealing((1, 2, 2000))
    check_annealing(None)
    check_annealing((1, 2, 10))


def test_permutation_null_calibration():
    import jax.numpy as jnp
    from conftest import simulate_fixture
    from atlasqtl_tpu import permutation_null_calibration

    y, x, p_act = simulate_fixture(n=80, p=40, p_act=5, q=10, seed=21)
    out = permutation_null_calibration(y, x, p0=(3, 9), n_perms=3, fdr=0.2,
                                       seed=1, dtype=jnp.float64, maxit=150)
    assert 0.0 <= out["threshold"] <= 1.0
    assert out["null_stats"].shape == (3,)
    # permuted nulls should produce far weaker PIPs than the real signal fit
    import atlasqtl_tpu as aq
    res = aq.atlasqtl(y, x, p0=(3, 9), dtype=jnp.float64, verbose=0,
                      user_seed=3)
    assert res.gam_vb[:p_act].max() > out["null_stats"].mean()
