"""Truth-based statistical recovery gates (VERDICT r4 missing #3).

The reference's statistical case lives in its paper (SURVEY §4;
/root/reference/DESCRIPTION:23-27); these tests pin it in-repo on a
separated simulated fixture where the truth is known: pair-level
precision/recall at 5% bFDR, hotspot ranking AUC, and null calibration
(a permuted-response fit must call ~nothing).
"""
import numpy as np
import pytest
import jax.numpy as jnp

import atlasqtl_tpu as aq


def _sim_separated(n=250, p=400, q=64, p_act=8, q_hit=16, seed=11,
                   strength=0.45):
    """Well-separated planted-block simulation: active predictors [0, p_act)
    hit traits [0, q_hit) with effects ~ N(1, 0.5) * strength against unit
    noise — strong enough that a calibrated method recovers most pairs,
    weak enough that an uncalibrated one shows false positives."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, p))
    x = (x - x.mean(0)) / x.std(0, ddof=1)
    y = rng.normal(size=(n, q))
    y[:, :q_hit] += x[:, :p_act] @ (
        rng.normal(1.0, 0.5, (p_act, q_hit)) * strength)
    y -= y.mean(0)
    truth = np.zeros((p, q), bool)
    truth[:p_act, :q_hit] = True
    return x, y, truth, p_act


@pytest.fixture(scope="module")
def fitted():
    x, y, truth, p_act = _sim_separated()
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=11)
    return res, truth, p_act, x, y


def test_pair_recovery_at_bfdr05(fitted):
    res, truth, p_act, _, _ = fitted
    assert res.converged
    sel = aq.assign_bfdr(res.gam_vb) <= 0.05
    tp = (sel & truth).sum()
    fp = (sel & ~truth).sum()
    fn = (~sel & truth).sum()
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    # bFDR 5% promises ~95% precision in expectation; the planted block is
    # strong, so most true pairs should be found
    assert precision >= 0.85, (tp, fp)
    assert recall >= 0.60, (tp, fn)


def test_hotspot_ranking_auc(fitted):
    from scipy.stats import rankdata
    res, truth, p_act, _, _ = fitted
    score = res.gam_vb.max(axis=1)
    lab = np.zeros(res.p, bool)
    lab[:p_act] = True
    r = rankdata(score)
    n1, n0 = int(lab.sum()), int((~lab).sum())
    auc = (r[lab].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert auc >= 0.95, auc


def test_hotspot_sizes_calibrated(fitted):
    res, truth, p_act, _, _ = fitted
    hot = res.hotspot_sizes(thres=0.05, fdr_adjust=True)
    called = int((hot > 0).sum())
    # every true hotspot hits 16 traits — all should be called, with at
    # most a few stray single-pair predictors
    assert called >= p_act - 1, (called, p_act)
    assert called <= p_act + 10, (called, p_act)


def test_null_calibration_permuted():
    x, y, truth, p_act = _sim_separated()
    rng = np.random.default_rng(99)
    res = aq.atlasqtl(y[rng.permutation(y.shape[0])], x, p0=(5, 25),
                      dtype=jnp.float64, verbose=0, user_seed=12)
    called = int((aq.assign_bfdr(res.gam_vb) <= 0.05).sum())
    # permuted responses carry no signal: a calibrated 5% bFDR calls
    # (essentially) nothing out of p*q = 25600 hypotheses
    assert called <= 5, called
