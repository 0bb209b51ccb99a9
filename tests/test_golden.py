"""Golden regression fixtures (VERDICT r2 #5; BASELINE "PIPs within 1e-2").

The R reference has no runtime in this image; update-level parity is
established by the independent NumPy oracle (tests/oracle.py, see PARITY.md).
These tests freeze the end-to-end float64 outputs of the testthat-shaped
fixture (reference tests/testthat/main.R:1-41) and a 20%-missing variant as
committed .npz goldens so output drift across rounds is caught.  Regenerate
deliberately with tests/make_goldens.py when an intentional change lands.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

import atlasqtl_tpu as aq
from conftest import simulate_fixture

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

# BASELINE acceptance: PIPs within 1e-2.  The remaining outputs get the
# tolerance at which a f64 deterministic rerun should reproduce them while
# still absorbing benign cross-version XLA reassociation.
PIP_ATOL = 1e-2
PAR_ATOL = 1e-3


def _check(res, g):
    np.testing.assert_allclose(res.gam_vb, g["gam_vb"], atol=PIP_ATOL)
    np.testing.assert_allclose(res.beta_vb, g["beta_vb"], atol=PAR_ATOL)
    np.testing.assert_allclose(res.theta_vb, g["theta_vb"], atol=PAR_ATOL)
    np.testing.assert_allclose(res.zeta_vb, g["zeta_vb"], atol=PAR_ATOL)
    np.testing.assert_allclose(res.lb_opt, float(g["lb_opt"]),
                               rtol=1e-6, atol=1e-4)


def test_golden_complete():
    y, x, _ = simulate_fixture()
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123)
    assert res.converged
    _check(res, np.load(os.path.join(GOLD, "golden_complete.npz")))


def test_golden_missing():
    y, x, _ = simulate_fixture(missing_frac=0.2, seed=5)
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=11, maxit=600)
    assert res.converged
    _check(res, np.load(os.path.join(GOLD, "golden_missing.npz")))
