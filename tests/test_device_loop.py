"""Device-resident fit loops (inference/device_loop.py) must be exactly
equivalent to the host-dispatched driver loop: same iteration count, same
ELBO evaluation schedule, same results.  The host loop is the reference
implementation of the control flow (R/atlasqtl_global_local_core.R:125-377);
the device loop restates it as lax.scan / lax.while_loop."""
import numpy as np
import pytest
import jax.numpy as jnp

import atlasqtl_tpu as aq
from atlasqtl_tpu.inference.driver import ElboDecreaseError
from conftest import simulate_fixture


def _fit_pair(y, x, **kw):
    base = dict(p0=(5, 25), dtype=jnp.float64, verbose=0, user_seed=123)
    base.update(kw)
    host = aq.atlasqtl(y, x, device_loop="off", **base)
    dev = aq.atlasqtl(y, x, device_loop="on", **base)
    return host, dev


def _assert_same(host, dev, tol=1e-10):
    assert dev.converged == host.converged
    assert dev.it == host.it
    h_hist = np.asarray([lb for _, lb in host.elbo_history])
    d_hist = np.asarray([lb for _, lb in dev.elbo_history])
    assert [i for i, _ in dev.elbo_history] == [i for i, _ in
                                               host.elbo_history]
    np.testing.assert_allclose(d_hist, h_hist, rtol=tol)
    np.testing.assert_allclose(dev.gam_vb, host.gam_vb, atol=tol)
    np.testing.assert_allclose(dev.beta_vb, host.beta_vb, atol=tol)
    np.testing.assert_allclose(dev.theta_vb, host.theta_vb, atol=tol)
    np.testing.assert_allclose(dev.zeta_vb, host.zeta_vb, atol=tol)


def test_device_loop_matches_host_annealed(fixture_small):
    y, x, _ = fixture_small
    host, dev = _fit_pair(y, x)
    _assert_same(host, dev)


def test_device_loop_matches_host_no_annealing(fixture_small):
    y, x, _ = fixture_small
    host, dev = _fit_pair(y, x, anneal=None)
    _assert_same(host, dev)


def test_device_loop_matches_host_missing():
    y, x, _ = simulate_fixture(missing_frac=0.2, seed=5)
    host, dev = _fit_pair(y, x, missing="exact")
    _assert_same(host, dev)


def test_device_loop_matches_host_global_model(fixture_small):
    y, x, _ = fixture_small
    host, dev = _fit_pair(y, x, model="global")
    _assert_same(host, dev)


def test_device_loop_maxit_truncation(fixture_small):
    """maxit reached inside the device loop reports non-convergence the
    same way as the host loop."""
    y, x, _ = fixture_small
    host, dev = _fit_pair(y, x, maxit=12)
    assert not dev.converged and not host.converged
    _assert_same(host, dev)


def test_device_loop_matches_host_under_mesh():
    """Device-resident loops with the 1-D trait mesh (shard_map inside
    lax.scan / lax.while_loop) must equal the host loop under the same
    mesh."""
    import jax
    from atlasqtl_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device virtual mesh")
    y, x, _ = simulate_fixture(q=32)
    mesh = make_mesh(jax.devices()[:8])
    base = dict(p0=(5, 25), dtype=jnp.float64, verbose=0, user_seed=123,
                mesh=mesh)
    host = aq.atlasqtl(y, x, device_loop="off", **base)
    dev = aq.atlasqtl(y, x, device_loop="on", **base)
    _assert_same(host, dev)


def test_device_loop_elbo_buf_overflow_warns(fixture_small, monkeypatch,
                                             caplog):
    """A run with more ELBO evaluations than the fixed device-side trace
    buffer must warn about the truncated host history (VERDICT r4 weak #6)
    — convergence/guard logic runs on device and is unaffected."""
    import logging
    from atlasqtl_tpu.inference import device_loop

    monkeypatch.setattr(device_loop, "ELBO_BUF", 4)
    monkeypatch.setattr(device_loop, "_loops", {})  # drop cached loops
    y, x, _ = fixture_small
    with caplog.at_level(logging.WARNING,
                         logger="atlasqtl_tpu.inference.driver"):
        dev = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                          user_seed=123, anneal=None, tol=1e-12, maxit=20,
                          thinned_elbo_eval=False, device_loop="on")
    assert not dev.converged
    assert any("ELBO trace truncated" in r.getMessage()
               for r in caplog.records)
    assert len(dev.elbo_history) <= 4


def test_maxit_exhausted_by_ladder_returns_nonconverged(fixture_small):
    """maxit smaller than the annealing ladder: no ELBO evaluation ever
    runs, lb stays the -inf sentinel — the fit must return non-converged,
    NOT raise the non-finite guard (r5 bench warm-up regression)."""
    y, x, _ = fixture_small
    for dl in ("on", "off"):
        res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                          user_seed=123, maxit=3, device_loop=dl)
        assert not res.converged
