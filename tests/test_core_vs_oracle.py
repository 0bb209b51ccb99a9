"""The blocked, n-space JAX engine must reproduce the reference algorithm
(per-coordinate Gram-space Gauss-Seidel) to float64 round-off.

This is the parity test standing in for golden R outputs (no R runtime in the
image): the oracle is an independent per-coordinate transcription of the
reference math; agreement to ~1e-8 relative across several iterations
validates both the blocked scheduling and the n-space residual identity.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.io.prepare import prepare_data
from atlasqtl_tpu.ops.sweep import block_gram

from conftest import simulate_fixture
from oracle import OracleState


def _setup(missing_frac=0.0, n=60, p=40, q=12, block_size=16, seed=7,
           mis_block=8):
    y, x, _ = simulate_fixture(n=n, p=p, p_act=5, q=q, seed=seed,
                               missing_frac=missing_frac)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=block_size,
                 shr_fac_inv=float(q_eff), mis_block=mis_block)
    data = gl.build_data(dat.x, dat.y, cfg)
    hyper_spec = elic.auto_set_hyper(dat.y, p_eff, (3, 10))
    hyper = gl.build_hyper(hyper_spec, data.y.shape[1], cfg)
    init = elic.auto_set_init(dat.y, p_eff, (3, 10), float(q_eff), 42)
    state = gl.build_state(init, data, cfg)
    oracle = OracleState(init, dat.x, dat.y, hyper_spec, float(q_eff))
    if data.mis_pat is None:
        gram = block_gram(data.x, min(cfg.block_size, data.x.shape[1]))
    else:
        gram = jnp.zeros((1, 1, 1), cfg.dtype)
    return cfg, data, hyper, state, oracle, gram, p_eff, q_eff


def _unpad(a, p, q):
    a = np.asarray(a)
    if a.ndim == 2:
        return a[:p, :q]
    return a[:p] if a.shape[0] >= p else a


@pytest.mark.parametrize("block_size", [1, 8, 16, 40])
def test_complete_data_iterations_match(block_size):
    cfg, data, hyper, state, oracle, gram, p, q = _setup(
        block_size=block_size)
    for it in range(4):
        state = gl.cavi_iteration(data, hyper, state, gram, 1.0, 1.0,
                                  cfg=cfg, annealed=False)
        oracle.iterate(c=1.0)
        np.testing.assert_allclose(_unpad(state.gam, p, q), oracle.gam,
                                   rtol=1e-7, atol=1e-9, err_msg=f"gam it{it}")
        np.testing.assert_allclose(_unpad(state.mu_beta, p, q), oracle.mu,
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(state.theta)[:p], oracle.theta,
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(state.zeta)[:q], oracle.zeta,
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(float(state.sig02_inv), oracle.sig02_inv,
                                   rtol=1e-7)
        np.testing.assert_allclose(np.asarray(state.lam2_inv)[:p],
                                   oracle.lam2_inv, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(state.tau)[:q], oracle.tau,
                                   rtol=1e-7)


def test_complete_data_elbo_matches():
    cfg, data, hyper, state, oracle, gram, p, q = _setup()
    for _ in range(3):
        state = gl.cavi_iteration(data, hyper, state, gram, 1.0, 1.0,
                                  cfg=cfg, annealed=False)
        oracle.iterate(c=1.0)
    lb = float(gl.compute_elbo(data, hyper, state, cfg=cfg))
    lb_oracle = oracle.elbo()
    np.testing.assert_allclose(lb, lb_oracle, rtol=1e-9)


def test_annealed_iterations_match():
    cfg, data, hyper, state, oracle, gram, p, q = _setup()
    for c in [0.5, 0.62, 0.78, 0.9]:
        state = gl.cavi_iteration(data, hyper, state, gram, c, c,
                                  cfg=cfg, annealed=True)
        oracle.iterate(c=c, c_s=c, annealed=True)
        np.testing.assert_allclose(_unpad(state.gam, p, q), oracle.gam,
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(state.lam2_inv)[:p],
                                   oracle.lam2_inv, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(state.theta)[:p], oracle.theta,
                                   rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("mis_block", [1, 8, 16])
def test_missing_data_iterations_match(mis_block):
    """mis_block=1 exercises the per-coordinate scan; >1 the blocked
    exact-missing sweep with precomputed pair Grams (ops/sweep.py:
    sweep_missing_blocked) — both must be order-exact vs the oracle."""
    cfg, data, hyper, state, oracle, gram, p, q = _setup(
        missing_frac=0.15, mis_block=mis_block)
    assert data.mis_pat is not None
    assert (data.mis_pair_gram is not None) == (mis_block > 1)
    for it in range(3):
        state = gl.cavi_iteration(data, hyper, state, gram, 1.0, 1.0,
                                  cfg=cfg, annealed=False)
        oracle.iterate(c=1.0)
        np.testing.assert_allclose(_unpad(state.gam, p, q), oracle.gam,
                                   rtol=1e-6, atol=1e-9, err_msg=f"it{it}")
        np.testing.assert_allclose(np.asarray(state.theta)[:p], oracle.theta,
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(state.tau)[:q], oracle.tau,
                                   rtol=1e-6)
    lb = float(gl.compute_elbo(data, hyper, state, cfg=cfg))
    np.testing.assert_allclose(lb, oracle.elbo(), rtol=1e-9)
