"""Trait-sharded MCMC equals the single-device chain.

BASELINE config 5 requires a path to run the NUTS/SMC cross-check subset
at pod scale; mcmc/sharded.py provides it by running the SAME jitted
conditionals with every (., q) array sharded over the mesh's trait axis
(GSPMD inserts the psums).  The rbg PRNG is layout-invariant, so the
sharded chain must reproduce the single-device chain up to reduction
rounding."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.io.prepare import prepare_data
from atlasqtl_tpu.mcmc.gibbs import run_gibbs
from atlasqtl_tpu.mcmc.sharded import run_gibbs_sharded
from atlasqtl_tpu.parallel.mesh import make_mesh

from conftest import simulate_fixture


def _build(q_pad_to=8):
    y, x, p_act = simulate_fixture(n=100, p=32, p_act=5, q=16, seed=11)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=16, shr_fac_inv=float(q_eff))
    data = gl.build_data(dat.x, dat.y, cfg, q_pad_to=q_pad_to)
    hyper = gl.build_hyper(elic.auto_set_hyper(dat.y, p_eff, (4, 12)),
                           data.y.shape[1], cfg)
    return data, hyper, cfg


def test_sharded_gibbs_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    data, hyper, cfg = _build(q_pad_to=64)   # q_pad 64 -> 8 per shard
    mesh = make_mesh(jax.devices()[:8])

    ref = run_gibbs(data, hyper, cfg, n_samples=3, n_burnin=2, seed=5)
    shd = run_gibbs_sharded(data, hyper, cfg, mesh, n_samples=3,
                            n_burnin=2, seed=5)
    for a, b, name in zip(ref, shd, ("pip", "beta", "theta", "zeta")):
        np.testing.assert_allclose(b, a, atol=1e-8, err_msg=name)


def test_sharded_gibbs_recovers_signal():
    """A short sharded chain separates planted actives from nulls
    (statistical check that the collectives carry the right reductions;
    the chain is kept short — hundreds of sharded dispatches exhaust the
    virtual-device CPU runtime)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    data, hyper, cfg = _build(q_pad_to=64)
    mesh = make_mesh(jax.devices()[:8])
    pip, _, theta_mean, _ = run_gibbs_sharded(
        data, hyper, cfg, mesh, n_samples=30, n_burnin=15, seed=2)
    p_eff = int(np.asarray(data.p_true))
    q_eff = int(np.asarray(data.q_true))
    pip = pip[:p_eff, :q_eff]
    assert pip[:5].mean() > pip[5:].mean() + 0.3
