"""Chebyshev-interpolation tail tiles (ops/interp.py): reconstruction
accuracy of ad / imrd / imr0u against scipy float64 references, across
annealing temperatures and adversarial theta ranges."""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy.special import log_ndtr
from scipy.stats import norm

from atlasqtl_tpu.ops.interp import K_BASE, tail_interp_operands


def _reference_tiles(theta, zeta, cst, c):
    u = theta[:, None] + zeta[None, :]
    uc = np.sqrt(c) * u
    d = log_ndtr(u) - log_ndtr(-u)
    ad = c * (d - cst[None, :])
    pdf = norm.pdf(uc)
    imr1 = pdf / norm.cdf(uc)
    imr0 = -pdf / norm.cdf(-uc)
    imrd = (imr1 - imr0) / np.sqrt(c)
    imr0u = imr0 / np.sqrt(c) + u
    return ad, imrd, imr0u


def _interp_tiles(theta, zeta, cst, c):
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    p_mask = jnp.ones(len(theta), jnp.float32)
    l_aug, n_stack, kz = tail_interp_operands(
        f32(theta), f32(zeta), f32(cst), f32(c), p_mask, r=40)
    l_aug = np.asarray(l_aug, np.float64)
    n_stack = np.asarray(n_stack, np.float64)
    u = theta[:, None] + zeta[None, :]
    u2 = u * u
    s_d = np.sqrt(u2 + K_BASE)
    s_z = np.sqrt(u2 + float(kz))
    ad = c * 0.5 * u * s_d + l_aug @ n_stack[0]
    imrd = s_z + l_aug @ n_stack[1]
    imr0u = l_aug @ n_stack[2] - 0.5 * (s_z + u)
    return ad, imrd, imr0u


@pytest.mark.parametrize("c", [1.0, 0.5, 0.1])
def test_tail_tiles_match_scipy(c):
    rng = np.random.default_rng(0)
    theta = np.concatenate([rng.normal(0, 1.5, 300), [-6.0, 6.0, 0.0]])
    zeta = np.concatenate([rng.normal(-2.5, 1.0, 200), [-9.0, 2.0]])
    cst = rng.normal(0.0, 2.0, len(zeta))
    ad, imrd, imr0u = _interp_tiles(theta, zeta, cst, c)
    ad_r, imrd_r, imr0u_r = _reference_tiles(theta, zeta, cst, c)
    u = theta[:, None] + zeta[None, :]
    # the logit: f32 round-off grade where sigmoid is live; proportional-
    # to-|d| (still invisible through the saturated sigmoid) beyond
    live = np.abs(ad_r) <= 25.0
    assert np.max(np.abs((ad - ad_r)[live])) < 5e-5
    rel = np.abs(ad - ad_r) / np.maximum(np.abs(ad_r), 1.0)
    assert np.max(rel) < 2e-5
    assert np.max(np.abs(imrd - imrd_r)) < 2e-5
    assert np.max(np.abs(imr0u - imr0u_r)) < 2e-5


def test_narrow_theta_range():
    """Degenerate theta spread (early iterations): the builder enforces a
    minimum half-width so the nodes stay distinct."""
    theta = np.full(50, 0.37)
    zeta = np.linspace(-6, 2, 64)
    cst = np.zeros(64)
    ad, imrd, imr0u = _interp_tiles(theta, zeta, cst, 1.0)
    ad_r, imrd_r, imr0u_r = _reference_tiles(theta, zeta, cst, 1.0)
    assert np.max(np.abs(ad - ad_r)) < 1e-5
    assert np.max(np.abs(imrd - imrd_r)) < 1e-5
    assert np.max(np.abs(imr0u - imr0u_r)) < 1e-5


def test_exact_node_hit():
    """theta exactly equal to a node must not blow up the barycentric
    weights (one-hot guard)."""
    from atlasqtl_tpu.ops.interp import cheb_nodes, lagrange_matrix
    nodes, w = cheb_nodes(jnp.float32(-3.0), jnp.float32(3.0), 16)
    theta = jnp.concatenate([nodes[:3], jnp.asarray([0.5], jnp.float32)])
    l_mat = np.asarray(lagrange_matrix(theta, nodes, w))
    assert np.isfinite(l_mat).all()
    np.testing.assert_allclose(l_mat[0], np.eye(16)[0], atol=1e-6)
    np.testing.assert_allclose(l_mat.sum(1), 1.0, atol=1e-5)
