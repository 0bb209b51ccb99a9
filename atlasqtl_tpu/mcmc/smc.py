"""Annealed SMC sampler over the tempered posterior.

Second gold-standard backend (BASELINE.md: "NUTS/SMC cross-check"): a
sequential Monte Carlo sampler in the Del Moral-Doucet-Jasra style targeting
pi_t propto prior * likelihood^{c_t} along the SAME inverse-temperature
ladder the CAVI engine anneals over (R/utils.R:108-146).  Mutations are the
exact tempered-Gibbs kernel (mcmc/gibbs.py, `temper` argument), weights are
the tempered-likelihood increments, with systematic resampling at low ESS.

Because the mutation kernel is a full conjugate Gibbs scan, the sampler is
valid for any ladder; it shines on multimodal posteriors where plain Gibbs
mixes poorly — the same regime the reference's annealing targets.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Config, Data, Hyper
from ..ops.annealing import annealing_ladder
from .gibbs import GibbsState, gibbs_sweep, init_state


@partial(jax.jit, static_argnames=("cfg",))
def log_likelihood(state: GibbsState, data: Data, *, cfg: Config):
    """Gaussian log-likelihood log p(y | beta, tau) of one particle."""
    dt = cfg.dtype
    resid2 = (data.y_norm_sq
              - 2.0 * jnp.einsum("nq,nq->q", data.y, state.fitted)
              + jnp.einsum("nq,nq->q", state.fitted, state.fitted))
    per_q = (0.5 * data.n_eff * (jnp.log(state.tau) - jnp.log(2.0 * jnp.pi))
             - 0.5 * state.tau * resid2)
    return jnp.sum(per_q * data.q_mask)


def _systematic_resample(key, log_w, n):
    w = jax.nn.softmax(log_w)
    positions = (jax.random.uniform(key, ()) + jnp.arange(n)) / n
    cum = jnp.cumsum(w)
    return jnp.searchsorted(cum, positions)


def run_smc(data: Data, hyper: Hyper, cfg: Config, n_particles: int = 32,
            anneal=(1, 2, 10), n_mutations: int = 3, n_final: int = 200,
            seed: int = 0):
    """Annealed SMC; after reaching temperature 1 the particle set is refined
    with `n_final` plain Gibbs sweeps (averaging over them and particles).

    Returns (pip, beta_mean, theta_mean, zeta_mean, log_evidence_estimate).
    """
    from ..ops.sweep import block_gram

    from ..models.global_local import data_block
    block = data_block(cfg, data)
    gram_blocks = jax.jit(block_gram, static_argnums=1)(data.x, block)

    master = jax.random.key(seed, impl="rbg")
    keys = jax.random.split(master, n_particles + 1)
    master = keys[0]

    particles = [init_state(k, data, cfg) for k in keys[1:]]
    stack = lambda ps: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *ps)
    particles = stack(particles)

    sweep_v = jax.vmap(
        lambda st, tmp: gibbs_sweep(st, data, hyper, gram_blocks, cfg=cfg,
                                    temper=tmp),
        in_axes=(0, None))
    loglik_v = jax.vmap(lambda st: log_likelihood(st, data, cfg=cfg))

    ladder = np.concatenate([[0.0], annealing_ladder(anneal)])
    log_w = jnp.zeros(n_particles, cfg.dtype)
    log_evidence = 0.0

    for c_prev, c in zip(ladder[:-1], ladder[1:]):
        ll = loglik_v(particles)
        inc = (c - c_prev) * ll
        log_evidence += float(jax.scipy.special.logsumexp(log_w + inc)
                              - jax.scipy.special.logsumexp(log_w))
        log_w = log_w + inc
        ess = float(1.0 / jnp.sum(jax.nn.softmax(log_w) ** 2))
        if ess < n_particles / 2:
            master, kr = jax.random.split(master)
            idx = _systematic_resample(kr, log_w, n_particles)
            particles = jax.tree_util.tree_map(lambda a: a[idx], particles)
            log_w = jnp.zeros(n_particles, cfg.dtype)
        for _ in range(n_mutations):
            particles = sweep_v(particles, c)

    # final refinement at temperature 1, accumulating posterior summaries
    w = np.asarray(jax.nn.softmax(log_w))
    acc_gam = np.zeros(np.asarray(particles.gam).shape[1:])
    acc_beta = np.zeros_like(acc_gam)
    acc_theta = np.zeros(np.asarray(particles.theta).shape[1:])
    acc_zeta = np.zeros(np.asarray(particles.zeta).shape[1:])
    for _ in range(n_final):
        particles = sweep_v(particles, 1.0)
        acc_gam += np.tensordot(w, np.asarray(particles.gam), axes=1)
        acc_beta += np.tensordot(w, np.asarray(particles.beta), axes=1)
        acc_theta += np.tensordot(w, np.asarray(particles.theta), axes=1)
        acc_zeta += np.tensordot(w, np.asarray(particles.zeta), axes=1)
    return (acc_gam / n_final, acc_beta / n_final, acc_theta / n_final,
            acc_zeta / n_final, log_evidence)
