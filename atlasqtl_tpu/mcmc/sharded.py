"""Trait-sharded MCMC: the Gibbs / NUTS-within-Gibbs cross-check backends
on a device mesh (BASELINE config 5: "sharded CAVI + NUTS/SMC cross-check
subset" at pod scale).

The Gibbs conditionals have exactly the structure that makes trait
sharding the natural mesh for CAVI (SURVEY.md §2.3): given (theta, zeta)
and the scalar precisions, the (beta, gamma, Z, tau) blocks are
independent across responses, and every cross-trait quantity is a plain
sum — sum(gam) and sum(tau * ||beta_k||^2) for the slab precision, the Z
row sums for theta, the zeta sum.  So the sharded sampler IS
`gibbs_sweep` itself, jitted with all (., q) arrays sharded on the q mesh
axis: GSPMD turns each cross-trait `jnp.sum`/einsum into a psum over ICI
and keeps everything else local.  No second code path, no re-derivation —
the same program runs on 1 chip or a pod slice.

Random draws stay identical across shardings because the sampler uses the
"rbg" PRNG (jax.random.key(..., impl="rbg"), mcmc/gibbs.py:261), whose
output is layout-invariant; the sharded chain is therefore the SAME chain
as the single-device one up to reduction rounding (verified to 1e-5 over
multiple sweeps in tests/test_mcmc_sharded.py).

The NUTS hotspot block (mcmc/nuts.py) needs no sharding at all: its
potential depends on the data only through the O(p + q) statistics
(zrow, zcol), which arrive psum-reduced from the sharded Z draw; the tree
recursion runs on replicated (2p + q + 1)-vectors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P

from ..types import Config, Data, Hyper


def shard_data_by_traits(data: Data, hyper: Hyper, mesh, q_axis: str = "q"):
    """Place every (., q)-shaped array of (data, hyper) on the mesh's trait
    axis (replicating the rest) and return the re-placed pytrees."""
    sh_q = NamedSharding(mesh, P(q_axis))
    sh_pq = NamedSharding(mesh, P(None, q_axis))
    sh_rep = NamedSharding(mesh, P())

    def place(a, spec):
        return None if a is None else jax.device_put(a, spec)

    q_pad = data.y.shape[1]

    def for_shape(a):
        if a is None:
            return None
        if a.ndim == 2 and a.shape[1] == q_pad:
            return place(a, sh_pq)
        if a.ndim == 1 and a.shape[0] == q_pad:
            return place(a, sh_q)
        return place(a, sh_rep)

    data_sharded = jax.tree_util.tree_map(for_shape, data)
    hyper_sharded = jax.tree_util.tree_map(for_shape, hyper)
    return data_sharded, hyper_sharded


def run_gibbs_sharded(data: Data, hyper: Hyper, cfg: Config, mesh,
                      n_samples: int, n_burnin: int, seed: int = 0,
                      thin: int = 1, q_axis: str = "q"):
    """`run_gibbs` with the chain's (., q) state sharded over the mesh's
    trait axis — same samples as the single-device chain (rbg PRNG is
    layout-invariant), with GSPMD-inserted collectives for the cross-trait
    reductions."""
    from .gibbs import run_gibbs

    data_s, hyper_s = shard_data_by_traits(data, hyper, mesh, q_axis)
    with jax.set_mesh(mesh):
        return run_gibbs(data_s, hyper_s, cfg, n_samples, n_burnin,
                         seed=seed, thin=thin)


def run_nuts_sharded(data: Data, hyper: Hyper, cfg: Config, mesh,
                     n_samples: int, n_burnin: int, seed: int = 0,
                     thin: int = 1, q_axis: str = "q"):
    """NUTS-within-Gibbs with the conjugate blocks trait-sharded; the NUTS
    hotspot block consumes only the psum-reduced O(p + q) statistics."""
    from .nuts import run_nuts

    data_s, hyper_s = shard_data_by_traits(data, hyper, mesh, q_axis)
    with jax.set_mesh(mesh):
        return run_nuts(data_s, hyper_s, cfg, n_samples, n_burnin,
                        seed=seed, thin=thin)
