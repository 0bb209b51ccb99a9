"""Trait (q-axis) sharding over a TPU device mesh.

The reference is single-threaded (SURVEY §2.3); the TPU-native scaling axis is
the response dimension q: the CAVI sweep is embarrassingly independent across
responses given (theta, zeta) (the reference's k-loop carries no cross-k
state, src/coreLoop.cpp:58), so every (.., q) tensor is sharded on q and the
few cross-q reductions (sum(gam), rowSums(Z), the kappa/rho accumulations and
the scalar horseshoe-scale moments) become psum collectives that XLA/GSPMD
inserts automatically from the sharding annotations.

Layout:
  replicated: x (n, p), theta/lam2_inv/sig2_theta/p_mask (p,), scalars
  q-sharded:  y/fitted (n, q), cp_x_y/gam/mu_beta (p, q),
              tau/zeta/eta/kappa/n0/q_mask/y_norm_sq/n_eff (q,)
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import Data, Hyper, VBState

Q_AXIS = "q"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over the trait axis; pass a subset of jax.devices() to
    restrict."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (Q_AXIS,))


def _put(tree, mesh, spec_fn):
    def place(path, leaf):
        if leaf is None:
            return None
        spec = spec_fn(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, tree)


def _data_spec(path, leaf):
    name = path[0].name if hasattr(path[0], "name") else str(path[0])
    if name in ("y", "mis_pat"):
        return P(None, Q_AXIS)
    if name in ("cp_x_y", "x_norm_sq"):
        return P(None, Q_AXIS)
    if name in ("y_norm_sq", "n_eff", "q_mask", "n_mis"):
        return P(Q_AXIS)
    if name == "mis_pair_gram":
        return P(None, None, Q_AXIS)
    return P()  # x, p_mask, scalars: replicated


def _hyper_spec(path, leaf):
    name = path[0].name if hasattr(path[0], "name") else str(path[0])
    if name in ("eta", "kappa", "n0"):
        return P(Q_AXIS)
    return P()


def _state_spec(path, leaf):
    name = path[0].name if hasattr(path[0], "name") else str(path[0])
    if name in ("gam", "mu_beta"):
        return P(None, Q_AXIS)
    if name == "sig2_beta":
        return P(None, Q_AXIS) if leaf.ndim == 2 else P(Q_AXIS)
    if name in ("tau", "zeta", "gam_colsum", "mu2gam_colsum",
                "beta2_colsum"):
        return P(Q_AXIS)
    if name == "fitted":
        return P(None, Q_AXIS)
    return P()  # theta, lam2_inv, sig2_theta, l_vb, scalars: replicated


def shard_data(data: Data, mesh: Mesh) -> Data:
    return _put(data, mesh, _data_spec)


def shard_hyper(hyper: Hyper, mesh: Mesh) -> Hyper:
    return _put(hyper, mesh, _hyper_spec)


def shard_state(state: VBState, mesh: Mesh) -> VBState:
    return _put(state, mesh, _state_spec)


def q_pad_multiple(mesh: Optional[Mesh]) -> int:
    """q must be padded to a multiple of (8 * #devices) so shards are even
    and lane-aligned."""
    n_dev = 1 if mesh is None else mesh.devices.size
    return 8 * n_dev
