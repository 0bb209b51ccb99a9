"""Trait (q) and predictor (p) sharding over a TPU device mesh.

The reference is single-threaded (SURVEY §2.3); the TPU-native scaling axes
are:

- q (traits): the CAVI sweep is embarrassingly independent across responses
  given (theta, zeta) (the reference's k-loop carries no cross-k state,
  src/coreLoop.cpp:58), so every (.., q) tensor shards on q and the few
  cross-q reductions (sum(gam), rowSums(Z), the kappa/rho accumulations and
  the scalar horseshoe-scale moments) become psum collectives XLA/GSPMD
  inserts from the sharding annotations.

- p (predictors, 2-D mesh only): X (n, p), the diagonal Gram blocks and all
  (p,) vectors shard over a second axis for pod-scale problems where
  replicating X is infeasible (BASELINE config 5: X alone is 6 GB).  The
  sweep's sequential-over-p order is preserved by the pipelined schedule in
  parallel/pipeline.py (q-tiles flow through p-stages over ICI).

1-D layout (q only):
  replicated: x (n, p), theta/lam2_inv/sig2_theta/p_mask (p,), scalars
  q-sharded:  y/fitted/mis_pat (n, q), cp_x_y/gam/mu_beta/x_norm_sq (p, q),
              tau/zeta/eta/kappa/n0/q_mask/y_norm_sq/n_eff (q,)
2-D layout ((p, q) mesh): as above, plus p-sharding of x (dim 1), the (p, q)
  matrices (dim 0) and the (p,) vectors; fitted stays q-sharded and
  p-replicated (every p-stage needs the full sample dimension).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import Data, Hyper, VBState

Q_AXIS = "q"
P_AXIS = "p"


def make_mesh(devices=None, p_shards: int = 1) -> Mesh:
    """1-D trait mesh by default; p_shards > 1 builds the 2-D (p, q) mesh
    (pod-scale layout).  Pass a subset of jax.devices() to restrict.

    2-D device layout: the p axis varies FASTEST over the device list, so
    consecutive devices (same host / directly ICI-linked on a pod) form a
    p-pipeline column.  The pipeline's per-step ppermute moves a big
    (n, q_tile) fitted tile along p every step (parallel/pipeline.py) while
    the q axis only carries small psums (Z row-sums, scalar moments), so p
    belongs on the fast links and q on DCN — the layout the DESIGN §6
    scaling argument assumes.  Under multi-process this also keeps every
    ppermute pair intra-process (cross-process traffic = psums only)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if p_shards > 1:
        assert devices.size % p_shards == 0, (devices.size, p_shards)
        return Mesh(devices.reshape(-1, p_shards).T, (P_AXIS, Q_AXIS))
    return Mesh(devices, (Q_AXIS,))


def _has_p(mesh: Mesh) -> bool:
    return P_AXIS in mesh.axis_names


def _put(tree, mesh, spec_fn):
    two_d = _has_p(mesh)
    multiproc = jax.process_count() > 1

    def place(path, leaf):
        if leaf is None:
            return None
        spec = spec_fn(path, leaf, two_d)
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            # plain device_put cannot place shards on non-addressable
            # devices; under multi-process every process holds the full
            # host array (the atlasqtl data contract — X/Y come from a
            # shared filesystem) and global_shape == local.shape tells JAX
            # to slice each device's addressable shard out of it
            local = np.asarray(leaf)
            return jax.make_array_from_process_local_data(
                sharding, local, local.shape)
        return jax.device_put(leaf, sharding)
    return jax.tree_util.tree_map_with_path(place, tree)


def to_host(arr) -> np.ndarray:
    """Global jax.Array -> host numpy on every process.

    Fully-addressable or fully-replicated arrays convert directly; arrays
    with non-addressable shards (q/p-sharded outputs under multi-process)
    are gathered with ``process_allgather`` so every process assembles the
    same full result (reference parity: the R API always returns full
    matrices)."""
    if isinstance(arr, jax.Array) and not (
            arr.is_fully_addressable or arr.is_fully_replicated):
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(arr)


def _data_spec(path, leaf, two_d):
    name = path[0].name if hasattr(path[0], "name") else str(path[0])
    pax = P_AXIS if two_d else None
    if name in ("y", "mis_pat"):
        return P(None, Q_AXIS)
    if name in ("cp_x_y", "x_norm_sq"):
        return P(pax, Q_AXIS)
    if name in ("y_norm_sq", "n_eff", "q_mask", "n_mis"):
        return P(Q_AXIS)
    if name == "mis_pair_gram":
        return P(pax, None, Q_AXIS)
    if name == "x":
        return P(None, pax)
    if name == "p_mask":
        return P(pax)
    return P()  # scalars: replicated


def _hyper_spec(path, leaf, two_d):
    name = path[0].name if hasattr(path[0], "name") else str(path[0])
    if name in ("eta", "kappa", "n0"):
        return P(Q_AXIS)
    return P()


def _state_spec(path, leaf, two_d):
    name = path[0].name if hasattr(path[0], "name") else str(path[0])
    pax = P_AXIS if two_d else None
    if name in ("gam", "mu_beta", "beta"):
        return P(pax, Q_AXIS)
    if name == "sig2_beta":
        return P(pax, Q_AXIS) if leaf.ndim == 2 else P(Q_AXIS)
    if name in ("tau", "zeta", "gam_colsum", "mu2gam_colsum",
                "beta2_colsum"):
        return P(Q_AXIS)
    if name == "fitted":
        return P(None, Q_AXIS)
    if name in ("theta", "lam2_inv", "sig2_theta", "l_vb"):
        return P(pax)
    return P()  # scalars: replicated


def shard_data(data: Data, mesh: Mesh) -> Data:
    return _put(data, mesh, _data_spec)


def shard_hyper(hyper: Hyper, mesh: Mesh) -> Hyper:
    return _put(hyper, mesh, _hyper_spec)


def shard_state(state: VBState, mesh: Mesh) -> VBState:
    return _put(state, mesh, _state_spec)


def q_pad_multiple(mesh: Optional[Mesh]) -> int:
    """q must be padded to a multiple of (8 * #q-shards) so shards are even
    and lane-aligned."""
    if mesh is None:
        return 8
    n_q = mesh.shape[Q_AXIS] if Q_AXIS in mesh.axis_names else mesh.devices.size
    return 8 * n_q


def p_pad_multiple(mesh: Optional[Mesh], block: int) -> int:
    """p must be padded so every p-shard holds whole predictor blocks."""
    if mesh is None or not _has_p(mesh):
        return 1
    return mesh.shape[P_AXIS] * block
