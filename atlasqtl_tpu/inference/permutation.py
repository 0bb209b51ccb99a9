"""Permutation-null calibration for hotspot/association calling.

Implements the dual-permutation FDR threshold estimation exercised by the
evaluation configs (BASELINE.md: "Dual-permutation null calibration:
permuted-Y FDR threshold estimation"): fit the model on row-permuted copies
of Y (which destroys all X-Y association while preserving the correlation
structure within Y), collect the null distribution of the max posterior
inclusion probability per permutation, and return the PIP threshold that
controls the family-wise/empirical FDR at the requested level.
"""
from __future__ import annotations

import numpy as np


def permutation_null_calibration(Y, X, p0, n_perms: int = 10,
                                 fdr: float = 0.05, seed: int = 0,
                                 statistic: str = "max_pip",
                                 **atlasqtl_kwargs):
    """Estimate a PIP calling threshold from permuted-Y null fits.

    statistic: "max_pip" (per-permutation maximum PIP -> threshold is the
    (1-fdr) quantile of the null maxima; controls the probability of any
    false call) or "pip_pool" (pooled null PIPs -> empirical-FDR threshold).

    Returns dict(threshold, null_stats, n_perms).
    """
    from ..api import atlasqtl

    rng = np.random.default_rng(seed)
    Y = np.asarray(Y, dtype=np.float64)
    atlasqtl_kwargs.setdefault("verbose", 0)
    null_max = []
    null_pool = []
    for b in range(n_perms):
        perm = rng.permutation(Y.shape[0])
        res = atlasqtl(Y[perm], X, p0=p0,
                       user_seed=int(rng.integers(2 ** 31)),
                       **atlasqtl_kwargs)
        null_max.append(float(res.gam_vb.max()))
        if statistic == "pip_pool":
            null_pool.append(np.asarray(res.gam_vb).ravel())

    null_max = np.asarray(null_max)
    if statistic == "max_pip":
        thr = float(np.quantile(null_max, 1.0 - fdr))
    elif statistic == "pip_pool":
        pool = np.concatenate(null_pool)
        thr = float(np.quantile(pool, 1.0 - fdr / pool.size))
    else:
        raise ValueError("statistic must be 'max_pip' or 'pip_pool'")
    return {"threshold": thr, "null_stats": null_max, "n_perms": n_perms}
