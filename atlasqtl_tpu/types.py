"""Pytree state containers for the TPU-native atlasqtl engine.

These are the structured analogs of the reference's loose R lists:
- Hyper      <-> `list_hyper` ("hyper"/"out_hyper" objects, R/set_hyper_init.R:98-197)
- VBState    <-> the set of variational parameters carried through the CAVI loop
                 (R/atlasqtl_global_local_core.R:45-63, 112-123)
- Data       <-> the precomputed sufficient statistics (R/atlasqtl_global_local_core.R:19-42)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree (all fields are leaves, keyed by
    field name so shardings can be assigned by path)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten_with_keys(obj):
        return ([(jax.tree_util.GetAttrKey(name), getattr(obj, name))
                 for name in fields], None)

    def flatten(obj):
        return [getattr(obj, name) for name in fields], None

    def unflatten(_, leaves):
        return cls(**dict(zip(fields, leaves)))

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten,
                                            flatten_func=flatten)
    return cls


@_pytree_dataclass
class Hyper:
    """Model hyperparameters (reference: R/set_hyper_init.R:98-197).

    eta, kappa, n0: (q,); nu, rho, t02, m0, a2_inv: scalars.
    """
    eta: Any
    kappa: Any
    n0: Any
    nu: Any
    rho: Any
    t02: Any
    m0: Any
    a2_inv: Any


@_pytree_dataclass
class VBState:
    """All variational parameters + carried sufficient statistics.

    Shapes (padded): gam/mu_beta (p, q); theta/lam2_inv/sig2_theta (p,);
    tau/zeta/sig2_beta (q,) [(p, q) sig2_beta in the missing-data path];
    sig02_inv scalar; fitted (n, q) is the carried n-space residual statistic
    F = X @ beta (masked by the missingness pattern when present) — the
    TPU-native replacement for the reference's Gram-space cp_betaX_X
    (src/coreLoop.cpp:71-81).
    """
    gam: Any
    mu_beta: Any
    sig2_beta: Any
    tau: Any
    sig2_inv: Any
    theta: Any
    zeta: Any
    sig02_inv: Any
    lam2_inv: Any
    sig2_theta: Any
    fitted: Any
    # diagnostics carried for the ELBO (set by the iteration that produced
    # this state; scalars)
    l_vb: Any
    rho_xi_inv: Any
    nu_s0_vb: Any
    rho_s0_vb: Any
    # fused column statistics of (gam, mu_beta) accumulated in-kernel by the
    # sweep that produced this state (colsum gam, colsum mu^2 gam,
    # colsum (gam mu)^2); None on paths that recompute them via einsum
    gam_colsum: Any = None
    mu2gam_colsum: Any = None
    beta2_colsum: Any = None
    # carried posterior-mean effects beta = gam * mu_beta (p, q).  The fused
    # sweep kernel reads/writes ONLY this array in steady state ("lite"
    # iterations); gam/mu_beta are refreshed on iterations whose results
    # feed an ELBO evaluation, a checkpoint, or the final output, so they
    # may be stale in between.  None on engines that do not carry it.
    beta: Any = None


@_pytree_dataclass
class Data:
    """Preprocessed data + one-time sufficient statistics.

    x: (n, p) standardized predictors (zero-padded past the true p);
    y: (n, q) centered responses (NaNs replaced by 0, mask in mis_pat);
    cp_x_y: (p, q) X^T Y;
    y_norm_sq: (q,);
    mis_pat: (n, q) 1/0 mask or None (complete data);
    x_norm_sq: (p, q) (X^2)^T mis_pat or None;
    n_eff: (q,) number of observed samples per response (= n when complete);
    p_mask: (p,) 1.0 for real predictors, 0.0 for padding;
    q_mask: (q,) 1.0 for real responses, 0.0 for padding.
    """
    x: Any
    y: Any
    cp_x_y: Any
    y_norm_sq: Any
    mis_pat: Any
    x_norm_sq: Any
    n_eff: Any
    n_mis: Any    # (q,) number of missing cells per response (zeros if none)
    p_mask: Any
    q_mask: Any
    n: Any        # scalar number of samples (static python int kept as leaf)
    p_true: Any   # true (unpadded) p
    q_true: Any   # true (unpadded) q
    # (p/B, B(B-1)/2, q) within-block triangular masked pair Grams for the
    # blocked exact-missing sweep (ops/sweep.py:mis_pair_gram); None unless
    # the exact-missing path is active with mis_block > 1
    mis_pair_gram: Any = None


@dataclasses.dataclass(frozen=True)
class Config:
    """Static configuration for the CAVI engine (hashable; passed as a static
    arg to jitted functions)."""
    block_size: int = 128
    dtype: Any = jnp.float32
    elbo_dtype: Any = jnp.float64
    use_pallas: bool = False
    sweep: str = "auto"   # "auto" | "fused" | "pallas" | "xla"
    tol: float = 0.1
    # maxit is host-side control flow only (the device-resident loop takes
    # it as a runtime operand) — excluded from hash/eq so jitted functions
    # compiled under one maxit are reused under another (the bench warm-up
    # runs maxit=3 before the maxit=1000 production fit)
    maxit: int = dataclasses.field(default=1000, compare=False)
    df: int = 1
    shr_fac_inv: float = 1.0   # = q (set at fit time)
    missing: str = "exact"     # "exact" (reference-equivalent) | "impute"
                               # (VB-imputed y_mis: fused complete-data
                               # kernel + one extra X^T y matmul per iter)
    mis_block: int = 8   # predictor block of the exact-missing sweep; the
                         # precomputed pair-Gram tensor costs
                         # (mis_block-1)/2 * p * q memory (1 -> per-
                         # coordinate scan, no precompute)
    mis_sub: int = 16    # window size of the FUSED exact-missing kernel.
    # Measured r4 (donated harness, eQTL shape, ms/iter): sub16/wg1 193,
    # sub8/wg4 245, sub8/wg8 260, sub4/wg8 351 — the per-window masked
    # Fm-advance/projection cost (~3.4 us per window-tile) dominates over
    # the pair-Gram MACs, so FEWER windows win (docs/DESIGN.md S5).
    mis_wgroup: int = 1  # windows batched per pair-Gram dot (lane packing;
                         # >1 only helps when mis_sub < 16)
    mis_pair_bf16: bool = False  # bfloat16 inputs (f32 accumulation) for
                                 # the masked pair-Gram dot — measured -5%
                                 # (234 vs 245 at sub8/wg4); rounds the
                                 # correction coefficients to ~3 decimal
                                 # digits, so OFF by default: this engine
                                 # exists for exactness (impute is the
                                 # fast path)
    anneal_scale: bool = True
    mxu_bf16: bool = False   # bfloat16 inputs (f32 accumulation) for the two
                             # large MXU contractions of the fused sweep
    sweep_sub: int = 0       # sub-block (unrolled window) of the fused
    # sweep; 0 = auto by sample count (models/global_local.py:_fused_sub):
    # n <= 2048 -> 8 (push-FMA-bound regime: 29.5 vs 30.7 ms at the eQTL
    # shape), larger n -> 32 (per-window projection/advance costs scale
    # with n: 61.0 vs 65.3 ms at the pod shape)
    sweep_lookahead: bool = False  # one-block-lookahead projection in the
    # fused sweep: block b+1's residual projection issues against the
    # pre-advance F and is repaired by the exact off-diagonal Gram
    # correction x_{b+1}^T x_b delta_b, overlapping the big MXU dots with
    # the sequential chain instead of serializing across the step boundary
    sweep_qchunk: int = 0    # q-chunk of the fused sweep's sequential
    # chain; 0 = auto (q_tile/2 for q_tile >= 4096, else 512 — measured
    # best; models/global_local.py:_fused_qchunk) — keeps per-row live
    # vectors in vregs
    sweep_stagger: bool = False  # staggered dual-half fused sweep
    # (ops/sweep_staggered.py): overlap the MXU dots with the sequential
    # chain by processing two independent q-tile column halves half a
    # step apart.  MEASURED DEAD END (r5, three scheduling revisions all
    # slower — Mosaic does not co-schedule a dot beside an independent
    # VPU stream; docs/DESIGN.md §3).  Kept as the documented negative
    # result; outputs bitwise-equal to the baseline kernel by test.
    sweep_interleave: bool = False  # interleave the independent q-chunk
    # chains per coordinate (chunk-INNER loop order): same per-column op
    # sequence (bitwise identical), but Mosaic's scheduler gets nqc
    # independent dependency chains to hide the serial per-row latency —
    # a candidate for deep-n shapes where the chain is latency-bound
    sweep_probe: str = "none"  # PERF PROBE selector for the fused sweep
    # (wrong math for any value but "none"; never set in production).
    # See ops/sweep_fused.py: jacobi/jacobi_min/nomxu/noseq/nosig/norank/
    # exact_noz/dmalite/noadv/nor0/chain_only
    debug: bool = True
    thinned_elbo_eval: bool = True
    device_loop: str = "auto"  # "auto" | "on" | "off": run the annealing
    # ladder and the converged phase as single device dispatches
    # (lax.scan / lax.while_loop) when no host hook (checkpoint/trace/
    # verbose-2) needs to interleave — see inference/device_loop.py
    q_axis: Optional[str] = None   # mesh axis name for trait sharding
    p_axis: Optional[str] = None   # mesh axis name for predictor sharding
                                   # (2-D pod-scale mesh; pipelined sweep)
    pipeline_step_overhead_qcols: float = 0.0  # per-pipeline-step fixed
    # overhead in q-columns-of-tile-compute units (parallel/pipeline.py:
    # pick_q_tile cost model).  0 = AUTO: the r5 real-chip measurement
    # (~1940 qcols at the pod per-chip shard, tools/tpu_stage_timing.py)
    # on accelerators, the asymptotic T >= 2P rule on CPU meshes.  Set
    # explicitly to override after re-measuring on new hardware.
