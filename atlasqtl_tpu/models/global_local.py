"""Global-local (horseshoe) CAVI — the product inference path.

TPU-native re-design of `atlasqtl_global_local_core_`
(R/atlasqtl_global_local_core.R:8-433): one jitted function per CAVI
iteration (update ordering preserved exactly — see the step numbers below,
which mirror the reference lines), a blocked MXU sweep instead of the C++
Gauss-Seidel kernel, and masked reductions so TPU tile padding never leaks
into the math.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Config, Data, Hyper, VBState
from ..ops import updates as upd
from ..ops import elbo as elbo_ops
from ..ops.horseshoe import lam2_inv_annealed, lam2_inv_exact
from ..ops.special import q_approx, log_ndtr_both
from ..ops.sweep import SweepConsts, block_gram, sweep_complete, sweep_missing


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def build_data(x_np, y_np, cfg: Config, q_pad_to: int = 8,
               p_shards: int = 1) -> Data:
    """Pad to TPU-friendly shapes and precompute sufficient statistics
    (reference precompute: R/atlasqtl_global_local_core.R:19-42).

    p_shards: the 2-D mesh needs p divisible by p_shards * block so every
    p-shard holds whole predictor blocks."""
    n, p = x_np.shape
    q = y_np.shape[1]
    block = min(cfg.block_size, _round_up(p, 8))
    p_pad = _round_up(p, block * max(1, p_shards))
    q_pad = _round_up(q, q_pad_to)
    # the sample axis is padded to the sublane width with all-zero rows:
    # they contribute nothing to any sufficient statistic (X and Y rows are
    # zero), and the scalar n used in the update formulas stays the true n
    n_pad = _round_up(n, 8)
    dt = cfg.dtype

    x = np.zeros((n_pad, p_pad), dtype=np.float64)
    x[:n, :p] = x_np
    y = np.zeros((n_pad, q_pad), dtype=np.float64)
    y[:n, :q] = y_np

    has_missing = bool(np.isnan(y).any())
    n_mis = np.zeros(q_pad)
    if has_missing:
        mis_pat = (~np.isnan(y)).astype(np.float64)
        mis_pat[:n, q:] = 1.0  # padded responses behave as fully observed
        mis_pat[n:, :] = 0.0   # padded samples are never observed
        y = np.nan_to_num(y, nan=0.0)
        if cfg.missing == "impute":
            # VB-imputation path: complete-data formulas with q(y_mis)
            # moments folded in; n_eff is the full n
            n_mis[:q] = n - mis_pat[:n, :q].sum(axis=0)
            n_eff = np.full(q_pad, float(n))
        else:
            n_eff = mis_pat[:, :].sum(axis=0)
            n_eff[q:] = float(n)
    else:
        mis_pat = None
        n_eff = np.full(q_pad, float(n))

    # O(npq) precomputes on device (host NumPy is the bottleneck at scale)
    xd = jnp.asarray(x, dt)
    yd = jnp.asarray(y, dt)
    md = None if mis_pat is None else jnp.asarray(mis_pat, dt)

    exact_missing = has_missing and cfg.missing == "exact"

    @partial(jax.jit, static_argnames=("missing",))
    def _precompute(xd, yd, md, missing: bool):
        cp_x_y = jnp.einsum("np,nq->pq", xd, yd, preferred_element_type=dt)
        y_norm_sq = jnp.einsum("nq,nq->q", yd, yd)
        x_norm_sq = (jnp.einsum("np,nq->pq", xd * xd, md,
                                preferred_element_type=dt)
                     if missing else None)
        return cp_x_y, y_norm_sq, x_norm_sq

    cp_x_y, y_norm_sq, x_norm_sq = _precompute(xd, yd, md,
                                               missing=exact_missing)

    pair_gram = None
    if exact_missing and cfg.mis_block > 1:
        # the fused missing kernel computes pair Grams on the fly from the
        # X tile and mask — skip the (mis_block-1)/2 * p * q precompute
        # (7 GB at the eQTL bench shape) when it will be selected
        fused_mis = (cfg.sweep in ("auto", "fused")
                     and cfg.dtype == jnp.float32
                     and jax.devices()[0].platform != "cpu"
                     and cfg.p_axis is None and cfg.q_axis is None
                     and cfg.block_size == 128 and p_pad % 128 == 0
                     and _mis_fused_q_tile(n_pad, q_pad) is not None)
        if not fused_mis and p_pad % cfg.mis_block == 0:
            from ..ops.sweep import mis_pair_gram
            pair_gram = jax.jit(mis_pair_gram, static_argnums=2)(
                xd, md, cfg.mis_block)
        elif not fused_mis:
            import logging
            logging.getLogger("atlasqtl_tpu").warning(
                "mis_block=%d does not divide the padded p=%d; falling "
                "back to the per-coordinate missing-data scan",
                cfg.mis_block, p_pad)

    p_mask = np.zeros(p_pad); p_mask[:p] = 1.0
    q_mask = np.zeros(q_pad); q_mask[:q] = 1.0

    j = lambda a: None if a is None else jnp.asarray(a, dt)
    return Data(
        x=xd, y=yd, cp_x_y=cp_x_y, y_norm_sq=y_norm_sq,
        mis_pat=md, x_norm_sq=x_norm_sq, n_eff=j(n_eff), n_mis=j(n_mis),
        p_mask=j(p_mask), q_mask=j(q_mask),
        n=jnp.asarray(float(n), dt),
        p_true=jnp.asarray(float(p), dt),
        q_true=jnp.asarray(float(q), dt),
        mis_pair_gram=pair_gram,
    )


def build_hyper(hs, q_pad: int, cfg: Config) -> Hyper:
    """Pad the (q,)-shaped hyperparameters; padded entries are benign
    (eta=kappa=1, n0=0) and masked out of every reduction."""
    dt = cfg.dtype
    q = hs.q

    def padv(v, fill):
        out = np.full(q_pad, fill, dtype=np.float64)
        out[:q] = v
        return jnp.asarray(out, dt)

    return Hyper(
        eta=padv(hs.eta, 1.0), kappa=padv(hs.kappa, 1.0), n0=padv(hs.n0, 0.0),
        nu=jnp.asarray(hs.nu, dt), rho=jnp.asarray(hs.rho, dt),
        t02=jnp.asarray(hs.t02, dt), m0=jnp.asarray(hs.m0, dt),
        a2_inv=jnp.asarray(hs.a2_inv, dt),
    )


def build_state(init, data: Data, cfg: Config) -> VBState:
    """Assemble the padded VBState from an InitSpec and compute the carried
    fitted matrix F = X beta (masked when data are missing) — the analog of
    the reference's cp_X_Xbeta precompute
    (R/atlasqtl_global_local_core.R:112-115)."""
    dt = cfg.dtype
    p_pad = data.x.shape[1]
    q_pad = data.y.shape[1]
    p, q = init.p, init.q

    def pad2(a, fill=0.0):
        out = np.full((p_pad, q_pad), fill, dtype=np.float64)
        out[:p, :q] = a
        return out

    def padp(a, fill):
        out = np.full(p_pad, fill, dtype=np.float64)
        out[:p] = a
        return out

    def padq(a, fill):
        out = np.full(q_pad, fill, dtype=np.float64)
        out[:q] = a
        return out

    gam = pad2(init.gam_vb)
    mu = pad2(init.mu_beta_vb)
    init_s2b = np.asarray(init.sig2_beta_vb)
    if init_s2b.ndim == 2:  # resume of an exact-missing run: per-(j,k) values
        sig2_beta = pad2(init_s2b, fill=1.0)
        if data.x_norm_sq is None:  # resuming into a complete-data fit
            sig2_beta = sig2_beta.mean(axis=0)
    else:
        sig2_beta = padq(init_s2b, 1.0)
        if data.x_norm_sq is not None:
            # exact missing-data path carries a (p, q) slab variance
            sig2_beta = np.broadcast_to(sig2_beta[None, :],
                                        (p_pad, q_pad)).copy()
    tau = padq(init.tau_vb, 1.0)
    theta = padp(init.theta_vb, 0.0)
    zeta = padq(init.zeta_vb, 0.0)
    sig2_theta = padp(init.sig2_theta_vb, 1.0)
    lam2_inv = np.ones(p_pad)

    beta = jnp.asarray(gam * mu, dt)
    fitted = jnp.matmul(data.x, beta, preferred_element_type=dt)
    colstats = (None, None, None)
    if data.x_norm_sq is not None:
        fitted = fitted * data.mis_pat
    else:
        colstats = (jnp.asarray(gam.sum(0), dt),
                    jnp.asarray(np.einsum("pq,pq->q", mu * mu, gam), dt),
                    jnp.asarray(np.einsum("pq,pq->q", gam * mu, gam * mu),
                                dt))

    return VBState(
        gam_colsum=colstats[0], mu2gam_colsum=colstats[1],
        beta2_colsum=colstats[2],
        beta=beta if data.x_norm_sq is None else None,
        gam=jnp.asarray(gam, dt), mu_beta=jnp.asarray(mu, dt),
        sig2_beta=jnp.asarray(sig2_beta, dt), tau=jnp.asarray(tau, dt),
        sig2_inv=jnp.asarray(1e-2, dt),
        theta=jnp.asarray(theta, dt), zeta=jnp.asarray(zeta, dt),
        sig02_inv=jnp.asarray(init.sig02_inv_vb, dt),
        lam2_inv=jnp.asarray(lam2_inv, dt),
        sig2_theta=jnp.asarray(sig2_theta, dt),
        fitted=fitted,
        l_vb=jnp.ones(p_pad, dt), rho_xi_inv=jnp.asarray(1.0, dt),
        nu_s0_vb=jnp.asarray(1.0, dt), rho_s0_vb=jnp.asarray(1.0, dt),
    )


def auto_init_device(seed, data: Data, p0, shr_fac_inv: float,
                     cfg: Config) -> VBState:
    """Device-side random initialization for large problems — same sampling
    distributions as the reference's auto_set_init_
    (R/set_hyper_init.R:356-418), drawn with the JAX PRNG (rbg impl — the
    threefry kernel takes minutes to compile at (p, q) scale on TPU) so no
    host-side (p, q) float64 temporaries are materialized."""
    from ..inference.elicitation import get_n0_t02

    dt = cfg.dtype
    p_true = int(np.asarray(data.p_true))
    q_true = int(np.asarray(data.q_true))

    n0_vec, t02 = get_n0_t02(1, p_true, p0)
    n0 = float(n0_vec[0])
    s02 = 1e-4

    med_var = float(np.nanmedian(np.asarray(
        jnp.var(data.y[:, :q_true], axis=0, ddof=1))))
    tau0 = 1.0 / med_var if np.isfinite(1.0 / med_var) else 1e3
    sig2_inv0 = 1e-2

    key = (seed if not isinstance(seed, int)
           else jax.random.key(seed, impl="rbg"))
    ks = jax.random.split(key, 8)
    f = lambda v: jnp.asarray(v, dt)
    return _auto_init_draw(
        ks, data.x, data.p_mask, data.q_mask,
        data.mis_pat if data.x_norm_sq is not None else None,
        f(n0), f(s02 + t02), f(np.sqrt(t02)), f(tau0), f(sig2_inv0),
        f(float(max(p_true, q_true))), f(float(q_true)), f(shr_fac_inv),
        dt=dt)


def _gamma_large(k, shape_param, size, dt):
    # Gamma(a, 1) ~= N(a, sqrt(a)) for large a — avoids the rejection
    # sampler, which is extremely slow on TPU for big shape params
    g = shape_param + jnp.sqrt(shape_param) * jax.random.normal(k, size, dt)
    return jnp.maximum(g, 0.1 * shape_param)


# Module-level jit (NOT defined inside auto_init_device: a nested @jax.jit
# is a fresh cache entry per call, which recompiled the draw on EVERY fit
# — ~1.5 s per atlasqtl() call at sim scale).  x/masks/mis_pat are explicit
# arguments — closure capture would bake them into the HLO as constants
# (6 GB of x at pod scale), which bloats compile payloads enough to break
# the axon tunnel; the distribution scalars are dynamic operands so fits
# with different hyperparameters share the executable.
@partial(jax.jit, static_argnames=("dt",))
def _auto_init_draw(ks, x, p_mask, q_mask, mis_pat, n0, sd2_gam, t0_sd,
                    tau0, sig2_inv0, pq_max, q_true, shr_fac_inv, *, dt):
    from jax.scipy.special import ndtr

    p_pad = p_mask.shape[0]
    q_pad = q_mask.shape[0]
    pm = p_mask[:, None]
    qm = q_mask[None, :]
    gam = ndtr(n0 + sd2_gam
               * jax.random.normal(ks[0], (p_pad, q_pad), dt)) * pm * qm
    mu = jax.random.normal(ks[1], (p_pad, q_pad), dt) * pm * qm
    tau = jnp.full((q_pad,), 1.0, dt) * tau0
    # Gamma(2, 1) = sum of two exponentials (exact, sampler-free)
    u = jax.random.uniform(ks[2], (2, q_pad), dt,
                           minval=jnp.finfo(dt).tiny)
    g2 = -jnp.log(u[0]) - jnp.log(u[1])
    # reference (R/set_hyper_init.R:398): 1/rgamma(shape=2,
    # rate=1/(sig2_inv*tau)) i.e. Gamma scale = sig2_inv*tau, so the
    # draw is 1/(g2 * sig2_inv * tau) with g2 ~ Gamma(2, 1)
    sig2_beta = 1.0 / (g2 * (sig2_inv0 * tau))
    sig02_inv = _gamma_large(ks[3], pq_max, (), dt)
    theta = (jax.random.normal(ks[4], (p_pad,), dt)
             / jnp.sqrt(sig02_inv * shr_fac_inv)) * p_mask
    sig2_theta = 1.0 / (q_true + _gamma_large(
        ks[5], sig02_inv * shr_fac_inv, (p_pad,), dt))
    zeta = (n0 + t0_sd
            * jax.random.normal(ks[6], (q_pad,), dt)) * q_mask
    fitted = jnp.matmul(x, gam * mu, preferred_element_type=dt)
    if mis_pat is not None:
        fitted = fitted * mis_pat
    sig2_beta_full = (jnp.broadcast_to(sig2_beta[None, :],
                                       (p_pad, q_pad))
                      if mis_pat is not None else sig2_beta)
    if mis_pat is None:
        beta0 = gam * mu
        colstats = (jnp.sum(gam, axis=0),
                    jnp.einsum("pq,pq->q", mu * mu, gam),
                    jnp.einsum("pq,pq->q", beta0, beta0))
    else:
        beta0 = None
        colstats = (None, None, None)
    return VBState(
        gam_colsum=colstats[0], mu2gam_colsum=colstats[1],
        beta2_colsum=colstats[2], beta=beta0,
        gam=gam, mu_beta=mu, sig2_beta=sig2_beta_full, tau=tau,
        sig2_inv=sig2_inv0, theta=theta, zeta=zeta,
        sig02_inv=sig02_inv, lam2_inv=jnp.ones(p_pad, dt),
        sig2_theta=sig2_theta, fitted=fitted,
        l_vb=jnp.ones(p_pad, dt), rho_xi_inv=jnp.asarray(1.0, dt),
        nu_s0_vb=jnp.asarray(1.0, dt), rho_s0_vb=jnp.asarray(1.0, dt),
    )


def _fused_q_tile(n, q_pad, block=128):
    """Largest response tile fitting the kernel's whole VMEM footprint —
    the resident F tile (n x qt), ~8 block-tile scratch buffers, and the
    double-buffered I/O windows (~5 more block-tile equivalents) — under
    the 100 MB kernel limit.  Bigger tiles cut the per-iteration X
    re-streaming and the grid-step count: qt=5120 measured 31.0 ms/iter
    vs 35.5 at qt=2048 (eQTL bench shape)."""
    budget = max(128, int(95e6 / (4 * (n + 13 * block))) // 128 * 128)
    for cand in (5120, 2560, 2048, 1024, 512, 256, 128):
        if cand <= budget and q_pad % cand == 0:
            return cand
    return None


def data_block(cfg: Config, data: Data) -> int:
    """The predictor block build_data padded p with — recompute it from
    p_true instead of `min(block_size, p_pad)`: under a p-sharded mesh with
    p < block_size, p_pad = block * p_shards exceeds block_size and the min
    rule picks a block that divides neither p_pad nor the per-shard p
    (r5 bug: p=75, p_shards=2 -> p_pad=160, min gave 128)."""
    p_true = int(np.asarray(data.p_true))
    return min(cfg.block_size, _round_up(p_true, 8))


def divisor_block(block_size: int, p_pad: int) -> int:
    """Largest multiple-of-8 block <= block_size dividing p_pad — the
    static-shape-safe variant for use inside jit (ELBO assemblers), where
    only p_pad is known.  Any divisor is correct there: the blocked pass
    just tiles the (padded, zero-masked) p axis."""
    b = min(block_size, p_pad)
    while p_pad % b:
        b -= 8
    return b


def _fused_sub(n, cfg: Config) -> int:
    """Chain window size: cfg.sweep_sub, or the measured-by-regime auto
    (small n: push FMAs dominate -> sub=8; large n: the per-window
    projection/advance costs scale with n -> fewer, bigger windows)."""
    return cfg.sweep_sub or (8 if n <= 2048 else 32)


def _fused_qchunk(q_tile):
    """Chain q-chunking: wider chunks amortize per-row overheads once the
    tile is large (measured at qt=5120: qc2560 27.9 ms < qc1024 31.0 <
    qc512 32.6), and tiles at or below 1024 never benefit from splitting
    (pod_slice shape n=5k, p=300k, qt=1024: qc1024 64.0 ms < qc512 65.3 <
    qc256 81.6 — the chain rows are few and wide relative to n-dominated
    window costs there).  Between 1024 and 4096, qc512 wins the
    register-pressure tradeoff."""
    if q_tile >= 4096:
        return q_tile // 2
    if q_tile <= 1024:
        return q_tile
    return 512


def _mis_fused_q_tile(n, q_pad, block=128):
    """Response tile for the fused exact-missing kernel: two resident
    (n x q_tile) tiles (Fm and the mask) plus six block tiles and the
    on-the-fly pair-Gram scratch."""
    budget = max(128, int(28e6 / (4 * (2 * n + 7 * block))) // 128 * 128)
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= budget and q_pad % cand == 0:
            return cand
    return None


def _select_missing_sweep(cfg: Config, data: Data, mesh=None) -> str:
    """Exact-missing engine choice: fused Pallas kernel on a real TPU in
    f32 (single device — mesh paths use the pipelined/GSPMD routes),
    blocked XLA scan when pair Grams were precomputed, else the
    per-coordinate scan."""
    on_accel = jax.devices()[0].platform != "cpu"
    if (mesh is None and cfg.sweep in ("auto", "fused")
            and cfg.dtype == jnp.float32 and on_accel
            and cfg.block_size == 128
            and data.x.shape[1] % 128 == 0
            and _mis_fused_q_tile(data.x.shape[0], data.y.shape[1])):
        return "fused"
    if data.mis_pair_gram is not None:
        return "blocked"
    return "scan"


def _select_sweep(cfg: Config, data: Data, mesh=None) -> str:
    """Sweep implementation choice: the fully-fused single-kernel sweep when
    it applies (f32, real TPU, F tile fits VMEM; sharded via shard_map when
    a mesh is given), else the chosen or default path."""
    impl = cfg.sweep
    if impl == "auto":
        if cfg.block_size < 8:
            return "xla"  # batch="0" reference mode: per-coordinate scan
        on_accel = jax.devices()[0].platform != "cpu"
        n_dev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
        q_local = data.y.shape[1] // n_dev
        sharding_ok = (cfg.q_axis is None) == (mesh is None)
        if (cfg.dtype == jnp.float32 and on_accel and sharding_ok
                and _fused_q_tile(data.x.shape[0], q_local)):
            return "fused"
        if mesh is None and (cfg.use_pallas
                             or (on_accel and cfg.dtype == jnp.float32)):
            return "pallas"
        return "xla"
    return impl


# ------------------------------------------------------------ one iteration

def _colsum_stats(data: Data, state: VBState, use_cached: bool = True):
    """Masked column statistics shared by the tau/sigma updates.

    When the sweep that produced `state` accumulated them in-kernel
    (state.gam_colsum et al.), reuse them instead of re-reading the p x q
    state from HBM.  The float64 ELBO path passes use_cached=False: its
    monotonicity tolerance needs the f64 re-accumulation, not the kernel's
    f32 sums."""
    gam = state.gam  # already masked post-sweep
    beta = gam * state.mu_beta
    if (use_cached and state.gam_colsum is not None
            and state.sig2_beta.ndim == 1):
        gam_colsum = state.gam_colsum
        m2b_colsum = state.mu2gam_colsum + state.sig2_beta * gam_colsum
        beta2_colsum = state.beta2_colsum
        yf_colsum = jnp.einsum("nq,nq->q", data.y, state.fitted)
        ff_colsum = jnp.einsum("nq,nq->q", state.fitted, state.fitted)
        return (gam_colsum, m2b_colsum, None, beta2_colsum, yf_colsum,
                ff_colsum, beta)
    gam_colsum = jnp.sum(gam, axis=0)
    if state.sig2_beta.ndim == 1:
        m2b_colsum = (jnp.einsum("pq,pq->q", state.mu_beta * state.mu_beta, gam)
                      + state.sig2_beta * gam_colsum)
        m2b = None
    else:
        m2b = (state.mu_beta * state.mu_beta + state.sig2_beta) * gam
        m2b_colsum = jnp.sum(m2b, axis=0)
    beta2_colsum = jnp.einsum("pq,pq->q", beta, beta)
    yf_colsum = jnp.einsum("nq,nq->q", data.y, state.fitted)
    ff_colsum = jnp.einsum("nq,nq->q", state.fitted, state.fitted)
    return gam_colsum, m2b_colsum, m2b, beta2_colsum, yf_colsum, ff_colsum, beta


def _cavi_iteration_impl(data: Data, hyper: Hyper, state: VBState,
                         gram_blocks, c, c_s, *, cfg: Config,
                         annealed: bool, mesh=None,
                         lite: bool = False) -> VBState:
    """One CAVI iteration, update ordering identical to the reference loop
    (R/atlasqtl_global_local_core.R:125-338).

    lite=True (fused engine only): the sweep reads/writes the carried
    beta = gam * mu_beta array and does NOT emit fresh gam/mu matrices —
    2 x 4 GB/iter less HBM traffic at bench shape.  The returned state's
    gam/mu_beta are the (stale) inputs; every downstream per-iteration
    update consumes only beta / the fused column statistics, so the math
    is bitwise identical.  The driver schedules full iterations whenever
    gam/mu freshness is needed (ELBO, checkpoint, final output)."""
    dt = cfg.dtype
    c = jnp.asarray(c, dt)
    c_s = jnp.asarray(c_s, dt)
    shr = jnp.asarray(cfg.shr_fac_inv, dt)

    (gam_colsum, m2b_colsum, m2b, beta2_colsum, yf_colsum, ff_colsum,
     beta) = _colsum_stats(data, state)

    impute = data.mis_pat is not None and data.x_norm_sq is None
    cp_x_y = data.cp_x_y
    y_norm_sq = data.y_norm_sq
    if impute:
        # q(y_mis) update: y_mis | rest ~ N((X beta)_mis, 1/(c tau)); fold
        # the moments into the complete-data sufficient statistics
        v_mis = 1.0 / (c * state.tau)
        y_eff = data.y + (1.0 - data.mis_pat) * state.fitted
        cp_x_y = jnp.einsum("np,nq->pq", data.x, y_eff,
                            preferred_element_type=dt)
        y_norm_sq = (jnp.einsum("nq,nq->q", y_eff, y_eff)
                     + data.n_mis * v_mis)
        yf_colsum = jnp.einsum("nq,nq->q", y_eff, state.fitted)

    # 1-2: slab precision (:134-137)
    sum_gam = jnp.sum(gam_colsum * data.q_mask)
    nu_vb = upd.nu_update(hyper.nu, sum_gam, c)
    rho_vb = upd.rho_update(hyper.rho, m2b_colsum, state.tau, data.q_mask, c)
    sig2_inv = nu_vb / rho_vb

    # residual precision (:141-145)
    eta_vb = upd.eta_update(data.n_eff, hyper.eta, gam_colsum, c)
    if data.x_norm_sq is None:
        kappa_vb = upd.kappa_update(data.n, y_norm_sq, yf_colsum,
                                    ff_colsum, hyper.kappa, m2b_colsum,
                                    beta2_colsum, sig2_inv, c)
    else:
        xns_m2b = jnp.einsum("pq,pq->q", data.x_norm_sq, m2b)
        xns_b2 = jnp.einsum("pq,pq->q", data.x_norm_sq, beta * beta)
        kappa_vb = upd.kappa_update(data.n, data.y_norm_sq, yf_colsum,
                                    ff_colsum, hyper.kappa, m2b_colsum,
                                    beta2_colsum, sig2_inv, c,
                                    x_norm_sq_m2b=xns_m2b,
                                    x_norm_sq_beta2=xns_b2)
    tau = eta_vb / kappa_vb

    # 3-4: slab variance + log-expectations (:147-150)
    sig2_beta = upd.sig2_beta_update(data.n, sig2_inv, tau, data.x_norm_sq, c)
    log_tau = upd.log_gamma_mean(eta_vb, kappa_vb)
    log_sig2_inv = upd.log_gamma_mean(nu_vb, rho_vb)

    # 5: the Gauss-Seidel sweep (:166-176 -> src/coreLoop.cpp)
    consts = SweepConsts(sig2_beta=sig2_beta, tau=tau, log_tau=log_tau,
                         log_sig2_inv=log_sig2_inv, theta=state.theta,
                         zeta=state.zeta, c=c)
    beta_new = None
    if data.x_norm_sq is None:
        block = gram_blocks.shape[1]
        colstats = None
        beta_carry = state.beta if state.beta is not None else beta
        if mesh is not None and cfg.p_axis is not None:
            # 2-D (p x q) mesh: pipelined exact sweep (q-tiles flow through
            # the p-stages; see parallel/pipeline.py)
            from ..parallel.pipeline import pipelined_sweep_2d
            (beta_new, gam_new, mu_new, fitted, z_row, z_col,
             colstats) = pipelined_sweep_2d(mesh, cfg, data, state,
                                            beta_carry, gram_blocks, cp_x_y,
                                            consts, block,
                                            emit_gam_mu=not lite,
                                            annealed=annealed)
        elif (impl := _select_sweep(cfg, data, mesh)) == "fused":
            from ..ops.sweep_fused import sweep_complete_fused
            n = data.x.shape[0]
            if mesh is not None:
                (beta_new, gam_new, mu_new, fitted, z_row, z_col,
                 colstats) = _sharded_fused_sweep(
                    mesh, cfg, data, state, beta_carry, gram_blocks, cp_x_y,
                    consts, block, emit_gam_mu=not lite, annealed=annealed)
            else:
                q_tile = _fused_q_tile(n, data.y.shape[1])
                if (cfg.sweep_stagger and q_tile >= 256
                        and cfg.sweep_probe == "none"):
                    from ..ops.sweep_staggered import sweep_complete_staggered
                    (beta_new, gam_new, mu_new, fitted, z_row, z_col,
                     colstats) = sweep_complete_staggered(
                        data.x, cp_x_y, gram_blocks, beta_carry,
                        state.fitted, consts, block,
                        p_mask=data.p_mask, q_mask=data.q_mask,
                        q_tile=q_tile, sub=_fused_sub(n, cfg),
                        qchunk=cfg.sweep_qchunk or _fused_qchunk(q_tile),
                        emit_gam_mu=not lite, annealed=annealed)
                else:
                    (beta_new, gam_new, mu_new, fitted, z_row, z_col,
                     colstats) = sweep_complete_fused(
                        data.x, cp_x_y, gram_blocks, beta_carry,
                        state.fitted, consts, block,
                        p_mask=data.p_mask, q_mask=data.q_mask,
                        q_tile=q_tile, sub=_fused_sub(n, cfg),
                        qchunk=cfg.sweep_qchunk or _fused_qchunk(q_tile),
                        mxu_bf16=cfg.mxu_bf16,
                        lookahead=cfg.sweep_lookahead,
                        interleave=cfg.sweep_interleave,
                        probe=cfg.sweep_probe,
                        emit_gam_mu=not lite, annealed=annealed)
            # the kernel masks beta/gam/mu at write time
        else:
            if impl == "pallas":
                from ..ops.sweep_pallas import sweep_complete_pallas
                gam_new, mu_new, fitted, z_row, z_col = sweep_complete_pallas(
                    data.x, cp_x_y, gram_blocks, state.gam, state.mu_beta,
                    state.fitted, consts, block,
                    p_mask=data.p_mask, q_mask=data.q_mask)
            else:
                gam_new, mu_new, fitted, z_row, z_col = sweep_complete(
                    data.x, cp_x_y, gram_blocks, state.gam, state.mu_beta,
                    state.fitted, consts, block,
                    p_mask=data.p_mask, q_mask=data.q_mask)
            gam_new = gam_new * data.p_mask[:, None] * data.q_mask[None, :]
            mu_new = mu_new * data.p_mask[:, None] * data.q_mask[None, :]
            beta_new = gam_new * mu_new
    else:
        colstats = None
        if mesh is not None and cfg.p_axis is not None:
            # 2-D (p x q) mesh, exact-missing: pipelined masked-F sweep
            from ..parallel.pipeline import pipelined_sweep_missing_2d
            gam_new, mu_new, fitted, z_row, z_col = pipelined_sweep_missing_2d(
                mesh, cfg, data, state, consts, cfg.block_size)
            gam_new = gam_new * data.p_mask[:, None] * data.q_mask[None, :]
            mu_new = mu_new * data.p_mask[:, None] * data.q_mask[None, :]
        elif _select_missing_sweep(cfg, data, mesh) == "fused":
            from ..ops.sweep_missing_fused import sweep_missing_fused_driver
            q_tile = _mis_fused_q_tile(data.x.shape[0], data.y.shape[1])
            gam_new, mu_new, fitted, z_row, z_col = sweep_missing_fused_driver(
                data.x, cp_x_y, data.x_norm_sq, data.mis_pat,
                state.gam, state.mu_beta, state.fitted, consts, sig2_inv,
                cfg.block_size, p_mask=data.p_mask, q_mask=data.q_mask,
                q_tile=q_tile, sub=cfg.mis_sub, wgroup=cfg.mis_wgroup,
                pair_bf16=cfg.mis_pair_bf16,
                qchunk=cfg.sweep_qchunk or _fused_qchunk(q_tile))
            # the kernel masks gam/mu at write time
        elif data.mis_pair_gram is not None:
            from ..ops.sweep import sweep_missing_blocked
            gam_new, mu_new, fitted, z_row, z_col = sweep_missing_blocked(
                data.x, data.cp_x_y, data.x_norm_sq, data.mis_pat,
                data.mis_pair_gram, state.gam, state.mu_beta, state.fitted,
                consts, cfg.mis_block, p_mask=data.p_mask,
                q_mask=data.q_mask)
            gam_new = gam_new * data.p_mask[:, None] * data.q_mask[None, :]
            mu_new = mu_new * data.p_mask[:, None] * data.q_mask[None, :]
        else:
            gam_new, mu_new, fitted = sweep_missing(
                data.x, data.cp_x_y, data.x_norm_sq, data.mis_pat, state.gam,
                state.mu_beta, state.fitted, consts)
            gam_new = gam_new * data.p_mask[:, None] * data.q_mask[None, :]
            mu_new = mu_new * data.p_mask[:, None] * data.q_mask[None, :]
            # 7: probit latent moments (:237)
            z_row, z_col = upd.z_moments(gam_new, state.theta, state.zeta,
                                         data.p_mask, data.q_mask, c,
                                         block_size=cfg.block_size)
    if colstats is None and data.x_norm_sq is None:
        # non-fused complete-data engines: accumulate the same column stats
        # here (same einsum cost the next iteration used to pay)
        colstats = (jnp.sum(gam_new, axis=0),
                    jnp.einsum("pq,pq->q", mu_new * mu_new, gam_new),
                    jnp.einsum("pq,pq->q", beta_new, beta_new))

    # 8: horseshoe local scales — "keep this order!" (:239-274)
    l_vb = (c_s * state.sig02_inv * shr
            * (state.theta ** 2 + state.sig2_theta) / 2.0 / cfg.df)
    # padded predictor rows carry sig2_theta = 1 (build_state pad fill), so
    # their L is ~sig02_inv * q / 2 — large enough to overflow the special
    # functions; pin them to a benign value (they are masked out of every
    # reduction, but NaN * 0 would still poison the sig02 sum)
    l_vb = jnp.where(data.p_mask > 0, l_vb, jnp.asarray(1.0, dt))
    rho_xi_inv = c_s * (hyper.a2_inv + state.sig02_inv)
    if annealed:
        lam2_inv = lam2_inv_annealed(l_vb, c_s, cfg.df)
    else:
        lam2_inv, _ = lam2_inv_exact(l_vb, cfg.df)

    # 9: global scale + propensities (:276-291)
    xi_inv = 1.0 / rho_xi_inv  # nu_xi_inv_vb = 1 (:119)
    sig02_lam_shr = state.sig02_inv * lam2_inv * shr
    sig2_theta = upd.sig2_c0_update(data.q_true, 1.0 / sig02_lam_shr, c)
    zeta_sum = jnp.sum(state.zeta * data.q_mask)
    theta = upd.theta_update(z_row, hyper.m0, sig02_lam_shr, sig2_theta,
                             zeta_sum, c) * data.p_mask

    nu_s0_vb = upd.nu_update(jnp.asarray(0.5, dt), data.p_true, c_s)
    rho_s0_vb = c_s * (xi_inv + 0.5 * jnp.sum(
        lam2_inv * shr * (theta ** 2 + sig2_theta) * data.p_mask))
    sig02_inv = nu_s0_vb / rho_s0_vb

    sig2_zeta = upd.sig2_c0_update(data.p_true, hyper.t02, c)
    theta_sum = jnp.sum(theta)
    zeta = upd.zeta_update(z_col, theta_sum, hyper.n0, sig2_zeta,
                           1.0 / hyper.t02, c) * data.q_mask

    if gam_new is None:  # lite fused iteration: gam/mu stay (stale) as-is
        gam_new, mu_new = state.gam, state.mu_beta
    return VBState(
        gam=gam_new, mu_beta=mu_new, beta=beta_new,
        sig2_beta=sig2_beta, tau=tau,
        sig2_inv=sig2_inv, theta=theta, zeta=zeta, sig02_inv=sig02_inv,
        lam2_inv=lam2_inv, sig2_theta=sig2_theta, fitted=fitted,
        gam_colsum=None if colstats is None else colstats[0],
        mu2gam_colsum=None if colstats is None else colstats[1],
        beta2_colsum=None if colstats is None else colstats[2],
        l_vb=l_vb, rho_xi_inv=rho_xi_inv, nu_s0_vb=nu_s0_vb,
        rho_s0_vb=rho_s0_vb,
    )


def _sharded_fused_sweep(mesh, cfg, data, state, beta_carry, gram_blocks,
                         cp_x_y, consts, block, emit_gam_mu=True,
                         annealed=False):
    """shard_map wrapper running the fused kernel per q-shard; the only
    cross-shard communication is the psum of the Z row-sums."""
    from jax.sharding import PartitionSpec as P
    from ..ops.sweep_fused import sweep_complete_fused

    qax = cfg.q_axis
    n_dev = int(np.prod(list(mesh.shape.values())))
    q_local = data.y.shape[1] // n_dev
    q_tile = _fused_q_tile(data.x.shape[0], q_local)

    def local(x, cp, beta, fitted, s2, tau, logtau, zeta, theta, pmask,
              qmask, c, log_sig2_inv, gb):
        consts_l = SweepConsts(sig2_beta=s2, tau=tau, log_tau=logtau,
                               log_sig2_inv=log_sig2_inv, theta=theta,
                               zeta=zeta, c=c)
        b, g, m, f, zr, zc, cs = sweep_complete_fused(
            x, cp, gb, beta, fitted, consts_l, block,
            p_mask=pmask, q_mask=qmask, q_tile=q_tile,
            sub=_fused_sub(x.shape[0], cfg),
            qchunk=cfg.sweep_qchunk or _fused_qchunk(q_tile),
            mxu_bf16=cfg.mxu_bf16, lookahead=cfg.sweep_lookahead,
            interleave=cfg.sweep_interleave,
            emit_gam_mu=emit_gam_mu, annealed=annealed)
        zr = jax.lax.psum(zr, qax)
        if not emit_gam_mu:  # shard_map needs arrays, not None
            g = m = jnp.zeros((1, zc.shape[0]), b.dtype)
        return b, g, m, f, zr, zc, cs[0], cs[1], cs[2]

    qs = P(None, qax)
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), qs, qs, qs, P(qax), P(qax), P(qax), P(qax), P(),
                  P(), P(qax), P(), P(), P()),
        out_specs=(qs, qs, qs, qs, P(), P(qax), P(qax), P(qax), P(qax)),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )(data.x, cp_x_y, beta_carry, state.fitted,
      consts.sig2_beta, consts.tau, consts.log_tau, consts.zeta,
      consts.theta, data.p_mask, data.q_mask, consts.c, consts.log_sig2_inv,
      gram_blocks)
    b, g, m, f, zr, zc, gcol, m2gcol, b2col = out
    if not emit_gam_mu:
        g = m = None
    return b, g, m, f, zr, zc, (gcol, m2gcol, b2col)


# Safe variant (callers may keep using the input state, e.g. tests).
cavi_iteration = partial(jax.jit, static_argnames=("cfg", "annealed", "mesh",
                                                   "lite"))(
    _cavi_iteration_impl)

# Buffer-donating variant for the fit loop: the input state's large arrays
# are reused for the output, halving peak HBM in steady state.
cavi_iteration_donated = jax.jit(_cavi_iteration_impl,
                                 static_argnames=("cfg", "annealed", "mesh",
                                                  "lite"),
                                 donate_argnames=("state",))


# -------------------------------------------------------------------- ELBO

@partial(jax.jit, static_argnames=("cfg",))
def compute_elbo(data: Data, hyper: Hyper, state: VBState, *,
                 cfg: Config) -> jnp.ndarray:
    """8-term ELBO, evaluated at c = 1 with the reference's re-derivation of
    the Gamma factors "needed for monotonically increasing elbo"
    (R/atlasqtl_global_local_core.R:440-495).  Accumulates in cfg.elbo_dtype
    (falls back to cfg.dtype when float64 is not enabled).

    The p x q state is never materialized in float64: a single lax.scan over
    predictor blocks casts each block on the fly and accumulates both the
    beta/gamma ELBO term and all the (q,)-length column statistics the other
    terms need, so peak memory stays O(block x q) above the f32 state.
    """
    dt = cfg.elbo_dtype if jax.config.jax_enable_x64 else cfg.dtype
    f = lambda a: jnp.asarray(a, dt)
    shr = jnp.asarray(cfg.shr_fac_inv, dt)

    hyper64 = jax.tree_util.tree_map(f, hyper)
    # small leaves only (vectors / (n, q)); the (p, q) arrays are cast
    # per block inside the scan below
    tau = f(state.tau)
    sig2_inv = f(state.sig2_inv)
    zeta = f(state.zeta)
    fitted = f(state.fitted)
    y = f(data.y)
    q_mask = f(data.q_mask)
    n_eff = f(data.n_eff)
    p_true, q_true, n_s = f(data.p_true), f(data.q_true), f(data.n)

    missing_exact = data.x_norm_sq is not None
    impute = data.mis_pat is not None and not missing_exact
    y_norm_sq = f(data.y_norm_sq)
    entropy_y_mis = jnp.zeros((), dt)
    if impute:
        # re-derived q(y_mis) moments (a coordinate update, so the ELBO stays
        # monotone) + entropy of the imputation factors
        n_mis = f(data.n_mis)
        v_mis = 1.0 / tau
        y_eff = y + (1.0 - f(data.mis_pat)) * fitted
        y_norm_sq = jnp.einsum("nq,nq->q", y_eff, y_eff) + n_mis * v_mis
        yf_colsum = jnp.einsum("nq,nq->q", y_eff, fitted)
        entropy_y_mis = 0.5 * jnp.sum(
            n_mis * (jnp.log(2.0 * jnp.pi * v_mis) + 1.0) * q_mask)
    else:
        yf_colsum = jnp.einsum("nq,nq->q", y, fitted)
    ff_colsum = jnp.einsum("nq,nq->q", fitted, fitted)

    t02_inv = 1.0 / hyper64.t02
    sig2_zeta = 1.0 / (p_true + t02_inv)
    vec_sum_log_det_zeta = -q_true * (
        jnp.log(hyper64.t02) + jnp.log(p_true + t02_inv))

    # log_tau / log_sig2_inv enter e_beta_gamma_blocked, but depend on the
    # column statistics; run the blocked pass twice is avoided by noting
    # e_beta_gamma is affine in (log_tau, log_sig2_inv, sig2_zeta) through
    # separately-accumulated sums — instead we accumulate the raw sums first
    # (stats pass folds them), then evaluate the closed-form terms.
    p_pad = state.gam.shape[0]
    q_pad = state.gam.shape[1]
    block = divisor_block(cfg.block_size, p_pad)
    nb = p_pad // block
    s2b_1d = state.sig2_beta.ndim == 1

    def bg_block(carry, idx):
        (gam_cs, mu2g_cs, b2_cs, xns_m2b, xns_b2, bg_fixed, gam_s, m2btau_s,
         s2t_s) = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * block, block, 0)
        gam_b = f(sl(state.gam))
        mu_b = f(sl(state.mu_beta))
        if s2b_1d:
            s2_b = jnp.broadcast_to(f(state.sig2_beta)[None, :],
                                    (block, q_pad))
        else:
            s2_b = f(sl(state.sig2_beta))
        th_b = f(sl(state.theta))
        s2th_b = f(sl(state.sig2_theta))
        pm_b = f(sl(data.p_mask))
        cell = pm_b[:, None] * q_mask[None, :]
        gam_m = gam_b * cell
        beta_b = gam_b * mu_b
        m2_b = (mu_b * mu_b + s2_b) * gam_b

        # column statistics
        gam_cs = gam_cs + jnp.sum(gam_m, axis=0)
        mu2g_cs = mu2g_cs + jnp.einsum("bq,bq->q", m2_b, cell)
        b2_cs = b2_cs + jnp.einsum("bq,bq,bq->q", beta_b, beta_b, cell)
        if missing_exact:
            xns_b = f(sl(data.x_norm_sq))
            xns_m2b = xns_m2b + jnp.einsum("bq,bq,bq->q", xns_b, m2_b, cell)
            xns_b2 = xns_b2 + jnp.einsum(
                "bq,bq,bq,bq->q", xns_b, beta_b, beta_b, cell)

        # fixed part of E log p(beta,gamma) - E log q (reference:
        # R/elbo.R:10-34) — everything except the log_tau / log_sig2_inv /
        # tau*sig2_inv pieces, which need the re-derived Gamma factors and
        # are folded in after the scan via the accumulated sums
        u = th_b[:, None] + zeta[None, :]
        log_p, log_1p = log_ndtr_both(u)
        _xlogx = elbo_ops._xlogx
        bg_fixed = bg_fixed + jnp.sum(
            (gam_b * log_p + (1.0 - gam_b) * log_1p
             - _xlogx(gam_b) - _xlogx(1.0 - gam_b)
             + 0.5 * gam_b * (jnp.log(s2_b) + 1.0)) * cell)
        gam_s = gam_s + jnp.sum(gam_m)                        # sum gam
        m2btau_s = m2btau_s + jnp.einsum("bq,q,bq->", m2_b, tau, cell)
        s2t_s = s2t_s + jnp.sum(s2th_b * pm_b)
        return (gam_cs, mu2g_cs, b2_cs, xns_m2b, xns_b2, bg_fixed, gam_s,
                m2btau_s, s2t_s), None

    zq = jnp.zeros((q_pad,), dt)
    z0 = jnp.zeros((), dt)
    (gam_colsum, mu2g_colsum, beta2_colsum, xns_m2b, xns_b2, bg_fixed,
     sum_gam, m2b_tau_sum, s2theta_sum), _ = jax.lax.scan(
        bg_block, (zq, zq, zq, zq, zq, z0, z0, z0, z0), jnp.arange(nb))
    m2b_colsum = mu2g_colsum  # (mu^2 + s2) gam summed — already includes s2

    eta_vb = upd.eta_update(n_eff, hyper64.eta, gam_colsum)
    if not missing_exact:
        kappa_vb = upd.kappa_update(n_s, y_norm_sq, yf_colsum,
                                    ff_colsum, hyper64.kappa, m2b_colsum,
                                    beta2_colsum, sig2_inv)
    else:
        kappa_vb = upd.kappa_update(n_s, y_norm_sq, yf_colsum,
                                    ff_colsum, hyper64.kappa, m2b_colsum,
                                    beta2_colsum, sig2_inv,
                                    x_norm_sq_m2b=xns_m2b,
                                    x_norm_sq_beta2=xns_b2)
    nu_vb = upd.nu_update(hyper64.nu, sum_gam)
    rho_vb = upd.rho_update(hyper64.rho, m2b_colsum, tau, q_mask)
    log_tau = upd.log_gamma_mean(eta_vb, kappa_vb)
    log_sig2_inv = upd.log_gamma_mean(nu_vb, rho_vb)
    log_sig02_inv = upd.log_gamma_mean(f(state.nu_s0_vb), f(state.rho_s0_vb))
    log_xi_inv = upd.log_gamma_mean(jnp.asarray(1.0, dt), f(state.rho_xi_inv))
    xi_inv = 1.0 / f(state.rho_xi_inv)

    term_a = elbo_ops.e_y(n_eff, hyper64.kappa, kappa_vb, log_tau,
                          m2b_colsum, sig2_inv, tau, q_mask)

    # assemble term_b from the accumulated sums (same algebra as
    # elbo_ops.e_beta_gamma_blocked, distributed over the scan):
    term_b = (bg_fixed
              + 0.5 * log_sig2_inv * sum_gam
              + 0.5 * jnp.sum(gam_colsum * log_tau * q_mask)
              - 0.5 * sig2_inv * m2b_tau_sum
              - 0.5 * sig2_zeta * p_true * q_true
              - 0.5 * q_true * s2theta_sum)

    theta = f(state.theta)
    sig2_theta = f(state.sig2_theta)
    lam2_inv = f(state.lam2_inv)
    l_vb = f(state.l_vb)
    p_mask = f(data.p_mask)

    q_app = q_approx(l_vb)
    term_c = elbo_ops.e_theta_hs(
        lam2_inv, l_vb, log_sig02_inv + jnp.log(shr),
        theta, q_app, f(state.sig02_inv) * shr, sig2_theta,
        p_mask, cfg.df)

    term_d = elbo_ops.e_zeta(zeta, hyper64.n0, sig2_zeta, t02_inv,
                             vec_sum_log_det_zeta, q_true, q_mask)
    term_e = elbo_ops.e_tau(hyper64.eta, eta_vb, hyper64.kappa, kappa_vb,
                            log_tau, tau, q_mask)
    term_f = elbo_ops.e_sig2_inv_hs(xi_inv, f(state.nu_s0_vb), log_xi_inv,
                                    log_sig02_inv, f(state.rho_s0_vb),
                                    f(state.sig02_inv))
    term_g = elbo_ops.e_sig2_inv(jnp.asarray(0.5, dt), jnp.asarray(1.0, dt),
                                 log_xi_inv, hyper64.a2_inv,
                                 f(state.rho_xi_inv), xi_inv)
    term_h = elbo_ops.e_sig2_inv(hyper64.nu, nu_vb, log_sig2_inv, hyper64.rho,
                                 rho_vb, sig2_inv)

    return (term_a + term_b + term_c + term_d + term_e + term_f + term_g
            + term_h + entropy_y_mis)
