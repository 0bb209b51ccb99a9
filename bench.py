#!/usr/bin/env python
"""Benchmark suite over the BASELINE.md evaluation configs.

Prints ONE JSON line.  Headline metric: CAVI iterations/s at the eQTL-scale
single-host config (n=1k, p=50k SNPs, q=10k traits) on the available
accelerator, measured DEVICE-RESIDENT (K iterations per lax.scan dispatch
— the production fit path; the old per-dispatch mode carries ~6 ms/iter of
host/tunnel overhead the device never sees and is reported as a
diagnostic).  `vs_baseline` reports the fraction of the BINDING-resource
speed of light achieved by the steady-state (lite) iteration — the r4
probe attribution (docs/DESIGN.md S3) showed the fused kernel's input DMA
fully overlapped and the VPU issue rate binding, so the honest ceiling is
max(VPU-op model, HBM-bytes model), not HBM alone (the old `roofline_frac`
is still reported per config for cross-round continuity).  The model is
externally witnessed by a hardware profiler trace (r5, docs/TRACE_r5.md):
kernel device-busy time 23.85 ms/iter at the eQTL shape with busy == span
(no stalls), vs the 20.8 ms VPU-op model.  The reference publishes no
numbers (BASELINE.md), so the scale is the hardware ceiling, not a
synthetic slowdown factor.

Extra keys:
  hbm_gbps          achieved HBM bandwidth of the lite iteration (GB/s)
  configs           per-BASELINE-config results:
    sim_small       config 1 (n=200,p=500,q=100): end-to-end annealed fit
                    seconds to convergence + iterations
    sim_anneal      config 2 (n=300,p=2k,q=500): same + bFDR hotspot calling
    perm_null       config 3 (n=500,p=5k,q=1k): observed fit + one
                    permuted-null fit (the dual-permutation unit of work)
    eqtl_1host      config 4: lite-iteration ms + roofline (the headline)
    eqtl_missing    config 4 with 15% missing cells (VB-impute production
                    path): lite-iteration ms
    pod_slice       config 5 single-chip slice (n=5k, p=300k, q=1024):
                    lite-iteration ms (the 2-D mesh scaling argument for the
                    full q=30k lives in docs/DESIGN.md S6)

Set BENCH_FAST=1 to run only the headline config (driver smoke runs).
"""
import json
import os
import time

import numpy as np

V5E_HBM_GBPS = 819.0  # TPU v5e peak HBM bandwidth


def _sim(n, p, q, p_act=None, seed=0, missing_frac=0.0):
    rng = np.random.default_rng(seed)
    p_act = p_act or max(10, p // 100)
    x = rng.normal(size=(n, p)).astype(np.float32)
    x = (x - x.mean(0)) / x.std(0, ddof=1)
    y = rng.normal(size=(n, q)).astype(np.float32)
    q_hit = max(2, q // 5)
    y[:, :q_hit] += x[:, :p_act] @ (
        rng.normal(1.0, 0.5, (p_act, q_hit)).astype(np.float32) * 0.3)
    y -= y.mean(0)
    if missing_frac > 0:
        y = y.astype(np.float64)
        y[rng.random(y.shape) < missing_frac] = np.nan
    return x, y


_SCAN = {}


def _scan_iters(data, hyper, state, gram, *, cfg, k):
    """K lite CAVI iterations in ONE dispatch (lax.scan) — the
    device-resident measurement mode (mirrors inference/device_loop.py's
    production fit loops)."""
    import jax
    from functools import partial
    from atlasqtl_tpu.models import global_local as gl

    if "fn" not in _SCAN:
        @partial(jax.jit, static_argnames=("cfg", "k"),
                 donate_argnames=("state",))
        def f(data, hyper, state, gram, *, cfg, k):
            def body(s, _):
                return gl.cavi_iteration(data, hyper, s, gram, 1.0, 1.0,
                                         cfg=cfg, annealed=False,
                                         lite=True), None
            return jax.lax.scan(body, state, None, length=k)[0]
        _SCAN["fn"] = f
    return _SCAN["fn"](data, hyper, state, gram, cfg=cfg, k=k)


def _iter_bench(n, p, q, iters=5, missing_frac=0.0, exact_missing=False,
                dev_k=50):
    """Steady-state lite-iteration timing at (n, p, q); returns
    (ms_per_iter, bytes_per_iter)."""
    import jax
    import jax.numpy as jnp
    from atlasqtl_tpu.types import Config
    from atlasqtl_tpu.models import global_local as gl
    from atlasqtl_tpu.inference import elicitation as elic
    from atlasqtl_tpu.ops.sweep import block_gram

    x, y = _sim(n, p, q, missing_frac=missing_frac)
    cfg = Config(dtype=jnp.float32, block_size=128, shr_fac_inv=float(q),
                 missing="exact" if (exact_missing or not missing_frac)
                 else "impute")
    data = gl.build_data(x, y, cfg, q_pad_to=512)
    state = gl.auto_init_device(0, data, (5.0, 25.0), float(q), cfg)
    hyper = gl.build_hyper(elic.auto_set_hyper(
        np.nan_to_num(np.asarray(y[:, :256], np.float64)), p, (5, 25)),
        data.y.shape[1], cfg)
    gram = jax.jit(block_gram, static_argnums=1)(data.x, cfg.block_size)

    step = lambda s: gl.cavi_iteration_donated(
        data, hyper, s, gram, 1.0, 1.0, cfg=cfg, annealed=False, lite=True)
    state = step(state)
    _ = float(jnp.sum(state.theta))  # forced readback: axon's
    # block_until_ready can return before execution completes
    # Median-of-k timing discipline (VERDICT r3 weak #7): a wedged
    # background job on the shared chip inflates a single 5-iteration
    # window silently; three independent windows expose it.
    reps = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            state = step(state)
        _ = float(jnp.sum(state.theta))
        reps.append((time.time() - t0) / iters)
    reps.sort()
    dt_dispatch = reps[1]  # median of 3, per-dispatch mode
    # steady-state sanity: the three windows run the identical compiled
    # step, so spread beyond ~20% means external contamination
    unstable = reps[2] > 1.2 * reps[0]

    # Device-resident measurement (r5): K iterations per dispatch via
    # lax.scan — the production fit path (inference/device_loop.py) runs
    # this way, and the r5 hardware profiler trace
    # (docs/DESIGN.md S3; tools/tpu_profile_job.py + parse_trace.py)
    # showed the per-dispatch mode above carries ~6 ms/iter of tunnel
    # overhead the device never sees (kernel busy == span, 23.85 ms/iter
    # at the eQTL shape vs 29.9 dispatched).  The scan number is the real
    # steady-state device rate; the dispatch number is kept as a
    # diagnostic.
    # k=50 amortizes the ~22 ms per-dispatch tunnel overhead to <0.5
    # ms/iter (measured r5: k=5 -> 29.6, k=25 -> 25.2, k=50 -> 24.7
    # ms/iter at the eQTL shape, converging on the 24.1 ms trace-witnessed
    # device time)
    dev_reps = []
    state = _scan_iters(data, hyper, state, gram, cfg=cfg, k=dev_k)
    _ = float(jnp.sum(state.theta))  # compile + warm
    for _ in range(3):
        t0 = time.time()
        state = _scan_iters(data, hyper, state, gram, cfg=cfg, k=dev_k)
        _ = float(jnp.sum(state.theta))
        dev_reps.append((time.time() - t0) / dev_k)
    dev_reps.sort()
    dt = dev_reps[1]
    unstable = unstable or dev_reps[2] > 1.2 * dev_reps[0]

    # ELBO sanity on a full iteration
    state = gl.cavi_iteration_donated(data, hyper, state, gram, 1.0, 1.0,
                                      cfg=cfg, annealed=False, lite=False)
    lb = float(gl.compute_elbo(data, hyper, state, cfg=cfg))
    assert np.isfinite(lb), "ELBO not finite in bench run"

    # HBM bytes per lite iteration (see docs/DESIGN.md S3): cp read + beta
    # read/write in place + x re-streamed per q-tile + gram blocks per tile
    # + F in/out + the (n,q) column statistics of the scalar updates
    p_pad = data.x.shape[1]
    q_pad = data.y.shape[1]
    n_pad = data.x.shape[0]
    q_tile = gl._fused_q_tile(n_pad, q_pad) or q_pad
    ntiles = q_pad // q_tile
    byt = 4.0 * (3 * p_pad * q_pad
                 + ntiles * (n_pad * p_pad + p_pad * 128)
                 + 2 * n_pad * q_pad        # F in/out
                 + 5 * n_pad * q_pad)       # y.F, F.F colsums + impute reads
    # Speed-of-light model, probe-validated (docs/DESIGN.md S3, r4 probe
    # table): the kernel's input DMA is fully overlapped (probe "dmalite"
    # == production) so the binding resource is VPU issue rate, not HBM.
    # Per-cell vector-op inventory: ~8 probit base + ~8 epilogue/stats
    # + ~15 chain (mu/logit/sigmoid/delta/stores) + sweep_sub push FMAs.
    cells = p_pad * q_pad
    # push-FMA count follows the kernel's actual chain window (auto:
    # sub=8 for n<=2048, sub=32 deep-n) — a literal 8 misprices pod shapes
    ops_per_cell = 31 + gl._fused_sub(n_pad, cfg)
    t_vpu_ms = cells * ops_per_cell / (8 * 128 * 0.94e9) * 1e3
    t_dma_ms = byt / 819e9 * 1e3
    # MXU term (r5): the two deep contractions (r0 = x^T F and the F
    # advance) need 2*n*p*q MACs per iteration; this chip's measured
    # achievable matmul rate is 78 T MACs/s — IDENTICAL for f32 and bf16
    # (tools/tpu_mxu_rate.py, in-jit loop: square 4096^3 f32 77.8 /
    # bf16 75.8 T MACs/s — which is why mxu_bf16 never helped).  At the
    # pod shape this term (39 ms) dominates and the r5 probe campaign
    # confirms it: removing both dots saves 37 ms.
    t_mxu_ms = 2.0 * n_pad * p_pad * q_pad / 78e12 * 1e3
    bound = max((t_vpu_ms, "vpu"), (t_dma_ms, "hbm"), (t_mxu_ms, "mxu"))
    sol = {"vpu_model_ms": round(t_vpu_ms, 1),
           "dma_model_ms": round(t_dma_ms, 1),
           "mxu_model_ms": round(t_mxu_ms, 1),
           "bound": bound[1],
           "sol_frac": round(bound[0] / (dt * 1e3), 3)}
    return dt * 1e3, byt, {
        "timing_reps_ms": [round(r * 1e3, 2) for r in dev_reps],
        "dispatch_ms_per_iter": round(dt_dispatch * 1e3, 2),
        "unstable": bool(unstable), "sol": sol}


def _truth_metrics(res, p, q):
    """Power/FDR against the simulation's KNOWN truth (_sim plants a dense
    active block: predictors [0, p_act) x traits [0, q_hit)): pair-level
    precision/recall at 5% bFDR and the hotspot ranking AUC.  The
    reference's statistical validation lives in its paper (SURVEY §4);
    these gates bring it in-repo so e.g. `hotspots_called` is
    interpretable against `true_hotspots`."""
    from scipy.stats import rankdata
    from atlasqtl_tpu import assign_bfdr

    p_act = max(10, p // 100)
    q_hit = max(2, q // 5)
    truth = np.zeros((p, q), bool)
    truth[:p_act, :q_hit] = True
    sel = assign_bfdr(res.gam_vb) <= 0.05
    tp = int((sel & truth).sum())
    fp = int((sel & ~truth).sum())
    fn = int((~sel & truth).sum())
    score = res.gam_vb.max(axis=1)           # hotspot propensity ranking
    lab = np.zeros(p, bool)
    lab[:p_act] = True
    r = rankdata(score)                      # average ranks on ties
    n1, n0 = int(lab.sum()), int((~lab).sum())
    auc = (r[lab].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    return {"pair_precision_bfdr05": round(tp / max(tp + fp, 1), 3),
            "pair_recall_bfdr05": round(tp / max(tp + fn, 1), 3),
            "pairs_called": tp + fp, "true_pairs": int(truth.sum()),
            "hotspot_auc": round(float(auc), 3), "true_hotspots": p_act}


def _fit_bench(n, p, q, label, seed=0, fdr_call=False, perm=False):
    """End-to-end annealed fit to convergence (wall-clock, compile excluded
    by a same-shape warm-up)."""
    import jax.numpy as jnp
    import atlasqtl_tpu as aq

    x, y = _sim(n, p, q, seed=seed)
    kw = dict(p0=(5, 25), dtype=jnp.float32, verbose=0, user_seed=seed)
    aq.atlasqtl(y, x, maxit=3, **kw)  # compile warm-up (same shapes)
    t0 = time.time()
    res = aq.atlasqtl(y, x, **kw)
    dt = time.time() - t0
    out = {"seconds_to_convergence": round(dt, 3), "iterations": res.it,
           "converged": bool(res.converged),
           "it_per_s": round(res.it / dt, 2)}
    out.update(_truth_metrics(res, p, q))
    if fdr_call:
        hot = res.hotspot_sizes(thres=0.05, fdr_adjust=True)  # 5% bFDR
        out["hotspots_called"] = int((hot > 0).sum())
    if perm:
        rng = np.random.default_rng(seed + 1)
        t0 = time.time()
        null_res = aq.atlasqtl(y[rng.permutation(n)], x, **kw)
        out["null_fit_seconds"] = round(time.time() - t0, 3)
        # permuted responses carry NO signal: anything called is a false
        # positive (the calibration half of the power/FDR gate)
        out["null_pairs_called"] = int(
            (aq.assign_bfdr(null_res.gam_vb) <= 0.05).sum())
    return out


def main():
    fast = os.environ.get("BENCH_FAST", "") == "1"
    n = int(os.environ.get("BENCH_N", 1000))
    p = int(os.environ.get("BENCH_P", 50_000))
    q = int(os.environ.get("BENCH_Q", 10_000))
    iters = int(os.environ.get("BENCH_ITERS", 5))

    configs = {}
    ms, byt, diag = _iter_bench(n, p, q, iters=iters)
    hbm_gbps = byt / (ms * 1e-3) / 1e9
    roofline = hbm_gbps / V5E_HBM_GBPS
    configs["eqtl_1host"] = {"n": n, "p": p, "q": q,
                             "ms_per_iter": round(ms, 2),
                             "hbm_gbps": round(hbm_gbps, 1),
                             "roofline_frac": round(roofline, 3), **diag}

    if not fast:
        for key, args in (
                ("sim_small", dict(n=200, p=500, q=100)),
                ("sim_anneal", dict(n=300, p=2000, q=500, fdr_call=True)),
                ("perm_null", dict(n=500, p=5000, q=1000, perm=True))):
            try:
                configs[key] = _fit_bench(label=key, **args)
            except Exception as e:  # noqa: BLE001 — report, don't die
                configs[key] = {"error": f"{type(e).__name__}: {e}"}
        try:
            ms_m, _, dg = _iter_bench(n, p, q, iters=iters, missing_frac=0.15,
                                      dev_k=25)
            configs["eqtl_missing"] = {"ms_per_iter": round(ms_m, 2),
                                       "vs_complete": round(ms_m / ms, 2),
                                       **dg}
        except Exception as e:  # noqa: BLE001
            configs["eqtl_missing"] = {"error": f"{type(e).__name__}: {e}"}
        try:
            # exact-missing engine (fused masked-F kernel), same shape
            ms_x, _, dg = _iter_bench(n, p, q, iters=3, missing_frac=0.15,
                                      exact_missing=True, dev_k=25)
            configs["eqtl_missing_exact"] = {
                "ms_per_iter": round(ms_x, 2),
                "vs_complete": round(ms_x / ms, 2), **dg}
        except Exception as e:  # noqa: BLE001
            configs["eqtl_missing_exact"] = {
                "error": f"{type(e).__name__}: {e}"}
        for attempt in (0, 1):  # one retry: the axon tunnel drops
            try:                # long-lived connections transiently
                ms_5, byt_5, dg = _iter_bench(5000, 300_000, 1024, iters=3,
                                              dev_k=25)
                configs["pod_slice"] = {
                    "n": 5000, "p": 300_000, "q": 1024,
                    "ms_per_iter": round(ms_5, 2),
                    "hbm_gbps": round(byt_5 / (ms_5 * 1e-3) / 1e9, 1), **dg}
                break
            except Exception as e:  # noqa: BLE001
                configs["pod_slice"] = {"error": f"{type(e).__name__}: {e}"}
                if attempt == 0:
                    time.sleep(30)

    print(json.dumps({
        "metric": f"cavi_iters_per_s_n{n}_p{p}_q{q}",
        "value": round(1e3 / ms, 4),
        "unit": "iterations/s",
        "vs_baseline": diag["sol"]["sol_frac"],
        "vs_baseline_semantics": "fraction of binding-resource (VPU/HBM/MXU) "
                                 "speed of light, probe-validated",
        "hbm_roofline_frac": round(roofline, 3),
        "hbm_gbps": round(hbm_gbps, 1),
        "configs": configs,
    }))


if __name__ == "__main__":
    main()
