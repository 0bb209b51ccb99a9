"""Measure 2-D pipeline utilization vs the T/(P+T-1) model (VERDICT r2 #7).

Runs the pipelined exact sweep on the 8-virtual-device CPU mesh at a shape
where the pipeline depth matters (p in the thousands), sweeping the tile
count T by forcing the tile width, and reports wall-clock per iteration
against the ideal-scaling model.  CPU virtual devices share host cores, so
absolute utilization is a lower-quality proxy than real multi-chip ICI —
the informative quantity is the RELATIVE iteration time vs T, which the
(P+T-1)/T bubble model predicts.

Usage:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH=. python tools/measure_pipeline.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.ops.sweep import block_gram
from atlasqtl_tpu.parallel import mesh as pmesh
from atlasqtl_tpu.parallel import pipeline as pp


def main():
    n, p, q = 256, 4096, 1024
    p_shards = 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, p))
    x = (x - x.mean(0)) / x.std(0, ddof=1)
    y = rng.normal(size=(n, q))
    y[:, :64] += x[:, :32] @ (rng.normal(0.5, 0.2, (32, 64)))
    y -= y.mean(0)

    q_eff = q
    cfg = Config(dtype=jnp.float64, block_size=128, shr_fac_inv=float(q_eff),
                 q_axis="q", p_axis="p")
    mesh = pmesh.make_mesh(p_shards=p_shards)
    data = gl.build_data(x, y, cfg, q_pad_to=pmesh.q_pad_multiple(mesh),
                         p_shards=p_shards)
    hyper = gl.build_hyper(elic.auto_set_hyper(y, p, (4, 16)),
                           data.y.shape[1], cfg)
    init = elic.auto_set_init(y, p, (4, 16), float(q_eff), 0)
    state0 = gl.build_state(init, data, cfg)
    gram = block_gram(data.x, cfg.block_size)
    data_s = pmesh.shard_data(data, mesh)
    hyper_s = pmesh.shard_hyper(hyper, mesh)
    state0 = pmesh.shard_state(state0, mesh)

    q_local = data.y.shape[1] // mesh.shape["q"]

    # ---- single-tile compute baseline (no mesh, no pipeline): the pure
    # per-step compute b*qt that the per-step decomposition subtracts ----
    from atlasqtl_tpu.ops.sweep import SweepConsts, sweep_complete
    p_local = data.x.shape[1] // p_shards
    x_l = data.x[:, :p_local]
    gram_l = gram[: p_local // cfg.block_size]
    q_pad = data.y.shape[1]
    consts = SweepConsts(
        sig2_beta=jnp.full((q_pad,), 0.01, cfg.dtype),
        tau=jnp.ones((q_pad,), cfg.dtype),
        log_tau=jnp.zeros((q_pad,), cfg.dtype),
        log_sig2_inv=jnp.asarray(0.0, cfg.dtype),
        theta=state0.theta[:p_local], zeta=state0.zeta,
        c=jnp.asarray(1.0, cfg.dtype))
    tile_ms = {}
    for qt in (256, 128, 64, 32):
        if q_local % qt:
            continue
        import functools
        consts_t = SweepConsts(
            sig2_beta=consts.sig2_beta[:qt], tau=consts.tau[:qt],
            log_tau=consts.log_tau[:qt], log_sig2_inv=consts.log_sig2_inv,
            theta=consts.theta, zeta=consts.zeta[:qt], c=consts.c)
        args = (x_l, data.cp_x_y[:p_local, :qt], gram_l,
                state0.gam[:p_local, :qt], state0.mu_beta[:p_local, :qt],
                state0.fitted[:, :qt])
        args = jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a), jax.devices()[0]), args)
        f = jax.jit(functools.partial(sweep_complete, consts=consts_t,
                                      block_size=cfg.block_size))
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = f(*args)
        jax.block_until_ready(out)
        tile_ms[qt] = (time.time() - t0) / 3 * 1e3

    orig_pick = pp.pick_q_tile
    results = []
    for qt in (256, 128, 64, 32):
        if q_local % qt:
            continue
        T = q_local // qt
        pp.pick_q_tile = lambda *a, **k: qt
        try:
            st = state0
            st = gl.cavi_iteration(data_s, hyper_s, st, gram, 1.0, 1.0,
                                   cfg=cfg, annealed=False, mesh=mesh)
            jax.block_until_ready(st.fitted)
            t0 = time.time()
            iters = 3
            for _ in range(iters):
                st = gl.cavi_iteration(data_s, hyper_s, st, gram, 1.0, 1.0,
                                       cfg=cfg, annealed=False, mesh=mesh)
            jax.block_until_ready(st.fitted)
            dt = (time.time() - t0) / iters
            steps = p_shards + T - 1
            per_step = dt * 1e3 / steps
            overhead = per_step - tile_ms[qt]
            model = T / (steps * 1.0)
            results.append((T, qt, dt, model, per_step, overhead))
            print(f"T={T:3d} (qt={qt:4d}): {dt*1e3:8.1f} ms/iter | "
                  f"{steps} steps x {per_step:6.1f} ms = "
                  f"{tile_ms[qt]:6.1f} compute + {overhead:6.1f} "
                  f"step-overhead (comm/dispatch)", flush=True)
        finally:
            pp.pick_q_tile = orig_pick

    if len(results) >= 2:
        # fit per_step = a + b*qt; A = a/b is pick_q_tile's
        # step_overhead_qcols calibration constant
        qts = np.array([r[1] for r in results], float)
        ps = np.array([r[4] for r in results], float)
        b_, a_ = np.polyfit(qts, ps, 1)
        A = a_ / b_
        print(f"\nper-step fit: {a_:.1f} ms + {b_:.3f} ms/qcol  =>  "
              f"step_overhead_qcols A = {A:.1f}")
        model = lambda T: ((p_shards + T - 1)
                           * (b_ * q_local / T + a_))
        Ts = [r[0] for r in results]
        best_measured = min(results, key=lambda r: r[2])[0]
        best_model = min(Ts, key=model)
        print(f"model-optimal T = {best_model}, measured-optimal "
              f"T = {best_measured}")
        print("model vs measured ms/iter:")
        for T, qt, dt, m, p_s, ov in results:
            print(f"  T={T:3d}: model {model(T):8.1f}  "
                  f"measured {dt*1e3:8.1f}")


if __name__ == "__main__":
    main()
