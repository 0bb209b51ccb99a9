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
            model = T / (p_shards + T - 1.0)
            results.append((T, qt, dt, model))
            print(f"T={T:3d} (qt={qt:4d}): {dt*1e3:8.1f} ms/iter   "
                  f"model utilization T/(P+T-1) = {model:.3f}", flush=True)
        finally:
            pp.pick_q_tile = orig_pick

    if len(results) >= 2:
        # normalize: time ~ work/util => time*util should be ~constant
        base = results[0]
        print("\nmodel check (time_T * util_T / (time_base * util_base), "
              "1.0 = perfect bubble model):")
        for T, qt, dt, m in results:
            ratio = (dt * m) / (base[2] * base[3])
            print(f"  T={T:3d}: {ratio:.3f}")


if __name__ == "__main__":
    main()
