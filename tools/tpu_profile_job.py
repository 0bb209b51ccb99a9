"""Hardware-profiler witness for the speed-of-light claim (VERDICT r4
weak #2): capture a real device trace of the production lite iteration at
the eQTL bench shape and dump per-op durations, so bench.py's op-count
model (sol_frac) is reconciled against an independent measurement instead
of the kernel measuring itself.

Run through the persistent worker: cp tools/tpu_profile_job.py /tmp/tpu_jobs/
Trace lands in /tmp/jax_trace_eqtl; parse with tools/parse_trace.py.
"""
import glob
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.ops.sweep import block_gram

N, P, Q = 1000, 50000, 10000
LOGDIR = "/tmp/jax_trace_eqtl"


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, P)).astype(np.float32)
    x = (x - x.mean(0)) / x.std(0, ddof=1)
    y = rng.normal(size=(N, Q)).astype(np.float32)
    y[:, :Q // 5] += x[:, :500] @ (
        rng.normal(1.0, 0.5, (500, Q // 5)).astype(np.float32) * 0.3)
    y -= y.mean(0)

    cfg = Config(dtype=jnp.float32, block_size=128, shr_fac_inv=float(Q))
    data = gl.build_data(x, y, cfg, q_pad_to=512)
    del x, y
    state = gl.auto_init_device(0, data, (5.0, 25.0), float(Q), cfg)
    hyper = gl.build_hyper(elic.auto_set_hyper(
        np.asarray(data.y[:, :256], np.float64), P, (5, 25)),
        data.y.shape[1], cfg)
    gram = jax.jit(block_gram, static_argnums=1)(data.x, cfg.block_size)

    def step(s):
        return gl.cavi_iteration_donated(data, hyper, s, gram, 1.0, 1.0,
                                         cfg=cfg, annealed=False, lite=True)

    state = step(state)          # compile
    _ = float(jnp.sum(state.theta))
    t0 = time.time()
    for _ in range(5):
        state = step(state)
    _ = float(jnp.sum(state.theta))
    base_ms = (time.time() - t0) / 5 * 1e3
    print(f"untraced: {base_ms:.2f} ms/iter", flush=True)

    os.makedirs(LOGDIR, exist_ok=True)
    with jax.profiler.trace(LOGDIR):
        for _ in range(5):
            state = step(state)
        _ = float(jnp.sum(state.theta))
    print("trace files:", flush=True)
    for f in sorted(glob.glob(LOGDIR + "/**/*", recursive=True)):
        if os.path.isfile(f):
            print("  ", f, os.path.getsize(f), flush=True)


main()
