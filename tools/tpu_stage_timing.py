"""Real-chip per-stage compute for the 2-D pipeline at the pod per-chip
shard shape (VERDICT r4 next #7).

The pipeline's tile processor is a single-device fused sweep over
(n, p_local, q_tile); its compute IS measurable on the one real chip:
n=5000, p_local=300032/8=37504, q_tile in {256, 512, 1024}.  These
numbers replace the CPU-dispatch-bound constants in DESIGN §6's scaling
table and calibrate Config.pipeline_step_overhead_qcols (together with an
ICI transfer estimate — the (n, qt) f32 tile over one v5e ICI link at
~45 GB/s + ~5 us latency).

Run through the worker: cp tools/tpu_stage_timing.py /tmp/tpu_jobs/
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.ops.sweep import block_gram

PROGRESS = "/tmp/tpu_jobs/stage_timing_progress.txt"
N, P_LOCAL = 5000, 37504  # 300032 / 8 p-shards


def log(msg):
    print(msg, flush=True)
    with open(PROGRESS, "a") as fh:
        fh.write(msg + "\n")


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, P_LOCAL)).astype(np.float32)
    x = (x - x.mean(0)) / x.std(0, ddof=1)
    log(f"== pipeline stage timing n={N} p_local={P_LOCAL} "
        f"{time.strftime('%H:%M:%S')} ==")

    for qt in (256, 512, 1024):
        y = rng.normal(size=(N, qt)).astype(np.float32)
        y -= y.mean(0)
        cfg = Config(dtype=jnp.float32, block_size=128,
                     shr_fac_inv=float(qt))
        data = gl.build_data(x, y, cfg, q_pad_to=qt)
        state = gl.auto_init_device(0, data, (5.0, 25.0), float(qt), cfg)
        hyper = gl.build_hyper(elic.auto_set_hyper(
            np.asarray(y[:, :min(qt, 256)], np.float64), P_LOCAL, (5, 25)),
            data.y.shape[1], cfg)
        gram = jax.jit(block_gram, static_argnums=1)(data.x, cfg.block_size)

        def step(s):
            return gl.cavi_iteration_donated(
                data, hyper, s, gram, 1.0, 1.0, cfg=cfg, annealed=False,
                lite=True)

        t0 = time.time()
        state = step(state)
        _ = float(jnp.sum(state.theta))
        compile_s = time.time() - t0
        reps = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(5):
                state = step(state)
            _ = float(jnp.sum(state.theta))
            reps.append((time.time() - t0) / 5)
        reps.sort()
        ici_ms = (N * qt * 4) / 45e9 * 1e3 + 0.005
        log(f"qt={qt:5d}  stage={reps[1]*1e3:8.2f} ms  "
            f"reps={[round(r*1e3, 2) for r in reps]}  "
            f"ici_est={ici_ms:.2f} ms  compile={compile_s:.0f}s")
        del data, state, hyper, gram
    log(f"== done {time.strftime('%H:%M:%S')} ==")


main()
