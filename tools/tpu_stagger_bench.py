"""Measure the staggered dual-half sweep vs production at both headline
shapes (eqtl n=1k/p=50k/q=10k; pod n=5k/p=300k/q=1024), donated harness,
median-of-3.  Also parity-checks the first staggered iteration against the
baseline kernel ON CHIP (Mosaic vs Mosaic, not interpret).

Run through the worker: cp tools/tpu_stagger_bench.py /tmp/tpu_jobs/q5_stagger.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.ops.sweep import block_gram

PROGRESS = "/tmp/tpu_jobs/stagger_progress.txt"


def log(msg):
    print(msg, flush=True)
    with open(PROGRESS, "a") as fh:
        fh.write(msg + "\n")


def run_shape(tag, N, P, Q, sub_override=None):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, P)).astype(np.float32)
    x = (x - x.mean(0)) / x.std(0, ddof=1)
    y = rng.normal(size=(N, Q)).astype(np.float32)
    y[:, :Q // 5] += x[:, :min(P // 10, 3000)] @ (
        rng.normal(1.0, 0.5, (min(P // 10, 3000), Q // 5)).astype(np.float32)
        * 0.3)
    y -= y.mean(0)
    base = dict(dtype=jnp.float32, block_size=128, shr_fac_inv=float(Q))
    if sub_override:
        base["sweep_sub"] = sub_override
    cfg0 = Config(**base)
    data = gl.build_data(x, y, cfg0, q_pad_to=512)
    del x, y
    hyper = gl.build_hyper(elic.auto_set_hyper(
        np.asarray(data.y[:, :256], np.float64), P, (5, 25)),
        data.y.shape[1], cfg0)
    gram = jax.jit(block_gram, static_argnums=1)(data.x, cfg0.block_size)

    results = {}
    for label, kw in (("baseline", {}), ("stagger", {"sweep_stagger": True})):
        cfg = Config(**base, **kw)
        state = gl.auto_init_device(0, data, (5.0, 25.0), float(Q), cfg)

        def step(s, c=cfg):
            return gl.cavi_iteration_donated(
                data, hyper, s, gram, 1.0, 1.0, cfg=c, annealed=False,
                lite=True)

        t0 = time.time()
        state = step(state)
        theta1 = np.asarray(state.theta)
        compile_s = time.time() - t0
        results[label] = theta1
        reps = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(5):
                state = step(state)
            _ = float(jnp.sum(state.theta))
            reps.append((time.time() - t0) / 5)
        reps.sort()
        unstable = reps[2] > 1.2 * reps[0]
        log(f"{tag} {label:9s} {reps[1]*1e3:8.2f} ms/iter  "
            f"reps={[round(r*1e3, 2) for r in reps]}  "
            f"compile={compile_s:.0f}s{'  UNSTABLE' if unstable else ''}")
        del state
    d = np.max(np.abs(results["baseline"] - results["stagger"]))
    rel = d / max(1e-12, np.max(np.abs(results["baseline"])))
    log(f"{tag} parity: max |dtheta| after 1 iter = {d:.3e} "
        f"(rel {rel:.1e}) {'OK' if rel < 1e-4 else 'MISMATCH'}")


def main():
    log(f"== stagger bench {time.strftime('%H:%M:%S')} ==")
    run_shape("pod ", 5000, 300000, 1024)
    run_shape("eqtl", 1000, 50000, 10000)
    log(f"== done {time.strftime('%H:%M:%S')} ==")


main()
