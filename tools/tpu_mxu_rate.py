"""Bare MXU rate measurement at the pod kernel's dot shapes: f32 vs bf16.

Interprets the r5 pod probe table (noadv/nor0 each save ~16-17 ms): if f32
matmul runs at half bf16 rate, the two deep dots alone are ~60 ms of MXU
time and the kernel is MXU-bound; if f32 is near bf16 rate the dots are
~30 ms and something else overlaps.  XLA-level matmuls (not Pallas) — XLA
tiles these near roofline, so this is the chip's achievable rate.

Run through the worker: cp tools/tpu_mxu_rate.py /tmp/tpu_jobs/q0_mxu.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

PROGRESS = "/tmp/tpu_jobs/mxu_rate_progress.txt"


def log(msg):
    print(msg, flush=True)
    with open(PROGRESS, "a") as fh:
        fh.write(msg + "\n")


def bench_dot(m, k, n, dt, reps=30):
    a = jnp.asarray(np.random.default_rng(0).normal(size=(m, k)), dt)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(k, n)), dt)

    # loop INSIDE jit: the first version of this job dispatched one dot per
    # call and measured pure tunnel latency (~1.4 ms/call) — every shape
    # "ran" at the same speed.  The scalar feedback defeats CSE and forces
    # the dots sequential.
    @functools.partial(jax.jit, static_argnames=("r",))
    def f(a, b, *, r):
        def body(_, carry):
            s, acc = carry
            out = jnp.dot(a * (1.0 + s), b,
                          preferred_element_type=jnp.float32)
            return out[0, 0] * 1e-30, acc + out[0, 0]
        return jax.lax.fori_loop(0, r, body,
                                 (jnp.asarray(0.0, jnp.float32),
                                  jnp.asarray(0.0, jnp.float32)))[1]

    _ = float(f(a, b, r=2))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        _ = float(f(a, b, r=reps))
        best = min(best, (time.time() - t0) / reps)
    macs = m * k * n
    log(f"dot ({m:5d},{k:5d})@({k:5d},{n:5d}) {str(dt):>16s}: "
        f"{best*1e3:8.3f} ms  {macs/best/1e12:7.1f} T MACs/s")
    return best


def main():
    log(f"== MXU rate micro-bench {time.strftime('%H:%M:%S')} ==")
    for dt in (jnp.float32, jnp.bfloat16):
        # the pod r0 dot: (B, n) @ (n, QT), repeated per block -> scale up
        # M to amortize dispatch (same aspect): 2048 rows = 16 blocks
        bench_dot(2048, 5000, 1024, dt)
        # the pod F-advance dot: (n, B) @ (B, QT) -> K=128 shallow
        bench_dot(5000, 128, 1024, dt)
        # square control
        bench_dot(4096, 4096, 4096, dt)
    log(f"== done {time.strftime('%H:%M:%S')} ==")


main()
