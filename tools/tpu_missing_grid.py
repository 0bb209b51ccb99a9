"""Exact-missing kernel: the last unmeasured corner of the design space
(VERDICT r4 next #5).

The r5 conservation analysis (docs/DESIGN.md §5) shows every exact scheme —
including the proposed "unmasked MXU Fm-advance + mask-deficit repair"
family — splits the masked interaction between (a) per-window masked VPU
advances and (b) per-k masked pair-Gram MXU MACs, with per-row cost
~ (sub/2)/R_mxu + 3/sub/R_vpu, minimized at sub* = sqrt(6 R_mxu/R_vpu).
The one lever that MOVES the floor is R_mxu: bf16 pair-Gram inputs double
it, shifting sub* up by sqrt(2) and the floor down by 1/sqrt(2).  r4 only
measured bf16 at sub=8/wgroup=4 (where the pair dot is NOT dominant, and it
lost 5%); this grid measures it at the pair-dot-heavy subs it was built
for, plus sub=32 f32 as the control.

Run through the worker: cp tools/tpu_missing_grid.py /tmp/tpu_jobs/
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic

PROGRESS = "/tmp/tpu_jobs/missing_grid_progress.txt"
N, P, Q = 1000, 50000, 10000

CONFIGS = [
    ("sub16_f32", {"mis_sub": 16, "mis_wgroup": 1}),                # prod
    ("sub16_bf16", {"mis_sub": 16, "mis_wgroup": 1,
                    "mis_pair_bf16": True}),
    ("sub32_bf16", {"mis_sub": 32, "mis_wgroup": 1,
                    "mis_pair_bf16": True}),
    ("sub32_f32", {"mis_sub": 32, "mis_wgroup": 1}),
]


def log(msg):
    print(msg, flush=True)
    with open(PROGRESS, "a") as fh:
        fh.write(msg + "\n")


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, P)).astype(np.float32)
    x = (x - x.mean(0)) / x.std(0, ddof=1)
    y = rng.normal(size=(N, Q)).astype(np.float32)
    y[:, :Q // 5] += x[:, :500] @ (
        rng.normal(1.0, 0.5, (500, Q // 5)).astype(np.float32) * 0.3)
    y -= y.mean(0)
    y = y.astype(np.float64)
    y[rng.random(y.shape) < 0.15] = np.nan

    log(f"== exact-missing grid n={N} p={P} q={Q} mf=0.15 "
        f"{time.strftime('%H:%M:%S')} ==")
    base = dict(dtype=jnp.float32, block_size=128, shr_fac_inv=float(Q),
                missing="exact")
    cfg0 = Config(**base)
    data = gl.build_data(x, y, cfg0, q_pad_to=512)
    del x, y
    hyper = gl.build_hyper(elic.auto_set_hyper(
        np.nan_to_num(np.asarray(data.y[:, :256], np.float64)), P, (5, 25)),
        data.y.shape[1], cfg0)
    gram = jnp.zeros((1, 1, 1), jnp.float32)  # unused on the missing path

    for label, kw in CONFIGS:
        cfg = Config(**base, **kw)
        state = gl.auto_init_device(0, data, (5.0, 25.0), float(Q), cfg)

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
            for _ in range(3):
                state = step(state)
            _ = float(jnp.sum(state.theta))
            reps.append((time.time() - t0) / 3)
        reps.sort()
        unstable = reps[2] > 1.2 * reps[0]
        log(f"{label:12s} {reps[1]*1e3:8.2f} ms/iter  "
            f"reps={[round(r*1e3, 2) for r in reps]}  "
            f"compile={compile_s:.0f}s{'  UNSTABLE' if unstable else ''}")
        del state
    log(f"== done {time.strftime('%H:%M:%S')} ==")


main()
