"""eQTL-shape (n=1k, p=50k, q=10k) round-5 campaign: own the last 1.4x or
pin the floor (VERDICT r4 next #4).

- chain_only probe: the serial chain in isolation — the first direct
  measurement of the ~9.5 ms "chain machinery" attribution.
- interleaved q-chunk chains (qt=5120 has nqc=2 at qc2560; qc1280 gives
  nqc=4): hides per-row serial latency if the chain is latency-bound.
- sub=4 with aligned pushes (r4 halved push FMAs; sub=4 halves them again
  at the cost of more left-looking dots).

Run through the worker: cp tools/tpu_probe_eqtl.py /tmp/tpu_jobs/
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.ops.sweep import block_gram

PROGRESS = "/tmp/tpu_jobs/eqtl_probe_progress.txt"
N, P, Q = 1000, 50000, 10000

CONFIGS = [
    ("production", {}),
    ("chain_only", {"sweep_probe": "chain_only"}),
    ("inter_qc2560", {"sweep_interleave": True, "sweep_qchunk": 2560}),
    ("inter_qc1280", {"sweep_interleave": True, "sweep_qchunk": 1280}),
    ("sub4", {"sweep_sub": 4}),
    ("sub4_inter_qc2560", {"sweep_sub": 4, "sweep_interleave": True,
                           "sweep_qchunk": 2560}),
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

    log(f"== eqtl probe campaign n={N} p={P} q={Q} "
        f"{time.strftime('%H:%M:%S')} ==")
    base = dict(dtype=jnp.float32, block_size=128, shr_fac_inv=float(Q))
    cfg0 = Config(**base)
    data = gl.build_data(x, y, cfg0, q_pad_to=512)
    del x, y
    hyper = gl.build_hyper(elic.auto_set_hyper(
        np.asarray(data.y[:, :256], np.float64), P, (5, 25)),
        data.y.shape[1], cfg0)
    gram = jax.jit(block_gram, static_argnums=1)(data.x, cfg0.block_size)

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
            for _ in range(5):
                state = step(state)
            _ = float(jnp.sum(state.theta))
            reps.append((time.time() - t0) / 5)
        reps.sort()
        unstable = reps[2] > 1.2 * reps[0]
        log(f"{label:20s} {reps[1]*1e3:8.2f} ms/iter  "
            f"reps={[round(r*1e3, 2) for r in reps]}  "
            f"compile={compile_s:.0f}s{'  UNSTABLE' if unstable else ''}")
        del state
    log(f"== done {time.strftime('%H:%M:%S')} ==")


main()
