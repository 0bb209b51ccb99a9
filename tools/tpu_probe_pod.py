"""Pod-shape (n=5k, p=300k, q=1024) probe campaign for the fused sweep.

Runs the full probe-kernel set (ops/sweep_fused.py `probe=` flags) plus the
chunk-interleaved-chain candidates through the DONATED production harness
(gl.cavi_iteration_donated — raw sweep calls without donation are not a
valid measurement, see docs/DESIGN.md S3).  Median-of-3 windows of 5
iterations each; appends one line per config to PROGRESS so partial results
survive a wedged job.

Run through the persistent worker:  cp tools/tpu_probe_pod.py /tmp/tpu_jobs/
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.ops.sweep import block_gram

PROGRESS = "/tmp/tpu_jobs/pod_probe_progress.txt"
N, P, Q = 5000, 300000, 1024

CONFIGS = [
    # (label, config-kwargs)
    ("production", {}),
    ("inter_qc512", {"sweep_interleave": True, "sweep_qchunk": 512}),
    ("inter_qc256", {"sweep_interleave": True, "sweep_qchunk": 256}),
    ("inter_qc128", {"sweep_interleave": True, "sweep_qchunk": 128}),
    ("probe_dmalite", {"sweep_probe": "dmalite"}),
    ("probe_noseq", {"sweep_probe": "noseq"}),
    ("probe_nosig", {"sweep_probe": "nosig"}),
    ("probe_norank", {"sweep_probe": "norank"}),
    ("probe_exact_noz", {"sweep_probe": "exact_noz"}),
    ("probe_noadv", {"sweep_probe": "noadv"}),
    ("probe_nor0", {"sweep_probe": "nor0"}),
    ("probe_jacobi", {"sweep_probe": "jacobi"}),
    ("probe_jacobi_min", {"sweep_probe": "jacobi_min"}),
    ("probe_nomxu", {"sweep_probe": "nomxu"}),
    ("probe_chain_only", {"sweep_probe": "chain_only"}),
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
    y[:, :Q // 5] += x[:, :3000] @ (
        rng.normal(1.0, 0.5, (3000, Q // 5)).astype(np.float32) * 0.3)
    y -= y.mean(0)

    log(f"== pod probe campaign n={N} p={P} q={Q} "
        f"{time.strftime('%H:%M:%S')} ==")
    base = dict(dtype=jnp.float32, block_size=128, shr_fac_inv=float(Q))
    hyper_spec = elic.auto_set_hyper(
        np.asarray(y[:, :256], np.float64), P, (5, 25))
    # data/hyper/gram are independent of the sweep knobs — build once
    # (the 6 GB x transfer through the tunnel is the dominant setup cost)
    cfg0 = Config(**base)
    data = gl.build_data(x, y, cfg0, q_pad_to=512)
    del x, y
    hyper = gl.build_hyper(hyper_spec, data.y.shape[1], cfg0)
    gram = jax.jit(block_gram, static_argnums=1)(data.x, cfg0.block_size)

    for label, kw in CONFIGS:
        cfg = Config(**base, **kw)
        # fresh deterministic state per config (the previous config's
        # donated chain left a garbage-math state for probe runs)
        state = gl.auto_init_device(0, data, (5.0, 25.0), float(Q), cfg)

        def step(s):
            return gl.cavi_iteration_donated(
                data, hyper, s, gram, 1.0, 1.0, cfg=cfg, annealed=False,
                lite=True)

        t_c0 = time.time()
        state = step(state)          # compile + 1 iter
        _ = float(jnp.sum(state.theta))
        compile_s = time.time() - t_c0
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
