"""Generate the frozen golden regression fixtures (run once, commit output).

The R reference is not runnable in this image, so these float64 fits on the
testthat-shaped fixture (reference tests/testthat/main.R:1-41) are the
committed stand-in: PARITY.md documents that the per-coordinate NumPy oracle
(tests/oracle.py) establishes update-level parity, and these goldens freeze
the end-to-end outputs so drift across rounds is detectable.

Usage:
    JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python tests/make_goldens.py
"""
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import atlasqtl_tpu as aq  # noqa: E402
from conftest import simulate_fixture  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def save(name, res):
    np.savez_compressed(
        os.path.join(OUT, name),
        gam_vb=np.asarray(res.gam_vb, np.float64),
        beta_vb=np.asarray(res.beta_vb, np.float64),
        theta_vb=np.asarray(res.theta_vb, np.float64),
        zeta_vb=np.asarray(res.zeta_vb, np.float64),
        lb_opt=np.float64(res.lb_opt),
        it=np.int64(res.it),
    )
    print(name, "it", res.it, "lb", res.lb_opt)


def main():
    os.makedirs(OUT, exist_ok=True)

    y, x, _ = simulate_fixture()
    res = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123)
    assert res.converged
    save("golden_complete.npz", res)

    ym, xm, _ = simulate_fixture(missing_frac=0.2, seed=5)
    resm = aq.atlasqtl(ym, xm, p0=(5, 25), dtype=jnp.float64, verbose=0,
                       user_seed=11, maxit=600)
    assert resm.converged
    save("golden_missing.npz", resm)


if __name__ == "__main__":
    main()
