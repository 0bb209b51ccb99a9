#!/usr/bin/env python
"""R-reference parity recipe, step 1 (run in THIS repo's environment).

Produces a deterministic fixture — data, hyperparameters, initialization —
plus this framework's fitted outputs, all as CSV, so the R reference can be
run on the IDENTICAL problem with the IDENTICAL init (removing RNG
mismatch; see step 2, run_reference.R).  North star: PIPs within 1e-2 of
the reference (BASELINE.md).

Usage:
    python tools/r_parity/make_fixture.py [outdir]   # default /tmp/r_parity

Then, on any machine with R + the atlasqtl package:
    Rscript tools/r_parity/run_reference.R /tmp/r_parity
    python tools/r_parity/compare.py /tmp/r_parity
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "tests"))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r_parity"
P0 = (5.0, 25.0)


def main():
    import jax.numpy as jnp
    import atlasqtl_tpu as aq
    from atlasqtl_tpu.inference import elicitation as elic
    from conftest import simulate_fixture

    os.makedirs(OUT, exist_ok=True)
    y, x, _ = simulate_fixture(n=100, p=75, p_act=10, q=20, seed=123)
    # pre-clean exactly as both packages would (keep the fixture clean so
    # the column bookkeeping cannot differ): drop constant/duplicate cols
    keep = x.std(0) > 0
    x = x[:, keep]
    n, p = x.shape
    q = y.shape[1]

    hyper = elic.auto_set_hyper(y, p, P0)
    init = elic.auto_set_init(y, p, P0, float(q), user_seed=123)

    sv = lambda name, a: np.savetxt(os.path.join(OUT, name + ".csv"),
                                    np.atleast_1d(np.asarray(a, np.float64)),
                                    delimiter=",")
    sv("X", x)
    sv("Y", y)
    for f in ("eta", "kappa", "n0"):
        sv("hyper_" + f, getattr(hyper, f))
    sv("hyper_scalars", [hyper.nu, hyper.rho, hyper.t02])
    for f in ("gam_vb", "mu_beta_vb", "sig2_beta_vb", "sig2_theta_vb",
              "tau_vb", "theta_vb", "zeta_vb"):
        sv("init_" + f, getattr(init, f))
    sv("init_scalars", [init.sig02_inv_vb])

    res = aq.atlasqtl(y, x, p0=P0, dtype=jnp.float64, verbose=0,
                      list_hyper=hyper, list_init=init)
    sv("tpu_gam_vb", res.gam_vb)
    sv("tpu_beta_vb", res.beta_vb)
    sv("tpu_theta_vb", res.theta_vb)
    sv("tpu_zeta_vb", res.zeta_vb)
    sv("tpu_scalars", [res.lb_opt, float(res.it), float(res.converged)])
    print(f"fixture + TPU-framework outputs written to {OUT} "
          f"(converged={res.converged}, it={res.it}, elbo={res.lb_opt:.6f})")


if __name__ == "__main__":
    main()
