#!/usr/bin/env python
"""R-reference parity recipe, step 3: compare outputs (north star:
PIPs within 1e-2, BASELINE.md).

    python tools/r_parity/compare.py [dir]          # default /tmp/r_parity
"""
import os
import sys

import numpy as np

DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r_parity"
ld = lambda name: np.loadtxt(os.path.join(DIR, name + ".csv"), delimiter=",")

ok = True
for name, tol in (("gam_vb", 1e-2), ("beta_vb", 1e-2), ("theta_vb", 5e-2),
                  ("zeta_vb", 5e-2)):
    t = np.atleast_1d(ld("tpu_" + name))
    r = np.atleast_1d(ld("ref_" + name))
    d = np.abs(t - r).max()
    stat = "OK " if d <= tol else "FAIL"
    ok &= d <= tol
    print(f"{stat} {name:10s} max|diff| = {d:.3e}  (tol {tol:g})")
ts, rs = ld("tpu_scalars"), ld("ref_scalars")
print(f"     elbo: tpu {ts[0]:.6f}  ref {rs[0]:.6f}  "
      f"it: {int(ts[1])} vs {int(rs[1])}  "
      f"converged: {bool(ts[2])} vs {bool(rs[2])}")
sys.exit(0 if ok else 1)
