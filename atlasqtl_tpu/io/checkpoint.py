"""Checkpoint/resume for the CAVI state.

TPU-native re-design of checkpoint_/checkpoint_clean_up_
(R/utils.R:571-627): periodic .npz snapshots with a rolling last-two window,
plus (beyond the reference, which is save-only) `load_checkpoint` producing an
InitSpec for seamless resume through `atlasqtl(..., list_init=...)`.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


class Checkpointer:
    def __init__(self, path, names_x, names_y, p, q, rate: int = 100):
        self.path = path
        self.names_x = list(names_x)
        self.names_y = list(names_y)
        self.p, self.q = p, q
        self.rate = rate

    def __call__(self, it, state, converged, lb_new, lb_old):
        if it % self.rate != 0:
            return
        p, q = self.p, self.q
        fname = os.path.join(self.path, f"tmp_output_it_{it}.npz")
        np.savez(
            fname,
            beta_vb=np.asarray(state.gam * state.mu_beta)[:p, :q],
            gam_vb=np.asarray(state.gam)[:p, :q],
            mu_beta_vb=np.asarray(state.mu_beta)[:p, :q],
            sig2_beta_vb=np.asarray(state.sig2_beta)[..., :q],
            tau_vb=np.asarray(state.tau)[:q],
            theta_vb=np.asarray(state.theta)[:p],
            zeta_vb=np.asarray(state.zeta)[:q],
            sig2_theta_vb=np.asarray(state.sig2_theta)[:p],
            lam2_inv_vb=np.asarray(state.lam2_inv)[:p],
            sig02_inv_vb=np.asarray(state.sig02_inv),
            converged=np.asarray(converged),
            it=np.asarray(it),
            lb_new=np.asarray(lb_new),
            diff_lb=np.asarray(abs(lb_new - lb_old)),
            names_x=np.asarray(self.names_x),
            names_y=np.asarray(self.names_y),
        )
        # rolling window: keep only the last two snapshots
        old = os.path.join(self.path,
                           f"tmp_output_it_{it - 2 * self.rate}.npz")
        if os.path.exists(old):
            os.remove(old)

    def clean_up(self):
        """Remove all snapshots at the end of a successful run
        (reference: checkpoint_clean_up_, R/utils.R:614-627)."""
        for f in os.listdir(self.path):
            if f.startswith("tmp_output_it_"):
                os.remove(os.path.join(self.path, f))


def load_checkpoint(fname):
    """Load a snapshot into an InitSpec for resume via
    atlasqtl(..., list_init=...)."""
    from ..inference.elicitation import InitSpec

    z = np.load(fname, allow_pickle=False)
    gam = z["gam_vb"]
    p, q = gam.shape
    # exact-missing runs store a (p, q) sig2_beta; keep it intact so the
    # first resumed sweep uses the same per-(j,k) variances it was saved with
    sig2_beta = z["sig2_beta_vb"]
    return InitSpec(
        q=q, p=p, gam_vb=gam, mu_beta_vb=z["mu_beta_vb"],
        sig02_inv_vb=float(z["sig02_inv_vb"]),
        sig2_beta_vb=sig2_beta,
        sig2_theta_vb=z["sig2_theta_vb"], tau_vb=z["tau_vb"],
        theta_vb=z["theta_vb"], zeta_vb=z["zeta_vb"], auto=True,
    )
