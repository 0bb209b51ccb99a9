"""Named, unpadded `full_output` assembly.

The reference's `full_output = TRUE` mode ("for internal use only") returns
the complete named list of internal variational quantities
(R/atlasqtl_global_local_core.R:404-410; global-only variant
R/atlasqtl_global_core.R:340-343).  This module rebuilds that exact named
surface from the padded device state: every array is unpadded to the true
(p, q) and converted to float64 NumPy.

The Gamma factors (eta/kappa/nu/rho) are not carried in VBState — every
iteration re-derives them from the current column statistics (the same
fresh re-derivation the ELBO assembler uses, "needed for monotonically
increasing elbo", R/atlasqtl_global_local_core.R:454-464).  Here they are
re-derived once more from the FINAL state at c = 1; at convergence this
differs from the reference's last-loop values by less than the ELBO
tolerance.
"""
from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

from ..types import Config, Data, Hyper, VBState
from ..models.global_local import _colsum_stats
from ..ops import updates as upd

log = logging.getLogger("atlasqtl_tpu")

# p above which the p x p Gram matrix cp_X is not materialized (the engine
# itself never forms it — see docs/DESIGN.md S1; at p = 50k it would be
# 20 GB of float64)
MAX_P_FOR_GRAM = 20_000


def assemble_full_output(data: Data, hyper: Hyper, state: VBState,
                         cfg: Config, model: str = "global_local") -> dict:
    """Reference-named dict of internal quantities (unpadded, float64)."""
    p = int(np.asarray(data.p_true))
    q = int(np.asarray(data.q_true))
    f = lambda a: np.asarray(a, np.float64)

    (gam_colsum, m2b_colsum, m2b, beta2_colsum, yf_colsum, ff_colsum,
     beta) = _colsum_stats(data, state, use_cached=False)

    impute = data.mis_pat is not None and data.x_norm_sq is None
    cp_x_y = data.cp_x_y
    y_norm_sq = data.y_norm_sq
    if impute:
        v_mis = 1.0 / state.tau
        y_eff = data.y + (1.0 - data.mis_pat) * state.fitted
        cp_x_y = jnp.einsum("np,nq->pq", data.x, y_eff,
                            preferred_element_type=cfg.dtype)
        y_norm_sq = (jnp.einsum("nq,nq->q", y_eff, y_eff)
                     + data.n_mis * v_mis)
        yf_colsum = jnp.einsum("nq,nq->q", y_eff, state.fitted)

    sum_gam = jnp.sum(gam_colsum * data.q_mask)
    nu_vb = upd.nu_update(hyper.nu, sum_gam)
    rho_vb = upd.rho_update(hyper.rho, m2b_colsum, state.tau, data.q_mask)
    eta_vb = upd.eta_update(data.n_eff, hyper.eta, gam_colsum)
    if data.x_norm_sq is None:
        kappa_vb = upd.kappa_update(data.n, y_norm_sq, yf_colsum, ff_colsum,
                                    hyper.kappa, m2b_colsum, beta2_colsum,
                                    state.sig2_inv)
    else:
        xns_m2b = jnp.einsum("pq,pq->q", data.x_norm_sq, m2b)
        xns_b2 = jnp.einsum("pq,pq->q", data.x_norm_sq, beta * beta)
        kappa_vb = upd.kappa_update(data.n, y_norm_sq, yf_colsum, ff_colsum,
                                    hyper.kappa, m2b_colsum, beta2_colsum,
                                    state.sig2_inv,
                                    x_norm_sq_m2b=xns_m2b,
                                    x_norm_sq_beta2=xns_b2)

    sig2_zeta_vb = 1.0 / (float(np.asarray(data.p_true))
                          + 1.0 / float(np.asarray(hyper.t02)))

    sig2_beta = f(state.sig2_beta)
    sig2_beta_vb = sig2_beta[:p, :q] if sig2_beta.ndim == 2 else sig2_beta[:q]

    out = {
        "beta_vb": f(state.gam * state.mu_beta)[:p, :q],
        "eta_vb": f(eta_vb)[:q],
        "gam_vb": f(state.gam)[:p, :q],
        "kappa_vb": f(kappa_vb)[:q],
        "nu_s0_vb": float(np.asarray(state.nu_s0_vb)),
        "nu_vb": float(np.asarray(nu_vb)),
        "rho_s0_vb": float(np.asarray(state.rho_s0_vb)),
        "rho_vb": float(np.asarray(rho_vb)),
        "shr_fac_inv": float(cfg.shr_fac_inv),
        "sig02_inv_vb": float(np.asarray(state.sig02_inv)),
        "sig2_beta_vb": sig2_beta_vb,
        "sig2_inv_vb": float(np.asarray(state.sig2_inv)),
        "sig2_theta_vb": f(state.sig2_theta)[:p],
        "sig2_zeta_vb": sig2_zeta_vb,
        "tau_vb": f(state.tau)[:q],
        "theta_vb": f(state.theta)[:p],
        "zeta_vb": f(state.zeta)[:q],
    }
    if model == "global_local":
        # horseshoe block + the Gram-space sufficient statistics
        # (R/atlasqtl_global_local_core.R:404-410)
        out.update({
            "lam2_inv_vb": f(state.lam2_inv)[:p],
            "nu_xi_inv_vb": 1.0,
            "rho_xi_inv_vb": float(np.asarray(state.rho_xi_inv)),
            "xi_inv_vb": 1.0 / float(np.asarray(state.rho_xi_inv)),
            "cp_Y_X": f(cp_x_y).T[:q, :p],
            "cp_X_Xbeta": f(jnp.einsum(
                "np,nq->pq", data.x, state.fitted,
                preferred_element_type=cfg.dtype))[:p, :q],
        })
        if p <= MAX_P_FOR_GRAM:
            out["cp_X"] = f(jnp.einsum(
                "np,nm->pm", data.x, data.x,
                preferred_element_type=cfg.dtype))[:p, :p]
        else:
            out["cp_X"] = None
            log.warning("full_output: cp_X (p x p Gram) not materialized at "
                        "p=%d > %d — the TPU engine never forms it "
                        "(docs/DESIGN.md S1)", p, MAX_P_FOR_GRAM)
    return out
