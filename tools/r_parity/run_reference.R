# R-reference parity recipe, step 2 (run on any machine with R and the
# hruffieux/atlasqtl package; this repo's image has no R runtime, so this
# script documents the exact invocation — see PARITY.md "R-output parity").
#
#   Rscript tools/r_parity/run_reference.R /tmp/r_parity
#
# Reads the fixture + init written by make_fixture.py and runs the
# reference with the IDENTICAL hyperparameters and initialization (via
# set_hyper / set_init, R/set_hyper_init.R:98,311), so the comparison is
# deterministic up to floating point and local-optimum equivalence.
args <- commandArgs(trailingOnly = TRUE)
dir <- if (length(args) >= 1) args[1] else "/tmp/r_parity"

rd <- function(name) as.matrix(read.csv(file.path(dir, paste0(name, ".csv")),
                                        header = FALSE))
X <- rd("X"); Y <- rd("Y")
n <- nrow(X); p <- ncol(X); q <- ncol(Y)
colnames(X) <- paste0("x", seq_len(p)); colnames(Y) <- paste0("y", seq_len(q))
rownames(X) <- rownames(Y) <- paste0("s", seq_len(n))

hs <- rd("hyper_scalars")
list_hyper <- atlasqtl::set_hyper(q, p, eta = c(rd("hyper_eta")),
                                  kappa = c(rd("hyper_kappa")),
                                  n0 = c(rd("hyper_n0")), nu = hs[1],
                                  rho = hs[2], t02 = hs[3])
is_ <- rd("init_scalars")
list_init <- atlasqtl::set_init(
  q, p,
  gam_vb = rd("init_gam_vb"), mu_beta_vb = rd("init_mu_beta_vb"),
  sig02_inv_vb = is_[1], sig2_beta_vb = c(rd("init_sig2_beta_vb")),
  sig2_theta_vb = c(rd("init_sig2_theta_vb")), tau_vb = c(rd("init_tau_vb")),
  theta_vb = c(rd("init_theta_vb")), zeta_vb = c(rd("init_zeta_vb")))

res <- atlasqtl::atlasqtl(Y, X, anneal = c(1, 2, 10), tol = 0.1,
                          maxit = 1000, list_hyper = list_hyper,
                          list_init = list_init, user_seed = 123)

wr <- function(name, a) write.table(a, file.path(dir, paste0(name, ".csv")),
                                    sep = ",", row.names = FALSE,
                                    col.names = FALSE)
wr("ref_gam_vb", res$gam_vb)
wr("ref_beta_vb", res$beta_vb)
wr("ref_theta_vb", res$theta_vb)
wr("ref_zeta_vb", res$zeta_vb)
wr("ref_scalars", c(res$lb_opt, res$it, as.numeric(res$converged)))
cat("reference outputs written to", dir, "\n")
