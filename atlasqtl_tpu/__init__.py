"""atlasqtl_tpu — TPU-native annealed variational inference for global-local
hotspot QTL mapping.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference R/Rcpp package `hruffieux/atlasqtl` (mounted read-only for parity
study): hierarchical spike-and-slab multi-response regression with a
global-local horseshoe prior on hotspot propensities, fit by annealed batch
coordinate-ascent variational inference.
"""
from .api import atlasqtl
from .inference.elicitation import (set_hyper, set_init, auto_set_hyper,
                                    auto_set_init, map_hyperprior_elicitation,
                                    HyperSpec, InitSpec)
from .inference.summarise import assign_bfdr, AtlasQTLResult
from .inference.permutation import permutation_null_calibration
from .io.checkpoint import load_checkpoint
from .parallel.distributed import initialize as initialize_distributed
from .types import Config

__version__ = "0.1.0"

__all__ = [
    "atlasqtl", "set_hyper", "set_init", "auto_set_hyper", "auto_set_init",
    "map_hyperprior_elicitation", "assign_bfdr", "AtlasQTLResult",
    "permutation_null_calibration",
    "load_checkpoint", "Config", "HyperSpec", "InitSpec",
    "initialize_distributed",
]
