"""plf_tpu — a TPU-native phylogenetic likelihood engine.

A ground-up JAX/Pallas re-design of the capabilities of
GeertRoks/AMD-Versal-phylogenetic-likelihood-function (an AMD Versal
AIE/PL accelerator for the RAxML ``newviewGAMMA`` PLF kernel): fused
single-kernel PLF on the TPU VPU, site-sharded multi-chip scaling via
``shard_map``, substitution models + tree traversal, and the reference's
verification/benchmark methodology as pytest/bench suites.
"""

from .config import PLFConfig, Layout, AieType, Backend, DNA, PROTEIN
from .reference import plf_reference, MIN_LIKELIHOOD, TWO_TO_THE_32
from .engine import PLFEngine, plf

__version__ = "0.1.0"
