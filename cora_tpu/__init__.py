"""cora_tpu — a TPU-native certifiably-correct range-aided SLAM engine.

A ground-up JAX/XLA/Pallas implementation of the CORA algorithm
(certifiably correct range-aided SLAM; see arXiv 2302.11614). Feature
reference: MarineRoboticsGroup/cora (C++/Eigen); this package is a new
TPU-first design, not a port — the sparse data matrix is kept in factored
edge-list form and every inner-loop operation is expressed as batched
dense ops (gather → block-GEMM → segment-sum) that XLA can fuse and tile
onto the MXU, with the entire trust-region solve compiled as a single
device program (`lax.while_loop`), and multi-chip scaling via
`jax.sharding` + `shard_map` with `psum` reductions.

Layout (mirror of the reference's layer map, SURVEY.md §1):
  symbol / measurements / types   — L2 symbols & measurement structs
  io/                             — L6 PyFG parser, MatrixMarket, exporters
  graph/                          — L4 factor-graph container + data assembly
  ops/                            — L3/L4 manifolds, Q-operator, Riemannian ops
  precond/                        — L4b preconditioners
  solve/                          — L1/L5 TNT, certification, staircase
  models/                         — formulations, initializations, synthetic problems
  parallel/                       — green-field distribution layer (mesh/shard_map)
"""

import jax as _jax

# Certification thresholds (eta down to 1e-7, gradient tolerances of 1e-6 on
# objectives of order 1e3) demand double precision on the reference datasets;
# device computations may still opt into float32 via SolverConfig.dtype.
_jax.config.update("jax_enable_x64", True)

# NOTE on matmul precision: the TPU MXU's default input precision is
# bfloat16, which is numerically fatal for this solver in float32 mode
# (κ ~ 1e4 rotation precisions; Newton–Schulz polar iterations diverge).
# Instead of forcing `jax_default_matmul_precision=highest` globally
# (which lowers every dot to a 6-pass decomposition and multiplies
# Mosaic compile times), all tiny contractions (d ≤ 3 blocks, rank ≤ 10)
# are unrolled into full-precision VPU multiply-adds
# (`cora_tpu.ops.linalg.bmm`), and the few genuinely large contractions
# (LOBPCG Rayleigh–Ritz) request HIGHEST precision explicitly.

from cora_tpu.symbol import Symbol, SymbolPair, key  # noqa: E402,F401
from cora_tpu.measurements import (  # noqa: E402,F401
    LandmarkPrior,
    PosePrior,
    RangeMeasurement,
    RelativePoseLandmarkMeasurement,
    RelativePoseMeasurement,
)
from cora_tpu.types import (  # noqa: E402,F401
    CertResults,
    Formulation,
    Initialization,
    Preconditioner,
    SolverConfig,
)
from cora_tpu.graph.problem import Problem  # noqa: E402,F401
from cora_tpu.io.pyfg import parse_pyfg  # noqa: E402,F401
from cora_tpu.solve.staircase import solve_cora  # noqa: E402,F401

__version__ = "0.1.0"
