from cora_tpu.io.pyfg import parse_pyfg  # noqa: F401
from cora_tpu.io.matrix_market import read_matrix_market, write_matrix_market  # noqa: F401

# visualization (cora_tpu.io.viz) is imported lazily — it pulls in
# matplotlib, which solve-path users should not pay for
