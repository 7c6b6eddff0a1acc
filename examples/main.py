"""Minimal example — parity with the reference `examples/main.cpp:10-35`:
parse → solve from random init (max_rank 10) → align → print cost."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/examples/data/plaza2.pyfg"
    )
    from cora_tpu import parse_pyfg, solve_cora
    from cora_tpu.solve.staircase import extract_solution
    from cora_tpu.types import SolverConfig

    problem = parse_pyfg(path)
    cfg = SolverConfig(verbose=True)
    res = solve_cora(problem, config=cfg, max_rank=10)
    soln = extract_solution(problem, cfg, res)
    print(
        f"\nSolved {path}: cost={res.result.f:.6f} "
        f"sdp_certified={res.certified} "
        f"suboptimality={res.suboptimality:.6f} "
        f"solution shape={soln.shape}"
    )


if __name__ == "__main__":
    main()
