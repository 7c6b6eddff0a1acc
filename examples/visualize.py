"""Dataset / solve visualization CLI (reference `examples/data_viz.py` +
the `ENABLE_VISUALIZATION` CORA_vis app, without Pangolin).

Usage:
    python examples/visualize.py data/plaza2.pyfg out.png          # solve + still
    python examples/visualize.py data/plaza2.pyfg out.gif --animate
    python examples/visualize.py data/plaza2.pyfg calib.png --calibration
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cora_tpu import parse_pyfg, solve_cora  # noqa: E402
from cora_tpu.io.viz import (  # noqa: E402
    animate_iterates,
    plot_range_calibration,
    plot_solution,
)
from cora_tpu.solve.staircase import extract_solution  # noqa: E402
from cora_tpu.types import SolverConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("output")
    ap.add_argument("--animate", action="store_true",
                    help="render the solve's TNT iterates as an animation")
    ap.add_argument("--calibration", action="store_true",
                    help="range-measurement calibration plots (no solve)")
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--max-frames", type=int, default=100)
    args = ap.parse_args()

    problem = parse_pyfg(args.dataset)
    if args.calibration:
        plot_range_calibration(problem, args.output)
        print(f"wrote {args.output}")
        return

    cfg = SolverConfig(seed=0, log_iterates=args.animate)
    res = solve_cora(problem, config=cfg, verbose=True)
    if args.animate:
        animate_iterates(
            problem, res.result.iterates, args.output, cfg,
            fps=args.fps, max_frames=args.max_frames,
        )
    else:
        soln = extract_solution(problem, cfg, res)
        plot_solution(
            problem, soln, args.output, show_gt=bool(problem.pose_gt),
            title=f"{os.path.basename(args.dataset)} "
                  f"(cost {res.result.f:.3f}, certified {res.certified})",
        )
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
