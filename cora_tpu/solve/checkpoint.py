"""Checkpoint / resume for long staircase solves.

The reference has no checkpointing (SURVEY.md §5 — its closest analogs
are `log_iterates` and the eigenvector bootstrap). For production-scale
graphs a solve can run long enough to warrant durable state, so
cora_tpu snapshots the staircase between rank levels:

  * current iterate Y (and its rank),
  * ranks visited so far,
  * the certification eigenvector block (the warm start that makes the
    next LOBPCG cheap),
  * solver configuration fingerprint (to refuse resuming a mismatched
    problem).

Format: a single .npz written atomically (tmp + rename).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import tempfile

import numpy as np


def problem_fingerprint(problem) -> str:
    """Cheap content hash of the factor graph (sizes + measurement sums)."""
    h = hashlib.sha256()
    h.update(
        f"{problem.dim}|{problem.num_poses}|{problem.num_landmarks}|"
        f"{problem.num_range_measurements}|{problem.num_pose_pose_measurements}"
        .encode()
    )
    if problem.range_measurements:
        rs = np.asarray([m.r for m in problem.range_measurements])
        h.update(rs.tobytes())
    if problem.rel_pose_measurements:
        ts = np.asarray([m.t for m in problem.rel_pose_measurements])
        h.update(ts.tobytes())
    return h.hexdigest()[:16]


@dataclasses.dataclass
class StaircaseCheckpoint:
    Y: np.ndarray
    rank: int
    ranks_visited: list
    eigvec_bootstrap: np.ndarray | None
    fingerprint: str
    stage: str = "staircase"  # staircase | refine

    def save(self, path: str) -> None:
        payload = {
            "Y": self.Y,
            "rank": np.asarray(self.rank),
            "ranks_visited": np.asarray(self.ranks_visited, dtype=np.int64),
            "fingerprint": np.frombuffer(
                self.fingerprint.encode(), dtype=np.uint8
            ),
            "stage": np.frombuffer(self.stage.encode(), dtype=np.uint8),
        }
        if self.eigvec_bootstrap is not None:
            payload["eigvec_bootstrap"] = self.eigvec_bootstrap
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(path)) or ".", suffix=".tmp"
        )
        os.close(fd)
        np.savez(tmp, **payload)
        os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)

    @classmethod
    def load(cls, path: str) -> "StaircaseCheckpoint":
        with np.load(path, allow_pickle=False) as z:
            return cls(
                Y=z["Y"],
                rank=int(z["rank"]),
                ranks_visited=[int(r) for r in z["ranks_visited"]],
                eigvec_bootstrap=(
                    z["eigvec_bootstrap"] if "eigvec_bootstrap" in z else None
                ),
                fingerprint=bytes(z["fingerprint"]).decode(),
                stage=bytes(z["stage"]).decode(),
            )


def maybe_resume(problem, path: str | None):
    """Load a checkpoint if it exists and matches the problem."""
    if not path or not os.path.exists(path):
        return None
    ckpt = StaircaseCheckpoint.load(path)
    if ckpt.fingerprint != problem_fingerprint(problem):
        raise ValueError(
            f"checkpoint {path} belongs to a different problem "
            f"({ckpt.fingerprint} != {problem_fingerprint(problem)})"
        )
    return ckpt
