"""Benchmark harness — prints the headline JSON line for the driver.

Headline metric (BASELINE.md): plaza2 time-to-certified-solution from
random initialization, against the reference's published wall-clock of
3.57132 s (cost 734.328; `run_utils/parse_data.py:40`, author's CPU).

Method: one warmup solve populates jit caches (compile time is a
per-shape, per-process one-off; the persistent compilation cache under
`.jax_cache/` carries it across runs), then the solve is re-run and the
time to the SDP certificate is reported.

Output protocol (round 5 — the headline can never be lost again):
the headline JSON line is printed and flushed IMMEDIATELY after the
timed plaza2 solve.  Extras (hv microbench, single_drone, scale,
multichip-subprocess) run afterwards, each under a hard wall-clock
budget; when they finish, the SAME headline object enriched with their
numbers is printed as a second line (the driver may parse either the
first or the last JSON line — both carry the identical metric/value)
and written to `BENCH_EXTRAS.json`.

Gates (fail => value=inf, and `extra.gates` records each verdict):
certified, final cost within 1% of the reference, ATE <= 0.30 m
(reference parity), <= 5 staircase levels.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

PLAZA2 = os.environ.get(
    "CORA_BENCH_DATASET", "/root/reference/examples/data/plaza2.pyfg"
)
SINGLE_DRONE = "/root/reference/examples/data/single_drone.pyfg"
BASELINE_S = 3.57132
REFERENCE_COST = 734.328


def _solve_config(np):
    from cora_tpu.types import Formulation, Preconditioner, SolverConfig

    dtype_name = os.environ.get("CORA_BENCH_DTYPE", "float32")
    return SolverConfig(
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
        formulation=Formulation.EXPLICIT,
        dtype=np.dtype(dtype_name).type,
        # defaults = the measured-fastest robust config (round 5,
        # scripts/r5_grid2_results.json): fused-kernel backend, staircase
        # started at rank 4 (init_rank_jump=2) — ranks [4,5,6], certified
        # 1.5-2.6 s warm across seeds 0-4 on the real chip, vs 4.5 s for
        # the XLA path from rank 2 (and 3.57 s for the reference)
        max_staircase_iterations=int(
            os.environ.get("CORA_BENCH_RAMP_CAP", "60")),
        ramp_tcg_iterations=int(os.environ.get("CORA_BENCH_TCG", "24")),
        seed=int(os.environ.get("CORA_BENCH_SEED", "4")),
        init_rank_jump=int(os.environ.get("CORA_BENCH_RANK_JUMP", "2")),
        use_pallas=os.environ.get("CORA_BENCH_PALLAS", "auto"),
    ), dtype_name


def hv_microbench(problem=None, quiet=False):
    """Hessian-vector product throughput (BASELINE kernel metric):
    GFLOP/s/chip of the factored Q·Y + manifold-correction pipeline on a
    plaza2-sized graph. Run standalone with CORA_BENCH_MODE=hv."""
    import jax
    import numpy as np

    from cora_tpu import parse_pyfg
    from cora_tpu.ops.quadratic import data_matrix_product
    from cora_tpu.ops.riemannian import random_initial_guess, riemannian_hvp

    dtype_name = os.environ.get("CORA_BENCH_DTYPE", "float32")
    if problem is None:
        problem = parse_pyfg(PLAZA2)
    pd = problem.device_data(dtype=np.dtype(dtype_name).type)
    rank = 4
    Y = random_initial_guess(pd, rank, jax.random.PRNGKey(0))
    nablaF = data_matrix_product(pd, Y)

    hvp = jax.jit(lambda Y, nablaF, V: riemannian_hvp(pd, Y, nablaF, V))
    hvp(Y, nablaF, Y).block_until_ready()
    n_iter = 200
    t0 = time.time()
    out = Y
    for _ in range(n_iter):
        out = hvp(Y, nablaF, out)
    out.block_until_ready()
    dt = (time.time() - t0) / n_iter

    # FLOPs: Q product (2*nnz*r via edge kernels) + Weingarten/tangent terms
    nnz = 2 * (
        pd.num_rot_edges * (2 * pd.d * pd.d + 2 * pd.d)
        + pd.num_pose_meas * (pd.d + 4)
        + pd.m * 6
    )
    flops_q = nnz * rank
    flops_manifold = pd.n * (4 * pd.d * pd.d * rank) + pd.m * 4 * rank
    gflops = (flops_q + flops_manifold) / dt / 1e9
    res = {
        "metric": "hv_product_gflops_per_chip",
        "value": round(gflops, 3),
        "unit": "GFLOP/s",
        "vs_baseline": None,
        "extra": {"latency_us": round(dt * 1e6, 1), "dtype": dtype_name,
                  "device": str(jax.devices()[0])},
    }
    if not quiet:
        print(json.dumps(res))
    return res


def scale_bench(quiet=False):
    """BASELINE config 4: large synthetic graph on one chip — Hv latency.
    Run standalone with CORA_BENCH_MODE=scale (CORA_BENCH_POSES to size)."""
    import jax
    import numpy as np

    from cora_tpu.models.synthetic import synthetic_problem
    from cora_tpu.ops.quadratic import data_matrix_product
    from cora_tpu.ops.riemannian import random_initial_guess, riemannian_hvp

    n_poses = int(os.environ.get("CORA_BENCH_POSES", "100000"))
    dtype_name = os.environ.get("CORA_BENCH_DTYPE", "float32")
    problem = synthetic_problem(
        n_poses=n_poses, n_landmarks=10, n_ranges=n_poses // 2, seed=0
    )
    pd = problem.device_data(dtype=np.dtype(dtype_name).type)
    rank = 4
    Y = random_initial_guess(pd, rank, jax.random.PRNGKey(0))
    nablaF = data_matrix_product(pd, Y)

    hvp = jax.jit(lambda Y, nablaF, V: riemannian_hvp(pd, Y, nablaF, V))
    hvp(Y, nablaF, Y).block_until_ready()
    n_iter = 100
    t0 = time.time()
    out = Y
    for _ in range(n_iter):
        out = hvp(Y, nablaF, out)
    out.block_until_ready()
    dt = (time.time() - t0) / n_iter
    res = {
        "metric": f"hv_latency_{n_poses}_poses",
        "value": round(dt * 1e3, 3),
        "unit": "ms",
        "vs_baseline": None,
        "extra": {"n_poses": n_poses, "N": pd.size, "dtype": dtype_name,
                  "device": str(jax.devices()[0])},
    }
    if not quiet:
        print(json.dumps(res))
    return res


def multichip_bench(quiet=False):
    """Sharded-vs-single Hv throughput (block-row operator,
    `cora_tpu.parallel.sharding.make_blockrow_operator`) over local
    devices. Run with CORA_BENCH_MODE=multichip (e.g. on the
    8-virtual-device CPU mesh).

    Reports the full-mesh efficiency AND a 2-device submesh: on a
    2-physical-core host the 8-virtual-device number is bounded by 2/8 =
    0.25 even for perfect sharding (8 device threads share 2 cores, and
    the in-process collective rendezvous adds a multi-ms floor), so the
    2-device figure — one device per core — is the honest CPU-mesh
    scaling signal. On real TPU ICI the collective cost is
    ~N·r·4B / 45 GB/s (all_gather) + σ·r·4B (separator psum), both ≪ the
    per-device compute at these sizes."""
    import jax
    import numpy as np

    from cora_tpu.models.synthetic import synthetic_problem
    from cora_tpu.ops.quadratic import data_matrix_product
    from cora_tpu.ops.riemannian import random_initial_guess
    from cora_tpu.parallel.sharding import make_blockrow_operator, make_mesh

    n_poses = int(os.environ.get("CORA_BENCH_POSES", "100000"))
    dtype_name = os.environ.get("CORA_BENCH_DTYPE", "float32")
    problem = synthetic_problem(
        n_poses=n_poses, n_landmarks=10, n_ranges=n_poses // 2, seed=0
    )
    pd = problem.device_data(dtype=np.dtype(dtype_name).type)
    Y = random_initial_guess(pd, 4, jax.random.PRNGKey(0))

    def timeit(op, Y, n=20):
        # block every iteration: queueing many collective programs on the
        # virtual CPU mesh starves the in-process rendezvous (8 device
        # threads on few cores) and aborts the process
        op(Y).block_until_ready()
        t0 = time.time()
        for _ in range(n):
            op(Y).block_until_ready()
        return (time.time() - t0) / n

    t_single = timeit(jax.jit(lambda V: data_matrix_product(pd, V)), Y)
    ndev = len(jax.devices())
    extra = {"t_single_ms": round(t_single * 1e3, 3),
             "n_devices": ndev, "n_poses": n_poses, "dtype": dtype_name}
    eff = float("nan")
    if ndev > 1:
        mesh = make_mesh()
        t_sharded = timeit(jax.jit(make_blockrow_operator(pd, mesh)), Y)
        eff = t_single / (t_sharded * ndev)
        extra["t_sharded_ms"] = round(t_sharded * 1e3, 3)
        mesh2 = make_mesh(devices=jax.devices()[:2])
        t_2dev = timeit(jax.jit(make_blockrow_operator(pd, mesh2)), Y)
        extra["t_2dev_ms"] = round(t_2dev * 1e3, 3)
        extra["eff_2dev"] = round(t_single / (t_2dev * 2), 3)
    res = {
        "metric": f"sharded_hv_scaling_{ndev}_devices",
        "value": round(eff, 3) if eff == eff else None,
        "unit": "efficiency",
        "vs_baseline": None,
        "extra": extra,
    }
    if not quiet:
        print(json.dumps(res))
    return res


def _solve_dataset(path, cfg, warmup=True):
    import numpy as np

    from cora_tpu import parse_pyfg, solve_cora
    from cora_tpu.solve.staircase import extract_solution
    from cora_tpu.utils.evaluation import evaluate_ate

    problem = parse_pyfg(path)
    if warmup:
        solve_cora(problem, config=cfg)  # warmup: compiles every rank level
    trace_dir = os.environ.get("CORA_BENCH_TRACE")
    t0 = time.time()
    if trace_dir:
        # xprof capture of the timed solve (phases annotated via
        # PhaseTimer -> named_scope); view with tensorboard/xprof
        from cora_tpu.utils.timing import profiler_trace

        with profiler_trace(trace_dir):
            res = solve_cora(problem, config=cfg)
    else:
        res = solve_cora(problem, config=cfg)
    wall = time.time() - t0
    t_cert = (
        res.elapsed_to_certificate
        if np.isfinite(res.elapsed_to_certificate)
        else wall
    )
    soln = extract_solution(problem, cfg, res)
    ate = float(evaluate_ate(problem, soln))
    return problem, res, t_cert, wall, ate


def _multichip_subprocess(timeout=180):
    """Sharded-Hv efficiency on an 8-virtual-device CPU mesh, isolated in
    a subprocess (this process owns the TPU)."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8"),
        CORA_BENCH_MODE="multichip",
        CORA_BENCH_POSES=os.environ.get("CORA_BENCH_POSES_MC", "20000"),
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception:  # noqa: BLE001
        pass
    return None


def main():
    mode = os.environ.get("CORA_BENCH_MODE")
    if mode == "hv":
        hv_microbench()
        return
    if mode == "scale":
        scale_bench()
        return
    if mode == "multichip":
        # the container's sitecustomize pre-imports jax on the TPU
        # platform, so JAX_PLATFORMS=cpu in the env is too late — flip
        # the config before first backend use (two clients on the one
        # tunneled chip contend and both crawl)
        import jax

        jax.config.update("jax_platforms", "cpu")
        multichip_bench()
        return
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    import numpy as np

    cfg, dtype_name = _solve_config(np)

    # ---- headline: plaza2 time-to-certificate from random init ----
    problem, res, t_cert, wall, ate = _solve_dataset(PLAZA2, cfg)

    gates = {
        "certified": bool(res.certified),
        "cost_within_1pct": bool(
            abs(res.result.f - REFERENCE_COST) / REFERENCE_COST < 0.01),
        "ate_le_0.30": bool(ate <= 0.30),  # reference parity (measured 0.271)
        "levels_le_5": bool(len(res.ranks_visited) <= 5),
    }
    ok = all(gates.values())

    extra = {
        "gates": gates,
        "final_cost": round(float(res.result.f), 4),
        "reference_cost": REFERENCE_COST,
        "sdp_cost": round(float(res.sdp_cost), 4),
        "suboptimality_bound": round(float(res.suboptimality), 4),
        "ate_vs_gt_m": round(ate, 4),
        "ranks": res.ranks_visited,
        "wall_total_s": round(wall, 4),
        "phases_s": {k: round(v, 3) for k, v in (res.phases or {}).items()},
        "device": str(jax.devices()[0]),
        "dtype": dtype_name,
        "use_pallas": cfg.use_pallas,
    }

    result = {
        "metric": "plaza2_time_to_certified_random_init",
        "value": round(t_cert, 4) if ok else float("inf"),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / t_cert, 3) if ok else 0.0,
        "extra": extra,
    }
    # the headline is emitted the moment it exists — a hung or
    # over-budget extra can no longer lose the round's number
    print(json.dumps(result), flush=True)

    # ---- full BASELINE kernel-metric set (each stage hard-budgeted) ----
    if os.environ.get("CORA_BENCH_SKIP_EXTRAS") != "1":
        budget_s = float(os.environ.get("CORA_BENCH_EXTRAS_BUDGET", "420"))
        t_extras = time.time()

        def in_budget():
            return time.time() - t_extras < budget_s

        try:
            hv = hv_microbench(problem=problem, quiet=True)
            extra["hv_gflops_per_chip"] = hv["value"]
            extra["hv_latency_us"] = hv["extra"]["latency_us"]
        except Exception as e:  # noqa: BLE001
            extra["hv_gflops_per_chip"] = f"error: {e}"
        if in_budget():
            try:
                _, res_sd, t_sd, _, ate_sd = _solve_dataset(SINGLE_DRONE, cfg)
                sd_gates = {
                    "certified": bool(res_sd.certified),
                    # measured 0.58 m on this 3D dataset (r5 rehearsal);
                    # the gate catches regressions, not an absolute target
                    "ate_le_1.0": bool(ate_sd <= 1.0),
                }
                extra["single_drone_t_cert_s"] = (
                    round(t_sd, 3) if all(sd_gates.values()) else float("inf"))
                extra["single_drone_gates"] = sd_gates
                extra["single_drone_cost"] = round(float(res_sd.result.f), 4)
                extra["single_drone_ate_m"] = round(ate_sd, 4)
            except Exception as e:  # noqa: BLE001
                extra["single_drone_t_cert_s"] = f"error: {e}"
        if in_budget():
            try:
                os.environ.setdefault("CORA_BENCH_POSES", "100000")
                sc = scale_bench(quiet=True)
                extra["hv_latency_100k_ms"] = sc["value"]
            except Exception as e:  # noqa: BLE001
                extra["hv_latency_100k_ms"] = f"error: {e}"
        if in_budget():
            mc = _multichip_subprocess(
                timeout=max(min(budget_s - (time.time() - t_extras), 180), 30))
            if mc is not None:
                extra["sharded_hv_eff_8dev_cpu"] = mc.get("value")
                extra["sharded_hv_detail"] = mc.get("extra")
        extra["extras_wall_s"] = round(time.time() - t_extras, 1)
        with open(os.path.join(REPO, "BENCH_EXTRAS.json"), "w") as fh:
            json.dump(result, fh, indent=1)
        # re-print the identical headline enriched with the extras: the
        # driver may parse the first or the last JSON line — both agree
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
