"""Round-4 experiment grid: {explicit, implicit} x {random, odom} over all
7 reference datasets (VERDICT #5; reference `run_utils/run_experiments.bash`).
Emits 'Experiment result' lines to /tmp/cora_tpu_experiments/experiments.txt
for `examples/parse_experiments.py`."""
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import numpy as np

import cora_tpu  # noqa: F401
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
print("devices:", jax.devices(), flush=True)
np.asarray(jnp.zeros((8,)))

from run_experiments import DEFAULT_DATA_DIR, DEFAULT_DATASETS, load_config, run_one

cfg0 = load_config(None)
cfg0.update(dtype="float32", init_rank_jump=0, max_rank=10)

outdir = pathlib.Path(cfg0["output_dir"])
outdir.mkdir(parents=True, exist_ok=True)
results = open(outdir / "experiments.txt", "a")

t_all = time.time()
for form in ("explicit", "implicit"):
    for init in ("random", "odom"):
        for ds in DEFAULT_DATASETS:
            g = dict(cfg0)
            g.update(formulation=form, init_type=init)
            path = str(pathlib.Path(DEFAULT_DATA_DIR) / ds)
            t0 = time.time()
            try:
                run_one(path, g, results)
            except Exception as e:  # noqa: BLE001
                line = (f"Experiment FAILED, name: {pathlib.Path(ds).stem}, "
                        f"form: {form}, init: {init}, "
                        f"error: {type(e).__name__}: {e}")
                print(line, flush=True)
                results.write(line + "\n")
                results.flush()
            print(f"-- [{form}/{init}/{pathlib.Path(ds).stem}] "
                  f"{time.time()-t0:.1f}s (total {time.time()-t_all:.0f}s)",
                  flush=True)
print("GRID DONE", flush=True)
