"""A/B: kmeans|| init vs the reference's random-subset init, end to end.

Same hard-regime corpus, same self-kNN labels, same training recipe —
only `kmeans_fit(init=...)` differs.  Reports the K-Means objective and
the part-0 analytic sweep (recall vs nprobe/ndis at every threshold) for
both inits, so the init's effect on the serving trade-off is isolated
from everything else.

Usage: python scripts/kmeanspp_ab.py [n] [n_bkt] [n_q] [n_epoch]
CPU-feasible at the 100k default; TPU for 1M+.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS=cpu even where sitecustomize force-registers the
# remote TPU backend (CPU-feasible at the 100k default)
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import lira_tpu

lira_tpu.enable_compilation_cache()

from lira_tpu.config import Config
from lira_tpu.io.datasets import HARD_REGIME, synthetic_dataset
from lira_tpu.pipelines.smallscale import run_smallscale


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    n_epoch = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    k, dim = 10, 32

    t0 = time.time()
    b = synthetic_dataset(
        n_base=n, n_query=n_q, dim=dim, k_gt=k, compute_gt=True,
        name="kppab", **HARD_REGIME,
    )
    print(f"dataset ready ({time.time() - t0:.0f}s)", flush=True)

    results = {}
    for init in ("random", "kmeans++"):
        cfg = Config(dataset="kppab", data_path="/tmp/kppab", k=k, n_bkt=n_bkt,
                     n_epoch=n_epoch, kmeans_init=init, pth_log=None).update()
        cfg.pth_log = None
        t0 = time.time()
        res = run_smallscale(cfg, bundle=b, serve_sweep=False, use_cache=False)
        obj = res["kmeans"].objective[-1]
        rows = res["sweep_parts"][1] if "sweep_parts" in res else res["sweep_rows_part1"]
        results[init] = (obj, rows)
        print(f"[{init}] objective={obj:.4f} pipeline {time.time() - t0:.0f}s", flush=True)

    print("\n=== part-1 sweep (redundant layout), matched thresholds ===", flush=True)
    print(f"{'thr':>6} | {'recall rnd':>10} {'recall k++':>10} | "
          f"{'nprobe rnd':>10} {'nprobe k++':>10} | {'ndis rnd':>9} {'ndis k++':>9}",
          flush=True)
    r_r, r_p = results["random"][1], results["kmeans++"][1]
    for a, c in zip(r_r, r_p):
        print(f"{a.threshold:6.2f} | {a.recall:10.4f} {c.recall:10.4f} | "
              f"{a.nprobe:10.2f} {c.nprobe:10.2f} | {a.computations:9.0f} {c.computations:9.0f}",
              flush=True)


if __name__ == "__main__":
    main()
