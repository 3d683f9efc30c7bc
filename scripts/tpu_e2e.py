"""End-to-end pipeline validation on real TPU hardware.

Runs the full small-scale pipeline (build → train → redundancy → sweeps)
on a synthetic clustered corpus, then measures serving-engine QPS for both
scan implementations.  Writes a summary to scripts/tpu_e2e_report.txt.

Usage: python scripts/tpu_e2e.py [n_base] [n_bkt]
"""

import sys
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()


def _wait_for_device():
    """The axon TPU registration happens at interpreter start and is
    transiently flaky (e.g. while a previous process still holds the chip).
    A failure is permanent for this process — exit code 42 tells the
    launcher to restart us."""
    import jax

    try:
        print(f"device ready: {jax.devices()}", flush=True)
    except RuntimeError as exc:
        print(f"device not ready: {exc}", flush=True)
        raise SystemExit(42)

from lira_tpu.config import Config
from lira_tpu.engine.serve import QueryEngine
from lira_tpu.io.datasets import synthetic_dataset
from lira_tpu.pipelines.smallscale import run_smallscale


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    _wait_for_device()
    t0 = time.time()
    bundle = synthetic_dataset(
        n_base=n_base, n_query=1000, dim=128, n_clusters=n_bkt, k_gt=100, seed=43
    )
    print(f"dataset ready ({time.time() - t0:.1f}s)", flush=True)

    cfg = Config(
        dataset="synthetic", k=10, n_bkt=n_bkt, n_epoch=5, batch_size=256,
        redundancy_ratio=0.03, data_path="/tmp/tpu_e2e_data",
    ).update()
    cfg.pth_log = "/tmp/tpu_e2e_logs/"

    t0 = time.time()
    res = run_smallscale(cfg, bundle=bundle, serve_sweep=False, use_cache=False)
    build_time = time.time() - t0
    print(f"pipeline done in {build_time:.1f}s", flush=True)

    lines = [f"n_base={n_base} n_bkt={n_bkt} build+train+sweeps: {build_time:.1f}s"]
    for part, rows in enumerate(res["sweep_parts"]):
        best = max(rows, key=lambda r: r.recall - 1e-9 * r.computations)
        at9 = [r for r in rows if r.recall >= 0.9]
        cheapest9 = min(at9, key=lambda r: r.computations) if at9 else None
        lines.append(
            f"part {part}: max recall {best.recall:.4f} (nprobe {best.nprobe:.1f}); "
            + (
                f"recall≥0.9 at ndis {cheapest9.computations:.0f}, nprobe {cheapest9.nprobe:.2f}"
                if cheapest9
                else "recall 0.9 not reached"
            )
        )

    for line in lines:
        print("##", line, flush=True)

    # serving QPS: scan impls × dtypes
    for impl, dtype in (("xla", "float32"), ("xla", "bfloat16"), ("pallas", "float32")):
        try:
            eng = QueryEngine(
                bundle.base, res["layout"], res["kmeans"].centroids, res["scaler"],
                res["state"].params, n_mul=cfg.n_mul, scan_impl=impl, scan_dtype=dtype,
            )
            eng.search(bundle.query[:256], 0.3, 10)  # warmup/compile
            for thr in (0.1, 0.3, 0.5):
                r = eng.search(bundle.query, thr, 10)
                recall = eng.recall_against(r.ids, bundle.groundtruth, 10).mean()
                line = (
                    f"serve[{impl}/{dtype}] thr={thr}: QPS {len(bundle.query) / r.elapsed:.0f}, "
                    f"recall@10 {recall:.4f}, ndis {r.ndis.mean():.0f}, nprobe {r.nprobe.mean():.1f}"
                )
                lines.append(line)
                print("##", line, flush=True)
        except Exception as exc:
            lines.append(f"serve[{impl}/{dtype}] FAILED: {exc}")
            print("##", lines[-1], flush=True)

    with open("scripts/tpu_e2e_report.txt", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
