"""Parallel-CPU reference baseline (round-2 VERDICT item 8).

The head-to-head ratio (logs/head_to_head.json) compares one TPU chip
against the reference engine's serial query loop (reference:
search.cpp:421 — no omp pragma in the per-query loop despite
--num_threads).  A fair server-class comparison needs the aggregate QPS of
N concurrent reference processes.  This host has exactly ONE CPU core
(nproc=1), so N-process scaling cannot be *measured* here; instead this
script measures

  * single-stream QPS (the reference's native execution model), and
  * aggregate QPS of 2 concurrent processes — which on a 1-core host must
    land at ~the single-stream number, demonstrating the measurement is
    core-bound, not engine-bound;

and records per-core QPS with the core count, so the honest server
extrapolation (aggregate ≈ cores × per-core, the engine shares nothing
across queries) is arithmetic the reader can audit, not a claim.

Prereqs: /tmp/refbuild/search_ref (scripts/reference_baseline/
build_reference_search.sh) + /tmp/h2h artifacts (scripts/head_to_head.py).
Usage: python scripts/parallel_cpu_baseline.py [n_procs] [threshold]
Writes logs/parallel_cpu_baseline.json.  CPU-only: safe to run while the
TPU is busy only if nothing else needs the host core — serialize with TPU
benchmarks for clean numbers.
"""

import json
import os
import re
import subprocess
import sys
import time

WORK = "/tmp/h2h"
REF_BIN = "/tmp/refbuild/search_ref"


def _artifact_prefix() -> str:
    """The prefix of whatever index head_to_head.py actually built —
    globbed from the artifacts dir instead of hand-duplicating the
    Config.file_name encoding (a non-default n_bkt would silently desync
    a hardcoded string and the reference binary would die loading)."""
    import glob

    hits = sorted(glob.glob(os.path.join(WORK, "artifacts", "h2h-*_centroids.npy")))
    if not hits:
        raise SystemExit(f"no artifacts under {WORK}/artifacts — run scripts/head_to_head.py first")
    return os.path.basename(hits[-1])[: -len("_centroids.npy")]


PREFIX = None  # resolved lazily by ref_cmd


def ref_cmd(thr: float) -> list[str]:
    global PREFIX
    if PREFIX is None:
        PREFIX = _artifact_prefix()
    return [
        REF_BIN, "--dataset", "h2h", "--data_path", os.path.join(WORK, "data"),
        "--artifacts_dir", os.path.join(WORK, "artifacts"), "--prefix", PREFIX,
        "--k", "10", "--metric", "L2", "--num_threads", "1",
        "--t_min", str(thr), "--t_max", str(thr + 0.01), "--t_step", "1.0",
    ]


def parse_qps(text: str) -> float:
    m = re.findall(r"QPS\s*:\s*([\d.eE+-]+)", text)
    if not m:
        raise RuntimeError(f"no QPS in reference output:\n{text[-2000:]}")
    return float(m[-1])


def main():
    n_procs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45
    n_cores = os.cpu_count()

    for path in (REF_BIN, os.path.join(WORK, "artifacts")):
        if not os.path.exists(path):
            raise SystemExit(f"{path} missing — run head_to_head.py first")

    # single stream (includes one warm-load; the engine re-loads artifacts
    # per process, QPS is computed by the engine over the query loop only)
    t0 = time.time()
    out = subprocess.run(ref_cmd(thr), capture_output=True, text=True, timeout=7200)
    if out.returncode != 0:
        raise SystemExit(out.stdout[-2000:] + out.stderr[-2000:])
    single_qps = parse_qps(out.stdout)
    print(f"single-stream: {single_qps:.0f} QPS ({time.time() - t0:.0f}s)", flush=True)

    # N concurrent processes: aggregate = sum of per-process QPS
    t0 = time.time()
    procs = [
        subprocess.Popen(ref_cmd(thr), stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for _ in range(n_procs)
    ]
    per_proc = []
    for p in procs:
        so, se = p.communicate(timeout=7200)
        if p.returncode != 0:
            raise SystemExit(so[-2000:] + se[-2000:])
        per_proc.append(parse_qps(so))
    agg = sum(per_proc)
    print(
        f"{n_procs} concurrent: per-proc {[f'{q:.0f}' for q in per_proc]}, "
        f"aggregate {agg:.0f} QPS ({time.time() - t0:.0f}s)",
        flush=True,
    )

    out = {
        "host_cores": n_cores,
        "threshold": thr,
        "single_stream_qps": single_qps,
        "n_procs": n_procs,
        "per_proc_qps": per_proc,
        "aggregate_qps": agg,
        "per_core_qps": agg / max(1, min(n_cores, n_procs)),
        "note": (
            "host has a single CPU core; aggregate ~= single-stream confirms "
            "the core-bound measurement. Server extrapolation: aggregate "
            "QPS ~= cores x per_core_qps (processes share no state)."
        ),
    }
    os.makedirs("logs", exist_ok=True)
    with open("logs/parallel_cpu_baseline.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote logs/parallel_cpu_baseline.json", flush=True)


if __name__ == "__main__":
    main()
