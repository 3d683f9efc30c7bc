"""Unified CLI: python -m lira_tpu <command> [args...]

Commands (each forwards to the matching pipeline module):
    smallscale   build + train + evaluate + redundancy + threshold sweeps
    largescale   subset training + full-corpus redundancy
    build        build an index and export serving artifacts
    search       load artifacts and run the serving threshold sweep
    knn          offline self-kNN precompute (exact or IVF-approximate)
    extract-k1   derive a smaller-k cache from an existing one
    distributed  multi-chip pipeline: sharded kNN/K-Means, DP training,
                 sharded serving sweep (--n_shards)
    batch        run an experiment grid over datasets × n_bkt
    parity       run pipeline + sweeps on a real dataset, diff vs a
                 reference-produced threshold-sweep CSV
"""

import sys

COMMANDS = {
    "smallscale": ("lira_tpu.pipelines.smallscale", "main"),
    "largescale": ("lira_tpu.pipelines.largescale", "main"),
    "build": ("lira_tpu.pipelines.build_index", "main"),
    "search": ("lira_tpu.pipelines.search_cli", "main"),
    "knn": ("lira_tpu.pipelines.compute_knn_cli", "main"),
    "extract-k1": ("lira_tpu.pipelines.extract_k1", "main"),
    "distributed": ("lira_tpu.pipelines.distributed", "main"),
    "batch": ("lira_tpu.pipelines.batch", "main"),
    "parity": ("lira_tpu.pipelines.parity", "main"),
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help") or sys.argv[1] not in COMMANDS:
        print(__doc__)
        raise SystemExit(0 if len(sys.argv) >= 2 and sys.argv[1] in ("-h", "--help") else 1)
    mod_name, fn_name = COMMANDS[sys.argv[1]]
    import importlib

    mod = importlib.import_module(mod_name)
    getattr(mod, fn_name)(sys.argv[2:])


if __name__ == "__main__":
    main()
