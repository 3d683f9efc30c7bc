"""Systematic bisection of the GIST-dim (1M×960) rig failure (round 4).

Round 3 established: the 960d fused-kNN round-1 Pallas program dispatches,
something after it fails with RESOURCE_EXHAUSTED, and the failure then
poisons every subsequent op (STATUS "GIST-dim fetch failure";
logs/fetch_iso2.log, logs/gist_fix_probe.log).  What round 3 never pinned
down is WHERE the error originates: the fetch path, or the round-1
execution itself surfacing asynchronously at the next sync point.

This probe forces the distinction: block_until_ready() directly on the
round-1 output BEFORE any other op, then walks a ladder of increasingly
demanding fetches, each in its own try/except, plus independent tiny ops
to test whether the client/device is globally poisoned or only the
poisoned buffer's dependents fail.

Usage: python scripts/gist_fetch_probe_r4.py [n] [d] [q_tile]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lira_tpu.ops.knn_pallas import (  # noqa: E402
    _r1_blocks,
    _r2_sub,
    _round1_select,
    _round2_rescan,
)


def step(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"[ok  ] {name} ({time.time() - t0:.2f}s)", flush=True)
        return out
    except Exception as exc:
        msg = str(exc).replace("\n", " | ")[:300]
        print(f"[FAIL] {name}: {type(exc).__name__}: {msg}", flush=True)
        return None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    q_tile = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    precision = sys.argv[4] if len(sys.argv) > 4 else "default"
    k = 11
    kg = 19

    blocks = _r1_blocks(d)
    print(f"n={n} d={d} q_tile={q_tile} precision={precision} blocks={blocks}",
          flush=True)
    q_block, c_block = blocks
    n_pad = ((n + c_block - 1) // c_block) * c_block

    t0 = time.time()
    rng = np.random.default_rng(7)
    base_h = rng.standard_normal((n_pad, d), dtype=np.float32)
    base_h[n:] = 0.0
    print(f"host corpus ready ({time.time() - t0:.1f}s)", flush=True)

    base_p = step("upload base_p", lambda: jax.block_until_ready(jnp.asarray(base_h)))
    del base_h
    penalty = jnp.where(jnp.arange(n_pad) < n, 0.0, 1e30).astype(jnp.float32)
    bsq = (jnp.sum(base_p * base_p, axis=1) + penalty).astype(jnp.float32)
    bsq_g = bsq.reshape(n_pad // 128, 128)
    step("block bsq", lambda: jax.block_until_ready(bsq_g))

    qt = base_p[:q_tile]
    step("sanity tiny op pre-r1",
         lambda: jnp.arange(16.0).sum().block_until_ready())

    gsel = step("dispatch r1", lambda: _round1_select(
        qt, base_p, bsq_g, "L2", kg, precision=precision,
        q_block=q_block, c_block=c_block, interpret=False))
    if gsel is None:
        return

    # THE decisive step: does the round-1 execution itself complete?
    ok = step("r1 block_until_ready", lambda: gsel.block_until_ready())

    # independent op: is the device/client poisoned globally?
    step("independent tiny op post-r1",
         lambda: jnp.arange(16.0).sum().block_until_ready())

    # fetch ladder
    step("fetch 1 row", lambda: np.asarray(gsel[:1]))
    step("fetch row-slices 1024", lambda: np.concatenate(
        [np.asarray(gsel[s:s + 1024]) for s in range(0, q_tile, 1024)]))
    step("device copy then fetch",
         lambda: np.asarray(jax.block_until_ready(jnp.copy(gsel))))
    step("full fetch gsel", lambda: np.asarray(gsel))

    # round 2
    sub = _r2_sub(kg, d, q_tile)
    out = step("dispatch r2", lambda: _round2_rescan(
        qt, gsel, base_p, bsq_g, "L2", k, sub=sub))
    if out is None:
        return
    sc, ids = out
    step("r2 block_until_ready", lambda: jax.block_until_ready(ids))
    step("fetch r2 ids", lambda: np.asarray(ids))
    step("fetch r2 scores", lambda: np.asarray(sc))

    # self-consistency: row 0's nearest neighbor is itself
    ids_h = np.asarray(ids)
    print(f"row0 top1 == 0? {ids_h[0, 0] == 0}", flush=True)
    print("probe complete", flush=True)


if __name__ == "__main__":
    main()
