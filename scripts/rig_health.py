"""Rig-health preamble for TPU measurements (VERDICT r4 item 8).

Every round-4 measurement that turned out wrong (capacity_profile_r4b,
the killed bvecs run, the 390 s windowed self-kNN) traces to chip/host
contention.  This probe runs BEFORE a measurement and prints one JSON
line with the three signals that flagged those runs after the fact:

  * h2d_gbps / d2h_gbps — a 256 MB host<->device copy (r4b's poisoned
    run showed q_upload 27.7 s vs the normal ~2 s),
  * mxu_ms — one warm 4096^2 bf16 matmul (chip contention),
  * load1 — host 1-min loadavg (this rig has ONE vCPU; load > ~1.5
    means another process is stealing the host half of the pipeline).

Exit code 1 if any signal is degraded, so `tpu_run.sh` can refuse to
start a measurement on a sick rig.  Thresholds are deliberately loose —
they catch the 10x pathologies seen in round 4, not 10% noise.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    out = {"device": str(dev), "load1": os.getloadavg()[0]}

    x_h = np.ones((64, 1024, 1024), np.float32)  # 256 MB
    jax.device_put(x_h[:1], dev).block_until_ready()  # warm the path
    t0 = time.perf_counter()
    x_d = jax.device_put(x_h, dev)
    x_d.block_until_ready()
    out["h2d_gbps"] = x_h.nbytes / (time.perf_counter() - t0) / 1e9
    t0 = time.perf_counter()
    _ = np.asarray(x_d)
    out["d2h_gbps"] = x_h.nbytes / (time.perf_counter() - t0) / 1e9
    del x_d, x_h

    a = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    f(a).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    f(a).block_until_ready()
    out["mxu_ms"] = 1e3 * (time.perf_counter() - t0)

    is_tpu = dev.platform != "cpu"
    degraded = []
    if is_tpu:
        if out["h2d_gbps"] < 1.0:
            degraded.append("h2d")
        if out["d2h_gbps"] < 0.5:
            degraded.append("d2h")
        if out["mxu_ms"] > 20.0:
            degraded.append("mxu")
    if out["load1"] > 1.5:
        degraded.append("load")
    out["degraded"] = degraded
    out["ok"] = not degraded
    print("RIG_HEALTH " + json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                                      for k, v in out.items()}), flush=True)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
