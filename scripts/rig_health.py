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
    # Load settles on its own when a previous measurement just finished
    # (the 1-min average lags the process exit) — wait for it, bounded,
    # instead of refusing a healthy rig.  A genuinely contended rig stays
    # loaded past the bound and is still refused.
    t_wait = time.perf_counter()
    while os.getloadavg()[0] > 1.5 and time.perf_counter() - t_wait < 540:
        print(f"rig_health: load1={os.getloadavg()[0]:.2f}, settling "
              f"({time.perf_counter() - t_wait:.0f}s)", flush=True)
        time.sleep(30)

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    out = {"device": str(dev), "load1": os.getloadavg()[0]}

    x_h = np.ones((16, 1024, 1024), np.float32)  # 64 MB
    # warm BOTH directions on a small array first: the axon tunnel's cold
    # d2h path is pathologically slow per byte (measured 90 s for the
    # first 1 MB fetch of a process, then 35 MB/s warm) — timing the big
    # array cold would hang the preamble for tens of minutes
    w = jax.device_put(x_h[:1], dev)
    w.block_until_ready()
    _ = np.asarray(w)
    del w
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
        # this environment's axon tunnel measures ~0.08 GB/s h2d and
        # ~0.035 GB/s d2h HEALTHY (round-2 numbers, re-measured round 5);
        # the thresholds catch the 10x contention pathologies of round 4,
        # not the tunnel's own (slow) steady state
        if out["h2d_gbps"] < 0.02:
            degraded.append("h2d")
        if out["d2h_gbps"] < 0.008:
            degraded.append("d2h")
        # one timed call pays the tunnel's ~30 ms dispatch round trip on
        # top of the ~1 ms matmul; healthy measures ~25 ms here
        if out["mxu_ms"] > 200.0:
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
