"""Microbenchmark of the union group-min kernel in isolation.

The phase profile shows the screen sustaining only ~17 TFLOPS f32-highest /
~32 TFLOPS bf16 (~8.5 us per grid step vs ~1.4 us of pure matmul), at 4% of
HBM bandwidth — so the kernel, not physics, is the limiter.  This times
variants on random data at representative shapes (qb x S.128 x 128-d dot +
per-tile min) to find what the step overhead is:

  base      — current kernel: min(-1).T emitted as (1, S, qb)
  notrans   — min(-1) emitted as (1, qb, S) (tests the relayout cost)
  nomin     — emit dot[:, :128] only (tests whether min+emit costs at all)
  s16/s32   — supertile of 16/32 tiles (fewer, fatter steps)
  xla       — jnp einsum+min over the same total work, no pallas (XLA
              baseline: what the compiler gets on its own)

Usage: python scripts/kernel_micro.py [qb] [u_supers] [n_blocks]
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, reps=5, qpos=None):
    """Robust timing against a lazy/memoizing remote backend: the query
    operand is perturbed every rep (no memoized replays) and every rep's
    output is folded into one scalar whose host fetch forces ALL reps to
    execute; block_until_ready alone does not (measured: 4000 'TFLOPS')."""
    args = list(args)
    out = fn(*args)
    float(jnp.sum(out))  # warm + sync
    perturbed = []
    for i in range(reps):
        if qpos is not None:
            delta = (
                jnp.int8(1)
                if jnp.issubdtype(args[qpos].dtype, jnp.integer)
                else jnp.float32(1e-7)
            )
            args[qpos] = (args[qpos] + delta).astype(args[qpos].dtype)
        perturbed.append(list(args))
    float(jnp.sum(perturbed[-1][qpos if qpos is not None else 0]))  # uploads done
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for a in perturbed:
        acc = acc + jnp.sum(fn(*a))
    total = float(acc)  # one 4-byte D2H forcing the whole chain
    elapsed = time.perf_counter() - t0
    assert np.isfinite(total)
    return elapsed / reps


def make_variant(name, qb, U, n_blocks, S, d=128, dtype=jnp.float32, prec=None):
    """Returns (jitted fn, args, flops) for one kernel variant."""
    if prec is None:
        prec = "highest" if dtype == jnp.float32 else "default"
    rng = np.random.default_rng(0)
    n_super = U  # one union's worth of supertiles; every block reads them all
    if dtype == jnp.int8:
        q = jnp.asarray(rng.integers(-127, 128, (n_blocks * qb, d)), jnp.int8)
        corpus = jnp.asarray(
            rng.integers(-127, 128, (n_super * S * 128, d)), jnp.int8
        )
    else:
        q = jnp.asarray(rng.standard_normal((n_blocks * qb, d)), dtype)
        corpus = jnp.asarray(rng.standard_normal((n_super * S * 128, d)), dtype)
    bsq = jnp.asarray(rng.standard_normal((n_super * S, 128)), jnp.float32)
    supers = jnp.asarray(
        np.tile(np.arange(n_super, dtype=np.int32)[None], (n_blocks, 1))
    )
    flops = 2.0 * n_blocks * qb * n_super * S * 128 * d

    if name == "xla":
        @jax.jit
        def fn(q, corpus, bsq):
            def per_block(qs):
                dot = jax.lax.dot_general(
                    qs, corpus, (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                sq = bsq.reshape(1, n_super * S * 128)
                return (sq - 2 * dot).reshape(qb, n_super * S, 128).min(-1)
            return jax.lax.map(per_block, q.reshape(n_blocks, qb, d))
        return fn, (q, corpus, bsq), flops

    if name == "base":
        def kern(sref, q_ref, c_ref, b_ref, o_ref):
            dot = jax.lax.dot_general(
                q_ref[...], c_ref[...], (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            sq = b_ref[...].reshape(1, S * 128)
            o_ref[...] = (sq - 2 * dot).reshape(qb, S, 128).min(-1).T[None]
        out_spec = pl.BlockSpec((1, S, qb), lambda i, u, sref: (i, u, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, U * S, qb), jnp.float32)
    elif name == "notrans":
        def kern(sref, q_ref, c_ref, b_ref, o_ref):
            dot = jax.lax.dot_general(
                q_ref[...], c_ref[...], (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            sq = b_ref[...].reshape(1, S * 128)
            o_ref[...] = (sq - 2 * dot).reshape(qb, S, 128).min(-1)[None]
        out_spec = pl.BlockSpec((1, qb, S), lambda i, u, sref: (i, 0, u),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, qb, U * S), jnp.float32)
    elif name == "tmin":
        # transposed dot: (S*128, d) x (qb, d)^T -> (S*128, qb); the per-tile
        # min then reduces over SUBLANES (cheap, no cross-lane shuffles) and
        # the output is already (S, qb)-oriented - no relayout
        def kern(sref, q_ref, c_ref, b_ref, o_ref):
            # b_ref arrives pre-flattened (S*128, 1): reshaping (S, 128) ->
            # (S*128, 1) in-kernel is a lane->sublane relayout Mosaic rejects
            dot = jax.lax.dot_general(
                c_ref[...], q_ref[...], (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            scores = b_ref[...] - 2 * dot
            mins = [
                scores[i * 128 : (i + 1) * 128, :].min(axis=0, keepdims=True)
                for i in range(S)
            ]
            o_ref[...] = jnp.concatenate(mins, axis=0)[None]
        out_spec = pl.BlockSpec((1, S, qb), lambda i, u, sref: (i, u, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, U * S, qb), jnp.float32)
    elif name == "treemin":
        # tmin but the sublane min is an explicit pairwise-minimum tree:
        # scores (S*128, qb) -> fold halves 7 times -> (S, qb) via strided rows
        def kern(sref, q_ref, c_ref, b_ref, o_ref):
            dot = jax.lax.dot_general(
                c_ref[...], q_ref[...], (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            scores = b_ref[...] - 2 * dot  # (S*128, qb)
            m = scores.reshape(S, 128, qb)
            w = 128
            while w > 1:
                w //= 2
                m = jnp.minimum(m[:, :w, :], m[:, w:2 * w, :])
            o_ref[...] = m[:, 0, :][None]
        out_spec = pl.BlockSpec((1, S, qb), lambda i, u, sref: (i, u, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, U * S, qb), jnp.float32)
    elif name == "qmin":
        # the int8 quantized screen (block_scan._union_groupmin_kernel
        # quantized=True): int8 x int8 -> int32 MXU dot + one scalar dequant
        def kern(sref, q_ref, c_ref, b_ref, t_ref, o_ref):
            doti = jax.lax.dot_general(
                c_ref[...], q_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            scores = b_ref[...] - t_ref[0, 0] * doti.astype(jnp.float32)
            mins = [
                scores[i * 128 : (i + 1) * 128, :].min(axis=0, keepdims=True)
                for i in range(S)
            ]
            o_ref[...] = jnp.concatenate(mins, axis=0)[None]
        out_spec = pl.BlockSpec((1, S, qb), lambda i, u, sref: (i, u, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, U * S, qb), jnp.float32)
    elif name == "qnomin":
        # the bare int8 dot (no min/emit): the int8 MXU speed-of-light probe
        def kern(sref, q_ref, c_ref, b_ref, t_ref, o_ref):
            doti = jax.lax.dot_general(
                c_ref[...], q_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[...] = doti[:128, :].astype(jnp.float32)[None]
        out_spec = pl.BlockSpec((1, 128, qb), lambda i, u, sref: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, 128, qb), jnp.float32)
    elif name == "nomin":
        def kern(sref, q_ref, c_ref, b_ref, o_ref):
            dot = jax.lax.dot_general(
                q_ref[...], c_ref[...], (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            o_ref[...] = dot[:, :128][None]
        out_spec = pl.BlockSpec((1, qb, 128), lambda i, u, sref: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, qb, 128), jnp.float32)
    else:
        raise ValueError(name)

    quant = name in ("qmin", "qnomin")
    in_specs = [
        pl.BlockSpec((qb, d), lambda i, u, sref: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S * 128, d), lambda i, u, sref: (sref[i, u], 0),
                     memory_space=pltpu.VMEM),
        (pl.BlockSpec((S * 128, 1), lambda i, u, sref: (sref[i, u], 0),
                      memory_space=pltpu.VMEM)
         if name in ("tmin", "treemin", "qmin", "qnomin") else
         pl.BlockSpec((S, 128), lambda i, u, sref: (sref[i, u], 0),
                      memory_space=pltpu.VMEM)),
    ]
    if quant:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda i, u, sref: (0, 0),
                         memory_space=pltpu.SMEM)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, U),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    call = pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape)
    bsq_arg = (
        jnp.asarray(np.asarray(bsq).reshape(-1, 1))
        if name in ("tmin", "treemin", "qmin", "qnomin") else bsq
    )
    if quant:
        fn = jax.jit(lambda s, q, c, b, t: call(s, q, c, b, t))
        t_arg = jnp.full((1, 1), 2.0 / 127.0, jnp.float32)
        return fn, (supers, q.reshape(n_blocks * qb, d), corpus, bsq_arg, t_arg), flops
    fn = jax.jit(lambda s, q, c, b: call(s, q, c, b))
    return fn, (supers, q.reshape(n_blocks * qb, d), corpus, bsq_arg), flops


def main():
    qb = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    U = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    cases = [
        (jnp.float32, "f32", [("tmin", 8, qb, None), ("tmin", 8, qb, "high"),
                              ("tmin", 8, qb, "default"), ("nomin", 8, qb, "high"),
                              ("tmin", 8, qb, "high"), ("tmin", 8, qb, None)]),
        (jnp.bfloat16, "bf16", [("tmin", 8, qb, None), ("tmin", 8, qb, "high"),
                                ("tmin", 8, qb, "default"), ("nomin", 8, qb, "high"),
                                ("tmin", 8, qb, "high"), ("tmin", 8, qb, None)]),
        (jnp.int8, "int8", [("qmin", 8, qb, None), ("qnomin", 8, qb, None),
                            ("qmin", 8, qb, None)]),
    ]
    for dtype, dname, case_list in cases:
        for name, S, qb_v, prec in case_list:
            u_eff = U * 8 // S  # same total rows regardless of S
            blocks_v = n_blocks * qb // qb_v  # same total queries
            try:
                fn, args, flops = make_variant(
                    name, qb_v, u_eff, blocks_v, S, dtype=dtype, prec=prec)
                qpos = None if name == "xla" else 1
                t = timed(fn, *args, qpos=0 if name == "xla" else 1)
                steps = blocks_v * u_eff
                print(f"[{dname} {name} S={S} qb={qb_v} prec={prec}] {1e3 * t:.1f}ms "
                      f"{flops / t / 1e12:.1f} TFLOPS "
                      f"{1e6 * t / steps:.2f} us/step", flush=True)
            except Exception as exc:
                print(f"[{dname} {name} S={S} qb={qb_v} prec={prec}] FAILED {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
