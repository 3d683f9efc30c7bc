"""AOT-lower the Pallas screen kernels for the TPU platform (no chip needed).

`jax.export(platforms=["tpu"])` runs the Pallas→Mosaic staging path, so a
kernel change that Mosaic would reject (dtype, tiling, memory space) fails
HERE instead of at first contact with real hardware.  (The final
Mosaic→machine-code compile still happens on-device; this pins the
lowering contract, which is where shape/dtype rejections live.)
"""

from functools import partial

import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lira_tpu.engine.block_scan import S_TILES, _union_groupmin_kernel


def _export_screen(quantized: bool, sel_rows: int = 128):
    qb, d, U = 1024, 128, 4
    SG = S_TILES * (128 // sel_rows)
    dt = jnp.int8 if quantized else jnp.bfloat16

    def prog(*operands):
        in_specs = [
            pl.BlockSpec((qb, d), lambda i, u, s, ul: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILES * 128, d), lambda i, u, s, ul: (s[i, u], 0),
                         memory_space=pltpu.VMEM),
        ]
        if quantized:
            in_specs.append(
                pl.BlockSpec((1, 1), lambda i, u, s, ul: (0, 0),
                             memory_space=pltpu.SMEM)
            )
            in_specs.append(
                pl.BlockSpec((d, 1), lambda i, u, s, ul: (0, 0),
                             memory_space=pltpu.VMEM)
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(1, U), in_specs=in_specs,
            out_specs=pl.BlockSpec((1, SG, qb), lambda i, u, s, ul: (i, u, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            partial(_union_groupmin_kernel, metric="L2", precision="default",
                    sel_rows=sel_rows, quantized=quantized),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, U * SG, qb), jnp.float32),
        )(*operands)

    args = [
        jax.ShapeDtypeStruct((1, U), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),  # true union length per block
        jax.ShapeDtypeStruct((qb, d), dt),
        jax.ShapeDtypeStruct((U * S_TILES * 128, d), dt),
    ]
    if quantized:
        args.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        args.append(jax.ShapeDtypeStruct((d, 1), jnp.float32))
    return jax.export.export(jax.jit(prog), platforms=["tpu"])(*args)


@pytest.mark.parametrize("quantized,sel_rows", [
    (False, 128), (False, 32), (True, 128), (True, 32),
])
def test_screen_kernel_lowers_for_tpu(quantized, sel_rows):
    exp = _export_screen(quantized, sel_rows)
    assert len(exp.mlir_module_serialized) > 0

def test_round1_kernel_lowers_for_tpu_gist_dim():
    """ops.knn_pallas round-1 sweep at GIST dimensionality with the
    d-aware (q_block, c_block) — pins the lowering contract of the shape
    that failed scoped-VMEM compile with the old fixed blocks."""
    from lira_tpu.ops.knn_pallas import _r1_blocks, _round1_select

    d = 960
    q_block, c_block = _r1_blocks(d)
    n_pad = 4 * c_block

    def prog(q, base, bsq):
        return _round1_select(q, base, bsq, "L2", 18,
                              q_block=q_block, c_block=c_block)

    args = [
        jax.ShapeDtypeStruct((q_block, d), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
    ]
    exp = jax.export.export(jax.jit(prog), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0
