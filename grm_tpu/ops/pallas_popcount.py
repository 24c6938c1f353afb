"""Pallas TPU kernel for the multi-mask masked-popcount column sweep.

A hand-scheduled alternative to the XLA path in :mod:`grm_tpu.ops.popcount`:
one grid step per k-mer column block, the matrix block staged once through
VMEM while ALL mask rows are applied from SMEM — guaranteeing a single HBM
read of the matrix per sweep regardless of the number of masks, with a
fixed-size program independent of K (HLO size does not grow with the matrix,
which also bounds compile time).

The XLA path already reaches ~HBM speed of light for small mask counts
(measured ~0.6 ms for a 342x9.6M-matrix dual-mask sweep on one v5e chip);
this kernel exists for (a) many-mask sweeps (multiclass CART, batched folds)
where fusion across masks is load-bearing, and (b) as the scheduling skeleton
for future fused sweep+argmax kernels. Numerics are identical to the XLA path
(integer popcount sums).

STATUS: validated in interpret mode (exact parity with the XLA path across
shapes) and Mosaic-compiled + verified on a real v5e chip. The XLA path
remains the default for small mask counts; the fused production kernels for
the hot learning sweeps live in :mod:`grm_tpu.ops.pallas_scm_sweep` and
:mod:`grm_tpu.ops.pallas_cart_sweep`.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only namespace; interpret mode works without it.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["popcount_colsum_pallas"]

BLOCK_K = 512


def _kernel(mask_ref, mat_ref, out_ref):
    """mask_ref: (C, W) SMEM; mat_ref: (W, BK) VMEM; out_ref: (C, BK) VMEM."""
    n_masks = out_ref.shape[0]
    n_words = mat_ref.shape[0]

    for c in range(n_masks):  # static, small
        def body(w, acc):
            m = mask_ref[c, w]
            return acc + jax.lax.population_count(
                mat_ref[w, :] & m
            ).astype(jnp.int32)[None, :]

        acc = jax.lax.fori_loop(
            0, n_words, body, jnp.zeros((1, mat_ref.shape[1]), jnp.int32)
        )
        out_ref[c, :] = acc[0, :]


@partial(jax.jit, static_argnames=("interpret",))
def _colsum_pallas(matrix, masks, interpret):
    w, k = matrix.shape
    c = masks.shape[0]
    grid = (k // BLOCK_K,)
    if _HAS_PLTPU and not interpret:
        mask_spec = pl.BlockSpec(
            (c, w), lambda i: (0, 0), memory_space=pltpu.SMEM
        )
        mat_spec = pl.BlockSpec(
            (w, BLOCK_K), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (c, BLOCK_K), lambda i: (0, i), memory_space=pltpu.VMEM
        )
    else:
        mask_spec = pl.BlockSpec((c, w), lambda i: (0, 0))
        mat_spec = pl.BlockSpec((w, BLOCK_K), lambda i: (0, i))
        out_spec = pl.BlockSpec((c, BLOCK_K), lambda i: (0, i))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((c, k), jnp.int32),
        grid=grid,
        in_specs=[mask_spec, mat_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(masks, matrix)


def popcount_colsum_pallas(matrix, masks, interpret=None):
    """counts[c, k] = sum_w popcount(matrix[w, k] & masks[c, w]) via Pallas.

    Pads K to the block multiple; the padded tail is sliced off. On CPU the
    kernel runs in interpret mode (Mosaic requires a TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    matrix = np.asarray(matrix, dtype=np.uint32) if not isinstance(
        matrix, jax.Array
    ) else matrix
    masks = jnp.asarray(np.asarray(masks, dtype=np.uint32))
    if masks.ndim == 1:
        masks = masks[None, :]
    k = matrix.shape[1]
    pad = (-k) % BLOCK_K
    mj = jnp.asarray(matrix)
    if pad:
        mj = jnp.pad(mj, ((0, 0), (0, pad)))
    out = _colsum_pallas(mj, masks, interpret)
    return out[:, :k]
