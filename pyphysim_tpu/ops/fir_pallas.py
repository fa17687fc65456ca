"""Pallas TPU kernel: block-static sparse-tap FIR.

The SURVEY's 'overlap-save FIR Pallas kernel': for block-static TDL
channels each block's output is the convolution of its samples with a
short sparse kernel. The XLA frequency-domain formulation is exact but
HBM-bound (DFT intermediates are written/read several times); this kernel
keeps everything in VMEM — per grid step it loads a tile of blocks plus
their per-block taps, accumulates the ~16 shifted multiply-adds in
registers, and writes the convolved tile once. Traffic = read x + write y,
nothing else.

Layout: rows = (realization, block) pairs flattened; x padded to a
128-lane multiple.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cplx import CArray

__all__ = ["block_fir"]

_ROW_TILE = 64  # sublane tile


def _kernel(xr_ref, xi_ref, tr_ref, ti_ref, yr_ref, yi_ref, *,
            tap_offsets: Tuple[int, ...], block_size: int):
    xr = xr_ref[:]                      # (ROWS, Lx)
    xi = xi_ref[:]
    yr_ref[:] = jnp.zeros(yr_ref.shape, yr_ref.dtype)
    yi_ref[:] = jnp.zeros(yi_ref.shape, yi_ref.dtype)
    for i, d in enumerate(tap_offsets):
        hr = tr_ref[:, i:i + 1]         # (ROWS, 1)
        hi = ti_ref[:, i:i + 1]
        pr = hr * xr - hi * xi          # (ROWS, Lx)
        pi = hr * xi + hi * xr
        # accumulate into the output ref at static offset d
        yr_ref[:, d:d + block_size] = (yr_ref[:, d:d + block_size] +
                                       pr[:, :block_size])
        yi_ref[:, d:d + block_size] = (yi_ref[:, d:d + block_size] +
                                       pi[:, :block_size])


def block_fir(x_blocks: CArray, taps: CArray,
              tap_offsets: Sequence[int], block_size: int) -> CArray:
    """Convolve each row of ``x_blocks`` (R, block_size) with its own
    sparse kernel ``taps`` (R, T) at static ``tap_offsets``.

    Returns (R, block_size + D - 1) with ``D = tap_offsets[-1] + 1``.
    """
    offsets = tuple(int(d) for d in tap_offsets)
    D = offsets[-1] + 1
    R = x_blocks.shape[0]
    out_len = block_size + D - 1
    # pad the lane dims to 128 multiples
    in_w = ((block_size + 127) // 128) * 128
    out_w = ((out_len + 127) // 128) * 128
    ntaps = taps.shape[-1]
    taps_w = ((ntaps + 127) // 128) * 128

    xr = jnp.pad(x_blocks.re, ((0, 0), (0, in_w - block_size)))
    xi = jnp.pad(x_blocks.im, ((0, 0), (0, in_w - block_size)))
    dt = x_blocks.dtype
    tr = jnp.pad(taps.re.astype(dt), ((0, 0), (0, taps_w - ntaps)))
    ti = jnp.pad(taps.im.astype(dt), ((0, 0), (0, taps_w - ntaps)))

    grid = (R // _ROW_TILE,) if R % _ROW_TILE == 0 else \
        ((R + _ROW_TILE - 1) // _ROW_TILE,)
    if R % _ROW_TILE != 0:
        pad_r = grid[0] * _ROW_TILE - R
        xr = jnp.pad(xr, ((0, pad_r), (0, 0)))
        xi = jnp.pad(xi, ((0, pad_r), (0, 0)))
        tr = jnp.pad(tr, ((0, pad_r), (0, 0)))
        ti = jnp.pad(ti, ((0, pad_r), (0, 0)))

    kernel = functools.partial(_kernel, tap_offsets=offsets,
                               block_size=block_size)
    row_spec_in = pl.BlockSpec((_ROW_TILE, in_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    tap_spec = pl.BlockSpec((_ROW_TILE, taps_w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_ROW_TILE, out_w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec_in, row_spec_in, tap_spec, tap_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((grid[0] * _ROW_TILE, out_w),
                                        x_blocks.dtype),
                   jax.ShapeDtypeStruct((grid[0] * _ROW_TILE, out_w),
                                        x_blocks.dtype)),
        interpret=interpret,
    )(xr, xi, tr, ti)
    return CArray(yr[:R, :out_len], yi[:R, :out_len])
