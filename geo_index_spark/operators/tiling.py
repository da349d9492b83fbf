"""S2-style quad-cell tiling (north-rule surface).

The reference has no tiling operator (it delegates to downstream
libraries, reference README.md:59); the north rule requires
H3/S2-style cell ids with *tile-assignment parity*, which therefore
binds to this exactly-specified function (SURVEY.md §7 risk register).

Spec (deterministic, golden-tested):
  For a point (x, y) in a fixed frame ``bounds = (lox, loy, hix, hiy)``
  (default the lon/lat frame (-180, -90, 180, 90)) and level
  ``L in [0, 16]``:

    gx = clamp(floor((x - lox) / (hix - lox) * 2^L), 0, 2^L - 1)
    gy = clamp(floor((y - loy) / (hiy - loy) * 2^L), 0, 2^L - 1)
    cell_id = (L << 58) | interleave_bits(gx, gy)   # Morton / Z-order

  ``interleave_bits`` puts gx on even bits, gy on odd bits — the same
  bit-expansion the Hilbert kernel uses, so the cell id of a parent at
  level L-1 is ``cell_id >> 2`` (after re-tagging the level), giving
  cheap hierarchical rollups with ``groupBy(cell >> 2k)``.

Implemented twice (parity-tested): numpy kernel and Catalyst Column
expression (the 100 TB path — tiling a trillion rows is a pure
projection inside whole-stage codegen, no shuffle, no Python).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

LONLAT_BOUNDS = (-180.0, -90.0, 180.0, 90.0)


def _expand_bits_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def quad_cell_np(
    x: np.ndarray,
    y: np.ndarray,
    level: int,
    bounds: tuple[float, float, float, float] = LONLAT_BOUNDS,
) -> np.ndarray:
    """Vectorized numpy tile assignment (the golden spec)."""
    if not 0 <= level <= 16:
        raise ValueError("level must be in [0, 16]")
    lox, loy, hix, hiy = bounds
    n = 1 << level
    gx = np.clip(np.floor((np.asarray(x, np.float64) - lox) / (hix - lox) * n), 0, n - 1)
    gy = np.clip(np.floor((np.asarray(y, np.float64) - loy) / (hiy - loy) * n), 0, n - 1)
    morton = _expand_bits_np(gx.astype(np.uint64)) | (
        _expand_bits_np(gy.astype(np.uint64)) << np.uint64(1)
    )
    return (np.uint64(level) << np.uint64(58)) | morton


def _expand_bits_col(v: Column) -> Column:
    for sh, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        v = v.bitwiseOR(F.shiftleft(v, sh)).bitwiseAND(F.lit(mask))
    return v


def quad_cell_col(
    x: Column,
    y: Column,
    level: int,
    bounds: tuple[float, float, float, float] = LONLAT_BOUNDS,
) -> Column:
    """Catalyst tile assignment, exactly equal to :func:`quad_cell_np`."""
    if not 0 <= level <= 16:
        raise ValueError("level must be in [0, 16]")
    lox, loy, hix, hiy = (float(b) for b in bounds)
    n = 1 << level
    gx = F.greatest(
        F.lit(0), F.least(F.lit(n - 1), F.floor((x - F.lit(lox)) / F.lit(hix - lox) * F.lit(n)))
    ).cast("long")
    gy = F.greatest(
        F.lit(0), F.least(F.lit(n - 1), F.floor((y - F.lit(loy)) / F.lit(hiy - loy) * F.lit(n)))
    ).cast("long")
    morton = _expand_bits_col(gx).bitwiseOR(F.shiftleft(_expand_bits_col(gy), 1))
    return F.shiftleft(F.lit(int(level)).cast("long"), 58).bitwiseOR(morton)


def parent_cell_col(cell: Column, levels_up: int = 1) -> Column:
    """Parent cell id (hierarchical rollup): strip level tag, shift the
    Morton code, re-tag."""
    level = F.shiftrightunsigned(cell, 58)
    morton = cell.bitwiseAND(F.lit((1 << 58) - 1))
    return F.shiftleft((level - F.lit(levels_up)).cast("long"), 58).bitwiseOR(
        F.shiftrightunsigned(morton, 2 * levels_up)
    )


def tile_assign(df, x_col: str = "x", y_col: str = "y", level: int = 8, bounds=LONLAT_BOUNDS):
    """Add a ``cell_id`` column (LongType) to a point DataFrame."""
    return df.withColumn("cell_id", quad_cell_col(F.col(x_col), F.col(y_col), level, bounds))
