"""Hilbert kernel parity: numpy vs scalar spec vs Catalyst expression,
and leaf-order agreement with the flatbush-JS golden buffer."""

from __future__ import annotations

import numpy as np
import pytest

from geo_index_spark.fixtures import data1_boxes
from geo_index_spark.hilbert import hilbert_of_boxes, hilbert_u32


def _hilbert_scalar(x: int, y: int) -> int:
    """Independent scalar spec (public-domain hilbert_curves algorithm,
    reference src/rtree/sort/hilbert.rs:122-177) for cross-checking the
    vectorized kernel."""
    M = 0xFFFFFFFF
    a = x ^ y
    b = 0xFFFF ^ a
    c = 0xFFFF ^ (x | y)
    d = x & (y ^ 0xFFFF)
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = C ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = D ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))
    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = C ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = D ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))
    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = D ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (0xFFFF ^ (i0 | a))
    for sh, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        i0 = ((i0 | (i0 << sh)) & M) & mask
        i1 = ((i1 | (i1 << sh)) & M) & mask
    return (((i1 << 1) & M) | i0) & M


RNG = np.random.default_rng(42)
GRID_SAMPLES = np.concatenate(
    [
        np.array([[0, 0], [65535, 65535], [0, 65535], [65535, 0], [1, 0], [0, 1]]),
        RNG.integers(0, 65536, size=(500, 2)),
    ]
)


def test_numpy_matches_scalar_spec():
    got = hilbert_u32(GRID_SAMPLES[:, 0], GRID_SAMPLES[:, 1])
    want = np.array([_hilbert_scalar(int(x), int(y)) for x, y in GRID_SAMPLES], dtype=np.uint64)
    assert np.array_equal(got.astype(np.uint64), want)


def test_catalyst_staged_matches_numpy(spark):
    import pandas as pd

    from geo_index_spark.hilbert import with_hilbert_key

    pdf = pd.DataFrame({"x": GRID_SAMPLES[:, 0].astype("int64"), "y": GRID_SAMPLES[:, 1].astype("int64")})
    df = spark.createDataFrame(pdf)
    out = with_hilbert_key(df, "x", "y", "h").toPandas()
    assert set(out.columns) == {"x", "y", "h"}
    want = hilbert_u32(out["x"].to_numpy(), out["y"].to_numpy())
    assert np.array_equal(out["h"].to_numpy().astype(np.uint64), want.astype(np.uint64))


def test_leaf_membership_matches_flatbush_js_golden():
    """Full stable sort must place the same 16-box groups into each leaf
    node as the reference's partial quicksort (ties permitting) — checked
    against the flatbush-JS golden buffer."""
    import pathlib

    boxes = data1_boxes()
    golden_path = pathlib.Path(__file__).parent / "data" / "data1_flatbush_js.raw"
    golden = np.fromfile(golden_path, dtype=np.uint8)
    n = 100
    coords = np.frombuffer(golden[8 : 8 + (n + 7 + 1) * 4 * 8].tobytes(), dtype=np.float64)
    leaf = coords[: n * 4].reshape(-1, 4)
    bounds = (
        boxes[:, 0].min(),
        boxes[:, 1].min(),
        boxes[:, 2].max(),
        boxes[:, 3].max(),
    )
    hv = hilbert_of_boxes(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], bounds)
    order = np.argsort(hv, kind="stable")
    ours = boxes[order]
    for start in range(0, n, 16):
        got = {tuple(r) for r in ours[start : start + 16]}
        want = {tuple(r) for r in leaf[start : start + 16]}
        assert got == want, f"leaf node at {start} differs"


