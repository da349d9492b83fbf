"""Golden fixture data ported from the reference test suite.

These are *data* (not code): the 100-box flatbush fixture
(reference fixtures/generate_data.py:7-27) and the 100-point kdbush
fixture (reference src/kdtree/test.rs:5-113), embedded so the repo is
standalone. Expected query results are pinned in tests
(reference src/rtree/trait.rs:588-610, src/kdtree/test.rs:150-234).
"""

from __future__ import annotations

import numpy as np

# 100 boxes, interleaved minx,miny,maxx,maxy — reference fixtures/generate_data.py:7-27
_DATA1 = (
    8, 62, 11, 66, 57, 17, 57, 19, 76, 26, 79, 29, 36, 56, 38, 56, 92, 77, 96, 80,
    87, 70, 90, 74, 43, 41, 47, 43, 0, 58, 2, 62, 76, 86, 80, 89, 27, 13, 27, 15,
    71, 63, 75, 67, 25, 2, 27, 2, 87, 6, 88, 6, 22, 90, 23, 93, 22, 89, 22, 93, 57,
    11, 61, 13, 61, 55, 63, 56, 17, 85, 21, 87, 33, 43, 37, 43, 6, 1, 7, 3, 80, 87,
    80, 87, 23, 50, 26, 52, 58, 89, 58, 89, 12, 30, 15, 34, 32, 58, 36, 61, 41, 84,
    44, 87, 44, 18, 44, 19, 13, 63, 15, 67, 52, 70, 54, 74, 57, 59, 58, 59, 17, 90,
    20, 92, 48, 53, 52, 56, 92, 68, 92, 72, 26, 52, 30, 52, 56, 23, 57, 26, 88, 48,
    88, 48, 66, 13, 67, 15, 7, 82, 8, 86, 46, 68, 50, 68, 37, 33, 38, 36, 6, 15, 8,
    18, 85, 36, 89, 38, 82, 45, 84, 48, 12, 2, 16, 3, 26, 15, 26, 16, 55, 23, 59,
    26, 76, 37, 79, 39, 86, 74, 90, 77, 16, 75, 18, 78, 44, 18, 45, 21, 52, 67, 54,
    71, 59, 78, 62, 78, 24, 5, 24, 8, 64, 80, 64, 83, 66, 55, 70, 55, 0, 17, 2, 19,
    15, 71, 18, 74, 87, 57, 87, 59, 6, 34, 7, 37, 34, 30, 37, 32, 51, 19, 53, 19,
    72, 51, 73, 55, 29, 45, 30, 45, 94, 94, 96, 95, 7, 22, 11, 24, 86, 45, 87, 48,
    33, 62, 34, 65, 18, 10, 21, 14, 64, 66, 67, 67, 64, 25, 65, 28, 27, 4, 31, 6,
    84, 4, 85, 5, 48, 80, 50, 81, 1, 61, 3, 61, 71, 89, 74, 92, 40, 42, 43, 43, 27,
    64, 28, 66, 46, 26, 50, 26, 53, 83, 57, 87, 14, 75, 15, 79, 31, 45, 34, 45, 89,
    84, 92, 88, 84, 51, 85, 53, 67, 87, 67, 89, 39, 26, 43, 27, 47, 61, 47, 63, 23,
    49, 25, 53, 12, 3, 14, 5, 16, 50, 19, 53, 63, 80, 64, 84, 22, 63, 22, 64, 26,
    66, 29, 66, 2, 15, 3, 15, 74, 77, 77, 79, 64, 11, 68, 11, 38, 4, 39, 8, 83, 73,
    87, 77, 85, 52, 89, 56, 74, 60, 76, 63, 62, 66, 65, 67,
)

# 100 points (x, y) — reference src/kdtree/test.rs:5-113
_KD_POINTS = (
    (54, 1), (97, 21), (65, 35), (33, 54), (95, 39), (54, 3), (53, 54), (84, 72),
    (33, 34), (43, 15), (52, 83), (81, 23), (1, 61), (38, 74), (11, 91), (24, 56),
    (90, 31), (25, 57), (46, 61), (29, 69), (49, 60), (4, 98), (71, 15), (60, 25),
    (38, 84), (52, 38), (94, 51), (13, 25), (77, 73), (88, 87), (6, 27), (58, 22),
    (53, 28), (27, 91), (96, 98), (93, 14), (22, 93), (45, 94), (18, 28), (35, 15),
    (19, 81), (20, 81), (67, 53), (43, 3), (47, 66), (48, 34), (46, 12), (32, 38),
    (43, 12), (39, 94), (88, 62), (66, 14), (84, 30), (72, 81), (41, 92), (26, 4),
    (6, 76), (47, 21), (57, 70), (71, 82), (50, 68), (96, 18), (40, 31), (78, 53),
    (71, 90), (32, 14), (55, 6), (32, 88), (62, 32), (21, 67), (73, 81), (44, 64),
    (29, 50), (70, 5), (6, 22), (68, 3), (11, 23), (20, 42), (21, 73), (63, 86),
    (9, 40), (99, 2), (99, 76), (56, 77), (83, 6), (21, 72), (78, 30), (75, 53),
    (41, 11), (95, 20), (30, 38), (96, 82), (65, 48), (33, 18), (87, 28), (10, 10),
    (40, 34), (10, 20), (47, 29), (46, 78),
)

# Golden bbox-search result for search(40,40,60,60) on data1 — the four boxes
# with these coords (reference src/rtree/trait.rs:588-610); set parity.
DATA1_SEARCH_40_60_BOXES = {
    (57, 59, 58, 59),
    (48, 53, 52, 56),
    (40, 42, 43, 43),
    (43, 41, 47, 43),
}

# Golden kd results (reference src/kdtree/test.rs:177-181, 212-214); set parity.
KD_RANGE_20_30_50_70_IDS = {
    60, 20, 45, 3, 17, 71, 44, 19, 18, 15, 69, 90, 62, 96, 47, 8, 77, 72,
}
KD_WITHIN_50_50_R20_IDS = {60, 6, 25, 92, 42, 20, 45, 3, 71, 44, 18, 96}


def data1_boxes() -> np.ndarray:
    """(100, 4) float64 array of [minx, miny, maxx, maxy]."""
    return np.asarray(_DATA1, dtype=np.float64).reshape(-1, 4)


def kdbush_points() -> np.ndarray:
    """(100, 2) float64 array of [x, y]."""
    return np.asarray(_KD_POINTS, dtype=np.float64)


def data1_df(spark):
    """data1 as a DataFrame (row_id = insertion index)."""
    b = data1_boxes()
    rows = [
        (int(i), float(r[0]), float(r[1]), float(r[2]), float(r[3]))
        for i, r in enumerate(b)
    ]
    return spark.createDataFrame(
        rows, "row_id long, minx double, miny double, maxx double, maxy double"
    )


def kdbush_df(spark):
    p = kdbush_points()
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(p)]
    return spark.createDataFrame(rows, "row_id long, x double, y double")


def admin_polygons() -> list[tuple[int, np.ndarray]]:
    """FIXTURES.md §5 analogue of the 85-polygon guerry set: a
    deterministic irregular tiling of [0,100]^2 into 85 simple quads
    (17x5 grid with seeded node perturbation, vertices rounded 1e-6).
    CCW rings; simple (perturbation < half cell) though not necessarily
    convex — the ray-cast refine handles any simple polygon."""
    nx, ny = 17, 5
    rng = np.random.default_rng(85)
    gx = np.linspace(0, 100, nx + 1)
    gy = np.linspace(0, 100, ny + 1)
    nodes = np.zeros((nx + 1, ny + 1, 2))
    for i in range(nx + 1):
        for j in range(ny + 1):
            px = gx[i] + (rng.uniform(-1.7, 1.7) if 0 < i < nx else 0.0)
            py = gy[j] + (rng.uniform(-5.5, 5.5) if 0 < j < ny else 0.0)
            nodes[i, j] = (round(px, 6), round(py, 6))
    out = []
    pid = 0
    for i in range(nx):
        for j in range(ny):
            ring = np.array(
                [nodes[i, j], nodes[i + 1, j], nodes[i + 1, j + 1], nodes[i, j + 1]]
            )
            out.append((pid, ring))
            pid += 1
    return out


def admin_polygons_df(spark):
    rows = []
    for pid, ring in admin_polygons():
        rows.append(
            (
                pid,
                [[float(x), float(y)] for x, y in ring],
                float(ring[:, 0].min()),
                float(ring[:, 1].min()),
                float(ring[:, 0].max()),
                float(ring[:, 1].max()),
            )
        )
    return spark.createDataFrame(
        rows,
        "poly_id long, vertices array<array<double>>, minx double, miny double,"
        " maxx double, maxy double",
    )


def raster_grid() -> np.ndarray:
    """FIXTURES.md §6: 64x64 grid over [0,100]^2; columns
    (cell_id, row, col, minx, miny, maxx, maxy, value) with
    value = sin(row) * cos(col)."""
    n = 64
    w = 100.0 / n
    rows = np.repeat(np.arange(n), n)
    cols = np.tile(np.arange(n), n)
    cell_id = rows * n + cols
    minx = cols * w
    miny = rows * w
    return np.column_stack(
        [cell_id, rows, cols, minx, miny, minx + w, miny + w, np.sin(rows) * np.cos(cols)]
    )


def raster_grid_df(spark):
    g = raster_grid()
    rows = [
        (int(r[0]), int(r[1]), int(r[2]), float(r[3]), float(r[4]), float(r[5]), float(r[6]), float(r[7]))
        for r in g
    ]
    return spark.createDataFrame(
        rows,
        "cell_id long, row int, col int, minx double, miny double, maxx double,"
        " maxy double, value double",
    )
