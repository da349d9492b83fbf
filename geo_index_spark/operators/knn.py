"""k-nearest-neighbors with geo-index ordering semantics.

Reference contract (src/rtree/trait.rs:198-302): results ascend by
distance; ``max_distance`` prunes (inclusive); ``max_results`` caps.
Tie order in the reference is heap-internal, so we pin the deterministic
tiebreak ``(dist, row_id)`` (SURVEY.md §2.3.3).

Spark plan: distance is a pure Catalyst expression (hypot / haversine
built from JVM math functions — no Python), then
``orderBy(dist, row_id).limit(k)`` which Catalyst executes as
``TakeOrderedAndProject``: each partition computes a local top-k
map-side and only k rows per partition reach the driver-side merge.
That is exactly the reference's best-first "local candidates, global
merge" shape, and it scales linearly with partition count. On
Hilbert-clustered storage, an optional ``prefilter_radius`` turns the
scan into a pushed-down bbox filter first.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6378137.0  # reference src/rtree/distance.rs (WGS84 semi-major)


def euclidean_dist_col(x: Column, y: Column, qx: float, qy: float) -> Column:
    dx = x - F.lit(float(qx))
    dy = y - F.lit(float(qy))
    return F.sqrt(dx * dx + dy * dy)


def haversine_dist_col(lon: Column, lat: Column, qlon: float, qlat: float) -> Column:
    """Great-circle meters, same formula as reference
    src/rtree/distance.rs:84-114 — all JVM built-ins."""
    lat1 = F.radians(F.lit(float(qlat)))
    lat2 = F.radians(lat)
    dlat = F.radians(lat - F.lit(float(qlat)))
    dlon = F.radians(lon - F.lit(float(qlon)))
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
    h = F.least(h, F.lit(1.0))
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(h))


def box_distance_col(
    minx: Column, miny: Column, maxx: Column, maxy: Column, qx: float, qy: float
) -> Column:
    """Euclidean distance from point (qx, qy) to a box, 0 inside —
    the reference's axis_dist composition (src/rtree/trait.rs:570-579)."""
    dx = F.greatest(F.lit(0.0), F.greatest(minx - F.lit(float(qx)), F.lit(float(qx)) - maxx))
    dy = F.greatest(F.lit(0.0), F.greatest(miny - F.lit(float(qy)), F.lit(float(qy)) - maxy))
    return F.sqrt(dx * dx + dy * dy)


def knn_boxes(
    df: DataFrame,
    qx: float,
    qy: float,
    k: int,
    max_distance: float | None = None,
    cols: tuple[str, str, str, str] = ("minx", "miny", "maxx", "maxy"),
    id_col: str = "row_id",
) -> DataFrame:
    """Q3/Q5 over a BOX table: top-k boxes by point-to-box distance
    (the reference's native kNN operates on leaf boxes; geometry
    queries refine the same lower bound, src/rtree/trait.rs:397-500)."""
    mnx, mny, mxx, mxy = (F.col(c) for c in cols)
    out = df.withColumn("dist", box_distance_col(mnx, mny, mxx, mxy, qx, qy))
    if max_distance is not None:
        out = out.filter(F.col("dist") <= F.lit(float(max_distance)))
    return out.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(int(k))


# ---------------------------------------------------------------------------
# Q5 full: kNN by query GEOMETRY (reference neighbors_geometry,
# src/rtree/trait.rs:397-500 + GeometryAccessor trait.rs:43-52)
# ---------------------------------------------------------------------------


def _geom_edges(vertices: list[list[float]], geom_type: str) -> list[tuple[float, float, float, float]]:
    """(x1, y1, x2, y2) edge list; polygons close the ring (dropping a
    duplicated closing vertex first), polylines don't."""
    v = [(float(p[0]), float(p[1])) for p in vertices]
    if geom_type == "polygon" and len(v) >= 2 and v[0] == v[-1]:
        v = v[:-1]
    n = len(v)
    if n < 2:
        raise ValueError("geometry needs at least 2 vertices")
    last = n if geom_type == "polygon" else n - 1
    return [(v[i][0], v[i][1], v[(i + 1) % n][0], v[(i + 1) % n][1]) for i in range(last)]


def geom_bounds(vertices: list[list[float]]) -> tuple[float, float, float, float]:
    xs = [float(p[0]) for p in vertices]
    ys = [float(p[1]) for p in vertices]
    return (min(xs), min(ys), max(xs), max(ys))


def point_to_geom_np(px, py, vertices: list[list[float]], geom_type: str):
    """Vectorized exact point-to-geometry distance (numpy twin of
    :func:`geom_distance_col`; also the >32-edge Arrow fast path).
    Polyline: min point-to-segment distance. Polygon: 0 inside
    (even-odd ray cast), else min distance to the ring."""
    import numpy as np

    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    e = np.array(_geom_edges(vertices, geom_type), dtype=np.float64)
    x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    dx, dy = x2 - x1, y2 - y1
    l2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / l2
    t = np.where(l2 == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    cx = x1 + t * dx
    cy = y1 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    d = np.sqrt(d2.min(axis=1))
    if geom_type == "polygon":
        from geo_index_spark.operators.pip import ray_cast_np

        ring = np.array([[p[0], p[1]] for p in vertices], dtype=np.float64)
        inside = ray_cast_np(px[:, 0], py[:, 0], ring)
        d = np.where(inside, 0.0, d)
    return d


def geom_distance_col(x: Column, y: Column, vertices: list[list[float]], geom_type: str = "polyline") -> Column:
    """Exact point-to-geometry distance as a PURE CATALYST expression —
    the geometry is a literal, so every edge's dx/dy/l2 folds to a
    Python-computed double and the whole thing stays in whole-stage
    codegen. Per edge: t = clamp(((p-a).(b-a))/|b-a|^2, 0, 1),
    d2 = |p - (a + t(b-a))|^2; distance = sqrt(min over edges);
    polygons short-circuit to 0 when the even-odd ray cast says inside.
    Use :func:`point_to_geom_np` via mapInPandas for geometries with
    thousands of edges (a flat least() over ~1e3 subtrees stops being
    a reasonable codegen unit)."""
    edges = _geom_edges(vertices, geom_type)
    d2s = []
    for (x1, y1, x2, y2) in edges:
        dx, dy = x2 - x1, y2 - y1
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            d2s.append((x - F.lit(x1)) * (x - F.lit(x1)) + (y - F.lit(y1)) * (y - F.lit(y1)))
            continue
        t_raw = ((x - F.lit(x1)) * F.lit(dx) + (y - F.lit(y1)) * F.lit(dy)) / F.lit(l2)
        t = F.least(F.lit(1.0), F.greatest(F.lit(0.0), t_raw))
        cx = F.lit(x1) + t * F.lit(dx)
        cy = F.lit(y1) + t * F.lit(dy)
        d2s.append((x - cx) * (x - cx) + (y - cy) * (y - cy))
    d = F.sqrt(F.least(*d2s) if len(d2s) > 1 else d2s[0])
    if geom_type == "polygon":
        # even-odd crossing parity, same test as pip.ray_cast_np
        crossings = None
        for (x1, y1, x2, y2) in edges:
            if y1 == y2:
                continue
            xin = F.lit(x2 - x1) * (y - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
            c = F.when(
                ((F.lit(y1) > y) != (F.lit(y2) > y)) & (x < xin), F.lit(1)
            ).otherwise(F.lit(0))
            crossings = c if crossings is None else crossings + c
        inside = (crossings % 2 == 1) if crossings is not None else F.lit(False)
        d = F.when(inside, F.lit(0.0)).otherwise(d)
    return d


MAX_CODEGEN_EDGES = 64


def _geom_dist_arrow(vertices: list[list[float]], geom_type: str):
    """Arrow-batched exact distance (pandas_udf over point_to_geom_np)
    for geometries too large to inline as one codegen expression."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def dist(px: pd.Series, py: pd.Series) -> pd.Series:
        return pd.Series(point_to_geom_np(px.to_numpy(), py.to_numpy(), vertices, geom_type))

    return dist


def knn_geometry(
    df: DataFrame,
    vertices: list[list[float]],
    k: int,
    geom_type: str = "polyline",
    max_distance: float | None = None,
    cols: tuple[str, str] = ("x", "y"),
    id_col: str = "row_id",
    two_phase: bool = True,
) -> DataFrame:
    """Exact top-k rows by distance to a query geometry — the
    reference's ``neighbors_geometry`` (candidate lower bound by bbox,
    exact geom refine on candidates; src/rtree/trait.rs:397-500).

    Two-phase exact plan: (1) seed top-k by the bbox lower bound
    (TakeOrderedAndProject — k rows to the driver) and read their MAX
    exact distance D; any true top-k row has exact <= D and bbox lower
    bound <= exact, so (2) ``filter(lb <= D)`` is a complete candidate
    set — the exact distance is then computed only on candidates and
    merged with the same (dist, id) tiebreak. The phase-1 collect is k
    SCALARS (not data rows) — driver-tiny at any scale — but it does
    serialize two jobs per query; ``two_phase=False`` trades the prune
    for a single full-scan job when query latency matters more than
    scan cost. Both phases are pure
    Catalyst for geometries up to ``MAX_CODEGEN_EDGES`` edges; larger
    geometries switch the exact distance to the Arrow-batched numpy
    kernel (same formula, so results agree to IEEE-double exactness —
    pytest-pinned), while the lower-bound prune stays Catalyst."""
    x, y = (F.col(c) for c in cols)
    gb = geom_bounds(vertices)
    # bbox lower bound: geometry is inside its bbox, so
    # dist(p, bbox) <= dist(p, geom) — the same axis_dist composition
    # as box_distance_col with the box literal and the point a column
    ddx = F.greatest(F.lit(0.0), F.greatest(F.lit(gb[0]) - x, x - F.lit(gb[2])))
    ddy = F.greatest(F.lit(0.0), F.greatest(F.lit(gb[1]) - y, y - F.lit(gb[3])))
    lb = F.sqrt(ddx * ddx + ddy * ddy)
    if len(_geom_edges(vertices, geom_type)) <= MAX_CODEGEN_EDGES:
        exact = geom_distance_col(x, y, vertices, geom_type)
    else:
        exact = _geom_dist_arrow(vertices, geom_type)(x, y)
    out = df
    if two_phase:
        seeds = (
            df.withColumn("_lb", lb)
            .withColumn("dist", exact)
            .orderBy(F.col("_lb").asc(), F.col(id_col).asc())
            .limit(int(k))
            .select("dist")
            .collect()
        )
        if len(seeds) >= int(k) and seeds:
            D = max(r["dist"] for r in seeds)
            if max_distance is not None:
                D = min(D, float(max_distance))
            out = out.filter(lb <= F.lit(float(D)))
    out = out.withColumn("dist", exact)
    if max_distance is not None:
        out = out.filter(F.col("dist") <= F.lit(float(max_distance)))
    return out.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(int(k))


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    left_id: str = "row_id",
    right_id: str = "row_id",
    left_cols: tuple[str, str] = ("x", "y"),
    right_cols: tuple[str, str] = ("x", "y"),
    bounds: tuple[float, float, float, float] | None = None,
    init_radius: float | None = None,
    max_rounds: int = 16,
    metric: str = "euclidean",
    max_distance: float | None = None,
) -> DataFrame:
    """EXACT distributed kNN join: for every left point, its ``k``
    nearest right points — (left_id, right_id, dist), per-left ascending
    (dist, right_id). ``max_distance`` prunes INCLUSIVELY like the
    reference's ``neighbors`` (src/rtree/trait.rs:261): each left gets
    up to k rows with dist <= max_distance (possibly fewer, possibly
    zero). Internally it caps the certification radius — once the
    candidate box covers the max_distance ball, every eligible right is
    a candidate and all remaining lefts certify unconditionally. The workhorse the reference runs as a per-query
    loop over ``neighbors`` (src/rtree/trait.rs:198-302), re-expressed
    as a bulk operator.

    Plan — certified-radius doubling (the Simba/Sedona family, pure
    Catalyst): each round candidate-joins the UNSATISFIED lefts against
    right within a +-r box (grid candidate join carrying coordinates),
    takes per-left top-k by window, and CERTIFIES a left exact when it
    has k candidates with kth distance <= r — no right point outside
    the box can beat them (outside the +-r box implies euclidean
    distance > r). Uncertified lefts re-join with r doubled; a round
    whose box covers the whole domain certifies unconditionally. Rounds
    shuffle only the remaining lefts, so the tail (points in sparse
    voids) costs little; ``init_radius`` defaults to a DENSITY-AWARE
    estimate — cell_edge * sqrt(k / max_cell_count) from one coarse
    grid count over right — because doubling makes the cost asymmetric:
    a too-small start wastes a few cheap rounds, a too-large start
    explodes the first candidate join (the old uniform estimate
    ext*sqrt(k/n) produced ~1e11 round-1 candidates on a city-skewed
    64M table; the job never finished). Once the uncertified tail
    drops below ~200k lefts, rounds broadcast the left side so the
    right table is scanned, not re-shuffled.

    ``metric="haversine"``: radius in METERS over (lon, lat) degrees;
    candidate boxes use the provably-containing degree expansion of
    :func:`geo_index_spark.operators.join.haversine_candidate_boxes`,
    WITH antimeridian wrap — a window crossing +-180 becomes two
    disjoint lon segments — so the certification argument (outside the
    box union implies haversine distance > r) holds for any data in
    [-180, 180] x [-90, 90], and the full-cover round (r >= pi*R ->
    dlon = 180, dlat = 180) genuinely covers the domain. Out-of-range
    latitudes raise (row-level check in the expansion)."""
    import math

    from pyspark.sql import Window

    from geo_index_spark.operators.join import (
        choose_grid_level,
        haversine_candidate_boxes,
        haversine_pair_col,
        spatial_join,
    )

    if metric not in ("euclidean", "haversine"):
        raise ValueError(f"metric must be euclidean|haversine, got {metric!r}")
    R_EARTH = 6378137.0

    lx, ly = left_cols
    rx, ry = right_cols
    lpts = left.select(
        F.col(left_id).alias("lid"), F.col(lx).alias("px"), F.col(ly).alias("py")
    )
    rb = right.select(
        F.col(right_id).alias("row_id"),
        F.col(rx).alias("minx"),
        F.col(ry).alias("miny"),
        F.col(rx).alias("maxx"),
        F.col(ry).alias("maxy"),
        F.col(rx).alias("qx"),
        F.col(ry).alias("qy"),
    )
    if bounds is None or init_radius is None:
        agg = rb.agg(
            F.min("minx"), F.min("miny"), F.max("maxx"), F.max("maxy"), F.count(F.lit(1))
        ).first()
        rlo_x, rlo_y, rhi_x, rhi_y, n_right = agg
        lagg = lpts.agg(F.min("px"), F.min("py"), F.max("px"), F.max("py")).first()
        if bounds is None:
            bounds = (
                min(rlo_x, lagg[0]),
                min(rlo_y, lagg[1]),
                max(rhi_x, lagg[2]),
                max(rhi_y, lagg[3]),
            )
        if init_radius is None:
            # DENSITY-AWARE start (round-4 fix): the old uniform estimate
            # ext*sqrt(k/n) is catastrophic under skew — on a city-
            # clustered 64M table it sized round-1 boxes to ~600k
            # candidates per clustered left (~1e11 pairs; the job never
            # finished). The doubling rounds make the cost asymmetric:
            # starting too SMALL wastes a few cheap extra rounds,
            # starting too BIG explodes the first candidate join. So
            # start at the NN scale of the DENSEST region: one coarse
            # grid count over the right table (cells sized for ~64
            # rows/cell on average), radius = cell_edge * sqrt(k/max_cnt).
            # Uniform data degenerates to (roughly) the old estimate.
            ext = max(bounds[2] - bounds[0], bounds[3] - bounds[1], 1e-12)
            gd = min(12, max(2, round(math.log2(max(n_right, 1) / 64.0) / 2.0)))
            nc_d = 1 << gd
            cell_edge = ext / nc_d
            cx = F.least(
                F.lit(nc_d - 1),
                F.greatest(F.lit(0), F.floor((F.col("minx") - F.lit(bounds[0])) / F.lit(cell_edge))),
            )
            cy = F.least(
                F.lit(nc_d - 1),
                F.greatest(F.lit(0), F.floor((F.col("miny") - F.lit(bounds[1])) / F.lit(cell_edge))),
            )
            mx = (
                rb.groupBy(cx.alias("_cx"), cy.alias("_cy"))
                .agg(F.count(F.lit(1)).alias("c"))
                .agg(F.max("c"))
                .first()[0]
            )
            dense = cell_edge * math.sqrt(float(k) / max(float(mx), 1.0))
            if metric == "haversine":
                # degrees -> conservative meters at the equator scale
                init_radius = dense * 111320.0
            else:
                init_radius = dense
    extent = max(bounds[2] - bounds[0], bounds[3] - bounds[1], 1e-12)
    # radius covering the whole domain: every right point is a candidate.
    # With max_distance, covering the max_d ball is just as final: the
    # dist <= max_d residual makes the candidate set complete, so the
    # cover radius shrinks to max_distance (same unconditional certify).
    cover_r = math.pi * R_EARTH if metric == "haversine" else extent
    if max_distance is not None:
        cover_r = min(cover_r, float(max_distance))
    r = max(float(init_radius), cover_r / (1 << 20))
    r = min(r, cover_r) if max_distance is not None else r

    remaining = lpts.localCheckpoint()
    n_remaining = remaining.count()
    parts: list[DataFrame] = []
    w = Window.partitionBy("left_id").orderBy(F.col("dist").asc(), F.col("right_id").asc())
    # once the uncertified tail is small, BROADCAST it: the candidate
    # join then streams the right table instead of re-shuffling all of
    # it every round — the late (sparse-void) rounds cost O(|R|) scan,
    # not O(|R|) shuffle. 200k lefts x <=4 cells/box x ~56 B is well
    # under the broadcast threshold.
    bcast_lefts = 200_000
    for _ in range(max_rounds):
        if metric == "haversine":
            lb = haversine_candidate_boxes(
                remaining, r, id_col="lid", lon_col="px", lat_col="py"
            )
            box_scale = 2 * math.degrees(r / R_EARTH)
        else:
            lb = remaining.select(
                F.col("lid").alias("row_id"),
                (F.col("px") - F.lit(r)).alias("minx"),
                (F.col("py") - F.lit(r)).alias("miny"),
                (F.col("px") + F.lit(r)).alias("maxx"),
                (F.col("py") + F.lit(r)).alias("maxy"),
                "px",
                "py",
            )
            box_scale = 2 * r
        level = choose_grid_level(bounds, box_scale, box_scale)
        cand = spatial_join(
            lb,
            rb,
            bounds=bounds,
            grid_level=level,
            broadcast_side="left" if n_remaining <= bcast_lefts else None,
            keep_left=("px", "py"),
            keep_right=("qx", "qy"),
        )
        if metric == "haversine":
            d = haversine_pair_col(
                F.col("l_px"), F.col("l_py"), F.col("r_qx"), F.col("r_qy")
            )
        else:
            dx = F.col("l_px") - F.col("r_qx")
            dy = F.col("l_py") - F.col("r_qy")
            d = F.sqrt(dx * dx + dy * dy)
        scored = cand.withColumn("dist", d)
        if max_distance is not None:
            scored = scored.filter(F.col("dist") <= F.lit(float(max_distance)))
        top = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= F.lit(int(k)))
            .select("left_id", "right_id", "dist")
        )
        full_cover = r >= cover_r
        if full_cover:
            parts.append(top)
            remaining = None
            break
        stats = top.groupBy("left_id").agg(
            F.max("dist").alias("dk"), F.count(F.lit(1)).alias("c")
        )
        done = stats.filter((F.col("c") == k) & (F.col("dk") <= F.lit(r))).select("left_id")
        parts.append(top.join(done, "left_id", "left_semi").localCheckpoint())
        remaining = remaining.join(
            done, remaining["lid"] == done["left_id"], "left_anti"
        ).localCheckpoint()
        n_remaining = remaining.count()
        if n_remaining == 0:
            remaining = None
            break
        r *= 2.0
    if remaining is not None and not remaining.isEmpty():
        raise RuntimeError("knn_join did not converge within max_rounds")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def knn_join_sql(
    k: int,
    left_sql: str,
    right_sql: str,
    left_id: str = "left_id",
    right_id: str = "right_id",
    metric: str = "euclidean",
    max_distance: float | None = None,
) -> str:
    """DuckDB mirror of :func:`knn_join` (brute-force cross join +
    window — oracle scale only). ``left_sql``/``right_sql`` must yield
    (id, x, y). Same distance expression order and the same
    (dist, right_id) row_number tiebreak."""
    if metric == "haversine":
        dist = (
            "2.0 * 6378137.0 * asin(sqrt(least(1.0,"
            " pow(sin(radians(r.y - l.y)/2), 2)"
            " + cos(radians(l.y)) * cos(radians(r.y)) * pow(sin(radians(r.x - l.x)/2), 2)"
            ")))"
        )
    else:
        dist = "sqrt((l.x - r.x)*(l.x - r.x) + (l.y - r.y)*(l.y - r.y))"
    return f"""
    WITH l AS ({left_sql}), r AS ({right_sql}),
    scored AS (
      SELECT l.id AS {left_id}, r.id AS {right_id},
             {dist} AS dist,
             row_number() OVER (
               PARTITION BY l.id
               ORDER BY {dist} ASC, r.id ASC
             ) AS rn
      FROM l CROSS JOIN r
    )
    SELECT {left_id}, {right_id}, round(dist, 6) AS dist_r
    FROM scored WHERE rn <= {int(k)}{'' if max_distance is None else f' AND dist <= {float(max_distance)!r}'}
    """


def knn_geometry_sql(
    vertices: list[list[float]],
    k: int,
    points_sql: str,
    geom_type: str = "polyline",
    point_id: str = "event_id",
) -> str:
    """DuckDB mirror of :func:`knn_geometry`: identical per-edge clamp
    distance with dx/dy/l2 pre-folded to the same Python doubles, min
    via n-ary least(), polygon inside via the same ray-cast parity —
    expression order matches :func:`geom_distance_col` term for term,
    so IEEE doubles agree exactly."""
    edges = _geom_edges(vertices, geom_type)
    d2s = []
    for (x1, y1, x2, y2) in edges:
        dx, dy = x2 - x1, y2 - y1
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            d2s.append(f"((p.x - {x1!r})*(p.x - {x1!r}) + (p.y - {y1!r})*(p.y - {y1!r}))")
            continue
        t = f"least(1.0, greatest(0.0, ((p.x - {x1!r})*{dx!r} + (p.y - {y1!r})*{dy!r}) / {l2!r}))"
        cx = f"({x1!r} + {t}*{dx!r})"
        cy = f"({y1!r} + {t}*{dy!r})"
        d2s.append(f"((p.x - {cx})*(p.x - {cx}) + (p.y - {cy})*(p.y - {cy}))")
    mind2 = f"least({', '.join(d2s)})" if len(d2s) > 1 else d2s[0]
    dist = f"sqrt({mind2})"
    if geom_type == "polygon":
        cs = []
        for (x1, y1, x2, y2) in edges:
            if y1 == y2:
                continue
            xin = f"({x2 - x1!r} * (p.y - {y1!r}) / {y2 - y1!r} + {x1!r})"
            cs.append(
                f"(CASE WHEN (({y1!r} > p.y) <> ({y2!r} > p.y)) AND p.x < {xin}"
                f" THEN 1 ELSE 0 END)"
            )
        if cs:
            dist = f"(CASE WHEN ({' + '.join(cs)}) % 2 = 1 THEN 0.0 ELSE {dist} END)"
    return f"""
    WITH p AS ({points_sql})
    SELECT {point_id}, round({dist}, 6) AS dist_r
    FROM p ORDER BY {dist} ASC, {point_id} ASC LIMIT {int(k)}
    """


def knn(
    df: DataFrame,
    qx: float,
    qy: float,
    k: int,
    metric: str = "euclidean",
    max_distance: float | None = None,
    cols: tuple[str, str] = ("x", "y"),
    id_col: str = "row_id",
    prefilter_radius: float | None = None,
) -> DataFrame:
    """Top-k rows by (distance, id). Returns input columns + ``dist``.
    ``max_distance`` / ``prefilter_radius`` are in the metric's units
    (coordinate units for euclidean, METERS for haversine); either one
    turns the scan into a pushed-down window prune (haversine uses the
    antimeridian-wrapped degree box)."""
    x, y = (F.col(c) for c in cols)
    if metric == "euclidean":
        d = euclidean_dist_col(x, y, qx, qy)
    elif metric == "haversine":
        d = haversine_dist_col(x, y, qx, qy)
    else:
        raise ValueError(f"unknown metric {metric}")
    out = df
    radius = prefilter_radius
    if max_distance is not None:
        radius = max_distance if radius is None else min(radius, max_distance)
    if radius is not None:
        # pushed-down window — prunes Hilbert-clustered row groups.
        # euclidean: coordinate-unit bbox; haversine: the literal
        # degree-box (meters radius, antimeridian-wrapped OR) shared
        # with within_geo — the prune that makes radius-capped geo kNN
        # a partial scan instead of a full one.
        if metric == "euclidean":
            out = out.filter(
                (x >= F.lit(qx - radius))
                & (x <= F.lit(qx + radius))
                & (y >= F.lit(qy - radius))
                & (y <= F.lit(qy + radius))
            )
        else:
            from geo_index_spark.operators.search import geo_prefilter_pred

            out = out.filter(geo_prefilter_pred(x, y, qx, qy, radius))
    out = out.withColumn("dist", d)
    if max_distance is not None:
        out = out.filter(F.col("dist") <= F.lit(float(max_distance)))
    return out.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(int(k))
