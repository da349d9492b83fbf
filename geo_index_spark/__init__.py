"""geo_index_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch distributed re-expression of the query surface of
``kylebarron/geo-index`` (packed Hilbert R-tree / implicit kd-tree):

* bbox intersection-candidate search           (reference src/rtree/trait.rs:113-165)
* kd range / radius queries                    (reference src/kdtree/trait.rs:37-174)
* kNN ordered by distance, euclid/haversine    (reference src/rtree/trait.rs:198-302)
* dual-tree intersection-candidate join        (reference src/rtree/traversal.rs:262-370)
* Hilbert spatial partitioning / partition_boxes
                                               (reference python/src/rtree/partitions.rs)
plus the north-rule surface the reference delegates downstream:
point-in-polygon refinement, S2-style quad tiling, raster<->vector zonal
joins, HTML->text geotag extraction, and web-scale text/dedup operators.

Architecture is Spark-first: DataFrame/Catalyst plans, JVM-side column
expressions for every hot-path scalar (including the Hilbert key), Arrow
``mapInArrow``/pandas UDFs only where an operator genuinely needs
per-partition imperative logic (local packed-index kernels).
"""

__version__ = "0.1.0"

from geo_index_spark.session import get_spark  # noqa: F401
