"""Distributed spatial operators (DataFrame-in, DataFrame-out).

Each operator is the Spark-native re-expression of a reference operator
(SURVEY.md §2 inventory); hot paths are pure Catalyst column expressions
so the 100 TB plan stays inside whole-stage codegen.
"""

from geo_index_spark.operators.partitioning import (  # noqa: F401
    global_bounds,
    hilbert_partition,
    partition_boxes,
    partitions,
    boxes_at_level,
    str_partition,
    with_str_order,
)
from geo_index_spark.operators.search import (  # noqa: F401
    bbox_search,
    kd_range,
    within,
    within_geo,
)
from geo_index_spark.operators.knn import (  # noqa: F401
    knn,
    knn_boxes,
    knn_geometry,
    knn_join,
)
from geo_index_spark.operators.join import distance_join, spatial_join  # noqa: F401
from geo_index_spark.operators.sessions import sessionize  # noqa: F401
from geo_index_spark.operators.pyramid import tile_pyramid  # noqa: F401
from geo_index_spark.operators.tiling import tile_assign  # noqa: F401
from geo_index_spark.operators.pip import (  # noqa: F401
    point_in_polygon,
    point_in_polygon_join,
    zonal_stats,
)
from geo_index_spark.operators.validate import (  # noqa: F401
    drop_invalid,
    reject_invalid,
    sanitize_lonlat,
)
