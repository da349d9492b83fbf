"""Local (per-Spark-partition) packed index kernels, pure numpy.

These run inside ``mapInArrow`` on executors: each Spark partition builds
its own packed R-tree / kd-tree over its (Hilbert-clustered) slice, so a
1000-executor cluster builds 10^5 local trees in parallel with zero
driver involvement. Nothing here loops per row in Python.
"""

from geo_index_spark.localindex.flatbush import Flatbush  # noqa: F401
from geo_index_spark.localindex.kdbush import KDBush  # noqa: F401
