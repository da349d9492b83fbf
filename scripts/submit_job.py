"""spark-submit smoke job: proves --py-files deployability."""
from pyspark.sql import SparkSession, functions as F
from geo_index_spark.operators import spatial_join, knn
from geo_index_spark.operators.partitioning import hilbert_partition

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
    "event_id", F.col("value").alias("x"), F.col("user_id").cast("double").alias("y"))
hp = hilbert_partition(ev, 4, cols=("x", "y"))
print("HILBERT_ROWS", hp.count())
print("KNN_TOP", [r.event_id for r in knn(ev, 100.0, 50.0, 5, id_col="event_id").collect()])
boxes = ev.select(F.col("event_id").alias("row_id"),
    (F.col("x")-1).alias("minx"), (F.col("y")-1).alias("miny"),
    (F.col("x")+1).alias("maxx"), (F.col("y")+1).alias("maxy"))
print("JOIN_PAIRS", spatial_join(boxes, boxes, grid_level=6).count())
spark.stop()
