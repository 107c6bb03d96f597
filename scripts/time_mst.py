"""Quick timing probe: Borůvka at sf0.01 (5000 vertices)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tric_spark.operators.mst import minimum_spanning_forest
from tric_spark.session import get_spark
from tric_spark.sources.doc_graph import doc_edges

spark = get_spark(cores=8, shuffle_partitions=8)
dwe = doc_edges(spark, "/root/testdata/sf0.01").select(
    "src", "dst", ((F.col("src") + F.col("dst")) % 7 + 1).alias("weight")
)
t0 = time.time()
n = minimum_spanning_forest(dwe, rounds=13).count()
print("mst sf0.01 edges", n, "sec", round(time.time() - t0, 1), flush=True)
