"""tric_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the reference `sg0/tric` (MPI/C++ exact
distributed triangle counting, /root/reference) Spark-first, and extends it
per the project north rule with PageRank, connected components, label
propagation, explicit skew handling, checkpointed supersteps, and the
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Layout
------
- ``session``            SparkSession builder (AQE, Arrow, tuned shuffle)
- ``synth``              deterministic Common-Crawl-style pages + edge synth
- ``extract``            pinned HTML→text/outlink extractor + pandas UDFs
- ``graph``              edge-table normalization, orientation, degrees, ids
- ``sources``            binary CSR (karate.bin) reader, parquet loaders
- ``operators``          tc, pagerank, cc, lp, dedup, similarity, textstats,
                         multimodal
- ``functions``          portable hashes, vector math helpers
- ``plans``              partitioning/skew (salting, 2-D edge grid, stats)
- ``streaming``          superstep driver with checkpoint/resume; streaming
"""

__version__ = "0.1.0"
