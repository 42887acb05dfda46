"""geo_big_data_analysis_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``jacktaolai/geo-big-data-analysis``
(pandas/GeoPandas/scikit geospatial lab pipelines), designed for 100 TB
scale: declarative DataFrame/SQL plans (Catalyst-optimized), broadcast
joins for small dimensions, grid-partitioned spatial joins, and
Arrow-batched pandas UDFs only where built-ins cannot express the
semantics.

Layout
------
- ``session``      : SparkSession bootstrap with engine defaults
- ``functions``    : scalar column-expression libraries (temporal/geo/text/stats)
- ``operators``    : relational + spatial + dedup/similarity operators
- ``graph``        : nodes/edges graph analytics (degree, weighted SSSP, isochrone)
- ``ml``           : Spark ML pipelines + metrics (RMSLE etc.)
- ``sources``      : readers/writers (CSV/NDJSON/GeoJSON conventions)
- ``streaming``    : Structured Streaming variants of the temporal operators
- ``multimodal``   : binary-column (image/audio) plumbing with stubbed decode
"""

__version__ = "0.1.0"
