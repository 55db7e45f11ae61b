"""PySpark-native analytics engine with the query and data-processing
capabilities of the ``ecvergis/m2-b3-market-data-pipeline`` reference,
re-expressed Spark-first (DataFrame / SQL / Catalyst / Structured Streaming).

Layout
------
- ``session``    SparkSession factory with scale-aware defaults (AQE, Arrow).
- ``sources``    Parquet/catalog I/O: partitioned read/write, empty guards.
- ``operators``  Core relational + expansion operators (normalize, rolling,
                 aggregates, dedup, similarity, text, multimodal, temporal).
- ``plans``      End-to-end pipelines and the registered query surface.
- ``streaming``  Structured Streaming equivalents of the reference's
                 S3-event -> Lambda -> Glue orchestration.

Reference parity is documented per-function with ``/root/reference``
file:line citations; architecture is deliberately *not* a translation
(the reference is single-process pandas inside a Glue container).
"""

__version__ = "0.1.0"
