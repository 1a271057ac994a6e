"""energy_data_pipeline_project_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference medallion ETL pipeline
(dhouha-hmem/Energy_Data_Pipeline_project), generalized into a real
engine:

- ``session``    — SparkSession factory (pinned UTC session TZ, AQE on).
- ``schemas``    — every explicit StructType schema in one place.
- ``sources``    — testdata parquet loaders, fixture payload generator,
                   LocalJsonSource / RestSource for the medallion flow.
- ``pipeline``   — config-driven bronze→silver→gold medallion engine.
- ``operators``  — the query surface: relational, dedup, similarity,
                   text analysis, multimodal.
- ``functions``  — reusable Column builders (hashing, vector math).
- ``plans``      — physical-plan inspection helpers (scale posture).
- ``streaming``  — Structured Streaming jobs mirroring the batch ops.

Everything is built on DataFrame/Catalyst primitives; Python UDFs are
avoided in hot paths (Arrow-vectorized pandas functions only where
built-ins cannot express the semantics).
"""

__version__ = "0.1.0"
