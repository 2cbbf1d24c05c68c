"""house_price_etl_pipeline_spark — a PySpark-native analytics engine.

From-scratch rebuild of the query/data-processing capabilities of
``ashleycheng/house-price-etl-pipeline`` (reference at /root/reference,
surveyed in SURVEY.md), re-expressed Spark-first:

- ``sources``   — loaders (reference-shaped house-price CSV; driver testdata parquet)
- ``functions`` — scalar expression library (Minguo dates, city map, decimal-exact aggs)
- ``operators`` — ETL pipelines, relational menu, dedup, similarity, text, multimodal
- ``plans``     — the query catalog consumed by ``__spark_entry__.py``
- ``streaming`` — Structured Streaming ingest + event-time windows

Design stance (SURVEY §7.1): DataFrame/SQL only, zero row-at-a-time Python
UDFs on the hot path, Catalyst is the IR, every operator designed for a
1000-executor / 100 TB deployment even though tests run on local[32].
"""

__version__ = "0.1.0"
