"""cli_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities surveyed from the ``gmalt/cli`` reference (see SURVEY.md;
the reference mount is empty, so SURVEY.md §2 is the binding operator
inventory), extended with the mandated LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Layout:
    session.py   — SparkSession factory (UTC, ns-timestamp cfg, AQE)
    tables.py    — canonical loaders for the driver's parquet tables
    operators/   — relational, dedup, similarity, text, as-of join
    sources/     — HGT (SRTM) binary source, multimodal binary columns
    functions/   — scalar/vector helper expressions
    plans/       — query registry (name -> Spark callable + oracle SQL)
    streaming/   — structured-streaming operators (batch-form + true)
"""

__version__ = "0.1.0"
