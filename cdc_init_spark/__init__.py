"""cdc_init_spark — a PySpark-native analytics/ETL engine.

A from-scratch reimplementation of the capabilities of the reference
``lymingtonprecision/cdc-init`` (trigger-based CDC bootstrap: control-plane
state machine over a Kafka control topic + snapshot seeding of source tables
into keyed canonical-JSON DML messages), re-expressed Spark-first:

- batch & streaming DataFrame pipelines (no RDDs in the public surface),
- a declared relational operator corpus verified against a DuckDB oracle,
- LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
  text analysis) designed for 100 TB scale.

Layout:
    session    — SparkSession factory tuned for the engine
    tables     — fixture/table loading helpers
    functions/ — column-expression libraries (canonical JSON, text, vectors)
    operators/ — composite operators (dedup, similarity, as-of join, ...)
    plans/     — the declared query corpus (Spark + DuckDB oracle pairs)
    streaming/ — CDC control plane, snapshot seeding, streaming operators
"""

__version__ = "0.1.0"
