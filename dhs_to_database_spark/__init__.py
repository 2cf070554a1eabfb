"""dhs_to_database_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of the
reference ``harry-gibson/DHS-To-Database`` pipeline (CSPro hierarchical survey
data -> relational query surface), re-expressed Spark-first:

- ``sources``    : fixed-width multi-table demux, CSPro DCF dictionary parsing,
                   CSV/parquet/JDBC readers (SURVEY.md §2.A A1-A20, §2.B B1-B4).
- ``operators``  : the relational operator pack (§2.B), metadata/reconciliation
                   operators (§2.A A19-A33), plus the LLM-data-pipeline
                   extensions (§2.D): dedup, similarity search, text analysis.
- ``functions``  : scalar/vector helpers built on ``pyspark.sql.functions``.
- ``plans``      : schema-evolution / incremental-load orchestration (§2.A
                   A21-A30) — union-of-columns schemas, partition overwrite,
                   JSON/map packing decisions.
- ``streaming``  : Structured Streaming surface over the ``events`` table
                   (watermarks, tumbling/sliding/session windows, stateful
                   dedup).

Everything is DataFrame/Catalyst-first: declarative plans, broadcast joins for
small dimensions, partition pruning on ``surveyid``, AQE for skew. Python UDFs
appear only where Spark builtins genuinely cannot express the semantics (the
sequential CSPro dictionary parser), and then as Arrow-batched operations.
"""

__version__ = "0.1.0"
