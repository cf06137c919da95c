"""adenhq_hive_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of joncode/adenhq-hive.

The reference (read-only at /root/reference/) delegates its SQL surface to
embedded engines (DuckDB over CSV/Excel, BigQuery) and runs a dataflow/
streaming agent runtime around them.  This package re-expresses that whole
capability surface Spark-first:

- ``session``   — tuned SparkSession bootstrap (AQE, UTC, arrow).
- ``catalog``   — explicit StructType schemas for the testdata tables and
  temp-view registration (SURVEY.md §1).
- ``engine``    — ``Engine.sql() -> ResultEnvelope``: the reference's
  ``{success, columns, rows, row_count}`` envelope
  (reference csv_tool.py:368-376) over Spark SQL, with the read-only
  query gate (csv_tool.py:333-352 re-done on the parsed plan).
- ``queries``   — the declared Q1-Q60 correctness contract plus the
  LLM-data-pipeline query set (dedup / similarity / text analysis).
- ``operators`` — as-of join, dedup tiers (exact / minhash-LSH / simhash /
  n-gram jaccard), similarity search, text analysis, multimodal plumbing.
- ``functions`` — safe_eval expression compiler → Spark SQL, heuristic
  JSON repair (reference output_cleaner.py:19-59, node.py:33-138).
- ``sources``   — csv/excel/data tool-parity wrappers (csv_tool.py,
  excel_tool.py, data_tools.py API contracts).
- ``streaming`` — Structured Streaming images of the reference's event
  bus / execution-stream runtime (event_bus.py, execution_stream.py).
"""

__version__ = "0.1.0"
