"""migration_pair_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference system
(vieira-andre/migration-pair "Mycenae", a C# Cassandra table copier at
/root/reference) as an idiomatic Spark engine:

- binlog/WAL-style change stream -> last-writer-wins keyed upserts into a
  snapshot-committed lake table (Iceberg-semantics; see ``lakehouse``),
- exactly-once application via a monotone LSN watermark committed atomically
  with each snapshot (reference analog: idempotent Cassandra LWW INSERTs,
  /root/reference/Tasks/MigrationTask.cs:118-151),
- salted-key repartition to break hot-key skew before the LWW window,
- mid-stream schema evolution (add / rename / widen),
- vectorized (Arrow / pandas-UDF) text extraction — no per-row Python,
- per-batch lineage + metrics (reference analog: the ExecutionTimeMeasured
  aspect, /root/reference/Aspects/ExecutionTimeMeasured.cs:8-30),
- plus the training-data-pipeline operator library (dedup family, similarity
  search, text analysis, multimodal plumbing).

Everything is DataFrame/SQL-first: Catalyst plans the physical execution;
custom logic lives in driver-side batch application code, never in per-row
Python.
"""

__version__ = "0.1.0"
