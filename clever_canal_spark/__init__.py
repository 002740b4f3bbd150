"""clever_canal_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine with the semantics of the reference Canal node (Lzw2016/clever-canal).

Not a port: the reference's ring-buffer/thread architecture is replaced by
Spark Structured Streaming micro-batches; its client ack/rollback protocol by
an idempotent epoch-commit protocol over an atomic-snapshot lake table; its
TableMeta TSDB by the lake table's schema history.

Subpackages
-----------
- ``model``       change-event data model (StructTypes)    [ref: EntryProtocol.proto]
- ``gen``         deterministic synthetic change-event feed generator
- ``lake``        parquet + JSON-log table format: atomic snapshots,
                  bucket-partitioned copy-on-write MERGE, schema evolution,
                  time travel                               [replaces Iceberg in-sandbox]
- ``filters``     Canal regex table filters / projections   [ref: AviaterRegexFilter.java]
- ``operators``   LWW dedup (plain + salted), webtext dedup, similarity, text
- ``functions``   vectorized pandas/Arrow UDF transforms (html→text, lang)
- ``plans``       apply_epoch (the foreachBatch core), DDL apply, metrics
- ``streaming``   readStream → foreachBatch wiring, checkpoint resume
"""

__version__ = "0.1.0"
