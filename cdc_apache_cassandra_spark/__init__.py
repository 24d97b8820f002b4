"""cdc_apache_cassandra_spark — a PySpark-native engine with the query and
data-processing capabilities of datastax/cdc-apache-cassandra.

The reference (see /root/repo/SURVEY.md) is a Cassandra CDC pipeline:
commitlog events -> per-table keyed event topic -> dedup (MutationCache)
-> read-after-event point lookup -> keyed data topic with tombstones.

This package re-expresses that surface Spark-first:

- ``sources``      event-stream generation/ingest, backfill union (SURVEY §2.1)
- ``functions``    CQL logical type system + scalar conversions (SURVEY §1.2, §2.8)
- ``operators``    dedup, last-write-wins, read-after-event join, classifiers
                   (SURVEY §2.2-2.7), plus the LLM-pipeline operators:
                   ``text_dedup`` (shingles/MinHash/SimHash/components),
                   ``vectors`` (cosine/LSH/IVF), ``multimodal`` (binary
                   payloads), ``skew`` (salting)
- ``streaming``    Structured Streaming pipeline + stateful mutation cache
- ``plans``        query registry consumed by __spark_entry__ (driver contract)

Everything is a pure DataFrame -> DataFrame function usable in both batch
(`spark.read`) and streaming (`spark.readStream`) mode — mirroring the
reference's backfill/live unification (SURVEY §7.1).
"""

__version__ = "0.1.0"
