"""energy_datalake_solution_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the semantic surface of the
reference repo ``estebanvasquez261/energy-datalake-solution`` (an AWS
medallion data-lake: Lambda ingest -> Glue ETL -> Redshift upsert -> Athena
queries), re-homed entirely onto open PySpark DataFrame/SQL over Parquet,
plus LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Layout:
  plans/      query registry + session config + plan introspection
  sources/    catalog readers, file ingest routing, partitioned sinks, merge
  functions/  scalar/vector helper column expressions
  operators/  the query surface (relational, events, text, dedup, similarity)
  streaming/  Structured Streaming pipelines (file ingest, windowed aggs)
"""

__version__ = "0.1.0"
