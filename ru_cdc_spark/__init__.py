"""ru_cdc_spark — a PySpark-native analytics & CDC engine.

A brand-new engine with the query/data-processing capabilities of the
reference CDC pipeline (ipconfiger/ru-cdc, surveyed in /root/repo/SURVEY.md),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the change stream, and a scale-oriented operator library
(dedup, similarity search, text analysis, multimodal plumbing) designed for
1000-executor / 100 TB deployments while remaining testable on local[32].

Layout:
  config.py      — pipeline config model + wildcard routing (reference
                   src/config.rs semantics)
  session.py     — SparkSession factory with scale-aware defaults
  functions/     — scalar-function library (MySQL type semantics, text,
                   vector math)
  operators/     — relational + CDC + LLM-pipeline operators, each a
                   DataFrame -> DataFrame transform
  sources/       — readers and the deterministic CDC change-stream derivation
  streaming/     — Structured Streaming pipeline, sinks, metrics listener
  plans/         — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
