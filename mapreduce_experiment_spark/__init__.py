"""mapreduce_experiment_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference repo
``chuuyaa/mapreduce-experiment`` (a Spark-on-YARN triangle-enumeration
workload; see SURVEY.md), extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns, event
sessionization) designed for 100 TB scale.

Design principles (see SURVEY.md §1.2, §4.2):

- DataFrame/SQL first: every operator is a declarative Catalyst plan;
  no hand-scheduled RDD lineages, no sentinel-tagged manual joins
  (reference mapreducePredictionTwitter100.java:52-87), no
  collect-to-driver in any engine path.
- Pandas UDFs only where built-ins genuinely can't express the
  semantics (multimodal decode); everything else stays JVM-side in
  whole-stage codegen.
- Explicit partitioning/broadcast/AQE knobs set once in
  :mod:`.session`, not per query.
"""

__version__ = "0.1.0"
