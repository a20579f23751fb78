"""asvsp_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference MarkoMrdja/ASVSP (see SURVEY.md): a layered
batch rollup hierarchy (daily -> monthly -> annual + statistical baselines),
ten analytic window-function queries, five streaming queries
(stream-static joins, tumbling/sliding windows), plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Design stance (SURVEY §7.0): every operator is a pure
``DataFrame -> DataFrame`` transform; I/O lives at the edges; Catalyst does
the optimizing — we express plans declaratively (built-in functions, no
row-at-a-time Python UDFs in hot paths) and keep joins broadcast-able and
aggregations partial-aggregatable so plans survive a 100TB scale-up.
"""

__version__ = "0.1.0"
