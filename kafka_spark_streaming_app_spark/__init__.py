"""PySpark-native analytics engine with the query surface of
``nikitamandhan10/kafka-spark-streaming-app`` (streaming e-commerce
analytics: sliding event-time windowed aggregation + rule-based alert
classification over a Kafka JSON stream), extended with the operators a
large-scale LLM-training-data pipeline needs (dedup, similarity search,
text analysis, multimodal columns).

Design stance (see SURVEY.md §7): every operator is a pure
``DataFrame -> DataFrame`` transform built from declarative DataFrame /
SQL primitives so Catalyst owns the physical strategy (pushdown,
broadcast, AQE, whole-stage codegen). The same transform runs in batch
(driver correctness oracle) and streaming (production path) — the
reference app itself demonstrates this duality.
"""

__version__ = "0.1.0"
