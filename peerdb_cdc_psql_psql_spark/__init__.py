"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference CDC pipeline (khoirulamars/peerdb-cdc-psql-psql).

Everything here is a Spark-first re-expression of the reference's
semantics (see SURVEY.md): batch relational operators, a Structured
Streaming CDC mirror (snapshot + log-tail + keyed merge with soft
delete), monitoring/reconciliation analytics, and an LLM-data-pipeline
extension pack (dedup / similarity / text analysis / multimodal).
"""

__version__ = "0.1.0"
