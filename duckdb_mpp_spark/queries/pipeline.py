"""LLM-training-data pipeline operators (dedup / similarity / text analysis /
multimodal) — registered in duckdb_mpp_spark.operators and re-exported here.
"""

from duckdb_mpp_spark.operators import register_pipeline_queries

register_pipeline_queries()
