def register_pipeline_queries() -> None:
    """Import-time registration of all pipeline-operator gate queries."""
    from duckdb_mpp_spark.operators import corpus, curation, dedup, multimodal, similarity, text  # noqa: F401
