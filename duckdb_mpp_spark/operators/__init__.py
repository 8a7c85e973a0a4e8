def register_pipeline_queries() -> None:
    """Import-time registration of all pipeline-operator gate queries."""
    from duckdb_mpp_spark.operators import (  # noqa: F401
        corpus,
        curation,
        dedup,
        graph,
        multimodal,
        similarity,
        skew,
        substrings,
        text,
    )
