from subgraph_extractor_spark.operators import (  # noqa: F401
    asof,
    dedup,
    multimodal,
    similarity,
    text_analysis,
)
