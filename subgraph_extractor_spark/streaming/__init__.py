from subgraph_extractor_spark.streaming.demo import (  # noqa: F401
    sessionized_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
