from subgraph_extractor_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    range_scan,
)
from subgraph_extractor_spark.sources import warc, webdataset  # noqa: F401
