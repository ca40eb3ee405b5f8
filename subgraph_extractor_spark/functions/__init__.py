from subgraph_extractor_spark.functions.uint256 import (  # noqa: F401
    uint256_to_be_bytes,
    be_bytes_to_decimal38,
    uint256_hex_from_decimal,
)
from subgraph_extractor_spark.functions.mappings import (  # noqa: F401
    SPARK_TYPE_FOR_MAPPING,
    compile_column_mappings,
    downscale,
    clamp,
    validity,
)
