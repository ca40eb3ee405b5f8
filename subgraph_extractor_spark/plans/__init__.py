from subgraph_extractor_spark.plans.partitions import (  # noqa: F401
    Partition,
    get_partitions,
    plan_delta,
)
from subgraph_extractor_spark.plans.watermark import (  # noqa: F401
    read_watermark,
    write_watermark,
)
from subgraph_extractor_spark.plans.config_gate import (  # noqa: F401
    ConfigMismatchError,
    ensure_config_unchanged,
)
from subgraph_extractor_spark.plans.manifest import (  # noqa: F401
    write_consolidated_metadata,
)
