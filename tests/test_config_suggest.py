"""Config suggestion (reference config-generator defaults, cli.py:450-484)
and a two-table end-to-end extraction driven by a suggested config."""

import decimal
import os

import pyarrow.dataset as pads
from pyspark.sql import functions as F
from pyspark.sql import types as T

from subgraph_extractor_spark.config_suggest import (
    DEFAULT_PARTITION_SIZES,
    suggest_config,
    suggest_table_config,
)
from subgraph_extractor_spark.extract import run_extraction


def _entity(spark, n, price_base):
    schema = T.StructType(
        [
            T.StructField("vid", T.LongType()),
            T.StructField("_block_number", T.LongType()),
            T.StructField("id", T.StringType()),
            T.StructField("amount", T.DecimalType(38, 0)),
        ]
    )
    rows = [
        (i, 18_000_000 + i * 1009, f"0x{i:03x}", decimal.Decimal(price_base + i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema)


def test_suggest_table_config_defaults(spark):
    df = _entity(spark, 3, 10**19)
    conf = suggest_table_config(df)
    assert conf["partition_sizes"] == DEFAULT_PARTITION_SIZES
    assert conf["numeric_columns"] == ["amount"]
    assert conf["drop_columns"] == ["vid"]  # reference cli.py:53
    mapping = conf["column_mappings"]["amount"]["amount_uint64"]
    assert mapping["type"] == "uint64"
    assert mapping["max_value"] == 2**64 - 1
    assert mapping["validity_column"] == "amount_uint64_valid"


def test_two_table_extraction_with_suggested_config(spark, tmp_path):
    t1 = _entity(spark, 40, 10**19)
    t2 = _entity(spark, 25, 2**64 - 10)  # crosses uint64-max -> clamps
    cfg = suggest_config(
        "sugg", "1", "QmS", {"alpha": t1, "beta": t2},
        partition_sizes=[32768, 1024],
    )
    out = str(tmp_path)
    run_extraction(spark, cfg, {"alpha": t1, "beta": t2}, out, 18_000_000, 18_060_000)

    for table, src in [("alpha", t1), ("beta", t2)]:
        td = os.path.join(out, "sugg", "1", "data", "subgraph=QmS", f"table={table}")
        data = pads.parquet_dataset(os.path.join(td, "_metadata")).to_table()
        expect = src.filter(
            F.col("_block_number") < (18_060_000 // 1024) * 1024
        ).count()
        assert data.num_rows == expect
        cols = set(data.column_names)
        assert {"amount", "amount_uint64", "amount_uint64_valid"} <= cols
        # original kept as 32-byte bytes
        vals = [v for v in data.column("amount").to_pylist() if v is not None]
        assert all(len(v) == 32 for v in vals)

    # clamp semantics on the table crossing uint64-max
    td2 = os.path.join(out, "sugg", "1", "data", "subgraph=QmS", "table=beta")
    t = pads.parquet_dataset(os.path.join(td2, "_metadata")).to_table()
    pairs = list(
        zip(t.column("amount_uint64").to_pylist(), t.column("amount_uint64_valid").to_pylist())
    )
    assert any(v is False and int(a) == 0 for a, v in pairs)  # clamped
    assert any(v is True for _, v in pairs)
