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


def _scripted(lines):
    it = iter(lines)

    def input_fn(prompt=""):
        try:
            return next(it)
        except StopIteration:  # pragma: no cover - test bug guard
            raise AssertionError(f"prompt loop asked beyond script: {prompt}")

    return input_fn


def test_interactive_all_defaults_equals_noninteractive(spark):
    """VERDICT r10 task #7 (reference config_generator, cli.py:383-487):
    walking the two menus accepting every default must emit a config
    IDENTICAL to the non-interactive path."""
    from subgraph_extractor_spark.config_suggest import interactive_config

    tables = {"alpha": _entity(spark, 3, 10**19), "beta": _entity(spark, 3, 7)}
    echoed: list[str] = []
    # menu 1: '' = all tables; menu 2 (x2, one per table): '' = map all
    conf = interactive_config(
        "sugg", "0.0.1", "QmS", tables,
        input_fn=_scripted(["", "", ""]), echo=echoed.append,
    )
    assert conf == suggest_config("sugg", "0.0.1", "QmS", tables)
    assert any("select the tables" in m for m in echoed)


def test_interactive_preview_and_selection(spark):
    """'p <i>' previews LIMIT 10 without consuming the selection; a
    comma pick restricts tables; 'none' keeps numerics as bytes
    (numeric_columns stays — the reference's bytes fallback — while
    column_mappings is dropped)."""
    from subgraph_extractor_spark.config_suggest import interactive_config

    tables = {"alpha": _entity(spark, 15, 10**19), "beta": _entity(spark, 3, 7)}
    echoed: list[str] = []
    conf = interactive_config(
        "sugg", "0.0.1", "QmS", tables,
        input_fn=_scripted(["p 0", "alpha", "none"]),
        echo=echoed.append,
    )
    preview = next(m for m in echoed if "_block_number" in m and "0x" in m)
    assert len(preview.splitlines()) <= 11 + 1  # LIMIT 10 (+ header)
    assert list(conf["tables"]) == ["alpha"]
    tc = conf["tables"]["alpha"]
    assert tc["numeric_columns"] == ["amount"]
    assert "column_mappings" not in tc


def test_interactive_reprompts_on_bad_input(spark):
    from subgraph_extractor_spark.config_suggest import interactive_config

    tables = {"alpha": _entity(spark, 3, 10**19)}
    conf = interactive_config(
        "sugg", "0.0.1", "QmS", tables,
        input_fn=_scripted(["nosuch", "0", "7", "all"]),
        echo=lambda *_: None,
    )
    assert list(conf["tables"]) == ["alpha"]
    assert "column_mappings" in conf["tables"]["alpha"]


def test_interactive_reprompts_on_out_of_range_index(spark):
    """A numeric pick past the end of the menu re-prompts like a bad
    name does (it used to raise IndexError and abort the whole run),
    for both the 'p <i>' preview and the selection list."""
    from subgraph_extractor_spark.config_suggest import interactive_config

    tables = {"alpha": _entity(spark, 3, 10**19)}
    echoed: list[str] = []
    conf = interactive_config(
        "sugg", "0.0.1", "QmS", tables,
        input_fn=_scripted(["p 9", "9", "0", "all"]),
        echo=echoed.append,
    )
    assert sum("no such table" in m for m in echoed) == 2
    assert list(conf["tables"]) == ["alpha"]


def test_interactive_cli_flag_writes_identical_yaml(spark, tmp_path, monkeypatch):
    """suggest-config --interactive with scripted stdin produces a YAML
    file byte-identical to the non-interactive invocation."""
    import sys

    import yaml

    from subgraph_extractor_spark import cli

    src = str(tmp_path / "tables")
    os.makedirs(src)
    _entity(spark, 5, 10**19).write.mode("overwrite").parquet(
        os.path.join(src, "alpha.parquet")
    )
    out_i = str(tmp_path / "conf_i.yaml")
    out_n = str(tmp_path / "conf_n.yaml")
    base = ["suggest-config", "--tables-dir", src, "--name", "sugg",
            "--subgraph", "QmS"]
    # In-process CLI runs must leave the host application's session
    # alone: get_spark() returns the active session verbatim (no
    # getOrCreate conf re-application — the r11 shuffle.partitions
    # 8 -> 32 leak class) and the command skips spark.stop() for a
    # session it did not create.  stop is instrumented, NOT no-opped:
    # a call here is the bug this test pins.
    stop_calls: list[bool] = []
    real_stop = type(spark).stop
    monkeypatch.setattr(
        type(spark), "stop", lambda self: stop_calls.append(True)
    )
    shuffle_before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        assert cli.main([*base, "--output", out_n]) == 0
        import io
        monkeypatch.setattr(sys, "stdin", io.StringIO("\n\n"))
        monkeypatch.setattr("builtins.input", lambda prompt="": "")
        assert cli.main([*base, "--output", out_i, "--interactive"]) == 0
        assert stop_calls == []  # library run never stops the host session
        assert (
            spark.conf.get("spark.sql.shuffle.partitions") == shuffle_before
        )
    finally:
        monkeypatch.setattr(type(spark), "stop", real_stop)
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_before)
    with open(out_n) as a, open(out_i) as b:
        na, nb = yaml.safe_load(a), yaml.safe_load(b)
    assert na == nb
