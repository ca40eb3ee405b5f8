"""sources/warc.py — WARC crawl-archive ingestion (binary container
parsing has no SQL face, so this is pytest-verified like the
webdataset and export-source readers; SURVEY §5 form)."""

import gzip

from subgraph_extractor_spark.operators import html as H
from subgraph_extractor_spark.sources import warc as W


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
        + b"\r\nServer: x\r\n\r\n" + body
    )


def _records():
    return [
        {
            "warc_type": "warcinfo",
            "record_id": "<urn:uuid:0>",
            "warc_date": "2026-01-01T00:00:00Z",
            "content_type": "application/warc-fields",
            "payload": b"software: synth\r\n",
        },
        {
            "warc_type": "request",
            "record_id": "<urn:uuid:1>",
            "target_uri": "http://a.example/page",
            "warc_date": "2026-01-01T00:00:01Z",
            "content_type": "application/http;msgtype=request",
            "payload": b"GET /page HTTP/1.1\r\nHost: a.example\r\n\r\n",
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:2>",
            "target_uri": "http://a.example/page",
            "warc_date": "2026-01-01T00:00:02Z",
            "content_type": "application/http;msgtype=response",
            "payload": _http(
                b"<html><body><nav><a href='/'>H</a></nav>"
                b"<p>real content here</p></body></html>"
            ),
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:3>",
            "target_uri": "http://b.example/",
            "warc_date": "2026-01-01T00:00:03Z",
            "content_type": "application/http;msgtype=response",
            "payload": _http(b"<p>second page</p>"),
        },
    ]


def test_roundtrip_plain_and_gzip_members():
    recs = _records()
    for gz in (False, True):
        data = W.encode_warc(recs, gzip_members=gz)
        parsed = list(W.parse_warc_bytes(data))
        assert [r["warc_type"] for r in parsed] == [
            "warcinfo", "request", "response", "response",
        ]
        assert parsed[2]["target_uri"] == "http://a.example/page"
        assert parsed[2]["payload"] == recs[2]["payload"]
    # whole-file gzip also decompresses through the same entry
    whole = gzip.compress(W.encode_warc(recs))
    assert len(list(W.parse_warc_bytes(whole))) == 4


def test_salvage_on_garbage_and_truncation():
    data = W.encode_warc(_records())
    # garbage tail: every record before it still parses
    assert len(list(W.parse_warc_bytes(data + b"NOT A RECORD"))) == 4
    # truncated final payload: parse stops at the last whole record
    assert len(list(W.parse_warc_bytes(data[:-30]))) == 3
    assert list(W.parse_warc_bytes(b"")) == []
    assert list(W.parse_warc_bytes(b"\x1f\x8bbroken gzip")) == []


def test_http_response_split():
    st, ct, body = W.http_response(_http(b"abc", "text/html; charset=utf-8"))
    assert (st, ct, body) == (200, "text/html; charset=utf-8", b"abc")
    # malformed head degrades to body salvage
    assert W.http_response(b"no headers here") == (0, "", b"no headers here")


def test_streaming_reader_matches_batch_and_is_incremental(spark, tmp_path):
    """read_warc_stream == read_warc over the same archives, and a
    restarted stream (same checkpoint) processes ONLY newly landed
    archives — the exactly-once continual-ingestion contract."""
    import os

    src = tmp_path / "drop"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    (src / "a.warc").write_bytes(W.encode_warc(_records()))

    def drain():
        q = (
            W.read_warc_stream(spark, str(src) + "/*.warc*")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    drain()
    first = spark.read.parquet(str(out)).collect()
    assert len(first) == 2  # a.warc's two response records
    # second archive lands; restart processes only the delta
    (src / "b.warc.gz").write_bytes(
        W.encode_warc(_records(), gzip_members=True)
    )
    drain()
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 4
    batch = W.read_warc(spark, str(src) + "/*.warc*").collect()
    key = lambda r: (r["target_uri"], r["record_id"], bytes(r["payload"]))
    assert sorted(map(key, rows)) == sorted(map(key, batch))
    assert os.path.isdir(ckpt)


def test_spark_reader_and_crawl_chain(spark, tmp_path):
    # two archives (one plain, one gzip-membered), one task each
    (tmp_path / "a.warc").write_bytes(W.encode_warc(_records()))
    (tmp_path / "b.warc.gz").write_bytes(
        W.encode_warc(_records(), gzip_members=True)
    )
    df = W.read_warc(spark, str(tmp_path / "*.warc*"))
    rows = df.collect()
    # default filter keeps only response records: 2 per archive
    assert len(rows) == 4
    assert {r["warc_type"] for r in rows} == {"response"}
    assert {r["target_uri"] for r in rows} == {
        "http://a.example/page", "http://b.example/",
    }
    # full ingestion chain: HTTP split -> decode -> main-text extraction
    split = W.with_http_body(df)
    texts = {
        r["target_uri"]: H.extract_main_text_str(
            bytes(r["body"]).decode("utf-8")
        )
        for r in split.collect()
    }
    assert texts["http://a.example/page"] == "real content here"
    assert texts["http://b.example/"] == "second page"
    assert all(r["http_status"] == 200 for r in split.collect())
    # types=None keeps every record
    assert W.read_warc(spark, str(tmp_path / "a.warc"), types=None).count() == 4
