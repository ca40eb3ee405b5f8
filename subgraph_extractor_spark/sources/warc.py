"""WARC (Web ARChive, ISO 28500) crawl-archive ingestion.

Web-scale pretraining corpora arrive as WARC files (Common Crawl ships
~100 TB/snapshot of them), so WARC→rows is the missing first hop in
front of the crawl-to-corpus chain (``operators/html.py`` extraction →
quality gates → dedup → sampling).  This module gives the engine that
container format with stdlib ``gzip``/byte parsing only — no warcio
dependency — shaped like the WebDataset reader (``webdataset.py``):

- **Reader**: ``spark.read.format("binaryFile")`` over the file glob
  (one task per archive — WARC files are the unit of parallelism, and
  Common Crawl sizes them ~1 GiB for exactly this reason), then one
  ``mapInPandas`` pass parses records into
  ``(warc_path, warc_type, record_id, target_uri, warc_date,
  content_type, payload)`` rows.  Gzip is handled transparently —
  both the per-record-member form the spec recommends (concatenated
  gzip members, one per record) and whole-file gzip decompress through
  the same call (stdlib ``gzip.decompress`` consumes concatenated
  members).  Bytes never touch the driver.
- **HTTP splitting**: a ``response`` record's payload is a raw HTTP
  response; :func:`http_response` (pure) and :func:`with_http_body`
  (Arrow kernel) split status / Content-Type / body so the body can
  feed ``html.extract_main_text`` directly.
- **Writer**: :func:`encode_warc` builds spec-shaped archives (pure
  function over record dicts, optional per-record gzip members) — the
  test fixture face and the export face for small curated archives;
  crawl-scale WARC *production* belongs to the crawler, not the
  analytics engine.

Malformed input posture (the crawl reality): a record with a bad
header block or a truncated payload ends that FILE's parse at the last
well-formed record boundary — never a task failure; the reader is a
salvage operation over whatever is parseable, like ``html.parser``
extraction.

At 100 TB: archives are the parallelism unit (one binaryFile blob =
one task, held in memory while parsing — the webdataset shard-size
contract applies, and Common Crawl's ~1 GiB sizing fits executor
memory comfortably); record filtering (``types=("response",)``) prunes
request/metadata records inside the kernel before anything is emitted.

Cross-reference: SURVEY.md §2 S10-S12 (source formats); the reference
itself reads only Postgres (cli.py:38-91) — WARC is part of the
mandated [ext] training-data surface.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_path", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    """WARC named fields: ``Name: value`` lines, names case-insensitive
    (normalized to lower); continuation lines are not in the wild
    subset we target and are treated as malformed."""
    out: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        name, sep, val = line.partition(b":")
        if not sep:
            raise ValueError("malformed header line")
        out[name.decode("ascii", "replace").strip().lower()] = val.decode(
            "utf-8", "replace"
        ).strip()
    return out


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Parse one (possibly gzipped) WARC archive into record dicts —
    the pure kernel body.  Yields until exhaustion or the first
    malformed boundary (salvage posture, see module docstring)."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)  # consumes concatenated members
        except Exception:
            return
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            return  # garbage tail — salvage what we have
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        try:
            version_end = data.index(_CRLF, pos)
            headers = _parse_headers(data[version_end + 2 : head_end])
            length = int(headers["content-length"])
        except Exception:
            return
        body_start = head_end + 4
        if body_start + length > n:
            return  # truncated payload
        yield {
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "payload": data[body_start : body_start + length],
        }
        pos = body_start + length


def read_warc(
    spark: SparkSession,
    path_glob: str,
    types: tuple[str, ...] | None = ("response",),
) -> DataFrame:
    """Distributed WARC reader: one task per archive file, records as
    rows (``WARC_SCHEMA``).  ``types`` filters record types inside the
    kernel (``None`` keeps everything); the default keeps only
    ``response`` records — the payload-bearing rows a corpus pipeline
    wants."""
    keep = None if types is None else set(types)
    files = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
    )

    def gen(batches):
        for pdf in batches:
            cols: dict[str, list] = {
                f.name: [] for f in WARC_SCHEMA.fields
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    if keep is not None and rec["warc_type"] not in keep:
                        continue
                    cols["warc_path"].append(path)
                    for k in (
                        "warc_type", "record_id", "target_uri",
                        "warc_date", "content_type",
                    ):
                        cols[k].append(rec[k])
                    cols["payload"].append(rec["payload"])
            yield pd.DataFrame(cols)

    return files.mapInPandas(gen, schema=WARC_SCHEMA)


def read_warc_stream(
    spark: SparkSession,
    path_glob: str,
    types: tuple[str, ...] | None = ("response",),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_warc` — the continual-ingestion
    face: crawl archives LAND continuously (a crawler drops one file
    per fetch batch), and this turns each newly arrived archive into
    record rows exactly once (Structured Streaming file-source
    tracking).  Same schema and kernel as the batch reader, so
    downstream foreachBatch pipelines (extraction → quality → the
    incremental dedup/index sinks in ``streaming/``) compose
    unchanged; ``max_files_per_trigger`` bounds per-batch memory (one
    archive is one in-memory blob, the webdataset contract)."""
    keep = None if types is None else set(types)
    # streaming sources need an explicit schema; binaryFile's is fixed
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, "
        "length long, content binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    files = reader.load(path_glob).select("path", "content")

    def gen(batches):
        for pdf in batches:
            cols: dict[str, list] = {
                f.name: [] for f in WARC_SCHEMA.fields
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    if keep is not None and rec["warc_type"] not in keep:
                        continue
                    cols["warc_path"].append(path)
                    for k in (
                        "warc_type", "record_id", "target_uri",
                        "warc_date", "content_type",
                    ):
                        cols[k].append(rec[k])
                    cols["payload"].append(rec["payload"])
            yield pd.DataFrame(cols)

    return files.mapInPandas(gen, schema=WARC_SCHEMA)


def http_response(payload: bytes) -> tuple[int, str, bytes]:
    """Split a raw HTTP response payload into (status, content_type
    lowercased, body).  Malformed input degrades to (0, '', payload) —
    the body is still worth salvaging for extraction."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return 0, "", payload
    lines = head.split(_CRLF)
    try:
        status = int(lines[0].split()[1])
    except Exception:
        return 0, "", payload
    ctype = ""
    for line in lines[1:]:
        name, s, val = line.partition(b":")
        if s and name.decode("ascii", "replace").strip().lower() == (
            "content-type"
        ):
            ctype = val.decode("utf-8", "replace").strip().lower()
            break
    return status, ctype, body


def with_http_body(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-kernel HTTP split of a response-payload column: adds
    ``http_status`` (int), ``http_content_type`` (string) and ``body``
    (binary) — feed ``body`` (decoded) to ``html.extract_main_text``
    for the crawl-to-corpus chain."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "http_status int, http_content_type string, body binary"
    )
    def split(payloads: pd.Series) -> pd.DataFrame:
        st, ct, bd = [], [], []
        for p in payloads:
            if p is None:
                st.append(0)
                ct.append("")
                bd.append(b"")
                continue
            s, c, b = http_response(bytes(p))
            st.append(s)
            ct.append(c)
            bd.append(b)
        return pd.DataFrame(
            {"http_status": st, "http_content_type": ct, "body": bd}
        )

    out = df.withColumn("_h", split(F.col(payload_col)))
    return out.select(
        "*",
        F.col("_h.http_status").alias("http_status"),
        F.col("_h.http_content_type").alias("http_content_type"),
        F.col("_h.body").alias("body"),
    ).drop("_h")


def encode_warc(
    records: list[dict],
    gzip_members: bool = False,
) -> bytes:
    """Spec-shaped WARC archive from record dicts (keys: warc_type,
    record_id, target_uri, warc_date, content_type, payload) — the
    fixture/export face.  ``gzip_members=True`` emits one gzip member
    per record (the spec-recommended seekable form); timestamps are
    caller-provided strings so output is byte-deterministic."""
    out = io.BytesIO()
    for rec in records:
        payload = rec.get("payload", b"")
        headers = [
            ("WARC-Type", rec.get("warc_type", "resource")),
            ("WARC-Record-ID", rec.get("record_id", "")),
            ("WARC-Target-URI", rec.get("target_uri", "")),
            ("WARC-Date", rec.get("warc_date", "")),
            ("Content-Type", rec.get("content_type", "")),
            ("Content-Length", str(len(payload))),
        ]
        block = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers if v
        ) + b"\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(block)
            out.write(buf.getvalue())
        else:
            out.write(block)
    return out.getvalue()
