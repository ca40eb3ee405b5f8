"""Token-window chunking with overlap: python-reference equality,
overlap sharing, boundary/empty cases, parameter validation."""

import pytest


def test_chunk_overlap_matches_python_reference(spark):
    from subgraph_extractor_spark.operators.packing import (
        chunk_documents_overlap,
    )

    docs = [
        (1, " ".join(f"w{i}" for i in range(10))),   # multi-chunk
        (2, " ".join(f"w{i}" for i in range(4))),    # single full chunk
        (3, "one two"),                              # short
        (4, ""),                                     # empty -> nothing
        (5, " ".join(f"w{i}" for i in range(5))),    # boundary n==chunk+1
    ]

    def py_chunks(text, size, ov):
        toks = text.split()
        if not toks:
            return []
        stride = size - ov
        out, i = [], 0
        while True:
            start = i * stride
            out.append((i, " ".join(toks[start : start + size]),
                        min(size, len(toks) - start)))
            if start + size >= len(toks):
                break
            i += 1
        return out

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {}
    for r in chunk_documents_overlap(df, "text", "doc_id", 4, 1).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        )
    for did, text in docs:
        expected = py_chunks(text, 4, 1)
        assert sorted(got.get(did, [])) == expected, (did, got.get(did))
    # every adjacent chunk pair shares exactly `overlap` tokens
    for did, chunks in got.items():
        chunks = sorted(chunks)
        for (i1, t1, _), (i2, t2, _) in zip(chunks, chunks[1:]):
            assert t1.split()[-1:] == t2.split()[:1] or len(t2.split()) < 4

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents_overlap(df, "text", "doc_id", 4, 4)
