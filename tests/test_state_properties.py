"""Property-based tests for the incremental-state family and passage
dedup: random feeds, random batch splits — the algebraic contracts must
hold for EVERY split, not just the parity splits the driver queries use.

Spark round-trips are ~1 s each, so examples are few but adversarial:
hypothesis shrinks any failure to a minimal feed.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from subgraph_extractor_spark.operators import aggstate as A
from subgraph_extractor_spark.operators import cdc as C
from subgraph_extractor_spark.operators import histogram as H
from subgraph_extractor_spark.operators import passages as P

# (key, op) feed rows; sequences assigned by position (unique, shuffled
# across batches by the mask)
feed_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["U", "D"])),
    min_size=1,
    max_size=12,
)
mask_strategy = st.integers(0, (1 << 12) - 1)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(max_examples=12, deadline=None)
@given(feed=feed_strategy, mask=mask_strategy)
def test_cdc_apply_compact_equals_compact_union_any_split(sp, feed, mask):
    rows = [
        (k, i, op, f"v{i}") for i, (k, op) in enumerate(feed)
    ]
    df = sp.createDataFrame(rows, "k bigint, seq bigint, op string, v string")
    # split by mask bit of the sequence position
    in_a = [r for r in rows if mask & (1 << r[1])]
    in_b = [r for r in rows if not mask & (1 << r[1])]
    schema = "k bigint, seq bigint, op string, v string"
    da = sp.createDataFrame(in_a, schema) if in_a else df.limit(0)
    db = sp.createDataFrame(in_b, schema) if in_b else df.limit(0)
    full = sorted(map(tuple, C.compact_changelog(df, ["k"], "seq").collect()))
    inc = sorted(map(tuple, C.apply_changelog(
        C.compact_changelog(da, ["k"], "seq", keep_tombstones=True),
        db, ["k"], "seq").collect()))
    assert inc == full


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3),
                  st.floats(-100, 100, allow_nan=False)),
        min_size=1, max_size=20),
    mask=st.integers(0, (1 << 20) - 1),
)
def test_aggstate_merge_equals_single_pass_any_split(sp, vals, mask):
    rows = [(g, i, v) for i, (g, v) in enumerate(vals)]
    schema = "g bigint, i bigint, v double"
    df = sp.createDataFrame(rows, schema)
    in_a = [r for r in rows if mask & (1 << r[1])]
    in_b = [r for r in rows if not mask & (1 << r[1])]
    da = sp.createDataFrame(in_a, schema) if in_a else df.limit(0)
    db = sp.createDataFrame(in_b, schema) if in_b else df.limit(0)
    full = sorted(map(tuple, A.finalize_aggregates(
        A.aggregate_state(df, ["g"], "v")).collect()))
    inc = sorted(map(tuple, A.finalize_aggregates(
        A.merge_aggregate_states(
            A.aggregate_state(da, ["g"], "v"),
            A.aggregate_state(db, ["g"], "v"))).collect()))
    assert inc == full


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(st.floats(-50, 150, allow_nan=False),
                  min_size=1, max_size=20),
    mask=st.integers(0, (1 << 20) - 1),
)
def test_histogram_merge_equals_single_pass_any_split(sp, vals, mask):
    rows = [(i, v) for i, v in enumerate(vals)]
    schema = "i bigint, v double"
    df = sp.createDataFrame(rows, schema)
    in_a = [r for r in rows if mask & (1 << r[0])]
    in_b = [r for r in rows if not mask & (1 << r[0])]
    da = sp.createDataFrame(in_a, schema) if in_a else df.limit(0)
    db = sp.createDataFrame(in_b, schema) if in_b else df.limit(0)
    mk = lambda d: H.histogram_state(d, "v", 0.0, 100.0, 16)  # noqa: E731
    full = sorted(map(tuple, mk(df).collect()))
    inc = sorted(map(tuple, H.merge_histogram_states(
        mk(da), mk(db), check_geometry=False).collect()))
    assert inc == full


def _py_duplicate_spans(docs, k):
    """Brute-force reference: mark every k-gram occurrence whose
    content appeared at a smaller (doc, pos); merge overlapping."""
    seen = {}
    marks = {}
    for did in sorted(docs):
        toks = docs[did].split()
        for pos in range(len(toks) - k + 1):
            g = " ".join(toks[pos : pos + k])
            if g in seen:
                marks.setdefault(did, []).append(pos)
            else:
                seen[g] = (did, pos)
    spans = {}
    for did, poss in marks.items():
        cur = []
        for pos in sorted(poss):
            if cur and pos <= cur[-1][1]:
                cur[-1] = (cur[-1][0], max(cur[-1][1], pos + k))
            else:
                cur.append((pos, pos + k))
        spans[did] = cur
    return {
        (did, s, e) for did, sp_ in spans.items() for (s, e) in sp_
    }


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=14).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    )
)
def test_passage_spans_match_bruteforce(sp, docs):
    k = 3
    rows = [(i, t) for i, t in enumerate(docs)]
    df = sp.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in P.duplicate_passage_spans(df, "doc_id", "text", k=k)
        .collect()
    }
    want = _py_duplicate_spans({i: t for i, t in rows}, k)
    assert got == want
