"""Product quantization (operators/pq.py) vs a verbatim single-process
Python reference: codebook training, encoding, ADC search."""

import math
import random

import pytest

from subgraph_extractor_spark.operators import pq


# ---------------------------------------------------------------- reference

def _quant(vec, scale_bits=16):
    s = 1 << scale_bits
    return [math.floor(float(x) * s) for x in vec]


def _fdiv(s, n):
    return (s - ((s % n) + n) % n) // n


def _sq(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _ref_train(rows, m, k, iters, scale_bits=16):
    q = {i: _quant(v, scale_bits) for i, v in rows}
    dim = len(next(iter(q.values())))
    dsub = dim // m
    sub = {
        (i, s): qv[s * dsub:(s + 1) * dsub]
        for i, qv in q.items()
        for s in range(m)
    }
    seeds = sorted(q)[:k]
    cents = [[list(sub[(i, s)]) for i in seeds] for s in range(m)]

    for _ in range(iters):
        assign = {
            (i, s): min(
                (_sq(sub[(i, s)], cents[s][j]), j) for j in range(k)
            )[1]
            for i in q
            for s in range(m)
        }
        nxt = [[list(c) for c in cb] for cb in cents]
        for s in range(m):
            for j in range(k):
                members = [
                    sub[(i, s)] for i in q if assign[(i, s)] == j
                ]
                if members:
                    n = len(members)
                    nxt[s][j] = [
                        _fdiv(sum(col), n) for col in zip(*members)
                    ]
        cents = nxt
    return cents


def _ref_encode(rows, cents, scale_bits=16):
    m = len(cents)
    dsub = len(cents[0][0])
    out = {}
    for i, v in rows:
        qv = _quant(v, scale_bits)
        out[i] = [
            min(
                (_sq(qv[s * dsub:(s + 1) * dsub], cents[s][j]), j)
                for j in range(len(cents[s]))
            )[1]
            for s in range(m)
        ]
    return out


def _ref_topk(rows, cents, codes, n_queries, topk, scale_bits=16):
    m = len(cents)
    dsub = len(cents[0][0])
    qids = sorted(i for i, _ in rows)[:n_queries]
    vec = dict(rows)
    out = []
    for qid in qids:
        qv = _quant(vec[qid], scale_bits)
        table = [
            [_sq(qv[s * dsub:(s + 1) * dsub], c) for c in cents[s]]
            for s in range(m)
        ]
        scored = sorted(
            (sum(table[s][codes[i][s]] for s in range(m)), i)
            for i, _ in rows
            if i != qid
        )
        for r, (d, i) in enumerate(scored[:topk], start=1):
            out.append((qid, i, r, d))
    return sorted(out)


# ---------------------------------------------------------------- tests

def _mk_df(spark, rows, parts=6):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "id long, vec array<float>",
    ).repartition(parts)


def _rand_rows(seed, n, dim):
    rng = random.Random(seed)
    return [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]


def test_pq_codebooks_match_reference(spark):
    rows = _rand_rows(5, 40, 8)
    got = pq.pq_train_codebooks(
        _mk_df(spark, rows), "vec", "id", m=2, k=3, iters=2
    )
    assert got == _ref_train(rows, m=2, k=3, iters=2)


def test_pq_encode_matches_reference(spark):
    rows = _rand_rows(7, 50, 12)
    cents = _ref_train(rows, m=3, k=4, iters=2)
    enc = pq.pq_encode(_mk_df(spark, rows), "vec", "id", cents)
    got = {r["id"]: list(r["codes"]) for r in enc.collect()}
    assert got == _ref_encode(rows, cents)


def test_pq_end_to_end_matches_reference(spark):
    rows = _rand_rows(11, 60, 8)
    out = pq.pq_ann_topk(
        _mk_df(spark, rows), "vec", "id",
        m=2, k_codes=4, iters=2, topk=3, n_queries=4,
    )
    got = sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["adc_dist"])
        for r in out.collect()
    )
    cents = _ref_train(rows, m=2, k=4, iters=2)
    codes = _ref_encode(rows, cents)
    assert got == _ref_topk(rows, cents, codes, n_queries=4, topk=3)


def test_pq_partitioning_invariance(spark):
    rows = _rand_rows(13, 45, 8)
    a = pq.pq_ann_topk(
        _mk_df(spark, rows, parts=1), "vec", "id",
        m=4, k_codes=3, iters=2, topk=2, n_queries=3,
    ).collect()
    b = pq.pq_ann_topk(
        _mk_df(spark, rows, parts=9), "vec", "id",
        m=4, k_codes=3, iters=2, topk=2, n_queries=3,
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pq_recovers_easy_structure(spark):
    # three tight blobs, ids interleaved so seeds span blobs: each
    # query's top neighbors under ADC must come from its own blob —
    # the compression is lossy but far coarser than the blob gap.
    rng = random.Random(17)
    rows = []
    centers = [(-6.0, -6.0, -6.0, -6.0), (6.0, 6.0, 6.0, 6.0),
               (6.0, -6.0, 6.0, -6.0)]
    for b, c in enumerate(centers):
        for i in range(12):
            rows.append(
                (i * 3 + b,
                 [c[d] + rng.uniform(-0.3, 0.3) for d in range(4)])
            )
    out = pq.pq_ann_topk(
        _mk_df(spark, rows), "vec", "id",
        m=2, k_codes=3, iters=3, topk=3, n_queries=3,
    )
    for r in out.collect():
        assert r["query_id"] % 3 == r["doc_id"] % 3


def test_pq_m_must_divide_dim(spark):
    rows = _rand_rows(1, 10, 10)
    with pytest.raises(ValueError):
        pq.pq_train_codebooks(_mk_df(spark, rows), "vec", "id", m=3, k=2)


def test_pq_k_exceeds_corpus_raises(spark):
    rows = _rand_rows(2, 3, 4)
    with pytest.raises(ValueError):
        pq.pq_train_codebooks(
            _mk_df(spark, rows), "vec", "id", m=2, k=5, iters=1
        )


# ------------------------------------------------------------- IVF-PQ

def _ref_ivfpq(rows, n_cells, nprobe, m, k, iters_cells, iters_pq,
               topk, n_queries, scale_bits=16):
    q = {i: _quant(v, scale_bits) for i, v in rows}
    dim = len(next(iter(q.values())))
    dsub = dim // m

    # coarse cells: full-dim kmeans (same contract as clustering ref)
    seeds = sorted(q)[:n_cells]
    cells = [list(q[i]) for i in seeds]
    for _ in range(iters_cells):
        a = {
            i: min((_sq(v, cells[j]), j) for j in range(n_cells))[1]
            for i, v in q.items()
        }
        nxt = [list(c) for c in cells]
        for j in range(n_cells):
            mem = [q[i] for i in a if a[i] == j]
            if mem:
                n = len(mem)
                nxt[j] = [_fdiv(sum(c), n) for c in zip(*mem)]
        cells = nxt
    cell_of = {
        i: min((_sq(v, cells[j]), j) for j in range(n_cells))[1]
        for i, v in q.items()
    }
    resid = {
        i: [v[d] - cells[cell_of[i]][d] for d in range(dim)] for i, v in q.items()
    }
    rrows = [(i, None) for i in sorted(resid)]  # ids only; train below
    sub = {
        (i, s): resid[i][s * dsub:(s + 1) * dsub]
        for i in resid for s in range(m)
    }
    rseeds = sorted(resid)[:k]
    cb = [[list(sub[(i, s)]) for i in rseeds] for s in range(m)]
    for _ in range(iters_pq):
        a = {
            (i, s): min((_sq(sub[(i, s)], cb[s][j]), j) for j in range(k))[1]
            for i in resid for s in range(m)
        }
        nxt = [[list(c) for c in b] for b in cb]
        for s in range(m):
            for j in range(k):
                mem = [sub[(i, s)] for i in resid if a[(i, s)] == j]
                if mem:
                    n = len(mem)
                    nxt[s][j] = [_fdiv(sum(c), n) for c in zip(*mem)]
        cb = nxt
    codes = {
        i: [
            min((_sq(sub[(i, s)], cb[s][j]), j) for j in range(k))[1]
            for s in range(m)
        ]
        for i in resid
    }

    out = []
    for qid in sorted(q)[:n_queries]:
        # probe nprobe nearest cells by (dist, cell)
        probes = sorted(
            (_sq(q[qid], cells[j]), j) for j in range(n_cells)
        )[:nprobe]
        scored = []
        for _, cell in probes:
            rq = [q[qid][d] - cells[cell][d] for d in range(dim)]
            table = [
                [_sq(rq[s * dsub:(s + 1) * dsub], cb[s][j]) for j in range(k)]
                for s in range(m)
            ]
            for i in resid:
                if i == qid or cell_of[i] != cell:
                    continue
                scored.append(
                    (sum(table[s][codes[i][s]] for s in range(m)), i)
                )
        for r, (d, i) in enumerate(sorted(scored)[:topk], start=1):
            out.append((qid, i, r, d))
    return sorted(out)


def test_ivfpq_matches_reference(spark):
    rows = _rand_rows(31, 70, 8)
    got = sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["adc_dist"])
        for r in pq.ivfpq_topk(
            _mk_df(spark, rows), "vec", "id",
            n_cells=3, nprobe=2, m=2, k_codes=4,
            iters_cells=2, iters_pq=2, topk=3, n_queries=4,
        ).collect()
    )
    assert got == _ref_ivfpq(
        rows, n_cells=3, nprobe=2, m=2, k=4,
        iters_cells=2, iters_pq=2, topk=3, n_queries=4,
    )


def test_ivfpq_matches_duckdb_oracle(spark):
    import duckdb

    rows = _rand_rows(37, 50, 8)
    got = sorted(
        tuple(r)
        for r in pq.ivfpq_topk(
            _mk_df(spark, rows), "vec", "id",
            n_cells=3, nprobe=2, m=4, k_codes=3,
            iters_cells=2, iters_pq=1, topk=2, n_queries=3,
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, vec FLOAT[])")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, v) for i, v in rows]
    )
    sql = pq.ivfpq_oracle_sql(
        "t", "id", "vec", dim=8,
        n_cells=3, nprobe=2, m=4, k=3,
        iters_cells=2, iters_pq=1, topk=2, n_queries=3,
    )
    ora = sorted(
        (int(a), int(b), int(c), int(d))
        for a, b, c, d in con.execute(sql).fetchall()
    )
    assert got == ora


def test_ivfpq_only_probed_cells_are_scored(spark):
    # three far-apart blobs guarantee clean cells; with nprobe=1 each
    # query's neighbors come from its own blob only
    import random as _random
    rng = _random.Random(41)
    rows = []
    centers = [(-9.0,) * 4, (9.0,) * 4, (9.0, -9.0, 9.0, -9.0)]
    for b, c in enumerate(centers):
        for i in range(10):
            rows.append(
                (i * 3 + b, [c[d] + rng.uniform(-0.2, 0.2) for d in range(4)])
            )
    out = pq.ivfpq_topk(
        _mk_df(spark, rows), "vec", "id",
        n_cells=3, nprobe=1, m=2, k_codes=3,
        iters_cells=3, iters_pq=2, topk=3, n_queries=3,
    )
    for r in out.collect():
        assert r["query_id"] % 3 == r["doc_id"] % 3


def test_pq_empty_corpus_raises_valueerror(spark):
    """ADVICE r6: empty corpus gives the clean ValueError, not a
    TypeError from first() returning None."""
    empty = spark.createDataFrame([], "id long, vec array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        pq.pq_train_codebooks(empty, "vec", "id", m=2, k=2)
    with pytest.raises(ValueError, match="empty corpus"):
        pq.ivfpq_topk(empty, "vec", "id", m=2, k_codes=2, n_cells=2)


def test_ivfpq_refined_full_shortlist_equals_exact(spark):
    """With nprobe = n_cells and shortlist >= corpus, the refine stage
    sees every candidate, so IVFADC+refine must return EXACTLY the
    brute-force quantized-L2 top-k (self excluded, (dist, id)
    tie-break) — the ADC approximation cancels entirely."""
    import math

    rows = _rand_rows(43, 40, 8)
    got = sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["dist"])
        for r in pq.ivfpq_topk_refined(
            _mk_df(spark, rows), "vec", "id",
            n_cells=3, nprobe=3, m=2, k_codes=4,
            iters_cells=2, iters_pq=2,
            shortlist=100, topk=3, n_queries=4,
        ).collect()
    )
    q = {
        i: [math.floor(float(x) * 65536) for x in v] for i, v in rows
    }
    want = []
    for qid in sorted(q)[:4]:
        scored = sorted(
            (sum((a - b) * (a - b) for a, b in zip(q[qid], q[d])), d)
            for d in q if d != qid
        )
        for rk, (dist, d) in enumerate(scored[:3], 1):
            want.append((qid, d, rk, dist))
    assert got == sorted(want)


def test_ivfpq_refined_shortlist_subset_of_index(spark):
    """A narrow shortlist must re-rank ONLY ivfpq_topk's candidates —
    every refined hit appears in the unrefined shortlist."""
    rows = _rand_rows(44, 40, 8)
    df = _mk_df(spark, rows)
    kw = dict(n_cells=3, nprobe=2, m=2, k_codes=4,
              iters_cells=2, iters_pq=2, n_queries=4)
    sl = {
        (r["query_id"], r["doc_id"])
        for r in pq.ivfpq_topk(df, "vec", "id", topk=8, **kw).collect()
    }
    ref = pq.ivfpq_topk_refined(
        df, "vec", "id", shortlist=8, topk=3, **kw
    ).collect()
    assert ref and all((r["query_id"], r["doc_id"]) in sl for r in ref)


def test_flat_adc_shuffle_is_rank_limit_capped(spark):
    """r6 verdict task #5: the per-query top-k over the Q x N scored
    set must not shuffle the full set.  Spark's SPARK-37099 rank-limit
    pushdown inserts a Partial WindowGroupLimit BELOW the exchange, so
    the shuffle carries at most k rows per (query, map-partition) —
    this pins that plan shape (a regression to a full-window rank, e.g.
    rank computed without the adjacent <=k filter, loses the node)."""
    rows = _rand_rows(3, 40, 8)
    out = pq.pq_ann_topk(
        _mk_df(spark, rows), "vec", "id",
        m=2, k_codes=4, iters=1, topk=3, n_queries=4,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    part = [i for i, l in enumerate(lines)
            if "WindowGroupLimit" in l and "Partial" in l]
    exch = [i for i, l in enumerate(lines)
            if "Exchange hashpartitioning(query_id" in l]
    assert part and exch, plan
    # tree printing: deeper nodes come later, so the Partial limit
    # must appear BELOW (after) the exchange it feeds
    assert min(part) > min(exch), plan


def test_index_model_roundtrip_and_serve(spark, tmp_path):
    """save/load of the bounded IVF-PQ model state is bit-exact, and a
    search served from the LOADED model + re-read parquet code table
    equals the search from the in-memory build."""
    rows = _rand_rows(51, 40, 8)
    df = _mk_df(spark, rows)
    cells, books, codes = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=3, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    mp = str(tmp_path / "idx" / "model.json")
    pq.save_index_model(mp, cells, books)
    codes.write.parquet(str(tmp_path / "idx" / "codes"))
    cells2, books2 = pq.load_index_model(mp)
    assert cells2 == cells and books2 == books
    codes2 = spark.read.parquet(str(tmp_path / "idx" / "codes"))
    a = sorted(map(tuple, pq.ivfpq_search(
        df, "vec", "id", cells, books, codes,
        nprobe=2, topk=3, n_queries=4).collect()))
    b = sorted(map(tuple, pq.ivfpq_search(
        df, "vec", "id", cells2, books2, codes2,
        nprobe=2, topk=3, n_queries=4).collect()))
    assert a == b


def test_ivfpq_search_serving_defaults(spark):
    """The serving face scores the WHOLE query batch by default
    (n_queries=None — no silent truncation to the 5 smallest ids) and
    keeps id-colliding corpus candidates (exclude_self=False): a
    serving batch's id space is independent of the corpus's, so a
    collision must not drop a legitimate neighbor.  The self-ANN
    fixture semantics stay available behind explicit flags."""
    rows = _rand_rows(17, 30, 8)
    df = _mk_df(spark, rows)
    cells, books, codes = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    # 12 queries (> the old default truncation of 5), ids disjoint
    # from the corpus apart from one deliberate collision (id=3)
    qrows = [(i + 100, v) for i, v in rows[:11]] + [(3, rows[3][1])]
    qdf = _mk_df(spark, qrows)
    out = pq.ivfpq_search(
        qdf, "vec", "id", cells, books, codes, nprobe=2, topk=2
    ).collect()
    # every query scored, none silently dropped
    assert {r["query_id"] for r in out} == {i for i, _ in qrows}
    # the colliding query keeps its identical corpus row as the top
    # hit (an exact duplicate's ADC distance is the minimum possible —
    # the doc's codes ARE the centroids nearest its own residual)
    top = [r for r in out if r["query_id"] == 3 and r["rank"] == 1][0]
    assert top["doc_id"] == 3
    # explicit fixture flags reproduce the self-ANN behavior
    self_out = pq.ivfpq_search(
        df, "vec", "id", cells, books, codes, nprobe=2, topk=2,
        n_queries=4, exclude_self=True,
    ).collect()
    assert {r["query_id"] for r in self_out} == {0, 1, 2, 3}
    assert all(r["query_id"] != r["doc_id"] for r in self_out)


def test_index_model_roundtrip_cloud_scheme(spark, tmp_path, monkeypatch):
    """VERDICT r7 stretch #8: the 'persist once, serve forever' claim
    through the NON-FILE scheme — save/load of the IVF-PQ model over
    mock:// routes every byte through the pyarrow FileSystem methods
    (create_dir / open_output_stream / move / open_input_stream), the
    same code path a real s3:// destination takes, and a search served
    from the cloud-loaded model equals the in-memory build's."""
    monkeypatch.setenv("SPARK_GRAFT_MOCK_FS_ROOT", str(tmp_path / "bucket"))
    (tmp_path / "bucket").mkdir()
    rows = _rand_rows(23, 40, 8)
    df = _mk_df(spark, rows)
    cells, books, codes = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    pq.save_index_model("mock://models/ivfpq/model.json", cells, books)
    cells2, books2 = pq.load_index_model("mock://models/ivfpq/model.json")
    assert cells2 == cells and books2 == books
    a = sorted(map(tuple, pq.ivfpq_search(
        df, "vec", "id", cells, books, codes, nprobe=1, topk=2).collect()))
    b = sorted(map(tuple, pq.ivfpq_search(
        df, "vec", "id", cells2, books2, codes, nprobe=1, topk=2).collect()))
    assert a == b


def test_ivfpq_encode_matches_build(spark):
    """The standing-model encode face (FAISS add()): encoding the
    corpus in two halves against the persisted model is bit-identical
    to the code table a full ivfpq_build_index emits, and a search
    over the incrementally built table equals the one-shot search."""
    rows = _rand_rows(29, 44, 8)
    df = _mk_df(spark, rows)
    cells, books, codes = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    want = sorted(
        (r["id"], r["cell"], tuple(r["codes"])) for r in codes.collect()
    )
    halves = [
        df.filter(df.id % 2 == 0), df.filter(df.id % 2 == 1)
    ]
    got = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for h in halves
        for r in pq.ivfpq_encode(h, "vec", "id", cells, books).collect()
    )
    assert got == want
    inc = halves[0].unionByName(halves[1])
    a = sorted(map(tuple, pq.ivfpq_search(
        df, "vec", "id", cells, books, codes,
        nprobe=2, topk=3, n_queries=4, exclude_self=True).collect()))
    b = sorted(map(tuple, pq.ivfpq_search(
        df, "vec", "id", cells, books,
        pq.ivfpq_encode(inc, "vec", "id", cells, books),
        nprobe=2, topk=3, n_queries=4, exclude_self=True).collect()))
    assert a == b


def test_ivfpq_codes_sink_stream_equals_batch(spark, tmp_path):
    """Continual vector ingest: the availableNow stream through
    ivfpq_codes_sink leaves exactly the code table a one-shot build
    with the same persisted model emits, a crash-replayed batch does
    not double-append, and a search served over the streamed table
    equals the one-shot search."""
    from subgraph_extractor_spark.streaming.demo import (
        ivfpq_codes_sink,
        serve_ivfpq_codes,
    )

    rows = _rand_rows(37, 30, 8)
    df = _mk_df(spark, rows)
    cells, books, codes = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    mp = str(tmp_path / "model.json")
    pq.save_index_model(mp, cells, books)
    stage = tmp_path / "stage"
    df.filter(df.id < 15).coalesce(1).write.parquet(str(stage / "a"))
    df.filter(df.id >= 15).coalesce(1).write.parquet(str(stage / "b"))
    codes_dir = str(tmp_path / "codes")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            ivfpq_codes_sink(spark, mp, codes_dir, "vec", "id")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    want = sorted(
        (r["id"], r["cell"], tuple(r["codes"])) for r in codes.collect()
    )
    served = serve_ivfpq_codes(spark, codes_dir)
    got = sorted(
        (r["id"], r["cell"], tuple(r["codes"])) for r in served.collect()
    )
    assert got == want

    # crash replay on a fresh dir: replaying a batch overwrites its
    # own version instead of double-appending
    cd2 = str(tmp_path / "codes2")
    fold = ivfpq_codes_sink(spark, mp, cd2, "vec", "id")
    fold(df.filter(df.id < 15), 0)
    fold(df.filter(df.id >= 15), 1)
    fold(df.filter(df.id >= 15), 1)
    got2 = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in serve_ivfpq_codes(spark, cd2).collect()
    )
    assert got2 == want
    # searches over streamed vs one-shot tables agree
    a = sorted(map(tuple, pq.ivfpq_search(
        df, "vec", "id", cells, books, codes,
        nprobe=1, topk=2, n_queries=3, exclude_self=True).collect()))
    b = sorted(map(tuple, pq.ivfpq_search(
        df, "vec", "id", cells, books, serve_ivfpq_codes(spark, cd2),
        nprobe=1, topk=2, n_queries=3, exclude_self=True).collect()))
    assert a == b


def test_ivfpq_codes_sink_compaction(spark, tmp_path):
    """The code-delta sink's shared compaction housekeeping: with
    compact_every=2, four single-batch ingests leave a committed
    snapshot + the retained previous cycle (bounded dirs), replaying
    the compacting batch is idempotent, and the served table always
    equals the one-shot build."""
    import os

    from subgraph_extractor_spark.streaming.demo import (
        ivfpq_codes_sink,
        serve_ivfpq_codes,
    )

    rows = _rand_rows(41, 32, 8)
    df = _mk_df(spark, rows)
    cells, books, codes = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    mp = str(tmp_path / "model.json")
    pq.save_index_model(mp, cells, books)
    cd = str(tmp_path / "codes")
    fold = ivfpq_codes_sink(spark, mp, cd, "vec", "id", compact_every=2)
    for b in range(4):
        fold(df.filter((df.id % 4) == b), b)
    dirs = sorted(os.listdir(cd))
    assert "c1" in dirs and "c3" in dirs          # both compactions landed
    assert "v0" not in dirs and "v1" not in dirs  # first cycle pruned at c3
    assert "v2" in dirs and "v3" in dirs          # current cycle retained
    want = sorted(
        (r["id"], r["cell"], tuple(r["codes"])) for r in codes.collect()
    )
    got = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in serve_ivfpq_codes(spark, cd).collect()
    )
    assert got == want
    # crash-replay of the compacting batch: previous cycle still on
    # disk, state rebuilds identically
    fold(df.filter((df.id % 4) == 3), 3)
    got2 = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in serve_ivfpq_codes(spark, cd).collect()
    )
    assert got2 == want


def test_ivfpq_remove_ids_lifecycle(spark, tmp_path):
    """The delete face (FAISS remove_ids): tombstoned ids disappear
    from the served table immediately (logical delete), survive a
    non-compacting ingest, are dropped PHYSICALLY by the next
    compaction (which clears the tombstones), and a search over the
    served table never returns them."""
    import os

    from subgraph_extractor_spark.streaming.demo import (
        _tombstone_versions,
        ivfpq_codes_sink,
        ivfpq_remove_ids,
        serve_ivfpq_codes,
    )

    rows = _rand_rows(43, 24, 8)
    df = _mk_df(spark, rows)
    cells, books, _codes = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    mp = str(tmp_path / "model.json")
    pq.save_index_model(mp, cells, books)
    cd = str(tmp_path / "codes")
    fold = ivfpq_codes_sink(spark, mp, cd, "vec", "id", compact_every=3)
    fold(df.filter(df.id < 12), 0)
    fold(df.filter(df.id >= 12), 1)
    # logical delete, effective immediately
    dead = {0, 5, 13}
    ivfpq_remove_ids(
        spark, cd, spark.createDataFrame([(i,) for i in dead], "id long")
    )
    served = {r["id"] for r in serve_ivfpq_codes(spark, cd).collect()}
    assert served == {i for i, _ in rows} - dead
    # search never returns a tombstoned doc
    hits = {
        r["doc_id"]
        for r in pq.ivfpq_search(
            df, "vec", "id", cells, books, serve_ivfpq_codes(spark, cd),
            nprobe=2, topk=5,
        ).collect()
    }
    assert not (hits & dead)
    # third ingest triggers compaction (compact_every=3): rows drop
    # physically, tombstones clear
    extra = _mk_df(spark, [(100 + i, v) for i, v in rows[:3]])
    fold(extra, 2)
    assert _tombstone_versions(cd) == []
    snap = spark.read.parquet(os.path.join(cd, "c2"))
    assert not ({r["id"] for r in snap.collect()} & dead)
    served2 = {r["id"] for r in serve_ivfpq_codes(spark, cd).collect()}
    assert served2 == ({i for i, _ in rows} - dead) | {100, 101, 102}


def _mk_labeled_df(spark, rows, parts=6):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], i % 3) for i, v in rows],
        "id long, vec array<float>, label int",
    ).repartition(parts)


def test_ivfpq_encode_carry_cols(spark):
    """carry_cols pass metadata into the code table map-only; the
    (cell, codes) pair is bit-identical to the no-carry encode."""
    rows = _rand_rows(31, 30, 8)
    df = _mk_labeled_df(spark, rows)
    cells, books, _ = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    plain = {
        r["id"]: (r["cell"], tuple(r["codes"]))
        for r in pq.ivfpq_encode(df, "vec", "id", cells, books).collect()
    }
    carried = pq.ivfpq_encode(
        df, "vec", "id", cells, books, carry_cols=["label"]
    ).collect()
    assert carried[0].asDict().keys() == {"id", "label", "cell", "codes"}
    for r in carried:
        assert r["label"] == r["id"] % 3
        assert plain[r["id"]] == (r["cell"], tuple(r["codes"]))


def test_ivfpq_search_filtered(spark):
    """filter_expr ranks among MATCHING docs (no post-filter recall
    loss): equals re-ranking the full unfiltered ADC scoring restricted
    to the predicate, and every result satisfies it."""
    rows = _rand_rows(37, 40, 8)
    df = _mk_labeled_df(spark, rows)
    cells, books, _ = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    codes = pq.ivfpq_encode(
        df, "vec", "id", cells, books, carry_cols=["label"]
    )
    qdf = _mk_df(spark, [(i + 100, v) for i, v in rows[:6]])
    k = 3
    got = pq.ivfpq_search(
        qdf, "vec", "id", cells, books, codes,
        nprobe=1, topk=k, filter_expr="label = 2",
    ).collect()
    lab = {i: i % 3 for i, _ in rows}
    assert got and all(lab[r["doc_id"]] == 2 for r in got)
    # independent derivation: full unfiltered ranking over the same
    # probed cells, post-restricted to the predicate, re-ranked
    full = pq.ivfpq_search(
        qdf, "vec", "id", cells, books, codes, nprobe=1, topk=len(rows)
    ).collect()
    expected = {}
    for r in sorted(
        full, key=lambda r: (r["query_id"], r["adc_dist"], r["doc_id"])
    ):
        if lab[r["doc_id"]] == 2:
            lst = expected.setdefault(r["query_id"], [])
            if len(lst) < k:
                lst.append((r["doc_id"], r["adc_dist"]))
    got_map = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_map.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["adc_dist"])
        )
    assert got_map == {q: v for q, v in expected.items() if v}


def test_ivfpq_filtered_scan_partition_prunes(spark, tmp_path):
    """The 100 TB claim behind filter_expr: over a code table WRITTEN
    partitionBy(filter col), the filtered search's file scan carries
    the predicate as a PartitionFilter — pruned at planning, never
    read."""
    rows = _rand_rows(41, 30, 8)
    df = _mk_labeled_df(spark, rows)
    cells, books, _ = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    path = str(tmp_path / "codes_by_label")
    pq.ivfpq_encode(
        df, "vec", "id", cells, books, carry_cols=["label"]
    ).write.partitionBy("label").parquet(path)
    codes = spark.read.parquet(path)
    out = pq.ivfpq_search(
        _mk_df(spark, rows[:3]), "vec", "id", cells, books, codes,
        nprobe=1, topk=2, filter_expr="label = 1",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "label" in pf, plan[:2000]
    assert all(r["doc_id"] % 3 == 1 for r in out.collect())


def test_ivfpq_codes_sink_carry_cols_filtered_serving(spark, tmp_path):
    """Streamed metadata-carrying ingest: code deltas keep the carry
    column through versioned appends AND compaction, and a
    filter_expr search over the served table equals the filtered
    search over a one-shot carried encode."""
    from subgraph_extractor_spark.streaming.demo import (
        ivfpq_codes_sink,
        serve_ivfpq_codes,
    )

    rows = _rand_rows(43, 30, 8)
    df = _mk_labeled_df(spark, rows)
    cells, books, _ = pq.ivfpq_build_index(
        df, "vec", "id", n_cells=2, m=2, k_codes=4,
        iters_cells=1, iters_pq=1,
    )
    mp = str(tmp_path / "model.json")
    pq.save_index_model(mp, cells, books)
    cd = str(tmp_path / "codes")
    fold = ivfpq_codes_sink(
        spark, mp, cd, "vec", "id", carry_cols=["label"],
        compact_every=2,
    )
    fold(df.filter(df.id < 10), 0)
    fold(df.filter((df.id >= 10) & (df.id < 20)), 1)  # triggers compaction
    fold(df.filter(df.id >= 20), 2)
    served = serve_ivfpq_codes(spark, cd)
    assert "label" in served.columns
    one_shot = pq.ivfpq_encode(
        df, "vec", "id", cells, books, carry_cols=["label"]
    )
    qdf = _mk_df(spark, [(i + 100, v) for i, v in rows[:4]])
    a = sorted(map(tuple, pq.ivfpq_search(
        qdf, "vec", "id", cells, books, one_shot,
        nprobe=1, topk=2, filter_expr="label = 1").collect()))
    b = sorted(map(tuple, pq.ivfpq_search(
        qdf, "vec", "id", cells, books, served,
        nprobe=1, topk=2, filter_expr="label = 1").collect()))
    assert a == b and a
