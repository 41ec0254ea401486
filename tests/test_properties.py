"""Property-based tests (hypothesis) for the pure-Python components:
the msgpack subset codec and the partition-local HNSW index."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hnsw_vector_db_spark.operators.hnsw_partition import LocalHNSW
from hnsw_vector_db_spark.sources.vectorflow_snapshot import (
    msgpack_decode,
    msgpack_encode,
)

# json-ish values the reference's snapshot payloads can contain
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=80),
    st.binary(max_size=40),
)
values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=8),
        st.dictionaries(st.text(max_size=20), children, max_size=8),
    ),
    max_leaves=25,
)


@given(values)
@settings(max_examples=200, deadline=None)
def test_msgpack_roundtrip_property(obj):
    assert msgpack_decode(msgpack_encode(obj)) == obj


@given(
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=2, max_value=8),
    st.sampled_from(["cosine", "euclidean", "manhattan", "dot_product"]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_local_hnsw_invariants(n, dim, metric, seed):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, dim)
    index = LocalHNSW(m=4, ef_construction=16, metric=metric, seed=0)
    index.build(X)
    q = rng.randn(dim)
    k = min(5, n)
    res = index.search(q, k=k, ef=16)
    assert 1 <= len(res) <= k
    ids = [i for i, _ in res]
    dists = [d for _, d in res]
    # valid ids, no duplicates, ascending distance (lower-is-better for
    # every metric, reference graph.py:23-43 convention)
    assert len(set(ids)) == len(ids)
    assert all(0 <= i < n for i in ids)
    assert dists == sorted(dists)


@given(st.integers(min_value=5, max_value=30), st.integers(min_value=0, max_value=1000))
@settings(max_examples=25, deadline=None)
def test_local_hnsw_exhaustive_ef_is_exact_top1(n, seed):
    """With ef >= n the beam search degenerates to exhaustive scan of the
    reachable graph; layer-0 links every node, so top-1 must equal the
    exact nearest neighbor (euclidean, no ties with continuous data)."""
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 4)
    index = LocalHNSW(m=4, ef_construction=n, metric="euclidean", seed=0)
    index.build(X)
    q = rng.randn(4)
    got = index.search(q, k=1, ef=n * 2)[0][0]
    exact = int(np.argmin(np.linalg.norm(X - q, axis=1)))
    assert got == exact


def _layer0_reachable(index: LocalHNSW) -> set[int]:
    """Directed BFS over layer-0 out-edges from the search entry point."""
    graph = index.adj[0]
    seen = {index.entry}
    stack = [index.entry]
    while stack:
        node = stack.pop()
        for nxt in graph.get(node, ()):
            if nxt not in seen:
                seen.add(nxt)
                stack.append(nxt)
    return seen


@given(
    st.integers(min_value=2, max_value=60),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from(["cosine", "euclidean"]),
)
@settings(max_examples=50, deadline=None)
def test_local_hnsw_layer0_strong_connectivity(n, seed, metric):
    """Every node is reachable from the entry point at layer 0 — the
    protected parent-edge spanning tree makes degree-cap re-pruning
    incapable of stranding a node (the reference's documented defect,
    `core/hnsw/graph.py:158-168`, which SURVEY §7 promised not to
    reproduce). Also holds after an incremental insert_batch."""
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 6)
    index = LocalHNSW(m=4, ef_construction=16, metric=metric, seed=0)
    index.build(X)
    assert _layer0_reachable(index) == set(range(n))
    index.insert_batch(rng.randn(5, 6))
    assert _layer0_reachable(index) == set(range(n + 5))


@given(
    st.integers(min_value=2, max_value=80),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_local_hnsw_protected_fanin_bounded(n, seed):
    """Protected fan-in per node stays <= m (the hub-degree bound on the
    spanning tree), including through incremental inserts and a
    state round-trip, WITHOUT breaking strong connectivity. A heavy
    cluster around one point is the hub-forcing adversarial shape."""
    rng = np.random.RandomState(seed)
    # half the points huddle around the origin-adjacent hub point
    hub = rng.randn(1, 6)
    X = np.vstack([hub + 0.01 * rng.randn(n // 2, 6), rng.randn(n - n // 2, 6)])
    index = LocalHNSW(m=4, ef_construction=16, metric="euclidean", seed=0)
    index.build(X)
    assert max(index.prot_fanin.values(), default=0) <= index.m
    assert _layer0_reachable(index) == set(range(n))
    index.insert_batch(hub + 0.01 * rng.randn(6, 6))
    assert max(index.prot_fanin.values(), default=0) <= index.m
    assert _layer0_reachable(index) == set(range(n + 6))
    # fan-in counts survive serialization (lower pair index == parent)
    st2 = index.to_state()
    back = LocalHNSW.from_state(
        st2["n"], st2["dim"], st2["metric"], st2["entry"], st2["levels"],
        st2["vec_bytes"], st2["e_layer"], st2["e_src"], st2["e_dst"],
        st2["e_prot"],
    )
    assert back.prot_fanin == index.prot_fanin


@given(
    st.text(min_size=1, max_size=2000),
    st.integers(min_value=2, max_value=300),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=100, deadline=None)
def test_chunk_coverage_property(text, chunk_chars, overlap):
    """Pure-python mirror of chunk_documents' arithmetic: chunks cover
    the text exactly, consecutive chunks share `overlap` chars, and
    de-overlapped concatenation reconstructs the text. (The Spark
    expression uses the same formulas; tests/test_corpus.py pins the
    expression itself — this pins the arithmetic across the whole
    parameter space.)"""
    if overlap >= chunk_chars:
        overlap = chunk_chars - 1
    stride = chunk_chars - overlap
    L = len(text)
    n_last = max((L - 1) // stride, 0)
    chunks = [text[i * stride : i * stride + chunk_chars] for i in range(n_last + 1)]
    # every char covered, reconstruction exact
    rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
    assert rebuilt == text
    # overlap is a shared suffix/prefix wherever the next chunk is full-offset
    for a, b in zip(chunks, chunks[1:]):
        if len(a) == chunk_chars:
            assert a[stride:] == b[: len(a[stride:])]


@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=100, deadline=None)
def test_span_packing_property(token_counts, budget):
    """Span packing invariants on one shard: seq ids are non-decreasing
    and contiguous-from-0 among non-empty items, every sequence's token
    total is < budget + max single item (the documented overflow bound),
    and totals sum to the stream total."""
    cum = 0
    seqs: dict[int, int] = {}
    order = []
    for t in token_counts:
        sid = (cum) // budget
        cum += t
        seqs[sid] = seqs.get(sid, 0) + t
        order.append(sid)
    assert order == sorted(order)
    assert sum(seqs.values()) == sum(token_counts)
    mx = max(token_counts)
    for sid, tot in seqs.items():
        assert tot < budget + max(mx, 1)


@given(
    st.lists(
        st.lists(st.sampled_from(["apple", "banana", "cherry", "date", "fig"]),
                 min_size=1, max_size=12),
        min_size=1, max_size=8,
    ),
    st.sets(st.sampled_from(["apple", "banana", "cherry"]), min_size=1, max_size=3),
)
@settings(max_examples=20, deadline=None)
def test_bm25_matches_pure_python_reference(spark, docs_tokens, query_terms):
    """Spark bm25_score equals an independent pure-python Okapi BM25
    across arbitrary tiny corpora — the formula itself, not just the
    golden case, is pinned (k1=1.2, b=0.75, idf = ln(1+(N-df+.5)/(df+.5))).
    (session-scoped spark fixture: allowed inside @given)"""
    import math

    from hnsw_vector_db_spark.operators.text_analysis import bm25_score

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_score(df, sorted(query_terms), top_k=100).collect()}

    n = len(docs_tokens)
    dls = [len(t) for t in docs_tokens]
    avgdl = sum(dls) / n
    dfs = {t: sum(1 for toks in docs_tokens if t in toks) for t in query_terms}
    k1, b = 1.2, 0.75
    want = {}
    for i, toks in enumerate(docs_tokens):
        s = 0.0
        for t in query_terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
        if s > 0:
            want[i] = round(s, 6)
    assert got == want


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_png_roundtrip_property(h, w, seed):
    """encode_png -> parse_png is the identity on pixels for any shape —
    the compressed-image codec, property-tested (stdlib zlib + filter-0
    encode, full inflate + unfilter decode)."""
    from hnsw_vector_db_spark.operators.multimodal import encode_png, parse_png

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    back = parse_png(encode_png(img))
    assert back is not None and back.tolist() == img.tolist()


@given(
    st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=12,
             unique=True),
    st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=12,
             unique=True),
)
@settings(max_examples=20, deadline=None)
def test_rrf_matches_pure_python_reference(spark, ids_a, ids_b):
    """rrf_fuse equals an independent python RRF on arbitrary two-list
    inputs: contributions 1/(60+rank), missing-list items keep one term,
    ordering by fused score then id."""
    from hnsw_vector_db_spark.operators.knn import rrf_fuse

    a = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ids_a)], "vec_id long, rank int")
    b = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ids_b)], "vec_id long, rank int")
    got = [(r["vec_id"], r["rrf_score"], r["n_lists"])
           for r in rrf_fuse([a, b], k_const=60, top_k=1000).collect()]

    scores: dict[int, float] = {}
    counts: dict[int, int] = {}
    for lst in (ids_a, ids_b):
        for r, i in enumerate(lst):
            scores[i] = scores.get(i, 0.0) + 1.0 / (60 + r + 1)
            counts[i] = counts.get(i, 0) + 1
    assert {(i, s, c) for i, s, c in got} == {
        (i, round(s, 6), counts[i]) for i, s in scores.items()
    }
    # output ordered by fused score desc, id asc
    got_keys = [(-s, i) for i, s, _ in got]
    assert got_keys == sorted(got_keys)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),          # user
            st.integers(min_value=0, max_value=5000),       # minutes offset
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=10, max_value=2000),              # window minutes
)
@settings(max_examples=30, deadline=None)
def test_funnel_steps_matches_python_reference(spark, events_rows, within_minutes):
    """funnel_steps == a direct pure-python evaluation of the spec
    (earliest view; earliest click strictly after; earliest purchase
    strictly after that; completed iff span <= window) on arbitrary
    event streams, including duplicate timestamps."""
    import datetime as dt

    from hnsw_vector_db_spark.operators.events import funnel_steps
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(minutes=m), e) for u, m, e in events_rows
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: (r["step_reached"], r["funnel_seconds"], r["completed"])
        for r in funnel_steps(ev, within_minutes=within_minutes).collect()
    }
    # pure-python reference
    expect = {}
    by_user: dict[int, list] = {}
    for u, ts, e in rows:
        by_user.setdefault(u, []).append((ts, e))
    for u, evs in by_user.items():
        views = sorted(ts for ts, e in evs if e == "view")
        if not views:
            continue
        t1 = views[0]
        clicks = sorted(ts for ts, e in evs if e == "click" and ts > t1)
        t2 = clicks[0] if clicks else None
        t3 = None
        if t2 is not None:
            purchases = sorted(ts for ts, e in evs if e == "purchase" and ts > t2)
            t3 = purchases[0] if purchases else None
        step = 3 if t3 else (2 if t2 else 1)
        span = int(t3.timestamp()) - int(t1.timestamp()) if t3 else None
        done = t3 is not None and span <= within_minutes * 60
        expect[u] = (step, span, done)
    assert got == expect


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),
            st.integers(min_value=0, max_value=40),         # day offset
            st.sampled_from(["signup", "click"]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=25, deadline=None)
def test_cohort_retention_matches_python_reference(spark, events_rows):
    """cohort_retention == direct evaluation: cohort = Monday of the
    user's first signup week; offset = floor(days since own signup / 7);
    distinct users per (cohort, offset); pre-signup activity excluded."""
    import datetime as dt

    from hnsw_vector_db_spark.operators.events import cohort_retention
    t0 = dt.datetime(2024, 1, 3, 12, 0)  # a Wednesday
    rows = [(u, t0 + dt.timedelta(days=d), e) for u, d, e in events_rows]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in cohort_retention(ev).collect()
    }
    first = {}
    for u, ts, e in rows:
        if e == "signup" and (u not in first or ts < first[u]):
            first[u] = ts
    agg: dict[tuple, set] = {}
    for u, ts, e in rows:
        if u not in first:
            continue
        t1 = first[u]
        off = (ts.date() - t1.date()).days // 7
        if off < 0:
            continue
        monday = t1.date() - dt.timedelta(days=t1.weekday())
        agg.setdefault((monday.isoformat(), off), set()).add(u)
    expect = {k: len(v) for k, v in agg.items()}
    assert got == expect


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),          # custkey
            st.integers(min_value=0, max_value=400),        # day offset
            st.integers(min_value=1, max_value=500),        # price (int: exact)
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=120),                # window days
)
@settings(max_examples=30, deadline=None)
def test_rolling_revenue_matches_python_reference(spark, order_rows, days):
    """rolling_revenue == direct evaluation of the RANGE-frame spec on
    arbitrary order streams, including same-day ties (every same-day row
    sees every other — the property a ROWS frame would violate).
    Integer prices keep the sums exact, so equality is strict."""
    import datetime as dt

    from hnsw_vector_db_spark.operators.relational import rolling_revenue

    epoch = dt.date(1992, 1, 1)
    rows = [
        (i, c, dt.datetime.combine(epoch + dt.timedelta(days=d), dt.time()), float(p))
        for i, (c, d, p) in enumerate(order_rows)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    got = {
        r["o_orderkey"]: (r["d"], r["rolling_total"], r["n_in_window"])
        for r in rolling_revenue(orders, days=days).collect()
    }
    expect = {}
    for i, (c, d, p) in enumerate(order_rows):
        frame = [
            (cj, dj, pj)
            for (cj, dj, pj) in order_rows
            if cj == c and d - days <= dj <= d
        ]
        expect[i] = (d, float(sum(pj for _, _, pj in frame)), len(frame))
    assert got == expect
