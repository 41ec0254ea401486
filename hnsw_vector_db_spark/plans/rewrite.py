"""Catalyst-style logical rewrite: naive crossJoin + row_number()<=k kNN
into the cost-based strategy (SURVEY.md §4 custom-work item 3).

The reference hard-codes its single traversal (`core/hnsw/graph.py:175-189`);
the Spark idiom is the opposite — a QUERY SHAPE is recognized and replanned
by the optimizer. Python cannot register a JVM Catalyst rule, so this module
does the same match-and-rebuild one level up: walk the ANALYZED logical plan
via py4j, recognize the naive kNN pattern, and re-emit the computation
through :func:`~hnsw_vector_db_spark.operators.knn.knn_batch` (default; same
SQL expressions, so every null/zero-norm edge behaves identically) or
:func:`~.knn.knn_auto` (opt-in ``strategy="auto"``, two-phase BLAS at scale
— numpy-path caveats disclosed on :func:`rewrite_knn_topk`) on DataFrames
rebuilt from the join's own subtrees (``Dataset.ofRows``), so the inputs are
the byte-identical plans and only the physical strategy changes.

Matched shape — exactly what the DataFrame API produces for::

    q.crossJoin(v)
     .withColumn(d, distance(qvec, vec, metric))      # our builder shapes
     .withColumn(r, row_number().over(
         Window.partitionBy(qid).orderBy(d [, id])))
     .filter(r <= k)            # or r < k+1
     .select(qid, id, d [, r])  # any subset/order of these four

i.e. ``Project* > Filter(rn <= k) > Project* > Window(row_number) >
Project*(defines dist) > Join(Cross|Inner, no condition)``.  Like any
Catalyst rule, the match is deliberately narrow: anything else returns
``None`` and the caller keeps the original plan.  Semantics are preserved
with one disclosed strengthening: when the naive sort is on ``dist`` alone,
ties make its output nondeterministic, and the rewrite resolves them by id
(one of the naive plan's valid executions).

Why rewrite at all: the naive plan shuffles Q·N joined rows into the window
(bounded only by WindowGroupLimit's partial top-k), while the rewrite
broadcasts the query side so the corpus never moves; ``strategy="auto"``
additionally switches above ~5e6 candidate pairs to the two-phase BLAS path
whose shuffle is Q·k·partitions — corpus-size-independent.  At 100 TB the
naive form is a cross join over the whole corpus; the rewritten form is a
scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["match_naive_knn", "rewrite_knn_topk", "with_knn_rewrite"]

# logical nodes that merely reshape/rename between the anchor nodes
_PASSTHROUGH = {"Project", "SubqueryAlias"}


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


def _descend(node, stop: set[str]):
    """Follow single-child passthrough nodes until a node in ``stop``.

    Returns the stop node, or None if something other than a passthrough
    shows up first (pattern broken)."""
    while True:
        name = _cls(node)
        if name in stop:
            return node
        if name not in _PASSTHROUGH or node.children().size() != 1:
            return None
        node = node.children().apply(0)


def _of_rows(spark, jplan) -> DataFrame:
    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, jplan
    )
    return DataFrame(jdf, spark)


def _resolved_sql(spark, jplan, c: Column) -> str:
    """Render ``c`` analyzed against the plan's own schema, so implicit
    casts and types match the original expression's rendering exactly."""
    proj = (
        _of_rows(spark, jplan)
        .select(c.alias("__cand__"))
        ._jdf.queryExecution()
        .analyzed()
    )
    return proj.projectList().apply(0).child().sql()


def _norm_sql(s: str) -> str:
    # resolved attributes render bare, unresolved ones backticked — strip
    return s.replace("`", "")


@dataclass
class _Match:
    k: int
    metric: str
    qid: str
    qvec: str
    id: str
    vec: str
    # output projection as (role, name) pairs, role in qid/id/dist/rank —
    # roles are resolved by exprId, never by name, so an id column that
    # happens to be NAMED "dist" can't be mistaken for the distance
    out_spec: list
    left_plan: object
    right_plan: object


def _attr_refs(expr) -> list:
    it = expr.references().iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


def match_naive_knn(df: DataFrame):  # -> _Match | None
    """Recognize the naive crossJoin+row_number kNN plan; None if no match."""
    try:
        root = df._jdf.queryExecution().analyzed()
    except Exception:  # non-classic (Connect) frames have no local plan
        return None

    flt = _descend(root, {"Filter"})
    if flt is None:
        return None
    cond = flt.condition()
    ccls = _cls(cond)
    if ccls not in ("LessThanOrEqual", "LessThan"):
        return None
    if _cls(cond.left()) != "AttributeReference" or _cls(cond.right()) != "Literal":
        return None
    kv = cond.right().value()
    if not isinstance(kv, int):
        return None
    k = kv if ccls == "LessThanOrEqual" else kv - 1
    from hnsw_vector_db_spark.operators.table import MAX_K

    # outside the engine's request contract (k in [1, MAX_K],
    # `api/rest/server.py:33`) the naive plan is left untouched — an
    # optimizer rule must never turn a working plan into an exception
    if k < 1 or k > MAX_K:
        return None
    rank_attr = cond.left()

    win = _descend(flt.children().apply(0), {"Window"})
    if win is None:
        return None
    wexprs = _seq(win.windowExpressions())
    if len(wexprs) != 1 or _cls(wexprs[0]) != "Alias":
        return None
    alias = wexprs[0]
    if alias.exprId().id() != rank_attr.exprId().id():
        return None
    wexpr = alias.child()
    if _cls(wexpr) != "WindowExpression" or _cls(wexpr.windowFunction()) != "RowNumber":
        return None
    spec = wexpr.windowSpec()
    parts = _seq(spec.partitionSpec())
    if len(parts) != 1 or _cls(parts[0]) != "AttributeReference":
        return None
    qid_attr = parts[0]
    orders = _seq(spec.orderSpec())
    if not 1 <= len(orders) <= 2:
        return None
    for so in orders:
        if so.direction().toString() != "Ascending":
            return None
        if _cls(so.child()) != "AttributeReference":
            return None
    dist_attr = orders[0].child()
    tie_attr = orders[1].child() if len(orders) == 2 else None

    # the Project that defines dist, then the Join beneath it
    node = win.children().apply(0)
    dist_def = None
    while dist_def is None:
        node = _descend(node, {"Project", "Join"})
        if node is None or _cls(node) == "Join":
            return None  # dist must be an alias above the join
        for e in _seq(node.projectList()):
            if _cls(e) == "Alias" and e.exprId().id() == dist_attr.exprId().id():
                dist_def = e
                break
        if dist_def is None:
            node = node.children().apply(0)
    join = _descend(node.children().apply(0), {"Join"})
    if join is None:
        return None
    if join.joinType().toString() not in ("Cross", "Inner"):
        return None
    if join.condition().isDefined():
        return None
    left, right = join.left(), join.right()
    lset, rset = left.outputSet(), right.outputSet()

    if not lset.contains(qid_attr):
        return None
    refs = _attr_refs(dist_def.child())
    lrefs = [a for a in refs if lset.contains(a)]
    rrefs = [a for a in refs if rset.contains(a)]
    if len(lrefs) != 1 or len(rrefs) != 1:
        return None
    qvec_attr, vec_attr = lrefs[0], rrefs[0]

    # id: the second sort key and/or the right-side attr in the output
    out_attrs = _seq(root.output())
    id_attr = tie_attr
    for a in out_attrs:
        if rset.contains(a) and a.exprId().id() != vec_attr.exprId().id():
            if id_attr is not None and a.exprId().id() != id_attr.exprId().id():
                return None  # a second right-side column — not plain kNN
            id_attr = a
    if id_attr is None or not rset.contains(id_attr):
        return None

    # output must be a subset of {qid, id, dist, rank}
    allowed = {
        qid_attr.exprId().id(),
        id_attr.exprId().id(),
        dist_attr.exprId().id(),
        rank_attr.exprId().id(),
    }
    if any(a.exprId().id() not in allowed for a in out_attrs):
        return None
    # the rebuild selects by NAME within each join side (then renames to
    # sanitized internals), so only same-side collisions are ambiguous;
    # queries.crossJoin(vectors) with both sides carrying an "id" column
    # is fine
    if qid_attr.name() == qvec_attr.name() or id_attr.name() == vec_attr.name():
        return None
    role_by_id = {
        qid_attr.exprId().id(): "qid",
        id_attr.exprId().id(): "id",
        dist_attr.exprId().id(): "dist",
        rank_attr.exprId().id(): "rank",
    }
    out_spec = [(role_by_id[a.exprId().id()], a.name()) for a in out_attrs]

    # metric: the dist expression must be one of our builder shapes
    from hnsw_vector_db_spark.functions.distance import METRICS, distance

    spark = df.sparkSession
    got = _norm_sql(dist_def.child().sql())
    metric = None
    try:
        for m in METRICS:
            # distance(a, b) and distance(b, a): every metric is symmetric
            for a, b in ((qvec_attr.name(), vec_attr.name()),
                         (vec_attr.name(), qvec_attr.name())):
                cand = distance(F.col(a), F.col(b), m)
                if _norm_sql(_resolved_sql(spark, join, cand)) == got:
                    metric = m
                    break
            if metric is not None:
                break
    except Exception:
        return None
    if metric is None:
        return None

    return _Match(
        k=k,
        metric=metric,
        qid=qid_attr.name(),
        qvec=qvec_attr.name(),
        id=id_attr.name(),
        vec=vec_attr.name(),
        out_spec=out_spec,
        left_plan=left,
        right_plan=right,
    )


def rewrite_knn_topk(
    df: DataFrame, strategy: str = "batch", **knn_kw
) -> DataFrame | None:
    """Rewrite a naive crossJoin+rank kNN DataFrame; None when no match.

    ``strategy="batch"`` (default) replans through ``knn_batch``:
    broadcast queries + WindowGroupLimit over the SAME distance
    expressions and window the naive plan used, so null vectors,
    zero-norm cosine guards, and every SQL edge behave bit-identically —
    the rewrite is observable only in the physical plan (and in tie
    order, resolved by id, one of the naive plan's valid executions).

    ``strategy="auto"`` replans through ``knn_auto``, which above ~5e6
    candidate pairs switches to the two-phase BLAS path (shuffle bounded
    by Q*k*partitions instead of Q*N). DISCLOSED semantic edges of that
    numpy path vs the naive SQL: rows with null vectors error instead of
    ranking nulls-first, and all-zero cosine vectors score the guard
    value 1.0 instead of null. Opt in when the corpus is clean (the
    validate_vectors gate) and the scale win matters. ``knn_kw``
    forwards (e.g. ``approx=True``, ``corpus_rows=...``)."""
    if strategy not in ("batch", "auto"):
        raise ValueError(f"strategy must be 'batch' or 'auto', got {strategy!r}")
    m = match_naive_knn(df)
    if m is None:
        return None
    from hnsw_vector_db_spark.operators.knn import knn_auto, knn_batch

    spark = df.sparkSession
    # sanitized internal names: a user column named "dist"/"rank" must not
    # collide with the kNN operators' own output columns
    queries = _of_rows(spark, m.left_plan).select(
        F.col(m.qid).alias("__rw_qid__"), F.col(m.qvec).alias("__rw_qvec__")
    )
    corpus = _of_rows(spark, m.right_plan).select(
        F.col(m.id).alias("__rw_id__"), F.col(m.vec).alias("__rw_vec__")
    )
    fn = knn_batch if strategy == "batch" else knn_auto
    res = fn(
        queries,
        corpus,
        k=m.k,
        metric=m.metric,
        query_id_col="__rw_qid__",
        query_vec_col="__rw_qvec__",
        id_col="__rw_id__",
        vector_col="__rw_vec__",
        **knn_kw,
    )
    col_src = {"qid": "__rw_qid__", "id": "__rw_id__", "dist": "dist", "rank": "rank"}
    picks = [F.col(col_src[role]).alias(name) for role, name in m.out_spec]
    return res.select(*picks)


def with_knn_rewrite(df: DataFrame, **knn_kw) -> DataFrame:
    """``rewrite_knn_topk`` or, when the plan doesn't match, ``df`` itself —
    the fixed-point shape of an optimizer rule."""
    out = rewrite_knn_topk(df, **knn_kw)
    return df if out is None else out
