"""Scale linter: the repo's 100 TB plan rules as an executable check.

Every scale defect this project has caught by eye and then fixed —
`tfidf_top_terms`' corpus-vocabulary broadcast, `benchmark_decontaminate`'s
corpus-side broadcast, accidental cross joins, row-at-a-time Python UDFs in
hot paths — is a PLAN property, visible before a single row is processed.
This module walks the physical plan (pre-AQE ``sparkPlan``, so the written
query's shape is judged, not one runtime sample's) and flags the patterns
that die at 100x data:

========================  =======  ====================================
rule                      level    meaning
========================  =======  ====================================
cartesian-product         error    CartesianProduct: Q*N row explosion
hinted-broadcast-agg      error/   an explicit broadcast() HINT over a
                          warning  groupBy(key) result. Unfiltered key
                                   domain = the whole corpus's key
                                   space forced to every executor (the
                                   tfidf lesson) -> error. With a
                                   Filter below the aggregate the
                                   domain is the author's boundedness
                                   claim (the bm25 query-terms shape)
                                   -> warning for review. Keyless
                                   single-row aggregates never flag;
                                   UNHINTED broadcasts chosen by the
                                   planner from size stats are fine
                                   (AQE re-decides at real scale).
row-python-udf            error    BatchEvalPython: row-pickled Python
                                   in the plan (use builtins or a
                                   pandas_udf)
arrow-python-udf          info     ArrowEvalPython / pandas operators:
                                   the sanctioned Python boundary —
                                   listed so hot paths stay auditable
broadcast-nl-join         warning  BroadcastNestedLoopJoin: fine for a
                                   deliberate small-side cross/theta
                                   join, deadly if the build side
                                   scales — review the build subtree
========================  =======  ====================================

Usage::

    from hnsw_vector_db_spark.plans.lint import lint_plan, assert_scale_clean
    findings = lint_plan(df)          # [LintFinding(level, rule, detail)]
    assert_scale_clean(df)            # raises on any error-level finding

The reference has no optimizer to lint (SURVEY.md §4); here the optimizer
IS the engine, so the rules that keep its plans scale-safe are part of the
library surface, not reviewer folklore. `tests/test_plan_lint.py` proves
each rule on a deliberately bad plan and keeps the flagship queries clean.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = ["LintFinding", "lint_plan", "assert_scale_clean"]

# pandas-batch operators: the sanctioned Python boundary (grouped-map /
# map-in-pandas / grouped-agg), reported as info so hot paths stay visible
_PANDAS_NODES = (
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "AggregateInPandas",
    "FlatMapCoGroupsInPandas",
)


@dataclass
class LintFinding:
    level: str  # "error" | "warning" | "info"
    rule: str
    detail: str


from hnsw_vector_db_spark.plans.explain import iter_tree, node_class


def _first_aggs(node, filtered_output: bool = False):
    """Yield (aggregate, output_filtered) for the TOPMOST Aggregate on
    each path — the node whose grouping decides the broadcast's
    cardinality. Deeper aggregates are that node's lineage, not its
    output, and must not flag (a single-row total OVER a keyed
    vocabulary is still one row). A Filter ABOVE the aggregate subsets
    the broadcast rows directly, whatever column it tests — recorded as
    output_filtered."""
    if node_class(node) == "Aggregate":
        yield node, filtered_output
        return
    if node_class(node) == "Filter":
        filtered_output = True
    for i in range(node.children().size()):
        yield from _first_aggs(node.children().apply(i), filtered_output)


def _refs_ids(expr) -> set:
    it = expr.references().iterator()
    out = set()
    while it.hasNext():
        out.add(it.next().exprId().id())
    return out


def _key_constrained_below(agg) -> bool:
    """True iff some Filter BELOW the aggregate tests the GROUPING key's
    own attributes — the only below-agg filter shape that bounds the key
    domain. An incidental filter (non-null text, quality gate) reduces
    rows but not distinct keys, and must NOT excuse the broadcast (the
    escape a first version of this rule had)."""
    key_ids = set()
    ges = agg.groupingExpressions()
    for i in range(ges.size()):
        key_ids |= _refs_ids(ges.apply(i))
    if not key_ids:
        return False
    for i in range(agg.children().size()):
        for d in iter_tree(agg.children().apply(i)):
            if node_class(d) == "Filter" and _refs_ids(d.condition()) & key_ids:
                return True
    return False


def _hinted_broadcast_findings(analyzed) -> list["LintFinding"]:
    """error/warning per keyed aggregate under an explicit broadcast hint
    (ResolvedHint(strategy=broadcast) in the ANALYZED logical plan — only
    user hints appear there; planner/stats broadcasts don't)."""
    out: list[LintFinding] = []
    for node in iter_tree(analyzed):
        if node_class(node) != "ResolvedHint":
            continue
        if "broadcast" not in str(node.hints().toString()).lower():
            continue
        for agg, output_filtered in _first_aggs(node):
            try:
                keyless = agg.groupingExpressions().size() == 0
                filtered = output_filtered or _key_constrained_below(agg)
            except Exception as ex:  # fail CLOSED: unclassifiable -> finding
                out.append(
                    LintFinding(
                        "warning",
                        "hinted-broadcast-agg",
                        "broadcast() hint over an aggregate the linter "
                        f"could not classify ({type(ex).__name__}) — "
                        "review by hand",
                    )
                )
                continue
            if keyless:
                # single-row global aggregate: sanctioned regardless of
                # what feeds it — ITS output is what gets broadcast
                continue
            if filtered:
                out.append(
                    LintFinding(
                        "warning",
                        "hinted-broadcast-agg",
                        "broadcast() hint over a keyed aggregate whose "
                        "key domain or output IS filtered — the hint "
                        "asserts that bound (the bm25 query-terms / "
                        "exact-dedup collided shapes); review that it "
                        "holds at scale",
                    )
                )
            else:
                out.append(
                    LintFinding(
                        "error",
                        "hinted-broadcast-agg",
                        "broadcast() hint over a keyed aggregate with no "
                        "filter on the key domain or on the aggregate "
                        "output (an incidental row filter does not bound "
                        "distinct keys): key cardinality grows with the "
                        "data, "
                        "so the hint forces an unbounded table to the "
                        "driver and every executor (the tfidf lesson) — "
                        "drop the hint (AQE broadcasts genuinely small "
                        "sides at runtime) or join by shuffle",
                    )
                )
    return out


def lint_plan(df: DataFrame) -> list[LintFinding]:
    """Lint the plan; see module docstring for the rules. Broadcast-hint
    rules read the ANALYZED logical plan (hints are invisible after
    physical planning); everything else reads the pre-AQE physical plan
    (so the written query's shape is judged, not one runtime sample)."""
    qe = df._jdf.queryExecution()
    findings: list[LintFinding] = _hinted_broadcast_findings(qe.analyzed())
    plan = qe.sparkPlan()
    for node in iter_tree(plan):
        name = node.nodeName()
        if name == "CartesianProduct":
            findings.append(
                LintFinding(
                    "error",
                    "cartesian-product",
                    "CartesianProduct in the plan: output rows = |left| * "
                    "|right|; express the relationship as a key join, or "
                    "broadcast a provably-bounded side explicitly",
                )
            )
        elif name == "BroadcastNestedLoopJoin":
            findings.append(
                LintFinding(
                    "warning",
                    "broadcast-nl-join",
                    "BroadcastNestedLoopJoin: fine for a deliberate "
                    "bounded-side cross/theta join; review that the "
                    "build side cannot scale with the data",
                )
            )
        elif name == "BatchEvalPython":
            findings.append(
                LintFinding(
                    "error",
                    "row-python-udf",
                    "BatchEvalPython: row-pickled Python UDF in the plan — "
                    "use built-in Column functions, or a pandas_udf if "
                    "Python is unavoidable",
                )
            )
        elif any(name.startswith(p) for p in _PANDAS_NODES):
            findings.append(
                LintFinding(
                    "info",
                    "arrow-python-udf",
                    f"{name}: Arrow-batched Python boundary (sanctioned — "
                    "listed for hot-path auditability)",
                )
            )
    return findings


def assert_scale_clean(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise AssertionError listing every error-level finding not in
    ``allow`` (rule names). Warnings/info never fail."""
    errors = [
        f for f in lint_plan(df) if f.level == "error" and f.rule not in allow
    ]
    if errors:
        lines = "\n".join(f"- [{f.rule}] {f.detail}" for f in errors)
        raise AssertionError(f"plan fails the scale lint:\n{lines}")
