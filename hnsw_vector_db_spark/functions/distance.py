"""Distance metrics as pure Column expressions over ``ARRAY<numeric>``.

Reference parity: the four metrics of ``core/hnsw/graph.py:23-43``
(euclidean :24-26, cosine-as-1-minus-sim with zero-norm guard :28-35,
manhattan :37-39, negated dot product :41-43) and the name-string dispatch
of ``graph.py:53,65``. All metrics sort ascending = most similar first,
exactly as the reference arranges (cosine returned as 1-sim, dot negated).

Spark-first design: these are built from the array higher-order functions
(``zip_with`` + ``aggregate``), NOT Python UDFs — the expressions stay
JVM-side inside whole-stage codegen, so a distance over a 100 TB vector
column never crosses the Python boundary. Inputs are cast elementwise to
DOUBLE first (the reference computes in float64 too, `engine.py:82`), which
also makes results bit-comparable with a DuckDB oracle casting ``::DOUBLE[]``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column | str) -> Column:
    """Column-ize and cast to array<double> so arithmetic is float64."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def lit_double_array(values) -> Column:
    """``array(<double literals>)`` built in ONE py4j round-trip.

    r12 optimization round (guide §1.2, driver cost): the idiomatic
    ``F.array(*[F.lit(float(v)) for v in vs])`` pays ~2 py4j calls per
    element — ~0.25 s per 64-dim query vector and ~1 s for a dim-1024
    table, per CALL, on the driver. One ``F.expr`` parse of the literal
    text builds the IDENTICAL tree (CreateArray of double Literals;
    ``repr`` is the shortest round-trip form and the SQL parser converts
    it with the same IEEE-exact path), so every downstream value is
    bit-unchanged. Non-finite values fall back to the per-element form
    (``inf``/``nan`` have no SQL literal)."""
    import math

    vals = [float(v) for v in values]
    if not vals:
        return F.array()
    if not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def lit_long_array(values) -> Column:
    """``array(<bigint literals>)`` in one round-trip — the integer twin
    of :func:`lit_double_array`."""
    vals = [int(v) for v in values]
    if not vals:
        return F.array()
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")


def dot_raw(a: Column | str, b: Column | str) -> Column:
    """Plain (un-negated) dot product — building block for cosine/dot."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """L2 norm of a vector column."""
    return F.sqrt(dot_raw(a, a))


def normalize(a: Column | str) -> Column:
    """Unit-normalize a vector (zero vector passes through unchanged).

    Pre-normalizing the corpus once turns every cosine query into a plain
    dot product — at scale this halves the flops and, done at write time,
    amortizes to zero. (The reference recomputes both norms per comparison,
    ``graph.py:30-32``.)

    NOTE: as a single Column expression the norm aggregate sits inside
    the per-element lambda and the generated code re-evaluates it per
    element (~2.8x slower, measured sf0.1). In a hot path prefer
    :func:`select_normalized`, which projects the norm to a plain column
    first.
    """
    a = _d(a)
    n = norm(a)
    return F.when(n == 0.0, a).otherwise(F.transform(a, lambda x: x / n))


def select_normalized(df, vector_col: str, out_col: str, *keep: str):
    """``df.select(*keep, normalize(vector_col) AS out_col)`` with the
    norm projected to a plain column BEFORE the per-element division —
    the codegen'd lambda then reads a scalar instead of re-running the
    aggregate per element (2.8x faster at 64 dims, measured sf0.1)."""
    base = df.select(*keep, _d(vector_col).alias("_nv")).select(
        *keep, "_nv", norm("_nv").alias("_nn")
    )
    unit = F.when(F.col("_nn") == 0.0, F.col("_nv")).otherwise(
        F.transform("_nv", lambda x: x / F.col("_nn"))
    )
    return base.select(*keep, unit.alias(out_col))


def squared_euclidean(a: Column | str, b: Column | str) -> Column:
    """Squared L2 — same ordering as euclidean, no sqrt; use for top-k."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean(a: Column | str, b: Column | str) -> Column:
    """L2 distance (reference `graph.py:24-26`)."""
    return F.sqrt(squared_euclidean(a, b))


def manhattan(a: Column | str, b: Column | str) -> Column:
    """L1 distance (reference `graph.py:37-39`)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine distance = 1 - cosine similarity, with the reference's
    zero-norm guard returning 1.0 (`graph.py:33-34`)."""
    na, nb = norm(a), norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(1.0)).otherwise(
        F.lit(1.0) - dot_raw(a, b) / (na * nb)
    )


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Negated dot product so ascending sort = most similar first
    (reference `graph.py:41-43`)."""
    return -dot_raw(a, b)


def cosine_to_const(a: Column | str, query: list[float]) -> Column:
    """Cosine distance to a known-constant query vector.

    Same semantics as :func:`cosine` (incl. the zero-norm guard,
    `graph.py:33-34`) but the query norm is a Python-computed literal, so
    the per-row work is one zip_with/aggregate instead of three.
    """
    import math

    qn = math.sqrt(sum(v * v for v in query))
    if qn == 0.0:
        return F.lit(1.0)
    q = lit_double_array(query)
    na = norm(a)
    return F.when(na == 0.0, F.lit(1.0)).otherwise(
        F.lit(1.0) - dot_raw(a, q) / (na * F.lit(qn))
    )


METRICS = {
    "euclidean": euclidean,
    "cosine": cosine,
    "manhattan": manhattan,
    "dot_product": dot_product,
    "squared_euclidean": squared_euclidean,
}


def distance(a: Column | str, b: Column | str, metric: str = "euclidean") -> Column:
    """Name-string metric dispatch (reference `graph.py:53,65`
    ``getattr(DistanceMetric, distance_metric)``)."""
    try:
        fn = METRICS[metric]
    except KeyError:
        raise ValueError(
            f"unknown metric {metric!r}; one of {sorted(METRICS)}"
        ) from None
    return fn(a, b)
