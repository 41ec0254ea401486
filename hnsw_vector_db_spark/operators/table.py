"""Vector-table lifecycle: insert / batch insert / upsert / delete / validate.

Reference parity:
- insert with optional caller id, auto-assign otherwise (`core/hnsw/graph.py:
  127-136`); a re-used external id silently overwrites (`graph.py:139`) — we
  make that an explicit, deterministic upsert instead.
- batch insert = REST loop with per-item failure count (`api/rest/server.py:
  202-230`) — here one vectorized append with invalid rows split to a
  rejects DataFrame (same partial-success semantics, set-oriented).
- delete = drop node + symmetric edges (`graph.py:191-207`) — here an
  anti-join (or, on a transactional table format, DELETE WHERE).
- dim check at ingress (`server.py:142-146`) — here a size() filter.
- metadata attach (`server.py:148-149`) + result-time lookup join
  (`server.py:174`) — here metadata simply lives as columns on the vectors
  table; the join form is `attach_metadata` (broadcast hash join).

Scale notes: validate/append/delete are all narrow or broadcast-side ops —
no full shuffle of the corpus. `upsert` shuffles only on the id key and is
exactly what a Delta/Iceberg MERGE plans; we express it engine-neutrally
as union + keep-latest so it runs on plain parquet too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def validate_vectors(
    df: DataFrame, dim: int, vector_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """Split a batch into (valid, rejects) by the reference's dim check
    (`server.py:142-146`). Null vectors are rejects too."""
    ok = F.col(vector_col).isNotNull() & (F.size(vector_col) == dim)
    return df.filter(ok), df.filter(~ok | F.col(vector_col).isNull())


#: Reference search-request bound: ``k`` is validated to [1, 1000] at the
#: API edge (`api/rest/server.py:33`, ``Field(10, ge=1, le=1000)``).
MAX_K = 1000


def validate_k(k: int, max_k: int = MAX_K) -> int:
    """Search-request contract parity (`api/rest/server.py:33`): the
    reference rejects any search with k outside [1, 1000] before it
    reaches the index; our kNN entry points apply the same bound.
    Accepts any integral type (numpy ints included); bools are rejected
    (True is an int subclass but never a sane k)."""
    import numbers

    if (
        isinstance(k, bool)
        or not isinstance(k, numbers.Integral)
        or not 1 <= k <= max_k
    ):
        raise ValueError(f"k must be an int in [1, {max_k}], got {k!r}")
    return int(k)


def insert_batch_capacity(
    base: DataFrame,
    new: DataFrame,
    dim: int,
    max_elements: int,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Capacity-guarded batch insert — the reference's ``max_elements``
    guard (`core/hnsw/graph.py:129-130` raises once ``len(self.nodes) >=
    max_elements``) in set-oriented form: rows beyond the remaining
    capacity are routed to the rejects DataFrame instead of raising
    per-row, deterministically (lowest id first is admitted).

    Returns (new_table, rejects); rejects = dim/null failures plus the
    capacity overflow. The ranking window runs over the NEW batch only
    (micro-batch sized, like :func:`assign_ids`), never the base table;
    the base contributes one metadata-cheap count."""
    valid, rejects = validate_vectors(new, dim, vector_col)
    room = max(max_elements - base.count(), 0)
    ranked = valid.withColumn(
        "_rn", F.row_number().over(Window.orderBy(F.col(id_col)))
    )
    accepted = ranked.filter(F.col("_rn") <= room).drop("_rn")
    overflow = ranked.filter(F.col("_rn") > room).drop("_rn")
    return base.unionByName(accepted), rejects.unionByName(overflow)


def assign_ids(
    df: DataFrame, start: int = 0, id_col: str = "vec_id", order_col: str | None = None
) -> DataFrame:
    """Deterministic id assignment, replacing the reference's monotonic
    counter (`graph.py:131-136`) and its guess-the-id race
    (`distributed_server.py:308`). Ids are row_number over a stable order —
    same input, same ids, on any cluster size.

    Scale note: a global row_number is a single-partition window; fine for
    micro-batches of new rows (the only place ids are minted), never run
    it over the full corpus.
    """
    order = F.col(order_col) if order_col else F.monotonically_increasing_id()
    w = Window.orderBy(order)
    return df.withColumn(id_col, F.row_number().over(w) + F.lit(start - 1))


def assign_ids_scalable(
    df: DataFrame,
    start: int = 0,
    id_col: str = "vec_id",
    order_col: str = "_order",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous deterministic ids WITHOUT a single-partition window —
    the any-size form of :func:`assign_ids`. Two phases, the classic
    zipWithIndex shape expressed in DataFrame ops:

    1. range-shuffle on the (unique, non-null) order key, local
       row_number per partition — each partition ranks independently;
    2. per-partition counts (P tiny rows) collected once to compute the
       cumulative offset each partition adds — the same driver pass
       ``RDD.zipWithIndex`` performs, O(partitions) not O(rows).

    Global id = partition offset + local rank + start. Deterministic for
    a unique order key: range partitioning puts equal-prefix runs in
    order, and the offset table is a pure function of partition sizes.
    The window in phase 1 is PARTITIONED — no stage funnels the corpus
    through one task, so this holds at any scale (the reference's
    counter, `core/hnsw/graph.py:131-136`, is a single mutex'd int).
    """
    P = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(P, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Offsets are computed IN THE SAME PLAN as the ranks, never in a
    # separate job: repartitionByRange draws its boundaries by SAMPLING,
    # so two actions over it can land rows in different partitions — a
    # separate count job produced colliding ids (caught by the sf0.1
    # strict sweep). Within one plan the range exchange is computed once
    # and reused (ReusedExchange), so both branches see identical
    # partitions. The offset branch reduces to P rows before its
    # single-partition cumsum window — the corpus itself never funnels
    # through one task.
    w_rank = Window.partitionBy("_pid").orderBy(order_col)
    ranked = ranged.withColumn("_rn", F.row_number().over(w_rank))
    per_pid = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = per_pid.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        ranked.join(F.broadcast(offs), "_pid")
        .withColumn(id_col, (F.col("_rn") + F.col("_off") + F.lit(start - 1)).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def insert_batch(
    base: DataFrame, new: DataFrame, dim: int, vector_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """Batch insert = validate + append (`server.py:202-230` vectorized).
    Returns (new_table, rejects)."""
    valid, rejects = validate_vectors(new, dim, vector_col)
    return base.unionByName(valid), rejects


def upsert(
    base: DataFrame, updates: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Keyed upsert: rows in ``updates`` win over same-id rows in ``base``
    — the explicit form of the reference's silent overwrite-by-external-id
    (`graph.py:131-139`). Within ``updates`` the last occurrence wins.

    Plans as union + per-id keep-one: one hash shuffle on the id key (what
    a MERGE does under the hood). AQE handles skew on hot ids.
    """
    b = base.withColumn("_src", F.lit(0)).withColumn("_ord", F.lit(0))
    u = updates.withColumn("_src", F.lit(1)).withColumn(
        "_ord", F.monotonically_increasing_id()
    )
    allrows = b.unionByName(u)
    w = Window.partitionBy(id_col).orderBy(
        F.col("_src").desc(), F.col("_ord").desc()
    )
    return (
        allrows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_ord", "_rn")
    )


def delete_ids(
    base: DataFrame, ids: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Point/bulk delete as an anti-join (`graph.py:191-207`). The delete
    set is broadcast (it is small by nature); the corpus never shuffles.
    Unlike the reference, no stranded-edge problem exists — derived
    indexes are rebuilt, not patched."""
    return base.join(F.broadcast(ids.select(id_col)), id_col, "left_anti")


def attach_metadata(
    results: DataFrame, metadata: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Result enrichment join (`server.py:174`'s per-row dict lookup as a
    broadcast hash join). Left join: hits without metadata keep nulls, as
    the reference's ``.get(id, {})`` does."""
    return results.join(F.broadcast(metadata), id_col, "left")


def train_val_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val split by portable hash of the id: row ->
    'val' iff poly_hash(str(id)) % 100 < val_pct. Pure codegen projection,
    no shuffle, and the SAME rows land in 'val' on any cluster, any
    partitioning, any engine that reproduces the hash (the property random
    splits lose the moment data moves). The assignment also survives
    appends — new rows don't reshuffle old ones, unlike randomSplit.
    """
    from hnsw_vector_db_spark.functions.text import poly_hash

    bucket = poly_hash(F.col(id_col).cast("string")) % 100
    return df.withColumn(
        split_col, F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train"))
    )
