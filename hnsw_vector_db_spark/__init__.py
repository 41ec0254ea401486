"""hnsw_vector_db_spark — a PySpark-native analytics engine with the query
capabilities of the reference vector database (shra4747/HNSW-Vector-DB,
"VectorFlow"), re-expressed Spark-first.

The reference is a single-table vector store answering top-k nearest-neighbor
queries over an in-memory HNSW graph (`core/hnsw/graph.py`), with keyed
insert/upsert/delete, JSON metadata, snapshot persistence
(`core/storage/engine.py`), and Raft-replicated ingest
(`distributed/raft/node.py`). This engine maps each capability onto Spark
DataFrame/SQL primitives (see SURVEY.md §2 for the operator-by-operator
mapping) and extends them with the batch-scale operators a training-data
pipeline needs: dedup, similarity join/search, text analysis, streaming
ingest.

Layout:
    functions/   Column-expression builders (distance metrics, text hashing)
    operators/   DataFrame -> DataFrame operators (knn, table lifecycle,
                 stats, dedup, text analysis, similarity search)
    sources/     parquet snapshot source/sink + testdata table registry
    plans/       plan-inspection helpers (pushdown/broadcast assertions)
    streaming/   Structured Streaming ingest + windowed aggregation
"""

__version__ = "0.1.0"
