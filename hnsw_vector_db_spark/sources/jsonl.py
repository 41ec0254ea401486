"""JSON-lines corpus ingestion — the format raw training corpora
actually arrive in (one JSON document per line, millions of files).

The reference only loads its own snapshot files
(`core/storage/engine.py:57-126`); a corpus engine needs the messy
front door too. Rules that matter at 100 TB:

- ALWAYS pass an explicit schema. Schema inference reads the data
  twice and can silently widen types per-file; an explicit schema makes
  ingestion one single-pass scan with stable types.
- Capture corrupt lines instead of failing the job: PERMISSIVE mode
  routes unparseable lines to ``_corrupt_record`` so a thousand bad
  lines in a billion don't kill the run — filter them into a quarantine
  sink and keep going.
- JSONL is splittable line-by-line, so parallelism is free; gzip'd
  JSONL is NOT splittable (one task per file) — document upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars int, "
    "_corrupt_record string"
)


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL documents corpus; returns (good, quarantine).

    Good rows carry the documents schema; quarantine rows carry the raw
    unparseable line for later inspection. One scan, no inference pass.
    """
    raw = (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark requires caching/materialization before filtering on the
    # corrupt column alone (referential transparency of the parser)
    raw = raw.cache()
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad


def write_documents_jsonl(df: DataFrame, path: str, n_files: int = 1) -> None:
    """Write a documents table as JSONL (interchange/export sink)."""
    df.coalesce(n_files).write.mode("overwrite").json(path)
