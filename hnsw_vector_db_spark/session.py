"""SparkSession construction with scale-appropriate defaults.

The reference boots one process per node with a global lock
(`core/hnsw/graph.py:70`); our unit of deployment is a SparkSession whose
configs are chosen for a many-executor cluster and merely exercised on
local[N] here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the test harness (local[32], 128 GiB). On a real
# cluster these come from spark-submit; everything here is safe to override.
_DEFAULTS = {
    # AQE re-plans shuffles at runtime: coalesces small partitions, splits
    # skewed ones, and converts sort-merge joins to broadcast when a side
    # turns out small — all critical at 100 TB where static planning guesses
    # wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow makes pandas_udf / applyInPandas / toPandas batch-columnar
    # instead of row-pickled (~10-100x on the Python boundary).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Shuffle width for the local harness; on a cluster AQE coalesces from
    # a deliberately-high initial number instead.
    "spark.sql.shuffle.partitions": "32",
    # 128 MiB scan splits: big enough to amortize task overhead, small
    # enough that a 100 TB table still yields ~800k parallel splits.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Operators built on applyInPandas/mapInPandas close over classes and
    functions from this package; cloudpickle serializes those by
    *reference*, so the worker must be able to import the module. A host
    session (e.g. the verify driver) won't have the repo on PYTHONPATH —
    ship the package once per SparkContext via addPyFile (a zip of the
    package travels with every task's file server fetch, exactly how
    spark-submit --py-files deploys to a real cluster).
    """
    import os
    import tempfile
    import zipfile

    sc = spark.sparkContext
    if getattr(sc, "_hnsw_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"hnsw_vector_db_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    sc.addPyFile(zpath)
    sc._hnsw_pkg_shipped = True


def get_spark(app_name: str = "hnsw_vector_db_spark", **overrides: str) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Master resolves from ``SPARK_GRAFT_CPUS`` (default ``local[*]``) so the
    same code path runs under the driver harness and on a cluster (where
    ``--master`` wins because an active session already exists).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf.update({k: str(v) for k, v in overrides.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
