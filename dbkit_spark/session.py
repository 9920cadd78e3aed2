"""SparkSession factory with scale-tuned defaults.

The reference engine is a single-process library with a pluggable allocator
and 1024-row batches (reference ``operation/mod.rs:8-9``,
``allocator.rs:20-33``). On Spark those concerns map to session config, not
code: Arrow batch sizing, AQE, shuffle partition sizing, broadcast
thresholds. This module centralizes the defaults used by every test, query,
and the bench harness.

Scale notes (100 TB target):
- AQE on: runtime partition coalescing + skew-join splitting mean the same
  plan works at sf0.001 and at 100 TB without hand-retuning
  ``spark.sql.shuffle.partitions`` per query.
- ``spark.sql.shuffle.partitions`` here defaults to ~cores for local runs;
  on a real cluster you set it to 2-3x total executor cores (or leave AQE's
  coalescing to trim an intentionally high value).
- Arrow enabled: every pandas-UDF crossing is Arrow-batched (the analogue of
  the reference's columnar ``CursorChunk`` batches).
- ANSI mode stays at the Spark 4 default (on) for strict cast/overflow
  semantics, matching the reference's checked type system (``types.rs``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "dbkit-spark"

# Repo root (the directory containing the dbkit_spark package). Worker
# processes must be able to import `dbkit_spark` regardless of the
# driver's cwd: mapInPandas closures that call in-package codecs
# (jpeg/audio/video decode, tokenizers) unpickle on executors, and a
# driver launched from outside the repo would otherwise fail with
# ModuleNotFoundError on the worker side.
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def build_session(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's tuned defaults."""
    cores = default_parallelism()
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores ts as TIMESTAMP(NANOS); Spark has no nanos
        # type — read as long and convert in sources.read_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # Location-independent worker imports: prepend the repo root to
        # every executor's PYTHONPATH so `import dbkit_spark` inside a
        # pandas-UDF closure resolves even when the driver cwd is
        # elsewhere. On a real cluster the same line works when the repo
        # is deployed to a shared path; for isolated executors, ship a
        # zip via ``sc.addPyFile`` instead.
        .config(
            "spark.executorEnv.PYTHONPATH",
            _PKG_ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_session() -> SparkSession:
    """Active session if one exists, else a new tuned one."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return build_session()
