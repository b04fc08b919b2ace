"""SparkSession factory + configuration resolution.

Replaces the reference's connection-string resolution chain
(``/root/reference/src/bio2bel/utils.py:120-138`` — env var > config file >
default) and engine/session construction
(``/root/reference/src/bio2bel/manager/connection_manager.py:100-148``) with a
SparkSession builder whose warehouse directory plays the role of the SQL
database.

Scale notes
-----------
* ``spark.sql.adaptive.enabled`` is on so skewed joins/aggregations re-plan at
  runtime on a real cluster.
* ``spark.sql.shuffle.partitions`` defaults to the local core count here; on a
  1000-executor cluster it should be set to 2-3× total cores (or left to AQE
  coalescing, which is enabled).
* Arrow execution is enabled for the few pandas-UDF paths (grounding,
  multimodal decode) so Python boundaries are Arrow-batched, never per-row.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

#: Environment variable that overrides the warehouse directory, mirroring the
#: reference's ``BIO2BEL_CONNECTION`` env override (utils.py:120-138).
WAREHOUSE_ENV = "BIO2BEL_SPARK_WAREHOUSE"
DEFAULT_APP_NAME = "bio2bel-spark"


def resolve_warehouse(explicit: Optional[str] = None) -> str:
    """Resolve the warehouse path: explicit arg > env var > default.

    Mirrors the precedence chain of ``get_connection``
    (``/root/reference/src/bio2bel/utils.py:120-138``).
    """
    if explicit:
        return explicit
    env = os.environ.get(WAREHOUSE_ENV)
    if env:
        return env
    return os.path.join(os.path.expanduser("~"), ".bio2bel_spark", "warehouse")


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: Optional[str] = None,
    warehouse: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict] = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[N]`` with N from ``SPARK_GRAFT_CPUS`` (or
    all cores); on a cluster, leave it unset and submit via spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.warehouse.dir", resolve_warehouse(warehouse))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet is the storage format for every managed table; enable
        # filter pushdown + vectorized reads explicitly (defaults, pinned).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # driver testdata has shipped TIMESTAMP(NANOS) and bare-micros
        # layouts; read nanos as long and normalize explicitly
        # (see bio2bel_spark.tables._normalize_ts)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # deterministic NTZ<->TIMESTAMP casts and epochs everywhere; also
        # what makes DuckDB's epoch_us on naive parquet values match ours
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
