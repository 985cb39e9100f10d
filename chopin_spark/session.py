"""SparkSession factory with scale-appropriate defaults.

AQE on (runtime coalescing of small shuffle partitions + skew-join
splitting — the built-in half of chopin's par_merge_grid rebalancing,
cf. /root/reference/R/gridding.R:558-766), Arrow on (every Python
crossing is a vectorized Arrow batch), UTC session time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    master: str | None = None,
    app_name: str = "chopin_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # local[N] → one JVM; match shuffle width to cores, not the 200 default
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = os.cpu_count() if n == "*" else max(int(n), 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # CPU-bound Arrow-UDF stages (zonal partials, kernel weighting)
        # carry few bytes per task; the default 1 MB floor lets AQE
        # coalesce them to a handful of tasks and serialize the Python
        # work.  A small floor keeps parallelismFirst effective — at
        # production scale partitions dwarf this and behavior is default.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Plan-STRING rendering is synchronous driver work charged to
        # every query execution and every AQE stage update (the SQL
        # listener event carries physicalPlanDescription).  The closed-
        # form raster/D8 queries build ~100 KB expression trees, and
        # rendering them repeatedly cost ~0.5 s/query at bench scale —
        # at any scale it is pure observability overhead.  32 KB keeps
        # complete plans for every normal query (test_plans' pinned
        # fragments included) while truncating only the giant literal
        # chains.  Display-only: cannot affect results.
        .config("spark.sql.maxPlanStringLength", "32768")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
