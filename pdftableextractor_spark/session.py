"""Tuned SparkSession builder.

Defaults chosen for the 100 TB design point, scaled to sandbox local mode:
Arrow transport on (every kernel is an Arrow batch), AQE on with skew-join
splitting (heavy-tailed doc sizes), shuffle partitions sized to cores in
local mode (a real cluster run overrides via spark-submit --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "pdftableextractor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = master[len("local[") : -1] if master.startswith("local[") else "32"
    n = 32 if cores == "*" else int(cores)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # 4x cores: enough granularity for AQE to balance uneven partitions
        # without starving any core (same rule of thumb as a real cluster)
        .config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions or 4 * n)
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local inputs are small; the default 64m advisory size would let AQE
        # coalesce post-shuffle stages below the core count
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # small-input locality: testdata files are tens of MB; the default
        # 128m would hand a whole file to one task. Harmless at cluster
        # scale (real inputs have many files); override via extra_conf.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        # local mode runs everything in the driver JVM; a small heap turns
        # 32 threads of string/regex work into GC thrash (measured 5x)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g")
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_WAREHOUSE_DIR",
                os.path.join(os.getcwd(), "_artifacts", "spark-warehouse"),
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
