"""SparkSession factory for the engine.

Replaces the reference's session builder
(/root/reference/src/utils/spark_session.py:39-96) with a
scale-appropriate posture:

- The reference hardcodes ``spark.sql.shuffle.partitions=1`` and
  ``spark.default.parallelism=1`` — correct only for KB-scale local
  runs. We default to a CPU-proportional partition count locally and
  rely on AQE (coalescing + skew-join splitting) so the same code
  re-plans itself correctly on a 1000-executor cluster.
- The reference never pins ``spark.sql.session.timeZone`` even though
  its config declares Europe/Berlin; its day-bucketing silently follows
  the JVM default TZ (SURVEY.md §2.6 F6). We pin UTC for determinism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs every engine entry point applies to whatever
# session it is handed (the driver harness builds its own session).
RUNTIME_CONFS: dict[str, str] = {
    # testdata events.parquet carries TIMESTAMP(NANOS); Spark has no
    # nanosecond timestamp type, so read as epoch-nanos long and convert
    # (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session.

    Safe to call repeatedly; used by every ``queries()`` callable so the
    engine behaves identically under the driver's own SparkSession.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be non-settable on some builds; never fail the
            # query over tuning.
            pass
    return spark


def get_spark_session(
    app_name: str = "energy-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[N]`` where N comes from
    ``$SPARK_GRAFT_CPUS`` (driver convention) or all cores. On a real
    cluster the caller passes master=None with an external cluster
    manager config and only the SQL confs below matter.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # Guarded parse: a set-but-empty/non-numeric/zero value (common CI
    # accidents) falls back to all cores instead of building an
    # invalid local[] / local[0] master or raising before the session
    # even exists.
    if cpus != "*" and not (cpus.isdigit() and int(cpus) > 0):
        cpus = "*"
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    def base_builder():
        b = (
            SparkSession.builder.appName(app_name)
            .master(master)
            .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
            .config("spark.ui.enabled", "false")
            # Progress bars interleave \r frames with stdout; the driver
            # harness parses bench.py's final JSON line from a bounded
            # tail of the output, so keep the stream clean.
            .config("spark.ui.showConsoleProgress", "false")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            # Partition sizing for large scans: 128 MB input splits is
            # the right default for 100 TB parquet; harmless locally.
            .config("spark.sql.files.maxPartitionBytes", "134217728")
            # local[32] runs every executor thread inside the driver
            # JVM: size the heap for 32 concurrent task slots, not a
            # lone driver (8g showed multi-second GC spikes under the
            # bench workload).
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
            )
        )
        for k, v in RUNTIME_CONFS.items():
            b = b.config(k, v)
        return b

    builder = base_builder()
    # Real Delta Lake wherever delta-spark is installed (the
    # reference's storage layer —
    # /root/reference/src/utils/spark_session.py:77-90 registers the
    # Delta SQL extension + catalog). Import-gated: this container
    # ships parquet only, so the probe is a no-op here, but a session
    # built on a delta-equipped cluster gets the genuine code path and
    # tests/test_catalog.py's delta skips flip to passes.
    try:
        from delta import configure_spark_with_delta_pip  # type: ignore

        builder = builder.config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        builder = configure_spark_with_delta_pip(builder)
        delta_configured = True
    except ImportError:
        delta_configured = False
    try:
        spark = builder.getOrCreate()
    except Exception:
        if not delta_configured:
            raise
        # delta-spark is pip-installed but the jars can't resolve
        # (offline machine, empty ivy cache): degrade to the parquet
        # path instead of making every entry point unbootable — the
        # same posture as the ImportError branch.
        spark = base_builder().getOrCreate()
    return apply_runtime_confs(spark)
