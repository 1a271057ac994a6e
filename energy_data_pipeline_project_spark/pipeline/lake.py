"""Lake layout + table IO for the medallion layers.

Path-addressed tables like the reference
(/root/reference/src/utils/paths.py): ``{root}/{layer}/{table}``.
Writes are full overwrites — every run is an idempotent refresh
(reference S6 semantics). Format is config-driven: parquet by default,
Delta when delta-spark is on the classpath (import-gated; the
container for this project ships parquet only).

Scale posture: ``partition_by`` is the opt-in day-partitioning knob
(bronze uses it via incremental ingest's ``date=`` layout; a 100 TB
deployment would pass ``("date",)`` for silver/gold too so day-keyed
queries get static + dynamic partition pruning). The reference leaves
its tables unpartitioned (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

LAYERS = ("bronze", "silver", "gold")


def table_path(root: str, layer: str, name: str) -> str:
    assert layer in LAYERS, layer
    return os.path.join(root, layer, name)


def resolve_table_format(spark: SparkSession, requested: str) -> str:
    """Resolve a config ``table_format`` to a concrete writer format.

    Every lake IO function below resolves its ``fmt`` through this,
    so a config carrying the literal ``"auto"`` works end to end
    (runner, CLI compaction, incremental ingest, direct callers).

    ``"auto"`` picks real Delta whenever the jars are on the classpath
    (reference storage parity —
    /root/reference/src/utils/spark_session.py:77-90) and falls back
    to parquet + the engine's pointer-file versioning otherwise; any
    explicit format passes through untouched."""
    if requested == "auto":
        return "delta" if delta_available(spark) else "parquet"
    return requested


def delta_available(spark: SparkSession) -> bool:
    # NB: plain attribute access on spark._jvm returns a lazy
    # JavaPackage even for classes that don't exist — only Class.forName
    # actually proves the Delta jars are on the classpath.
    try:
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
) -> None:
    fmt = resolve_table_format(df.sparkSession, fmt)
    writer = df.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_table_observed(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    null_check_cols: tuple[str, ...] = (),
) -> dict:
    """Overwrite ``path`` and return write-pass metrics for free.

    The reference verifies its pipeline by RE-READING all seven tables
    and counting them (``/root/reference/src/main.py:88-101``) — a
    second full scan per table. A Spark ``Observation`` attaches
    accumulator-backed aggregates to the write job itself, so row
    counts and per-column null counts arrive with the write: at 100 TB
    the verification costs zero extra IO. Returns
    ``{"n_rows": …, "nulls_<col>": …}``.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    fmt = resolve_table_format(df.sparkSession, fmt)
    obs = Observation()
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_check_cols:
        exprs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nulls_{c}")
        )
    observed = df.observe(obs, *exprs)
    writer = observed.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    return dict(obs.get)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    # NON-destructively serve a parked table: a writer that died
    # between _atomic_swap's two renames leaves the data at
    # ._pre_swap, and until r07 every plain read failed with "path
    # does not exist" until the next swap-calling WRITER healed it.
    # Reading the parked directory (the funnel_report precedent)
    # serves both the crashed case and the instant a LIVE writer is
    # mid-swap — an eager rename here would race that writer's second
    # rename and strand its new version (r07 diff review); mutation
    # stays with writers (_recover_pre_swap).
    src = path
    pre = path.rstrip("/") + "._pre_swap"
    if not os.path.exists(path) and os.path.isdir(pre):
        src = pre
    return spark.read.format(resolve_table_format(spark, fmt)).load(src)


def compact_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite a table into ~``ceil(rows / target_rows_per_file)``
    files. Returns the file count written.

    The small-file problem is the dominant operational cost of a
    many-small-batch lake (bronze ingests one file per day-payload by
    design — see pipeline/ingestion.py): a 100 TB table accreted in
    small increments can hold millions of KB-sized files, and every
    scan then pays file-open + footer-read + task-schedule per file.
    Periodic compaction rewrites cold partitions into scan-sized files.

    Mechanics: count once (metadata-only for parquet), then rewrite
    through round-robin ``repartition(n)`` — an all-to-all exchange
    that produces evenly-sized output files (``coalesce`` would skip
    the shuffle but glues existing partitions, preserving skew).  The
    rewrite stages into a sibling directory and swaps via rename, so a
    reader never observes a half-written table; the swap is the same
    idempotent-overwrite semantic as ``write_table``.
    """
    import math

    fmt = resolve_table_format(spark, fmt)
    _recover_pre_swap(path)
    df = spark.read.format(fmt).load(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    staged = path.rstrip("/") + "._compacting"
    # A hive-partitioned table (e.g. bronze's date= layout from
    # incremental ingest) must keep its layout through compaction, or
    # partition pruning dies and the next incremental run sees a
    # "legacy flat" table and pays a full rewrite.
    pcols = _partition_columns(path)
    if pcols:
        import pyspark.sql.functions as F

        # Hash-partition on the layout columns: each hive partition is
        # then written by exactly one task (one file per partition
        # dir). Round-robin repartition(n) here would spread EVERY
        # partition's rows across all n tasks, so output could grow to
        # n_files × n_partitions files — compaction that adds files.
        # A partition hotter than target_rows_per_file still compacts
        # to a single file: the target is a goal, not a bound.
        shaped = df.repartition(n_files, *[F.col(c) for c in pcols])
        writer = (
            shaped.write.format(fmt).mode("overwrite").partitionBy(*pcols)
        )
    else:
        writer = df.repartition(n_files).write.format(fmt).mode("overwrite")
    writer.save(staged)
    _atomic_swap(path, staged)
    if pcols:
        # the partitioned path writes one file per hive partition, not
        # n_files — report the real count, not the flat-path estimate
        # (r06 diff review: the operator log printed the wrong number)
        import glob as _glob

        return len(
            [
                f
                for f in _glob.glob(
                    os.path.join(path, *(["*"] * len(pcols)), "part-*")
                )
                if not f.endswith(".crc")
            ]
        )
    return n_files


def _partition_columns(path: str) -> list[str]:
    """Hive-style partition columns of ``path``, outermost first, by
    directory-name inspection (``col=value`` entries)."""
    cols: list[str] = []
    cur = path
    while os.path.isdir(cur):
        parts = [
            e
            for e in os.listdir(cur)
            if "=" in e and os.path.isdir(os.path.join(cur, e))
        ]
        if not parts:
            break
        col = parts[0].split("=", 1)[0]
        cols.append(col)
        cur = os.path.join(cur, parts[0])
    return cols


def read_parquet_index(spark: SparkSession, path: str) -> "DataFrame | None":
    """Read a growing foreachBatch index/log directory; ``None`` means
    cold start — the path is missing OR it is a pre-existing
    schema-less directory (legacy dirs with only ``_SUCCESS``; empty
    writes themselves are skipped by the lake-level guard). Any OTHER
    analysis failure — renamed/missing columns, schema drift — must
    PROPAGATE: silently treating it as empty would screen/attribute
    against nothing and persist wrong results. Centralizes the guard
    attribution.py carried alone while its sibling index readers
    (dedup_index, span_index) crash-looped on the same legacy-dir
    case (r07 review)."""
    from pyspark.errors import AnalysisException

    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        infer = getattr(e, "getErrorClass", lambda: None)()
        if infer != "UNABLE_TO_INFER_SCHEMA" and (
            "UNABLE_TO_INFER_SCHEMA" not in str(e)
        ):
            raise
        return None


def _recover_pre_swap(path: str) -> None:
    """Self-heal a crash inside ``_atomic_swap``'s rename window: the
    table parked at ``._pre_swap`` with no live ``path`` is restored;
    a stale parked copy NEXT TO a live table (crash after the second
    rename) is cleaned up. Centralized here so every swap caller
    (compaction, upsert, incremental ingest) heals the same way."""
    import shutil

    pre = path.rstrip("/") + "._pre_swap"
    if not os.path.exists(pre):
        return
    if os.path.exists(path):
        shutil.rmtree(pre)
    else:
        os.rename(pre, path)


def write_batch_partition(df: "DataFrame", path: str, batch_id: int) -> None:
    """Replay-idempotent per-batch sink write: rows land in (and only
    in) the batch's own ``batch_id=<n>`` partition; a re-delivered
    batch REPLACES that partition. The overwrite mode is set as a
    PER-WRITER option (not a session conf set/restore, which races
    between concurrently running streaming queries and can flip a
    writer into static overwrite — wiping every other partition).

    Legacy adoption: a sink directory that predates partitioning
    (flat part-files at the root) would break partition discovery the
    moment ``batch_id=`` dirs appear; such files are moved once into
    a ``batch_id=-1`` partition, whose value partition-discovery then
    supplies for the old rows."""
    import pyspark.sql.functions as F

    _adopt_legacy_flat(path)
    if df.isEmpty():
        # Writing an empty frame would still create the directory with
        # only _SUCCESS — a schema-less sink that breaks every later
        # read. An empty batch is deterministic on redelivery (same
        # input rows -> same empty output), so there is no stale
        # partition to replace either; skipping is the idempotent act.
        return
    (
        df.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def _adopt_legacy_flat(path: str) -> None:
    """Move root-level data files of ``path`` into ``batch_id=-1/``."""
    if not os.path.isdir(path):
        return
    entries = os.listdir(path)
    if any(e.startswith("batch_id=") for e in entries):
        return
    data = [
        e
        for e in entries
        if not e.startswith(("_", "."))
        and os.path.isfile(os.path.join(path, e))
    ]
    if not data:
        return
    legacy = os.path.join(path, "batch_id=-1")
    os.makedirs(legacy, exist_ok=True)
    for e in data:
        os.rename(os.path.join(path, e), os.path.join(legacy, e))


def _atomic_swap(path: str, staged: str) -> None:
    """Replace ``path`` with ``staged`` via two renames. Readers never
    see a PARTIAL write, but there is an instant between the renames
    where ``path`` does not exist: a concurrent reader in that window
    fails fast with path-does-not-exist (retryable), and a writer
    crash in the window parks the table at ``._pre_swap`` —
    ``_recover_pre_swap`` heals that on the next read or write. True
    both-versions-visible swaps need the pointer design of
    ``write_table_versioned`` (or a transaction log); an
    object-store deployment would use that path instead."""
    import shutil

    old = path.rstrip("/") + "._pre_swap"
    os.rename(path, old)
    try:
        os.rename(staged, path)
    except Exception:
        os.rename(old, path)  # roll back
        raise
    shutil.rmtree(old)


def upsert_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    order_col: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Merge-by-key into a path-addressed table: latest row per key
    wins (by ``order_col``; an update beats an existing row on ties).
    This is MERGE INTO for a plain-parquet lake — Delta does it
    transactionally (the reference's format); without a log the same
    semantics come from deduplicated rewrite + atomic directory swap.

    Scale shape: with ``partition_by`` set, only the partitions the
    updates actually touch are read, merged, and overwritten (dynamic
    partition overwrite — per-write option, not session conf). The
    fast path is only sound while every updated key's rows live in ONE
    partition: an update whose key also has rows in a different
    partition leaves the superseded row alive there (dynamic overwrite
    never rewrites a partition the output doesn't land in),
    duplicating the key (r07 review). Soundness is established one of
    two ways:

    - ZERO-COST when the partition column is itself one of the key
      columns: each key then has exactly one partition value by
      definition and can never span, so the fast path engages with no
      check at all (the common date-keyed merge shape).
    - Otherwise a moved-key probe runs: existing rows of updated keys
      (a column-pruned key+partition read of the table, semi-joined
      against the update keys — the same matching-files pass Delta's
      MERGE pays on a table without a key-partition constraint) are
      checked for spanning. The REWRITE stays proportional to touched
      partitions, but this probe reads the table's key/partition
      columns in full each call; callers merging high-frequency
      micro-batches into a huge table should either include the
      partition column in the key or maintain an external
      key→partition index — this function deliberately does not cache
      one, because a stale cache recreates the exact silent-loss bug
      the probe exists to prevent.

    On any detected spanning, the merge falls back to the full staged
    rewrite + swap (layout preserved). Unpartitioned tables always
    take the full rewrite + swap. The keep-latest dedup is one window
    over the key — the same row_number idiom as dedup_latest_order.
    """
    fmt = resolve_table_format(spark, fmt)
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    _recover_pre_swap(path)
    existing = spark.read.format(fmt).load(path)
    tagged_old = existing.withColumn("_upd", F.lit(0))
    tagged_new = updates.select(*existing.columns).withColumn(
        "_upd", F.lit(1)
    )

    partition_scoped = False
    if partition_by:
        pcols = list(partition_by)
        if all(p in key_cols for p in pcols):
            # EVERY partition column ∈ key → one partition tuple per
            # key by definition, spanning is impossible: fast path
            # with no probe job at all (r07 advisor; r08 review
            # tightened the test from partition_by[0] to ALL columns —
            # with ("date","region") partitioning and only date in
            # the key, a key could still span region values and the
            # old first-column shortcut stranded the loser's row)
            partition_scoped = True
        else:
            # The fast path is sound iff every updated key's rows —
            # existing AND update — live in ONE partition tuple: then
            # the winning row lands in that partition, the dynamic
            # overwrite rewrites it, and every loser is retired with
            # it. A weaker input-partition-set comparison missed an
            # update batch that itself carries the same key in two
            # partitions (the losing row's partition gets no output
            # and its stale row survives — r07 diff review).
            # Spanning is measured over the FULL partition tuple
            # (countDistinct of the struct — a struct is never NULL
            # itself, so NULL-bearing tuples are counted distinctly,
            # replacing the old isNull max term), and the updated-key
            # semi-join is NULL-SAFE: a plain leftsemi never matches
            # NULL keys, so a NULL-keyed moved row slipped past the
            # probe while the merge window (which groups NULLs) would
            # have retired it on the slow path (r08 review). The
            # existing-side read selects only key+partition columns,
            # so the parquet scan is column-pruned.
            cand_cols = list(dict.fromkeys([*key_cols, *pcols]))
            upd_keys = updates.select(*key_cols).distinct()
            key_cond = None
            for k in key_cols:
                c = existing[k].eqNullSafe(upd_keys[k])
                key_cond = c if key_cond is None else (key_cond & c)
            cand = (
                existing.join(upd_keys, key_cond, "leftsemi")
                .select(*cand_cols)
                .unionByName(updates.select(*cand_cols))
            )
            spanning = (
                cand.groupBy(*key_cols)
                .agg(
                    F.countDistinct(F.struct(*pcols)).alias("n_parts")
                )
                .where(F.col("n_parts") > 1)
            )
            partition_scoped = spanning.isEmpty()
    if partition_scoped:
        # null-safe touched-partition semi join over the FULL tuple
        # (isin() evaluates to NULL for NULL partition rows, silently
        # EXCLUDING existing null-partition rows from the merge while
        # the dynamic overwrite still rewrites that partition; and the
        # old single-column filter read every second-level partition
        # of a touched first level)
        touched = updates.select(*pcols).distinct()
        part_cond = None
        for pc in pcols:
            c = tagged_old[pc].eqNullSafe(touched[pc])
            part_cond = c if part_cond is None else (part_cond & c)
        tagged_old = tagged_old.join(touched, part_cond, "leftsemi")

    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col), F.desc("_upd")
    )
    merged = (
        tagged_old.unionByName(tagged_new)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_upd")
    )

    if partition_scoped:
        (
            merged.write.format(fmt)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .save(path)
        )
    else:
        staged = path.rstrip("/") + "._upserting"
        writer = merged.write.format(fmt).mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(staged)
        _atomic_swap(path, staged)


# ---------------------------------------------------------------------------
# Versioned tables: pointer-file time travel for a plain-parquet lake
# ---------------------------------------------------------------------------
# The reference leans on Delta for versioned overwrites; without the
# jar, the same user-visible capability — every write is a retained
# snapshot, readers can time-travel, writers never disturb readers —
# comes from the Iceberg-style pointer design: each write lands in an
# immutable _versions/v{N} directory and a tiny _LATEST pointer file is
# swapped atomically (os.replace) to publish it. Readers resolve the
# pointer (or an explicit version) to a directory and scan it; a
# half-written version is unreachable until its pointer lands, and a
# crashed writer leaves only an unreferenced orphan directory that the
# next retention sweep removes. On an object store the pointer is a
# single small object PUT — the publish is one metadata operation
# regardless of table size.

_VERSIONS_DIR = "_versions"
_LATEST_FILE = "_LATEST"
_PUBLISHED_LOG = "_PUBLISHED"


def _version_dir(path: str, version: int) -> str:
    return os.path.join(path, _VERSIONS_DIR, f"v{version:08d}")


def list_table_versions(path: str) -> list[int]:
    """Existing version numbers (ascending), including unpublished
    orphans from crashed writes."""
    vroot = os.path.join(path, _VERSIONS_DIR)
    if not os.path.isdir(vroot):
        return []
    out = []
    for name in os.listdir(vroot):
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def latest_table_version(path: str) -> int | None:
    """The PUBLISHED version (pointer contents), or None."""
    try:
        with open(os.path.join(path, _LATEST_FILE)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def published_table_versions(path: str) -> set[int]:
    """Every version number that was ever PUBLISHED (pointer landed).

    The pointer alone cannot distinguish a crashed writer's orphan
    from once-published history after the pointer moves PAST the
    orphan's number (r08 review: retention then counted the partial
    dir as history and deleted a valid snapshot instead). Each publish
    appends to a `_PUBLISHED` log (atomic rewrite+replace, same
    single-writer assumption as the pointer swap). Legacy tables with
    no log fall back to the old pointer rule (everything <= pointer),
    preserving their previous behavior. A log that EXISTS but fails
    to parse raises instead of falling back (r08 advisor): silently
    reverting to pointer-counting would reintroduce the exact
    orphan-vs-history confusion the log was added to fix — vacuum
    could delete real history — with no signal the log is damaged."""
    log_path = os.path.join(path, _PUBLISHED_LOG)
    try:
        with open(log_path) as f:
            raw = f.read()
    except OSError:
        published = latest_table_version(path)
        if published is None:
            return set()
        return {v for v in list_table_versions(path) if v <= published}
    try:
        return {int(line) for line in raw.split() if line}
    except ValueError as exc:
        raise ValueError(
            f"corrupt publish log at {log_path}: {exc}. Refusing to "
            "fall back to pointer-counting (it cannot tell a crashed "
            "writer's orphan from published history); repair or remove "
            "the log explicitly."
        ) from exc


def write_table_versioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    keep_versions: int | None = None,
) -> int:
    """Write ``df`` as a new immutable version and publish it; returns
    the version number.

    ``keep_versions`` prunes to the newest N *published-or-older*
    snapshots after the pointer swap (the just-published version is
    always kept). Concurrent readers of pruned versions are the one
    hazard, as with Delta VACUUM — retention is the knob.
    """
    prev = latest_table_version(path)
    existing = list_table_versions(path)
    version = (max(existing) if existing else (prev or 0)) + 1
    target = _version_dir(path, version)
    writer = df.write.format(
        resolve_table_format(df.sparkSession, fmt)
    ).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(target)
    # publish: write-then-rename is atomic on POSIX (os.replace), a
    # single small-object PUT on an object store
    # the publish-log append comes FIRST: a crash between the two
    # writes leaves a logged-but-unpointed version — harmless history
    # — while the reverse order would leave a pointed-but-unlogged
    # version that retention could then vacuum (r08 review)
    log = published_table_versions(path) | {version}
    log_tmp = os.path.join(path, _PUBLISHED_LOG + ".tmp")
    with open(log_tmp, "w") as f:
        f.write("\n".join(str(v) for v in sorted(log)))
    os.replace(log_tmp, os.path.join(path, _PUBLISHED_LOG))
    ptr_tmp = os.path.join(path, _LATEST_FILE + ".tmp")
    with open(ptr_tmp, "w") as f:
        f.write(str(version))
    os.replace(ptr_tmp, os.path.join(path, _LATEST_FILE))
    if keep_versions is not None:
        # delegate to the orphan-aware vacuum: the old inline prune
        # counted crashed-writer orphan dirs as retained history, so
        # it could delete a valid published snapshot while KEEPING a
        # half-written orphan as "history" (r08 review); vacuum
        # counts retention over published-or-older versions only and
        # clears orphans as a bonus
        vacuum_table_versions(path, keep_versions)
    return version


def read_table_versioned(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    version: int | None = None,
) -> DataFrame:
    """Scan the published snapshot, or time-travel to ``version``."""
    if version is None:
        version = latest_table_version(path)
        if version is None:
            raise FileNotFoundError(f"no published version at {path}")
    elif version not in published_table_versions(path):
        # a dir the publish log never recorded is a crashed writer's
        # partial orphan, not a snapshot — scanning it returned
        # silently truncated data despite the module contract that
        # half-written versions are unreachable (r08 review)
        raise FileNotFoundError(
            f"version {version} was never published at {path}"
            f" (published: {sorted(published_table_versions(path))})"
        )
    target = _version_dir(path, version)
    if not os.path.isdir(target):
        raise FileNotFoundError(f"version {version} not found at {path}")
    return spark.read.format(resolve_table_format(spark, fmt)).load(target)


def vacuum_table_versions(path: str, keep_versions: int = 2) -> list[int]:
    """Remove unpublished orphan version dirs (crashed writers) and
    published snapshots beyond the newest ``keep_versions``. Returns
    the removed version numbers. Delta VACUUM semantics: never removes
    the published version; readers pinned to a pruned snapshot are the
    documented retention hazard."""
    import shutil

    published = latest_table_version(path)
    versions = list_table_versions(path)
    # only versions the publish log records count as history: an
    # orphan below a later pointer is still a crashed write, not a
    # snapshot (r08 review — the <=-pointer rule kept such a partial
    # dir while deleting real history)
    logged = published_table_versions(path)
    history = [v for v in versions if v in logged]
    keep = set(history[-keep_versions:]) if keep_versions > 0 else set()
    if published is not None:
        keep.add(published)
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(_version_dir(path, v), ignore_errors=True)
            removed.append(v)
    return removed
