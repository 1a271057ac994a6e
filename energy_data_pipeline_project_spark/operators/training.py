"""Training-set assembly & audit operators (round-3 tier).

The reference repo has none of this surface (it is a two-table energy
ETL — ``/root/reference/src/main.py:1-118``); these extend the
SURVEY.md §2.10 LLM-data tier with the queries a team runs in the week
before a training launch:

- ``split_leakage_audit`` — near-duplicate pairs that straddle the
  train/val/test hash split. Exact-dedup runs before splitting, but
  *near*-dups slip through and leak eval data into training; this is
  the audit that catches it. Composes the MinHash-LSH pair generator
  (``dedup.minhash_lsh_pairs``) with the 90/5/5 hash split
  (``text.data_split_hash``), both already oracle-checked on their
  own, and hash-checks the composition.
- ``corpus_token_budget_plan`` — given per-source token counts and a
  total training-token budget, derive each source's full-epoch repeat
  count and residual sampling rate (the "how many epochs of each
  domain" mixing table). Pure integer arithmetic end to end.
- ``train_linear_probe`` — two full-batch gradient-descent steps of a
  linear probe (squared loss) on document surface features, entirely
  as DataFrame aggregates in fixed-point int64 arithmetic. Each step
  is a 1-row aggregate cross-joined back (broadcast) — the same
  in-plan iteration idiom as ``clustering.kmeans_embeddings``, so the
  whole training run is ONE Catalyst plan, no driver-side loop, and
  the DuckDB oracle replays it as a CTE chain under the exact
  hash-equality gate. Completes the train→infer story next to
  ``curation.text_quality_classifier`` (which scores with fixed
  weights).
- ``text_heavy_hitters`` — Misra-Gries frequent-tokens sketch:
  bounded-memory per-partition summaries (mapInPandas, k counters per
  partition regardless of vocabulary size) merged by count-sum minus
  the (k+1)-th largest — the mergeable-summaries construction
  (Agarwal et al., PODS'12, public). The frequency-sketch sibling of
  the HLL (``events_sketch_rollup``) and quantile
  (``events_quantile_histogram``) sketches. Estimates are proven
  underestimates with additive error ≤ n/(k+1)
  (tests/test_training_ops.py asserts both against exact counts);
  rows-only driver check, like the other approximate sketches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import hashing as H
from ..sources.tables import load_table
from ._frames import cached as _cached
from ._registry import make_registry
from .dedup import _minhash_oracle, shared_lsh_pairs
from .text import _SPLIT_BUCKET_DUCK, _SPLIT_BUCKET_SPARK
from .timeseries import _CENTS_DUCK, _cents

QUERIES, ORACLES, query = make_registry()

_TOKS_DUCK = H.tokens_sql("text", duck=True)
_TOKS_SPARK = H.tokens_sql("text", duck=False)

_SPLIT_NAMES = ("train", "val", "test")


# ---------------------------------------------------------------------------
# Split-leakage audit: near-dup pairs crossing the train/val/test split
# ---------------------------------------------------------------------------
# Scale shape: the pair frame is LSH-bounded (linear + collisions, hot
# buckets capped), and the split frame is 2 ints per doc; both joins
# are doc-id equi-joins (co-partitionable with the corpus layout). The
# explode doubles the already-small pair frame only.


def _leakage_oracle() -> str:
    names = "['" + "','".join(_SPLIT_NAMES) + "']"
    return f"""
    WITH pr AS (SELECT doc_a, doc_b FROM ({_minhash_oracle()}) mh),
    s AS (SELECT doc_id,
                 CASE WHEN {_SPLIT_BUCKET_DUCK} < 90 THEN 0
                      WHEN {_SPLIT_BUCKET_DUCK} < 95 THEN 1
                      ELSE 2 END AS r
          FROM documents),
    lab AS (SELECT LEAST(sa.r, sb.r) AS lo, GREATEST(sa.r, sb.r) AS hi,
                   pr.doc_a, pr.doc_b
            FROM pr
            JOIN s sa ON pr.doc_a = sa.doc_id
            JOIN s sb ON pr.doc_b = sb.doc_id),
    e AS (SELECT lo, hi, unnest([doc_a, doc_b]) AS d FROM lab)
    SELECT ({names})[lo + 1] AS split_a,
           ({names})[hi + 1] AS split_b,
           CAST(COUNT(*) // 2 AS BIGINT) AS n_pairs,
           COUNT(DISTINCT d) AS n_docs
    FROM e GROUP BY lo, hi
    """


@query("split_leakage_audit", _leakage_oracle())
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup (MinHash-verified) pairs bucketed by the split pair
    they straddle. Rows with split_a != split_b are leakage: an eval
    document with a near-duplicate in train. n_docs counts distinct
    documents involved per bucket."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = shared_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")

    bucket = F.expr(_SPLIT_BUCKET_SPARK)
    rank = (
        F.when(bucket < 90, 0).when(bucket < 95, 1).otherwise(2)
    ).cast("int")
    splits = docs.select("doc_id", rank.alias("r"))

    p = pairs.join(
        splits.select(F.col("doc_id").alias("doc_a"), F.col("r").alias("ra")),
        "doc_a",
    ).join(
        splits.select(F.col("doc_id").alias("doc_b"), F.col("r").alias("rb")),
        "doc_b",
    )
    lab = p.select(
        F.least("ra", "rb").alias("lo"),
        F.greatest("ra", "rb").alias("hi"),
        "doc_a",
        "doc_b",
    )
    # Each pair contributes both endpoints; doc_a < doc_b always, so
    # COUNT(*)/2 is the exact pair count.
    e = lab.select("lo", "hi", F.explode(F.array("doc_a", "doc_b")).alias("d"))
    names = F.array(*[F.lit(n) for n in _SPLIT_NAMES])
    return (
        e.groupBy("lo", "hi")
        .agg(
            (F.count("*") / 2).cast("bigint").alias("n_pairs"),
            F.countDistinct("d").alias("n_docs"),
        )
        .select(
            F.element_at(names, F.col("lo") + 1).alias("split_a"),
            F.element_at(names, F.col("hi") + 1).alias("split_b"),
            "n_pairs",
            "n_docs",
        )
    )


# ---------------------------------------------------------------------------
# Token-budget mixing plan: epochs + residual rate per source
# ---------------------------------------------------------------------------
# The mixing table behind "rebalance domains to a uniform share of a
# 2x-corpus token budget": each source gets budget/n_sources tokens,
# served as floor(alloc/src_tokens) full epochs plus a residual
# hash-sampled at residual_keep_permille (the deterministic sampling
# idiom of docs_hash_sample). Integer floor division throughout; both
# engines truncate toward zero (positives here, so floor == trunc).

BUDGET_EPOCHS = 2  # total budget = BUDGET_EPOCHS x corpus tokens


@query(
    "corpus_token_budget_plan",
    f"""
    WITH p AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(COALESCE({_TOKS_DUCK}, []))) AS BIGINT)
               AS src_tokens
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
                 COUNT(*) AS n_sources FROM p),
    a AS (SELECT p.*,
                 CAST(({BUDGET_EPOCHS} * t.total_tokens) // t.n_sources
                      AS BIGINT) AS alloc_tokens
          FROM p CROSS JOIN t),
    e AS (SELECT a.*,
                 CAST(alloc_tokens // NULLIF(src_tokens, 0) AS BIGINT)
                   AS epochs_full
          FROM a)
    SELECT source, n_docs, src_tokens, alloc_tokens, epochs_full,
           CAST(alloc_tokens - epochs_full * src_tokens AS BIGINT)
             AS residual_tokens,
           -- NULLIF: an all-empty-text source has src_tokens = 0;
           -- DuckDB // raises on /0 while Spark div yields NULL
           -- (r07 review) — NULL-safe in BOTH engines
           CAST((1000 * (alloc_tokens - epochs_full * src_tokens))
                // NULLIF(src_tokens, 0) AS BIGINT)
             AS residual_keep_permille
    FROM e
    """,
)
def corpus_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-mix plan for a BUDGET_EPOCHS×-corpus token
    budget split uniformly across sources. Scale shape: one corpus
    scan + per-source agg; the totals row rides a broadcast
    cross-join, never a collect."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        # NULL-text docs count 0 tokens in BOTH engines: unguarded,
        # Spark's answer depends on the ANSI flag (size(NULL) is NULL
        # under ANSI but -1 legacy — the r07 text.py lesson) while the
        # oracle's SUM skips the NULL row (r08 review)
        docs.select(
            "source",
            F.size(F.expr(f"coalesce({_TOKS_SPARK}, array())")).alias("nt"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("src_tokens"),
        )
    )
    tot = per_src.agg(
        F.sum("src_tokens").cast("bigint").alias("total_tokens"),
        F.count("*").alias("n_sources"),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .withColumn(
            "alloc_tokens",
            F.expr(f"({BUDGET_EPOCHS} * total_tokens) div n_sources"),
        )
        .withColumn(
            "epochs_full",
            F.expr("alloc_tokens div NULLIF(src_tokens, 0)"),
        )
        .withColumn(
            "residual_tokens",
            F.expr("alloc_tokens - epochs_full * src_tokens"),
        )
        .withColumn(
            "residual_keep_permille",
            F.expr("(1000 * residual_tokens) div NULLIF(src_tokens, 0)"),
        )
        .select(
            "source", "n_docs", "src_tokens", "alloc_tokens",
            "epochs_full", "residual_tokens", "residual_keep_permille",
        )
    )


# ---------------------------------------------------------------------------
# Linear-probe training: 2 exact fixed-point GD steps, one plan
# ---------------------------------------------------------------------------
# Squared-loss linear probe p(y=en | x) ~ w·x on capped surface
# features x = (1, n_tokens, n_distinct_tokens). Weights live in
# 1/SCALE units so every quantity is int64: prediction z = w·x is
# SCALE-scaled, err = z - y*SCALE, gradient g_j = trunc(Σ err·x_j / n),
# update w_j -= trunc(g_j / LR_DIV). The reported per-step loss is the
# GD objective itself, Σ err² (err² ≤ 2^34 ⇒ int64-safe to ~2^29 docs
# per aggregation; per-partition pre-averaging extends it). Spark's `div` and DuckDB's `//`
# both truncate toward zero, so the chain is bitwise identical.
#
# Bounds (documented, asserted in tests): x ≤ FEATURE_CAP = 512, so
# |err| ≤ 2·SCALE once weights are warm (|w| stays ≤ ~2^7 with
# LR_DIV = 2^19 ≥ λmax/2, the GD stability bound for these feature
# magnitudes), and Σ|err·x| ≤ n·2^27 — int64-safe to ~2^35 docs per
# aggregation; beyond that, block-average gradients per partition
# first (same partial/final split Catalyst already does).

SCALE = 65536  # 2^16 fixed-point unit
LR_DIV = 524288  # 2^19: lr = 1/LR_DIV, below the GD stability bound
FEATURE_CAP = 512


def _probe_chain_sql() -> str:
    """The shared WITH-chain: features f → step-1 gradient a1 →
    weights w1 → step-2 errors/gradient z2/a2 → weights w2. Both the
    trainer oracle and the probe-filter oracle append to this."""
    s, lr, cap = SCALE, LR_DIV, FEATURE_CAP
    return f"""
    WITH f AS (
      SELECT source,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
             CAST(LEAST(len(toks), {cap}) AS BIGINT) AS x1,
             CAST(LEAST(len(list_distinct(toks)), {cap}) AS BIGINT) AS x2
      FROM (SELECT source, lang, COALESCE({_TOKS_DUCK}, []) AS toks
            FROM documents)
    ),
    a1 AS (
      SELECT CAST(SUM(0 - y * {s}) AS BIGINT) AS s0,
             CAST(SUM((0 - y * {s}) * x1) AS BIGINT) AS s1,
             CAST(SUM((0 - y * {s}) * x2) AS BIGINT) AS s2,
             COUNT(*) AS n,
             CAST(SUM((0 - y * {s}) * (0 - y * {s})) AS BIGINT) AS loss
      FROM f
    ),
    w1 AS (
      SELECT CAST(0 - ((s0 // n) // {lr}) AS BIGINT) AS w0,
             CAST(0 - ((s1 // n) // {lr}) AS BIGINT) AS w1,
             CAST(0 - ((s2 // n) // {lr}) AS BIGINT) AS w2,
             loss
      FROM a1
    ),
    z2 AS (
      SELECT w1.w0 + w1.w1 * f.x1 + w1.w2 * f.x2 - f.y * {s} AS err,
             f.x1, f.x2
      FROM f CROSS JOIN w1
    ),
    a2 AS (
      SELECT CAST(SUM(err) AS BIGINT) AS s0,
             CAST(SUM(err * x1) AS BIGINT) AS s1,
             CAST(SUM(err * x2) AS BIGINT) AS s2,
             COUNT(*) AS n,
             CAST(SUM(err * err) AS BIGINT) AS loss
      FROM z2
    ),
    w2 AS (
      SELECT CAST(w1.w0 - ((a2.s0 // a2.n) // {lr}) AS BIGINT) AS w0,
             CAST(w1.w1 - ((a2.s1 // a2.n) // {lr}) AS BIGINT) AS w1,
             CAST(w1.w2 - ((a2.s2 // a2.n) // {lr}) AS BIGINT) AS w2,
             a2.loss
      FROM a2 CROSS JOIN w1
    )"""


def _probe_oracle() -> str:
    return f"""{_probe_chain_sql()}
    SELECT 1 AS iter, w0 AS w_bias, w1 AS w_ntoks, w2 AS w_ndist,
           loss AS sum_sq_err FROM w1
    UNION ALL
    SELECT 2, w0, w1, w2, loss FROM w2
    """


def _probe_features(docs: DataFrame, *carry: str) -> DataFrame:
    """Probe feature projection — defined ONCE so the trainer
    (`train_linear_probe`) and the filter (`corpus_probe_filter`)
    cannot drift (r06 review: the filter had its own inline copy).
    ``carry`` names extra passthrough columns (e.g. ``source``)."""
    # coalesce to array(): least()/LEAST() SKIP NULL args in BOTH
    # engines, so an unguarded NULL-text doc scored x1 = x2 =
    # FEATURE_CAP — the longest possible document instead of an empty
    # one — identically on both sides, which is exactly the class the
    # parity gate can never catch (r08 review)
    toks = F.expr(f"coalesce({_TOKS_SPARK}, array())")
    return docs.select(
        *carry,
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("bigint").alias("y"),
        F.least(F.size(toks), F.lit(FEATURE_CAP)).cast("bigint").alias("x1"),
        F.least(F.size(F.array_distinct(toks)), F.lit(FEATURE_CAP))
        .cast("bigint")
        .alias("x2"),
    )


def _zero_weights(spark: SparkSession) -> DataFrame:
    return spark.range(1).select(
        *[F.lit(0).cast("bigint").alias(f"w{j}") for j in range(3)]
    )


def _probe_step(feats: DataFrame, w: DataFrame) -> DataFrame:
    """One GD step: broadcast the 1-row weights frame onto the feature
    rows, take the gradient sums in one aggregate (grouped by the
    weight columns, a single group), and emit a 1-row frame
    (w0, w1, w2, loss) holding the POST-update weights and the
    PRE-update Σ err² (matching the oracle's sum_sq_err)."""
    src = feats.crossJoin(F.broadcast(w))
    err = (
        F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
        - F.col("y") * SCALE
    )
    agg = src.groupBy("w0", "w1", "w2").agg(
        F.sum(err).cast("bigint").alias("s0"),
        F.sum(err * F.col("x1")).cast("bigint").alias("s1"),
        F.sum(err * F.col("x2")).cast("bigint").alias("s2"),
        F.count("*").alias("n"),
        F.sum(err * err).cast("bigint").alias("loss"),
    )
    return agg.select(
        *[
            F.expr(f"cast(w{j} - ((s{j} div n) div {LR_DIV}) as bigint)").alias(
                f"w{j}"
            )
            for j in range(3)
        ],
        "loss",
    )


@query("train_linear_probe", _probe_oracle())
def train_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two exact GD steps of the quality linear probe as one Catalyst
    plan; see module docstring for the fixed-point construction."""
    # persisted: the feature projection feeds every GD-step subplan;
    # without it each step re-scanned and re-tokenized documents
    # (3 scans per query — r07 review; Spark has no cross-subtree CSE)
    feats = _cached(_probe_features(load_table(spark, sf_dir, "documents")))
    w1 = _probe_step(feats, _zero_weights(spark))
    w2 = _probe_step(feats, w1)

    def row(i: int, w: DataFrame) -> DataFrame:
        return w.select(
            F.lit(i).alias("iter"),
            F.col("w0").alias("w_bias"),
            F.col("w1").alias("w_ntoks"),
            F.col("w2").alias("w_ndist"),
            F.col("loss").alias("sum_sq_err"),
        )

    return row(1, w1).unionAll(row(2, w2))


# Calibrated on the testdata corpus (scores span ~50-460 after two GD
# steps; median ~275): keeps roughly half the docs, so both the kept
# and dropped branches of the filter are exercised at every scale.
PROBE_SCORE_MIN = 280


def _probe_filter_oracle() -> str:
    return f"""{_probe_chain_sql()}
    , scored AS (
      SELECT f.source,
             w2.w0 + w2.w1 * f.x1 + w2.w2 * f.x2 AS score
      FROM f CROSS JOIN w2
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN score >= {PROBE_SCORE_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST((1000 * SUM(CASE WHEN score >= {PROBE_SCORE_MIN}
                                 THEN 1 ELSE 0 END)) // COUNT(*)
                AS BIGINT) AS kept_permille
    FROM scored GROUP BY source
    """


@query("corpus_probe_filter", _probe_filter_oracle())
def corpus_probe_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the linear probe (2 GD steps) and apply it as a corpus
    filter IN THE SAME Catalyst plan: per source, how many documents
    clear the fixed-point score threshold. The model-training →
    corpus-scoring → filter-report composition a curation pipeline
    runs as one job — weights never leave the cluster, and the whole
    chain (training included) stays under the exact hash gate."""
    docs = load_table(spark, sf_dir, "documents")
    feats = _cached(_probe_features(docs, "source"))
    w1 = _probe_step(feats.drop("source"), _zero_weights(spark))
    w2 = _probe_step(feats.drop("source"), w1)
    scored = feats.crossJoin(F.broadcast(w2.drop("loss"))).withColumn(
        "score",
        F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2"),
    )
    kept = F.when(F.col("score") >= PROBE_SCORE_MIN, 1).otherwise(0)
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(kept).cast("bigint").alias("n_kept"),
        F.expr(
            f"cast((1000 * sum(case when score >= {PROBE_SCORE_MIN} "
            "then 1 else 0 end)) div count(*) as bigint)"
        ).alias("kept_permille"),
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: bounded-memory frequent tokens
# ---------------------------------------------------------------------------

HH_K = 32  # counters per partition summary
HH_TOP = 20  # reported rows


def mg_update(counts: dict[str, int], tokens, k: int = HH_K) -> dict[str, int]:
    """Misra-Gries continuation: fold more tokens into an existing
    k-counter summary IN PLACE (MG is one-pass, so resuming from a
    stored summary is exactly the same algorithm — the property the
    streaming twin in streaming/sketches.py relies on)."""
    for t in tokens:
        if t in counts:
            counts[t] += 1
        elif len(counts) < k:
            counts[t] = 1
        else:
            dead = []
            for key in counts:
                counts[key] -= 1
                if counts[key] == 0:
                    dead.append(key)
            for key in dead:
                del counts[key]
    return counts


def mg_partial(tokens, k: int = HH_K) -> dict[str, int]:
    """Classic Misra-Gries over an iterable of tokens with k counters:
    est ∈ [true - n/(k+1), true] per stream. Pure Python, unit-tested
    directly; the distributed path runs one instance per partition."""
    return mg_update({}, tokens, k)


def heavy_hitters_frame(docs: DataFrame) -> DataFrame:
    """Merged Misra-Gries estimates (token, est_count), unlimited.

    Per-partition summaries are k counters regardless of vocabulary
    size (the whole point — an exact token groupBy shuffles the full
    vocabulary; this shuffles ≤ k rows per partition). The merge is
    the mergeable-summaries construction: sum per-token counts across
    summaries, subtract the (k+1)-th largest merged count, keep
    positives — total additive error stays ≤ n/(k+1). The merged
    frame is ≤ partitions×k rows, so the single-partition ranking
    window is bounded by construction (same argument as the
    band-prefix windows in DESIGN.md)."""
    import pandas as pd

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        def token_stream():
            for pdf in batches:
                for text in pdf["text"]:
                    if text:
                        # same tokenization as hashing.tokens_sql:
                        # split on single space, drop empties
                        yield from (t for t in text.split(" ") if t)

        counts = mg_partial(token_stream(), HH_K)
        yield pd.DataFrame(
            {"token": list(counts), "cnt": list(counts.values())}
        )

    partials = docs.select("text").mapInPandas(summarize, "token string, cnt long")
    merged = partials.groupBy("token").agg(F.sum("cnt").alias("c"))
    ranked = merged.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("c"), "token"))
    )
    off = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == HH_K + 1, F.col("c"))), F.lit(0)
        ).alias("off")
    )
    return (
        ranked.crossJoin(F.broadcast(off))
        .withColumn("est_count", F.col("c") - F.col("off"))
        .where(F.col("est_count") > 0)
        .select("token", "est_count")
    )


@query("text_heavy_hitters")  # rows-only: approximate by design
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        heavy_hitters_frame(docs)
        .orderBy(F.desc("est_count"), "token")
        .limit(HH_TOP)
    )


# ---------------------------------------------------------------------------
# Point-in-time-correct feature backfill
# ---------------------------------------------------------------------------
# The training-pipeline staple that prevents label leakage: every
# feature attached to a label row may only read events STRICTLY
# earlier than the label's own timestamp. All features are value-based
# (RANGE) window frames ending at 1 PRECEDING on the epoch-microsecond
# axis, so even events sharing the label's exact instant are excluded
# — the strict-past guarantee is a property of the frame, not of tie
# ordering, which is what makes it deterministic cross-engine.
PIT_WINDOW_US = 7 * 86_400_000_000  # 7-day trailing feature window
_US_PER_DAY = 86_400_000_000


@query(
    "training_feature_backfill",
    f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             {_CENTS_DUCK} AS cents
      FROM events
    ),
    feat AS (
      SELECT event_id, event_type, cents,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                        THEN 1 ELSE 0 END) OVER w7, 0) AS BIGINT)
               AS clicks_7d,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                        THEN 1 ELSE 0 END) OVER w7, 0) AS BIGINT)
               AS views_7d,
             (MAX(CASE WHEN event_type = 'cart'
                       THEN {{'u': us, 'e': event_id, 'c': cents}}
                  END) OVER wall).c AS last_cart_cents,
             (us - MIN(us) OVER wall) // {_US_PER_DAY} AS days_since_first
      FROM ev
      WINDOW
        w7 AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {PIT_WINDOW_US} PRECEDING AND 1 PRECEDING),
        wall AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS label_id, cents AS label_cents,
           clicks_7d, views_7d, last_cart_cents, days_since_first
    FROM feat WHERE event_type = 'purchase'
    """,
)
def training_feature_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill leakage-safe features onto purchase labels: 7-day
    trailing click/view counts, the most recent cart value, and days
    since the user's first PRIOR event — each computed over a RANGE
    frame ending at 1 microsecond PRECEDING, so no feature can ever
    see the label instant or anything after it.

    Scale: one shuffle on user_id; all four features share the same
    sort order so Catalyst evaluates them in a single Window exec pair
    (7-day frame + unbounded frame) — no self-joins, no per-label
    range explosion. This is the scalable alternative to the
    point-in-time JOIN formulation, whose naive theta-join is O(n*m)
    per user.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        # shared cents definition (operators/timeseries.py), the same
        # single source the streaming twin imports — never re-spelled
        _cents("value").alias("cents"),
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-PIT_WINDOW_US, -1)
    )
    wall = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.when(F.col("event_type") == "click", 1).otherwise(0)
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    # Order-insensitive "latest prior cart": MAX over a (us, event_id,
    # cents) struct is lexicographic on the unique (us, event_id) key,
    # so ties at the same microsecond can never make the result depend
    # on physical row order (LAST_VALUE over a RANGE frame would).
    cart_struct = F.when(
        F.col("event_type") == "cart",
        F.struct(
            F.col("us").alias("u"),
            F.col("event_id").alias("e"),
            F.col("cents").alias("c"),
        ),
    )
    feat = ev.select(
        "event_id",
        "event_type",
        "cents",
        F.coalesce(F.sum(is_click).over(w7), F.lit(0))
        .cast("bigint")
        .alias("clicks_7d"),
        F.coalesce(F.sum(is_view).over(w7), F.lit(0))
        .cast("bigint")
        .alias("views_7d"),
        F.max(cart_struct).over(wall).getField("c").alias(
            "last_cart_cents"
        ),
        (F.col("us") - F.min("us").over(wall)).alias("prior_gap_us"),
    )
    return feat.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"),
        F.col("cents").alias("label_cents"),
        "clicks_7d",
        "views_7d",
        "last_cart_cents",
        F.expr(f"prior_gap_us div {_US_PER_DAY}").alias(
            "days_since_first"
        ),
    )
