"""Round-5 late additions: behavioral invariants beyond the
oracle-parity sweep (which already pins cross-engine equality) for the
sweep-line concurrency operator, the count-min sketch, the zone-map
skipping audit, and the point-in-time feature backfill."""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.operators.timeseries import (
    SWEEP_GAP_US,
    cms_grid,
    cms_hashed,
    events_concurrency_sweep,
    events_countmin_heavy,
)
from energy_data_pipeline_project_spark.operators.training import (
    PIT_WINDOW_US,
    training_feature_backfill,
)
from energy_data_pipeline_project_spark.operators.warehouse import (
    layout_zonemap_skipping,
)
from energy_data_pipeline_project_spark.sources.tables import load_table

from .conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# Sweep-line concurrency: independent Python replay
# ---------------------------------------------------------------------------
def _python_sweep(events):
    """Reference sessionize + sweep in plain Python over collected rows."""
    per_user: dict[int, list[int]] = {}
    for us, uid, eid in events:
        per_user.setdefault(uid, []).append((us, eid))
    sessions = []
    for uid, rows in per_user.items():
        rows.sort()
        lo = prev = rows[0][0]
        for us, _ in rows[1:]:
            if us - prev > SWEEP_GAP_US:
                sessions.append((lo, prev + SWEEP_GAP_US))
                lo = us
            prev = us
        sessions.append((lo, prev + SWEEP_GAP_US))
    day_us = 86_400_000_000
    per_day: dict[int, list[tuple[int, int]]] = {}
    for lo, hi in sessions:
        for day in range(lo // day_us, (hi - 1) // day_us + 1):
            seg = (max(lo, day * day_us), min(hi, (day + 1) * day_us))
            per_day.setdefault(day, []).append(seg)
    out = {}
    for day, segs in per_day.items():
        deltas: dict[int, int] = {}
        for lo, hi in segs:
            deltas[lo] = deltas.get(lo, 0) + 1
            deltas[hi] = deltas.get(hi, 0) - 1
        running = peak = covered = 0
        instants = sorted(deltas)
        for ts, nxt in zip(instants, instants[1:] + [None]):
            running += deltas[ts]
            peak = max(peak, running)
            if running > 0:
                covered += nxt - ts
        out[day] = (len(segs), peak, covered // 1_000_000)
    return out


def test_concurrency_sweep_matches_python_replay(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    rows = [
        (r.us, r.user_id, r.event_id)
        for r in ev.selectExpr(
            "unix_micros(ts) AS us", "user_id", "event_id"
        ).collect()
    ]
    expected = _python_sweep(rows)
    got = {
        (r.d.toordinal() - 719163): (
            r.n_segments,
            r.peak_concurrent,
            r.covered_seconds,
        )
        for r in events_concurrency_sweep(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_concurrency_sweep_day_invariants(spark):
    for r in events_concurrency_sweep(spark, SF_SMOKE).collect():
        assert 1 <= r.peak_concurrent <= r.n_segments
        # 0 is legitimate: a day whose only activity is a sub-second
        # session tail spilling over midnight floors to 0 seconds.
        assert 0 <= r.covered_seconds <= 86_400


# ---------------------------------------------------------------------------
# Count-min sketch: one-sided error + mergeability
# ---------------------------------------------------------------------------
def test_cms_estimates_are_one_sided_and_bounded(spark):
    res = events_countmin_heavy(spark, SF_SMOKE).collect()
    assert res
    n_total = load_table(spark, SF_SMOKE, "events").count()
    from energy_data_pipeline_project_spark.functions.hashing import CMS_WIDTH

    for r in res:
        assert r.est_count >= r.exact_count
        # e*N/w is the probabilistic bound; 4N/w is ample slack and
        # deterministic on this fixed corpus + fixed hash family.
        assert r.est_count - r.exact_count <= 4 * n_total // CMS_WIDTH


def test_cms_grid_merges_cellwise(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    full = cms_grid(cms_hashed(ev))
    odd = cms_grid(cms_hashed(ev.where(F.col("event_id") % 2 == 1)))
    even = cms_grid(cms_hashed(ev.where(F.col("event_id") % 2 == 0)))
    merged = (
        odd.unionAll(even)
        .groupBy("i", "col")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )


# ---------------------------------------------------------------------------
# Zone-map skipping: scatter scans everything, clustering prunes
# ---------------------------------------------------------------------------
def test_zonemap_layouts_agree_on_truth_but_not_on_scan(spark):
    rows = {r.layout: r for r in layout_zonemap_skipping(spark, SF_SMOKE).collect()}
    assert set(rows) == {"hash", "range"}
    h, rg = rows["hash"], rows["range"]
    assert h.rows_matching == rg.rows_matching > 0
    # Scatter layout: every shard's zone spans the predicate.
    assert h.shards_scanned == h.n_shards
    assert h.skip_permille == 0
    # Range-clustered layout prunes most shards; scan amplification
    # collapses toward the true matching rows.
    assert rg.shards_scanned < rg.n_shards
    assert rg.skip_permille > 500
    assert rg.rows_scanned < h.rows_scanned
    assert rg.rows_scanned >= rg.rows_matching


# ---------------------------------------------------------------------------
# Feature backfill: strict-past guarantee via Python replay
# ---------------------------------------------------------------------------
def test_feature_backfill_matches_strict_past_replay(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    rows = ev.selectExpr(
        "event_id",
        "user_id",
        "event_type",
        "unix_micros(ts) AS us",
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents",
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    expected = {}
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.us)
        for r in rs:
            if r.event_type != "purchase":
                continue
            past = [p for p in rs if p.us < r.us]
            clicks = sum(
                1
                for p in past
                if p.event_type == "click" and p.us >= r.us - PIT_WINDOW_US
            )
            views = sum(
                1
                for p in past
                if p.event_type == "view" and p.us >= r.us - PIT_WINDOW_US
            )
            carts = [p for p in past if p.event_type == "cart"]
            last_cart = (
                max(carts, key=lambda p: (p.us, p.event_id)).cents
                if carts
                else None
            )
            days = (r.us - past[0].us) // 86_400_000_000 if past else None
            expected[r.event_id] = (r.cents, clicks, views, last_cart, days)
    got = {
        r.label_id: (
            r.label_cents,
            r.clicks_7d,
            r.views_7d,
            r.last_cart_cents,
            r.days_since_first,
        )
        for r in training_feature_backfill(spark, SF_SMOKE).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# CDC merge apply: reconstruction algebra
# ---------------------------------------------------------------------------
def test_cdc_merge_apply_reconstructs_target(spark):
    from energy_data_pipeline_project_spark.operators.warehouse import (
        cdc_merge_apply,
    )

    row = cdc_merge_apply(spark, SF_SMOKE).collect()[0]
    assert row.n_mismatch == 0
    assert row.n_merged == row.n_target
    # cardinality algebra of MERGE: base - deletes + inserts = target
    assert row.n_base - row.n_deletes + row.n_inserts == row.n_target
    assert row.n_inserts > 0 and row.n_updates > 0 and row.n_deletes > 0


# ---------------------------------------------------------------------------
# PSI drift: per-term non-negativity and count conservation
# ---------------------------------------------------------------------------
def test_psi_terms_nonnegative_and_counts_conserve(spark):
    from energy_data_pipeline_project_spark.operators.warehouse import (
        PSI_BUCKETS,
        dq_distribution_drift,
    )

    rows = dq_distribution_drift(spark, SF_SMOKE).collect()
    assert len(rows) == PSI_BUCKETS
    # (p-q) and ln(p/q) always share a sign, so every term is >= 0.
    assert all(r.psi_term >= 0 for r in rows)
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r.c_old + r.c_new for r in rows) == n_orders


def _sweep_rows(spark, rows):
    from energy_data_pipeline_project_spark.operators.timeseries import (
        concurrency_sweep_frame,
    )

    df = spark.createDataFrame(
        [(uid, eid, ts) for uid, eid, ts in rows],
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return {
        str(r.d): (r.n_segments, r.peak_concurrent, r.covered_seconds)
        for r in concurrency_sweep_frame(df).collect()
    }


def test_sweep_session_crossing_midnight_splits_cleanly(spark):
    # One user active 23:50-00:10: one session, two day segments.
    got = _sweep_rows(
        spark,
        [
            (1, 1, "1995-06-01 23:50:00"),
            (1, 2, "1995-06-02 00:10:00"),
        ],
    )
    # Session = [23:50, 00:40) (gap extension): 600s on day 1,
    # 2400s on day 2.
    assert got == {
        "1995-06-01": (1, 1, 600),
        "1995-06-02": (1, 1, 2400),
    }


def test_sweep_subsecond_tail_day_floors_to_zero(spark):
    # Event at 23:30:00.7 -> session [23:30:00.7, 00:00:00.7): day one
    # covers 1799.3s (floors to 1799), and the 0.7s spill-over day
    # legitimately reports covered_seconds == 0.
    got = _sweep_rows(spark, [(1, 1, "1995-06-01 23:30:00.700")])
    assert got == {"1995-06-01": (1, 1, 1799), "1995-06-02": (1, 1, 0)}


def test_sweep_overlap_and_gap_counted_exactly(spark):
    # Two users overlap 10 minutes; a third is disjoint. Peak 2,
    # covered = union length, not the sum.
    got = _sweep_rows(
        spark,
        [
            (1, 1, "1995-06-01 01:00:00"),  # session [01:00, 01:50)
            (1, 2, "1995-06-01 01:20:00"),
            (2, 3, "1995-06-01 01:40:00"),  # session [01:40, 02:10)
            (3, 4, "1995-06-01 05:00:00"),  # session [05:00, 05:30)
        ],
    )
    # union = [01:00, 02:10) + [05:00, 05:30) = 4200 + 1800
    assert got == {"1995-06-01": (3, 2, 6000)}


# ---------------------------------------------------------------------------
# Join maintenance: delta algebra equals direct recompute (Spark-side)
# ---------------------------------------------------------------------------
def test_join_maintenance_algebra_equals_direct_join(spark):
    from energy_data_pipeline_project_spark.operators.warehouse import (
        join_incremental_maintenance,
        _cents,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    direct = (
        orders.select("o_orderkey")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.to_date("l_shipdate").alias("ship_date"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(_cents("l_extendedprice * (1 - l_discount)"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )
    inc = join_incremental_maintenance(spark, SF_SMOKE)
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, direct.collect())
    )


# ---------------------------------------------------------------------------
# Feature-store refresh example: end-to-end composition
# ---------------------------------------------------------------------------
def test_feature_store_refresh_example_runs(spark, tmp_path):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "feature_store_refresh",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "feature_store_refresh.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "store")
    report = mod.refresh(spark, SF_SMOKE, out)
    assert report["1_cdc_mismatch"] == 0
    # drift now gates BEFORE the store writes (r08): on this fixture
    # the refresh publishes, so the view/features stages must have run
    assert report["status"] == "published"
    assert report["3_view_days"] > 0
    assert report["2_psi_total"] >= 0
    feats = spark.read.parquet(f"{out}/store/features")
    assert feats.count() == report["4_features_rows"] > 0
    # every published feature row is a purchase label
    ev = load_table(spark, SF_SMOKE, "events")
    purchases = {
        r.event_id
        for r in ev.where(F.col("event_type") == "purchase").collect()
    }
    assert {r.label_id for r in feats.collect()} <= purchases


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup: candidate bound + verify threshold
# ---------------------------------------------------------------------------
def test_sorted_neighborhood_bounds_and_threshold(spark):
    from energy_data_pipeline_project_spark.operators.dedup import (
        SN_THRESHOLD_PERMILLE,
        SN_WINDOW,
        dedup_sorted_neighborhood,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    n = docs.count()
    rows = dedup_sorted_neighborhood(spark, SF_SMOKE).collect()
    # candidate space is O(w*n) BY CONSTRUCTION — the emitted subset
    # can never exceed it
    assert len(rows) <= (SN_WINDOW - 1) * n
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.jaccard_permille >= SN_THRESHOLD_PERMILLE
        assert r.jaccard_permille <= 1000


def test_sorted_neighborhood_pairs_are_deterministic(spark):
    from energy_data_pipeline_project_spark.operators.dedup import (
        dedup_sorted_neighborhood,
    )

    a = sorted(map(tuple, dedup_sorted_neighborhood(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, dedup_sorted_neighborhood(spark, SF_SMOKE).collect()))
    assert a == b and a


# ---------------------------------------------------------------------------
# Benford audit: conservation and fixed expectation
# ---------------------------------------------------------------------------
def test_benford_audit_conserves_counts(spark):
    from energy_data_pipeline_project_spark.operators.warehouse import (
        BENFORD_PERMILLE,
        dq_benford_audit,
    )

    rows = dq_benford_audit(spark, SF_SMOKE).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    n_audited = (
        load_table(spark, SF_SMOKE, "orders")
        .where(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) > 0"))
        .count()
    )
    assert sum(r.n for r in rows) == n_audited
    total_share = sum(r.observed_permille for r in rows)
    assert 1000 - len(rows) <= total_share <= 1000  # floor-division slack
    for r in rows:
        assert r.benford_permille == BENFORD_PERMILLE[r.digit]
        assert r.abs_dev_permille == abs(
            r.observed_permille - r.benford_permille
        )


def test_sorted_neighborhood_pairs_are_slice_invariant(spark):
    """The range-sliced candidate decomposition (r10 verdict #1a) must
    produce EXACTLY the single-global-sort pair set whatever the slice
    count — including one slice (the degenerate single-window
    formulation), slices that straddle neighborhoods, and more slices
    than rows (most slices empty, neighbors several slices apart)."""
    import pyspark.sql.functions as F

    from energy_data_pipeline_project_spark.operators import dedup
    from energy_data_pipeline_project_spark.operators.dedup import (
        SN_KEY_LEN,
        sorted_neighborhood_candidates,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        F.expr(f"substr(lower(text), 1, {SN_KEY_LEN})").alias("k"),
    )
    n = docs.count()
    sets = {}
    # None = the adaptive default (slice count derived from the input's
    # estimated bytes, r11 optimization round) — must land on the same
    # pair set as every explicit count
    for nb in (1, 3, n + 7, None):
        sets[nb] = sorted(
            map(tuple, sorted_neighborhood_candidates(t, n_buckets=nb).collect())
        )
        dedup.release_cached_frames()
    assert sets[1] and sets[3] == sets[1] and sets[n + 7] == sets[1]
    assert sets[None] == sets[1]


def test_sliced_window_bucket_count_adapts_to_input_size(spark):
    """The slice count is derived from Catalyst's size estimate
    (guide §2: scale-adaptive partitioning, not a constant tuned for
    one deployment): tiny inputs collapse to the 2-slice floor so the
    decomposition overhead stays bounded, the count grows with
    estimated bytes, and the cap bounds the offsets frame."""
    from energy_data_pipeline_project_spark.functions.windows import (
        DEFAULT_SLICES,
        MAX_SLICES,
        TARGET_SLICE_BYTES,
        _EST_SANITY_CEILING,
        _auto_buckets,
    )

    # floor: a tiny input collapses to a small count (asserted as a
    # range, not an estimator-exact value — r11 advisor: pinning
    # Catalyst's per-version estimate breaks on upgrades without any
    # real regression)
    docs = load_table(spark, SF_SMOKE, "documents")
    small = _auto_buckets(docs.select("doc_id", "lang"))
    assert 2 <= small <= DEFAULT_SLICES

    # growth: a frame whose estimate spans multiple targets gets more
    # slices; range() has a simple bytes/row estimate and is never
    # executed here (_auto_buckets only reads the optimized plan's
    # stats)
    rows = 2 * TARGET_SLICE_BYTES // 8  # estimate ≈ 2 × target bytes
    grown = _auto_buckets(spark.range(rows))
    assert small < grown <= MAX_SLICES

    # cap: a large-but-plausible estimate (under the sanity ceiling)
    # clamps to MAX_SLICES
    big_rows = (_EST_SANITY_CEILING // 2) // 8
    assert _auto_buckets(spark.range(big_rows)) == MAX_SLICES

    # garbage estimates are UNKNOWN, not huge: an unsizable leaf
    # (defaultSizeInBytes = Long.MaxValue) or a join-multiplied
    # product estimate past the sanity ceiling falls back to
    # DEFAULT_SLICES instead of buying a 4096-way shuffle on possibly
    # tiny data (r11 advisor)
    huge = spark.range(rows).crossJoin(spark.range(10_000_000))
    assert _auto_buckets(huge) == DEFAULT_SLICES
