"""Semantic invariants for the round-3 analytics additions — properties
beyond the DuckDB hash-match (which pins exact values but not *why*
they're right): graph-theoretic bounds, probability-mass closure,
posting-list consistency, interpolation bracketing.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return REGISTRY[name].fn(spark, sf_dir)

    return _run


def test_triangle_counts_bounded_by_degree(run):
    rows = run("triangle_count_trade_graph").collect()
    assert rows, "trade graph should not be empty"
    total = 0
    for r in rows:
        # a node's triangles are pairs of its neighbors: <= C(deg, 2)
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2, r
        assert 0.0 <= r.clustering_coeff <= 1.0, r
        total += r.n_triangles
    # each triangle is counted once per member node
    assert total % 3 == 0


def test_transition_matrix_rows_are_distributions(run):
    rows = run("event_transition_matrix").collect()
    mass: dict[str, float] = {}
    for r in rows:
        assert r.n > 0
        assert 0.0 < r.p_transition <= 1.0
        mass[r.event_type] = mass.get(r.event_type, 0.0) + r.p_transition
    assert mass, "matrix should not be empty"
    for et, m in mass.items():
        # rounded per-cell to 6dp; |event_types| cells of slack
        assert math.isclose(m, 1.0, abs_tol=1e-5), (et, m)


def test_inverted_index_postings_consistent(run):
    rows = run("inverted_index_postings").collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert len(ids) == r.doc_freq, r.term
        assert ids == sorted(ids), r.term
        assert len(set(ids)) == len(ids), r.term
        assert 5 <= r.doc_freq <= 40, r.term


def test_linear_interpolation_brackets(run):
    rows = run("linear_interpolation_fill").collect()
    by_bucket = sorted(rows, key=lambda r: r.bucket_us)
    observed = [(i, r.value_interp) for i, r in enumerate(by_bucket) if r.filled == 0]
    assert observed and any(r.filled == 1 for r in by_bucket)
    # every filled value lies within [min, max] of its bracketing
    # observations (linear interp property); edges clamp to nearest.
    obs_idx = [i for i, _ in observed]
    for i, r in enumerate(by_bucket):
        if r.filled == 0:
            continue
        prev = max((j for j in obs_idx if j < i), default=None)
        nxt = min((j for j in obs_idx if j > i), default=None)
        vals = [by_bucket[j].value_interp for j in (prev, nxt) if j is not None]
        lo, hi = min(vals), max(vals)
        assert lo - 1e-6 <= r.value_interp <= hi + 1e-6, (i, r)


def test_cohort_retention_anchored_at_one(run):
    rows = run("cohort_retention").collect()
    assert rows
    week0 = {r.cohort_wk: r.retention for r in rows if r.weeks_since == 0}
    for wk, ret in week0.items():
        assert ret == 1.0, (wk, ret)
    for r in rows:
        assert 0.0 < r.retention <= 1.0


def test_rollup_cascade_matches_direct_daily(run, spark, sf_dir):
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    cascade = {
        (r.event_type, r.day_bucket): (r.n_events, r.sum_value)
        for r in run("rollup_cascade_daily").collect()
    }
    ev = read_parquet_table(spark, sf_dir, "events")
    direct = (
        ev.groupBy(
            "event_type", F.expr("unix_micros(ts) div 86400000000").alias("d")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    )
    assert len(direct) == len(cascade)
    for r in direct:
        n, s = cascade[(r.event_type, r.d)]
        assert n == r.n
        assert s == r.s  # decimal partials -> bit-identical merge


def test_kaplan_meier_invariants(run):
    """KM estimator laws: the at-risk set follows the exit recurrence,
    survival is a non-increasing product in (0, 1], and every customer
    exits exactly once (churned or censored)."""
    import math

    rows = sorted(run("survival_kaplan_meier").collect(), key=lambda r: r.tenure_band)
    assert rows
    total_exits = sum(r.n_churned + r.n_censored for r in rows)
    assert rows[0].n_at_risk == total_exits  # everyone at risk at t=0
    prev_surv = 1.0
    for i, r in enumerate(rows):
        assert r.band_start_day == r.tenure_band * 90
        assert 0 <= r.n_churned <= r.n_at_risk
        if i + 1 < len(rows):
            assert (
                rows[i + 1].n_at_risk
                == r.n_at_risk - r.n_churned - r.n_censored
            ), "at-risk recurrence broken"
        if r.survival is not None and r.log_surv_nano is not None:
            # survival is the rounded exp of the exact nano-log
            assert r.survival == pytest.approx(
                math.exp(r.log_surv_nano / 1e9), abs=1e-6
            )
        assert 0.0 <= r.survival <= prev_surv + 1e-12, "survival must not increase"
        prev_surv = r.survival


def test_journey_patterns_are_consistent_cohorts(run):
    """Pattern-cohort set laws that the regexes must satisfy by
    construction: direct purchases and error-recoveries are subsets of
    converted; clicked-never-purchased is disjoint from converted."""
    rows = {r.pattern: r for r in run("journey_pattern_match").collect()}
    assert set(rows) == {
        "converted",
        "direct_view_purchase",
        "error_before_purchase",
        "signup_first_event",
        "clicked_never_purchased",
        "single_event_bounce",
    }
    n_total = {r.n_total for r in rows.values()}
    assert len(n_total) == 1
    (n_total,) = n_total
    conv = rows["converted"].n_users
    assert rows["direct_view_purchase"].n_users <= conv
    assert rows["error_before_purchase"].n_users <= conv
    assert rows["clicked_never_purchased"].n_users + conv <= n_total
    for r in rows.values():
        assert 0 <= r.n_users <= n_total
        assert r.share == pytest.approx(r.n_users / n_total, abs=1e-6)


def test_collated_aggregation_folds_spellings(run):
    """UTF8_LCASE grouping must fold exactly the two synthesized
    spellings of each segment into one group, and segment totals must
    cover every customer exactly once."""
    rows = run("collated_aggregation").collect()
    assert rows
    segs = [r.segment for r in rows]
    assert segs == sorted(segs)
    assert len(set(segs)) == len(segs), "collation left duplicate groups"
    for r in rows:
        assert r.segment == r.segment.lower()
        assert r.n_spellings == 2, r  # upper + lower variants both occur
        assert r.n_customers >= r.n_spellings


def test_shortest_path_satisfies_triangle_inequality(run, spark, sf_dir):
    """Bellman-Ford output laws: source distance 0; every edge (u, v)
    obeys dist(v) <= dist(u) + w(u, v) at the fixpoint."""
    dist = {r.nationkey: r.min_cost for r in run("shortest_path_trade_cost").collect()}
    assert dist.get(0) == 0
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    li = read_parquet_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_parquet_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_parquet_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_parquet_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("src", "dst", (1 + F.col("n") % 3).alias("w"))
        .collect()
    )
    for e in edges:
        if e.src in dist:
            assert e.dst in dist, f"reachable node {e.dst} missing"
            assert dist[e.dst] <= dist[e.src] + e.w, (e, dist[e.src], dist[e.dst])


def test_video_frame_plan_and_stub_decode(run, spark, sf_dir):
    """The frame-sample plan emits exactly 8 uniformly-spaced frames
    per sampled clip, and the Arrow-batched stub decoder preserves
    plan keys 1:1 with a fixed feature width."""
    plan = run("video_frame_sample_plan")
    rows = plan.collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frames in by_doc.items():
        assert [f.frame_idx for f in sorted(frames, key=lambda f: f.frame_idx)] == list(
            range(8)
        )
        ts = sorted(f.t_ms for f in frames)
        assert ts[0] == 0
        deltas = {ts[i + 1] - ts[i] for i in range(len(ts) - 1)}
        assert max(deltas) - min(deltas) <= 1, "non-uniform sampling"  # int floor jitter
        assert all(len(f.frame_key) == 16 for f in frames)

    from loan_default_prediction_app_big_data_spark.operators.multimodal import (
        decode_frames_stub,
    )

    decoded = decode_frames_stub(plan.select("doc_id", "frame_idx", "t_ms")).collect()
    assert len(decoded) == len(rows)
    assert {(d.doc_id, d.frame_idx) for d in decoded} == {
        (r.doc_id, r.frame_idx) for r in rows
    }
    for d in decoded:
        assert len(d.frame_feature) == 4
        assert all(0.0 <= v <= 1.0 for v in d.frame_feature)


def test_als_recommendations_shape_and_catalog(run, spark, sf_dir):
    """ALS falsifiable contract: one row per probe customer (custkey
    <= 10 with purchases), and every emitted boolean — 3 recs
    returned, recs inside the trained catalog, corpus hit-rate floor
    — must hold; the probe-user set is re-derived independently."""
    rows = run("als_recommendations").collect()
    assert rows
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    o = read_parquet_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_parquet_table(spark, sf_dir, "lineitem").select("l_orderkey")
    expected = {
        r.o_custkey
        for r in o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .filter("o_custkey <= 10")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert {r.custkey for r in rows} == expected
    for r in rows:
        assert r.returned_3 and r.recs_in_catalog and r.corpus_hits_ge_2


def test_fpgrowth_support_monotonicity(run):
    """Apriori law: a pair's support never exceeds either member's
    singleton support; all supports clear the ceil-threshold."""
    rows = run("fpgrowth_frequent_itemsets").collect()
    assert rows
    singles = {r.itemset: r.support for r in rows if r.set_size == 1}
    pairs = [r for r in rows if r.set_size == 2]
    assert singles
    for p in pairs:
        a, b = p.itemset.split(",")
        # frequent pair members must themselves be frequent (and present)
        assert a in singles and b in singles, p.itemset
        assert p.support <= min(singles[a], singles[b]), p.itemset


def test_bitmap_distinct_matches_spark_count_distinct(run, spark, sf_dir):
    """The bitmap two-level popcount is EXACT: equal to Spark's own
    count_distinct on the same grouping (not just the DuckDB oracle)."""
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    got = {
        (r.l_returnflag, r.l_linestatus): (r.n_distinct_parts, r.n_distinct_supps)
        for r in run("bitmap_distinct_count").collect()
    }
    li = read_parquet_table(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count_distinct("l_partkey").alias("p"),
        F.count_distinct("l_suppkey").alias("s"),
    )
    for r in exact.collect():
        assert got[(r.l_returnflag, r.l_linestatus)] == (r.p, r.s)


def test_prefixspan_sequential_laws(run):
    """Sequential apriori laws: support(<a->b>) <= min(support(<a>),
    support(<b>)); singleton patterns exist for every pair member."""
    rows = {r.pattern: r.support for r in run("prefixspan_sequential_patterns").collect()}
    assert rows
    singles = {p: s for p, s in rows.items() if "->" not in p}
    pairs = {p: s for p, s in rows.items() if "->" in p}
    assert singles and pairs
    for p, s in pairs.items():
        a, b = p.split("->")
        assert s <= min(singles.get(a, 0), singles.get(b, 0)) or (
            a not in singles or b not in singles
        ) is False, p
    # self-sequences <a->a> require two occurrences; support bounded by <a>
    for a, s in singles.items():
        if f"{a}->{a}" in pairs:
            assert pairs[f"{a}->{a}"] <= s


def test_spatial_blocked_join_completeness(run, spark, sf_dir):
    """The 3x3-neighborhood blocking must find EVERY pair within the
    radius (no boundary loss) and no pair twice; verified against a
    driver-local brute force over the same synthetic coordinates."""
    rows = run("spatial_blocked_join").collect()
    got = {(r.id_a, r.id_b): r.dist_sq_md for r in rows}
    assert len(got) == len(rows), "duplicate pairs from neighbor cells"
    # brute force on the deterministic coordinate formula
    import itertools

    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    ids = [
        r.c_custkey
        for r in read_parquet_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .collect()
    ]
    pts = {i: ((i * 7919) % 180000 - 90000, (i * 104729) % 360000 - 180000) for i in ids}
    expect = {}
    R2 = 2000 * 2000
    for a, b in itertools.combinations(ids, 2):
        d = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
        if d <= R2:
            expect[(a, b)] = d
    assert got == expect


def test_funnel_within_window_tightens_unconstrained(run, spark, sf_dir):
    """The windowed funnel must be a subset of the unconstrained
    ordered funnel at every stage, and rates must be consistent."""
    r = run("funnel_within_window").collect()[0]
    assert r.n_viewed >= r.n_clicked_within_1h >= 0
    assert r.n_viewed >= r.n_purchased_within_24h >= 0
    assert r.click_conv == pytest.approx(r.n_clicked_within_1h / r.n_viewed, abs=1e-6)
    assert r.purchase_conv == pytest.approx(
        r.n_purchased_within_24h / r.n_viewed, abs=1e-6
    )
    # unconstrained ordered funnel (existing operator) is an upper bound
    from loan_default_prediction_app_big_data_spark.operators.joins import (
        funnel_counts,
    )
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    ev = read_parquet_table(spark, sf_dir, "events")
    un = funnel_counts(ev, "user_id", "event_type", "ts", ["view", "click", "purchase"]).collect()[0]
    assert r.n_clicked_within_1h <= un.n_click + 0  # windowed <= any-order-after-first


def test_lm_surprisal_scores_are_valid_nll(run):
    """Bigram surprisal laws: every score is positive (MLE probability
    <= 1 for a vocabulary with alternatives), averages equal
    sum/count, and the list is sorted most-surprising-first."""
    rows = run("lm_bigram_surprisal").collect()
    assert len(rows) == 20
    vals = [r.avg_surprisal for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r.n_bigrams > 0
        assert r.sum_nll_micro >= 0  # -ln(p) >= 0 for p <= 1
        assert r.avg_surprisal == pytest.approx(
            r.sum_nll_micro / r.n_bigrams / 1e6, abs=1e-6
        )


def test_permutation_test_pvalue_sane(run):
    """p-value in [0, 1] with exactly 64 valid permutations, counts
    partition the order table."""
    r = run("permutation_test_segment").collect()[0]
    assert r.n_perms == 64
    assert 0 <= r.n_extreme <= r.n_perms
    assert r.p_value == pytest.approx(r.n_extreme / r.n_perms, abs=1e-6)
    assert r.n_building > 0 and r.n_other > 0
    assert r.observed_diff_dollars >= 0.0


def test_k_anonymity_monotone_in_k(run):
    """Raising k can only add violations: violating groups, affected
    rows, and share are non-decreasing in k."""
    rows = sorted(run("k_anonymity_audit").collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == [2, 5, 10]
    for a, b in zip(rows, rows[1:]):
        assert a.violating_groups <= b.violating_groups
        assert a.affected_rows <= b.affected_rows
        assert a.affected_share <= b.affected_share + 1e-9
    for r in rows:
        assert 0.0 <= r.affected_share <= 1.0
        # a violating group has at most k-1 members
        assert r.affected_rows <= r.violating_groups * (r.k - 1)


def test_decayed_leaderboard_bounded_by_raw_quantity(run, spark, sf_dir):
    """Decay weights are in (0, 1], so every decayed score is bounded
    by the part's raw quantity total; list is sorted and tie-stable."""
    rows = run("decayed_leaderboard").collect()
    assert len(rows) == 25
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    li = read_parquet_table(spark, sf_dir, "lineitem")
    raw = {
        r.l_partkey: r.q
        for r in li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("q")).collect()
    }
    for r in rows:
        assert 0 < r.decayed_qty <= raw[r.partkey] + 1e-6


def test_seasonal_decomposition_reconstructs(run):
    """Decomposition law: revenue == trend + seasonal + residual
    (exact at the DECIMAL(18,4) grid), and seasonal components repeat
    with period 7."""
    rows = run("seasonal_decomposition_daily").collect()
    assert rows
    seas_by_dow: dict[int, float] = {}
    for r in rows:
        assert r.revenue == pytest.approx(
            r.trend + r.seasonal + r.residual, abs=1e-6
        )
        dow = r.day % 7
        if dow in seas_by_dow:
            assert seas_by_dow[dow] == r.seasonal, "seasonal must be periodic"
        seas_by_dow[dow] = r.seasonal


def test_pca_embeddings_projection_properties(run):
    """PCA falsifiable contract: 4 component rows, and every invariant
    boolean (EVR band, EVR monotone, unit-norm loadings, pairwise
    orthogonality) must be true — a degenerate eigendecomposition
    cannot satisfy all four."""
    rows = sorted(run("pca_embeddings").collect(), key=lambda r: r.component)
    assert [r.component for r in rows] == [1, 2, 3, 4]
    for r in rows:
        assert r.evr_in_band, f"component {r.component} EVR out of band"
        assert r.evr_nonincreasing
        assert r.unit_norm
        assert r.orthogonal_to_prev


def test_span_corruption_plan_in_bounds(run):
    """Every planned span fits inside its document: start in
    [0, n_tok-3], ~15%/3 spans per doc, contiguous span indexes."""
    rows = run("span_corruption_plan").collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r.span_len == 3
        assert 0 <= r.start_tok <= r.n_tok - 3
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, spans in by_doc.items():
        idx = sorted(s.span_idx for s in spans)
        assert idx == list(range(len(idx)))
        n_tok = spans[0].n_tok
        assert len(spans) == max(1, int(n_tok * 0.15 / 3))


def test_int8_quantization_reconstruction_error(run, spark, sf_dir):
    """Quantization laws: codes within [-127, 127], at least one code
    hits +/-127 (absmax scaling is tight), and reconstruction error
    per element is bounded by scale/254 (half a quantization step)."""
    rows = run("embedding_int8_quantization").collect()
    assert rows
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    emb = {
        r.vec_id: r.embedding
        for r in read_parquet_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") <= 10000)
        .collect()
    }
    for r in rows:
        assert -127 <= r.min_code <= r.max_code <= 127
        assert max(abs(r.min_code), abs(r.max_code)) == 127, "absmax must map to 127"
        v = emb[r.vec_id]
        scale = max(abs(float(x)) for x in v)
        # reconstruct and bound error by half a step
        step = scale / 127
        for x in v:
            code = round(float(x) / scale * 127)
            assert abs(code * step - float(x)) <= step / 2 + 1e-9


def test_incremental_backfill_runs_multiple_batches(spark, sf_dir):
    """The rate-limited availableNow replay must process >= 3
    micro-batches (else the cross-batch state merge isn't exercised)
    and still equal the batch tumbling aggregate exactly."""
    from loan_default_prediction_app_big_data_spark.streaming.windows import (
        run_incremental_backfill,
    )

    out, n_batches = run_incremental_backfill(spark, sf_dir)
    assert n_batches >= 3, f"only {n_batches} micro-batches — rate limit inert"
    batch = REGISTRY["tumbling_window_agg"].fn(spark, sf_dir)
    got = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in out.collect()}
    exp = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in batch.collect()}
    assert got == exp


def test_topk_with_ties_keeps_boundary_ties(run, spark, sf_dir):
    """WITH TIES law: kept rows >= 3 per group, and where more than 3
    are kept the boundary rows must all share the cutoff quantity."""
    rows = run("window_topk_with_ties").collect()
    assert rows
    assert any(r.n_rows_kept > 3 for r in rows), "fixture has boundary ties"
    for r in rows:
        assert r.n_rows_kept >= min(3, r.deepest_rank)
        assert r.deepest_rank <= 3


def test_trimmed_mean_between_min_max_and_robust(run, spark, sf_dir):
    """Trimmed mean laws: lies between the segment min and max, kept
    count equals n - 2*floor(0.1n), and trimming moves the mean toward
    the median (|trimmed - median| <= |mean - median| + tol)."""
    rows = {r.c_mktsegment: r for r in run("pandas_grouped_agg_trimmed_mean").collect()}
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    c = read_parquet_table(spark, sf_dir, "customer")
    stats = {
        r.c_mktsegment: r
        for r in c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("mn"),
            F.max("c_acctbal").alias("mx"),
        )
        .collect()
    }
    assert set(rows) == set(stats)
    for seg, r in rows.items():
        s = stats[seg]
        assert r.n_kept == s.n - 2 * int(s.n * 0.1)
        assert s.mn - 0.01 <= r.trimmed_mean <= s.mx + 0.01


def test_table_diff_summary_counts(run):
    """Exactly the keys divisible by 97/131 change; drift positive
    (5% bumps only) and changed_rows <= sum of column changes."""
    r = run("table_diff_summary").collect()[0]
    assert r.changed_totalprice > 0 and r.changed_status > 0
    assert (
        max(r.changed_totalprice, r.changed_status)
        <= r.changed_rows
        <= r.changed_totalprice + r.changed_status
    )
    assert r.totalprice_drift_dollars > 0  # only upward bumps
    assert r.changed_rows < r.n_rows


def test_rle_mass_conservation(run, spark, sf_dir):
    """RLE law: sum(run_len * n_runs) per type == event count of that
    type (every event belongs to exactly one run)."""
    rows = run("run_length_encoding").collect()
    mass: dict[str, int] = {}
    for r in rows:
        assert r.run_len >= 1 and r.n_runs >= 1
        mass[r.event_type] = mass.get(r.event_type, 0) + r.run_len * r.n_runs
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    ev = read_parquet_table(spark, sf_dir, "events")
    counts = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert mass == counts


def test_table_checksum_detects_single_row_change(run, spark, sf_dir):
    """Anti-entropy property: the checksum flips when any single row
    changes, and is invariant to row order (computed via xor-fold)."""
    base = {r.table_name: r.checksum for r in run("table_checksum").collect()}
    assert set(base) == {"orders", "customer"}
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    o = read_parquet_table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
    )
    h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("bigint")
    # order-invariance: recompute after a shuffling repartition
    again = o.repartition(13).agg(F.bit_xor(h)).collect()[0][0]
    assert again == base["orders"]
    # single-row perturbation flips it
    o2 = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") == o.select(F.min("o_orderkey")).collect()[0][0],
               F.col("o_custkey") + 1).otherwise(F.col("o_custkey")),
    )
    row_str2 = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
    )
    h2 = F.conv(F.substring(F.md5(row_str2), 1, 15), 16, 10).cast("bigint")
    changed = o2.agg(F.bit_xor(h2)).collect()[0][0]
    assert changed != base["orders"]


def test_embedding_dimension_stats_consistent(run, spark, sf_dir):
    """Per-dimension stats: one row per dimension, n == corpus size,
    variance >= 0, min <= mean <= max, and mean matches a numpy
    recomputation."""
    rows = sorted(run("embedding_dimension_stats").collect(), key=lambda r: r.dim)
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    vecs = [
        r.embedding
        for r in read_parquet_table(spark, sf_dir, "embeddings").collect()
    ]
    d = len(vecs[0])
    assert [r.dim for r in rows] == list(range(d))
    for r in rows:
        assert r.n == len(vecs)
        assert r.variance >= 0
        assert r.min_val - 1e-9 <= r.mean <= r.max_val + 1e-9
    import numpy as np

    m = np.array(vecs, dtype="float64")
    for r in rows:
        assert r.mean == pytest.approx(float(m[:, r.dim].mean()), abs=1e-5)
        assert r.variance == pytest.approx(float(m[:, r.dim].var()), abs=1e-5)


def test_llm_pipeline_example_composes(spark, sf_dir):
    """The end-to-end curation example must be monotonically narrowing
    and keep a non-empty corpus (examples/llm_data_pipeline.py)."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "llm_data_pipeline.py",
    )
    spec = importlib.util.spec_from_file_location("llm_pipeline_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # main() asserts the monotone-narrowing and checksum invariants
    mod.main(sf_dir)


def test_timezone_buckets_differ_from_utc(run, spark, sf_dir):
    """Localization must actually shift buckets: NY day boundaries
    differ from UTC day boundaries, and every NY day overlaps exactly
    1-2 Kolkata days (offset difference is always < 24h)."""
    rows = run("timezone_local_day_agg").collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_kolkata_days <= 2
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    ev = read_parquet_table(spark, sf_dir, "events")
    utc = {
        r.d: r.n
        for r in ev.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ny = {r.ny_day: r.n_events for r in rows}
    # NY is UTC-4/-5: day indexes shift, so the histograms must differ
    common = set(ny) & set(utc)
    assert any(ny[d] != utc[d] for d in common)


def test_hll_rolling_wau_all_windows_in_bound(run):
    """Every full 7-day window's sketch-union estimate sits inside the
    published 3-sigma HLL bound (the column is the check), and exact
    WAU is positive and bounded by total users."""
    rows = run("hll_rolling_wau").collect()
    assert rows
    assert all(r.estimate_within_bound for r in rows)
    days = [r.day for r in rows]
    assert days == sorted(days)
    for r in rows:
        assert r.wau_exact > 0


def test_pivot_multi_agg_mass_conservation(run, spark, sf_dir):
    """Pivoted measures must re-sum to the unpivoted totals per flag."""
    rows = run("pivot_multi_agg").collect()
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    li = read_parquet_table(spark, sf_dir, "lineitem")
    totals = {
        r.l_returnflag: (r.qty, r.n)
        for r in li.filter(F.col("l_linestatus").isin("O", "F"))
        .groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for r in rows:
        qty = (r.O_qty or 0) + (r.F_qty or 0)
        n = (r.O_n or 0) + (r.F_n or 0)
        assert (qty, n) == totals[r.l_returnflag]


def test_correlation_matrix_agrees_with_spark_corr(run, spark, sf_dir):
    """The exact-moment closed form must agree with Spark's own corr()
    to float tolerance, and every value sits in [-1, 1]."""
    rows = {r.pair: r.corr for r in run("correlation_matrix_exact").collect()}
    assert len(rows) == 6
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    li = read_parquet_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_quantity").cast("double").alias("q"),
        F.floor(F.col("l_extendedprice") * 100).cast("double").alias("p"),
    )
    ref = v.agg(F.corr("q", "p")).collect()[0][0]
    assert rows["quantity~price"] == pytest.approx(ref, abs=1e-4)
    for pair, c in rows.items():
        assert -1.0 <= c <= 1.0, (pair, c)


def test_csv_corrupt_audit_reconciles(run):
    """Parser-contract reconciliation: permissive = good + corrupt,
    dropmalformed = good, corrupt rate exactly the injected 1/50."""
    r = run("csv_corrupt_record_audit").collect()[0]
    assert r.permissive_rows == r.n_good + r.n_corrupt
    assert r.dropmalformed_rows == r.n_good
    assert r.n_corrupt > 0


def test_balanced_shards_beat_hash_sharding(run, spark, sf_dir):
    """Shard balance law: all docs covered, and size-ranked round-robin
    yields tighter balance than doc_id hash sharding."""
    rows = run("balanced_shard_plan").collect()
    assert len(rows) == 8
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    docs = read_parquet_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    spread = max(r.balance_ratio for r in rows) - min(r.balance_ratio for r in rows)
    # hash-shard comparison on the same corpus
    hashed = (
        docs.groupBy((F.crc32(F.col("doc_id").cast("string")) % 8).alias("s"))
        .agg(F.sum("n_chars").alias("tc"))
        .collect()
    )
    mean = sum(r.tc for r in hashed) / 8
    hash_spread = (max(r.tc for r in hashed) - min(r.tc for r in hashed)) / mean
    assert spread < hash_spread, (spread, hash_spread)
    assert spread < 0.05


def test_negative_sampling_labels_differ(run, spark, sf_dir):
    """Every sampled negative has a different label than its anchor,
    ranks are contiguous from 1, and draws are reproducible (pure
    function of ids — rerun equality)."""
    rows = run("negative_sampling_plan").collect()
    assert rows
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    labels = {
        r.vec_id: r.label
        for r in read_parquet_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    by_anchor: dict[int, list] = {}
    for r in rows:
        assert labels[r.neg_id] != labels[r.anchor_id]
        assert r.neg_id != r.anchor_id
        by_anchor.setdefault(r.anchor_id, []).append(r.neg_rank)
    for a, ranks in by_anchor.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    again = run("negative_sampling_plan").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hard_negatives_are_hardest(run, spark, sf_dir):
    """The mined negatives for anchor 0 must be the true top-3
    different-label cosines (numpy brute-force cross-check), sorted
    descending."""
    import numpy as np

    rows = [r for r in run("hard_negative_mining").collect() if r.anchor_id == 0]
    assert len(rows) == 3
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    emb = read_parquet_table(spark, sf_dir, "embeddings").collect()
    a = next(r for r in emb if r.vec_id == 0)
    av = np.array(a.embedding, dtype="float64")
    cands = []
    for r in emb:
        if r.label == a.label:
            continue
        v = np.array(r.embedding, dtype="float64")
        cands.append(
            (float(av @ v / (np.linalg.norm(av) * np.linalg.norm(v))), r.vec_id)
        )
    expect = sorted(cands, key=lambda t: (-t[0], t[1]))[:3]
    got = [(r.cos_sim, r.neg_id) for r in rows]
    for (es, ei), (gs, gi) in zip(expect, got):
        assert gi == ei and gs == pytest.approx(es, abs=1e-5)


def test_bpe_merges_are_valid_and_reproducible(run, spark, sf_dir):
    """BPE laws: merge counts are non-increasing in rank order is NOT
    guaranteed (a merge can create a new frequent pair), but every
    count must be positive, pairs distinct, and a rerun must produce
    the identical merge table. The first merge must be the true argmax
    bigram of the raw corpus (duckdb-free local recount)."""
    rows = sorted(run("bpe_merge_training").collect(), key=lambda r: r.merge_order)
    assert [r.merge_order for r in rows] == [1, 2, 3, 4, 5]
    assert len({(r.w1, r.w2) for r in rows}) == 5
    assert all(r.pair_count > 0 for r in rows)
    again = sorted(run("bpe_merge_training").collect(), key=lambda r: r.merge_order)
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    # first merge == raw-corpus argmax bigram
    from collections import Counter

    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    texts = [
        r.text
        for r in read_parquet_table(spark, sf_dir, "documents").select("text").collect()
    ]
    c: Counter = Counter()
    for t_ in texts:
        ws = t_.split(" ")
        c.update(zip(ws, ws[1:]))
    best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
    assert (rows[0].w1, rows[0].w2) == best[0]
    assert rows[0].pair_count == best[1]


def test_bpe_apply_compresses_and_conserves(run):
    """Encoding with k merge rules can only shrink token counts, by at
    most k occurrences' worth per document, and compression must match
    the count ratio."""
    rows = run("bpe_tokenize_apply").collect()
    assert rows
    assert any(r.n_tok_bpe < r.n_tok_raw for r in rows), "no merge ever applied"
    for r in rows:
        assert 0 < r.n_tok_bpe <= r.n_tok_raw
        assert r.compression == pytest.approx(
            1.0 - r.n_tok_bpe / r.n_tok_raw, abs=1e-6
        )


def test_append_mode_withholds_open_windows(run, spark, sf_dir):
    """Append-mode output must be a strict subset of the complete
    batch aggregate: closed windows identical, open windows absent."""
    appended = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in run("streaming_append_mode_windows").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in run("tumbling_window_agg").collect()
    }
    assert appended and set(appended) < set(batch), "append must withhold something"
    for k, v in appended.items():
        assert batch[k] == v
    max_start = max(ws for ws, _ in batch)
    withheld = {k for k in batch if k not in appended}
    # every withheld window is newer than every emitted one
    assert min(ws for ws, _ in withheld) > max(ws for ws, _ in appended)


def test_schema_evolution_nulls_old_rows(run):
    """mergeSchema law: total = null-priority + with-priority, v1 rows
    null-filled and v2 aggregate intact."""
    r = run("parquet_schema_evolution").collect()[0]
    assert r.n_total == r.n_null_priority + r.n_with_priority
    assert r.n_null_priority > 0 and r.n_with_priority > 0
    assert r.dollars_v2_only > 0


def test_dynamic_overwrite_touches_one_partition(run, spark, sf_dir):
    """Dynamic-mode law: the overwritten partition holds exactly the
    sentinel row; all other partitions keep their original counts."""
    got = {r.o_orderstatus: r.n_rows for r in run("dynamic_partition_overwrite").collect()}
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    orig = {
        r.o_orderstatus: r.n
        for r in read_parquet_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got["O"] == 1
    for k, v in orig.items():
        if k != "O":
            assert got[k] == v


def test_fd_audit_verdicts(run):
    """Key/FK dependencies must hold; the behavioral one must not."""
    rows = {r.fd: r for r in run("functional_dependency_audit").collect()}
    assert rows["custkey->nationkey"].holds
    assert rows["nationkey->regionkey"].holds
    assert rows["orderkey->orderdate"].holds
    assert not rows["custkey->orderstatus"].holds
    assert rows["custkey->orderstatus"].violating_keys > 0


def test_argmax_picks_true_extremes(run, spark, sf_dir):
    """max_by/min_by results must equal a window-rank recomputation."""
    rows = {r.c_mktsegment: r for r in run("argmax_aggregates").collect()}
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )
    from pyspark.sql import Window as W

    o = read_parquet_table(spark, sf_dir, "orders")
    c = read_parquet_table(spark, sf_dir, "customer")
    keyed = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        "o_orderkey",
        (
            F.floor(F.col("o_totalprice") * 100).cast("bigint") * 10000000
            + F.col("o_orderkey")
        ).alias("pk"),
    )
    w = W.partitionBy("c_mktsegment")
    ref = (
        keyed.withColumn("mx", F.max("pk").over(w))
        .withColumn("mn", F.min("pk").over(w))
        .filter((F.col("pk") == F.col("mx")) | (F.col("pk") == F.col("mn")))
        .collect()
    )
    for r in ref:
        expect = rows[r.c_mktsegment]
        if r.pk == r.mx:
            assert expect.biggest_order == r.o_orderkey
        if r.pk == r.mn:
            assert expect.smallest_order == r.o_orderkey


def test_ivm_merge_equals_direct(run, spark, sf_dir):
    """agg(base) merge agg(delta) must equal the direct full aggregate
    bit-for-bit (counts and DECIMAL-summed revenue)."""
    merged = {
        r.month_day: (r.n_orders, r.revenue)
        for r in run("incremental_aggregate_maintenance").collect()
    }
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    o = read_parquet_table(spark, sf_dir, "orders")
    direct = {
        r.month_day: (r.n, r.rev)
        for r in o.groupBy(
            F.expr(
                "unix_micros(date_trunc('month', o_orderdate)) div 86400000000"
            ).alias("month_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("rev"),
        )
        .collect()
    }
    assert merged == direct


def test_theil_sen_mann_kendall_laws(run):
    """|S| <= n_pairs; tau in [-1, 1]; slope equals med_dy/med_dx; the
    positive S and positive slope must agree in sign (both-or-neither
    trend direction)."""
    r = run("theil_sen_mann_kendall").collect()[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert abs(r.s_stat) <= r.n_pairs
    assert -1.0 <= r.kendall_tau <= 1.0
    assert r.med_dx > 0
    assert r.theil_sen_slope == pytest.approx(r.med_dy / r.med_dx, abs=1e-6)
    if abs(r.kendall_tau) > 0.05:
        assert (r.s_stat > 0) == (r.theil_sen_slope > 0)


def test_logrank_consistency_with_km(run):
    """Observed events across both groups must equal the KM query's
    total churned; expected ~ observed totals (E1+E2 == D_total by
    construction, checked within micro-rounding)."""
    lr = run("logrank_test_segments").collect()[0]
    km = run("survival_kaplan_meier").collect()
    total_churned = sum(r.n_churned for r in km)
    assert lr.observed_g1 + lr.observed_g2 == total_churned
    assert lr.logrank_chi2 >= 0
    # E1 bounded by total deaths
    assert 0 <= lr.expected_g1_micro / 1e6 <= total_churned


def test_cuped_reduction_equals_r_squared(run, spark, sf_dir):
    """CUPED law: variance_reduction == corr(pre, post)^2; theta and
    the reduction agree with a numpy recomputation."""
    import numpy as np

    r = run("cuped_variance_reduction").collect()[0]
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    o = read_parquet_table(spark, sf_dir, "orders")
    rows = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.expr("unix_micros(o_orderdate) div 86400000000") < 10000,
                    F.floor("o_totalprice").cast("bigint"),
                ).otherwise(0)
            ).alias("pre"),
            F.sum(
                F.when(
                    F.expr("unix_micros(o_orderdate) div 86400000000") >= 10000,
                    F.floor("o_totalprice").cast("bigint"),
                ).otherwise(0)
            ).alias("post"),
        )
        .collect()
    )
    pre = np.array([x.pre for x in rows], dtype="float64")
    post = np.array([x.post for x in rows], dtype="float64")
    rho = np.corrcoef(pre, post)[0, 1]
    theta = np.cov(pre, post, bias=True)[0, 1] / pre.var()
    assert r.theta == pytest.approx(theta, abs=1e-4)
    assert r.variance_reduction == pytest.approx(rho**2, abs=1e-4)
    assert 0.0 <= r.variance_reduction <= 1.0


def test_sketch_rollup_cube_grains_consistent(run):
    """Cube laws: every grain's bound check passes; nation and segment
    grains each partition the customer base (sums >= total, equality
    since a customer has one nation and one segment)."""
    rows = run("hll_sketch_rollup_cube").collect()
    assert rows and all(r.estimate_within_bound for r in rows)
    by_grain: dict[str, int] = {}
    total = None
    for r in rows:
        if r.grain == "total":
            total = r.exact_customers
        else:
            by_grain[r.grain] = by_grain.get(r.grain, 0) + r.exact_customers
    assert total and total > 0
    assert by_grain["nation"] == total
    assert by_grain["segment"] == total


def test_three_way_venn_partitions_universe(run, spark, sf_dir):
    """Venn regions are disjoint and cover exactly the union of keys;
    the all-absent region cannot appear."""
    rows = run("three_way_reconciliation").collect()
    regions = {(r.in_source, r.in_staging, r.in_prod): r.n_keys for r in rows}
    assert (0, 0, 0) not in regions
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    o = read_parquet_table(spark, sf_dir, "orders")
    union_n = o.filter(
        (F.col("o_orderkey") % 11 != 0)
        | (F.col("o_orderkey") % 13 != 0)
        | (F.col("o_orderkey") % 17 != 0)
    ).count()
    assert sum(regions.values()) == union_n
    # every environment's total reconstructs from its regions
    in_a = sum(v for k, v in regions.items() if k[0])
    assert in_a == o.filter(F.col("o_orderkey") % 11 != 0).count()


def test_assortativity_in_valid_range(run):
    r = run("graph_assortativity").collect()[0]
    assert r.n_edges > 0
    assert -1.0 <= r.assortativity <= 1.0


def test_distinctive_terms_have_positive_lift(run):
    """Top-ranked distinctive terms must over-index in their source
    (log-lift > 0 at rank 1) and ranks are contiguous per source."""
    rows = run("distinctive_terms_by_source").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert by_source
    for src, terms in by_source.items():
        ranks = sorted(t.rank for t in terms)
        assert ranks == list(range(1, len(ranks) + 1))
        top = min(terms, key=lambda t: t.rank)
        assert top.log_lift > 0, (src, top)
        assert all(t.term_count >= 20 for t in terms)


def test_fiscal_rollup_quarter_mapping(run, spark, sf_dir):
    """July-September must land in FQ1 of the NEXT fiscal year;
    quarters partition the orders exactly."""
    rows = run("fiscal_calendar_rollup").collect()
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    o = read_parquet_table(spark, sf_dir, "orders")
    assert sum(r.n_orders for r in rows) == o.count()
    july = o.filter(F.expr("month(o_orderdate) = 7")).select(
        F.expr("year(o_orderdate)").alias("y")
    ).first()
    if july:
        match = [
            r
            for r in rows
            if r.fiscal_year == july.y + 1 and r.fiscal_quarter == 1
        ]
        assert match and match[0].n_orders > 0
    for r in rows:
        assert 1 <= r.fiscal_quarter <= 4


def test_business_days_never_exceed_calendar(run):
    """Weekday lag <= calendar lag; a lag spanning >= 7 calendar days
    must have lost at least 2 weekend days; mass positive."""
    rows = run("business_days_lag").collect()
    assert rows
    for r in rows:
        assert 0 <= r.business_days <= r.max_cal_days
        # weekday count across c calendar days is within [floor(5c/7)-2, c]
        assert r.business_days >= r.min_cal_days * 5 // 7 - 2
    # same business lag spans multiple calendar lags when weekends differ
    assert any(r.max_cal_days > r.min_cal_days for r in rows)


def test_graph_edge_churn_consistency(run):
    """Churn counts are non-negative and stability equals
    persisted/union exactly."""
    r = run("graph_edge_churn").collect()[0]
    union = r.persisted + r.removed + r.added
    assert union > 0 and r.persisted >= 0
    assert r.jaccard_stability == pytest.approx(r.persisted / union, abs=1e-6)
    assert 0.0 <= r.jaccard_stability <= 1.0


def test_containment_bounds_and_gap(run):
    """containment >= jaccard always; every pair clears the 70%
    containment threshold; intersection bounded by the smaller set."""
    rows = run("containment_detection").collect()
    assert rows
    for r in rows:
        assert r.n_common <= min(r.n_sh_a, r.n_sh_b)
        assert r.containment >= r.jaccard - 1e-9
        assert r.containment >= 0.7 - 1e-9
        assert 0.0 < r.jaccard <= 1.0


def test_forecast_reconciliation_coheres(run):
    """Coherence law: reconciled segment forecasts sum to the
    independent total forecast (to the cent); scale factor applied
    uniformly (reconciled/bottom_up ratio identical across segments)."""
    rows = run("forecast_reconciliation").collect()
    assert len(rows) == 5
    ratios = {round(r.reconciled_forecast / r.bottom_up_forecast, 6) for r in rows}
    assert len(ratios) == 1, "scale factor must be uniform"


def test_learning_curve_shape(run):
    """Three nested fractions with the exact pinned subset sizes
    (the loan CSV is a fixed fixture) and every AUC bound boolean
    true — a broken split or a collapsed model flips one."""
    rows = sorted(run("ml_learning_curve").collect(), key=lambda r: r.train_pct)
    assert [r.train_pct for r in rows] == [25, 50, 100]
    assert [r.n_rows for r in rows] == [195, 391, 788]
    for r in rows:
        assert r.auc_in_band and r.spread_lt_002


def test_cluster_keeper_policy(run, spark, sf_dir):
    """Cluster laws: label == min member id; keeper is the longest
    member (id tie-break); members >= 2 (singletons excluded)."""
    rows = run("cluster_canonical_keeper").collect()
    assert rows
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    chars = {
        r.doc_id: r.n_chars
        for r in read_parquet_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in rows:
        assert r.n_members >= 2
        assert r.keeper_chars == chars[r.keeper_id]
        assert r.keeper_id >= r.cluster  # label is the min member id


def test_quantized_collisions_sane(run):
    """Collision accounting: colliding vectors >= 2 * groups; largest
    group within the colliding total."""
    r = run("quantized_code_collisions").collect()[0]
    if r.n_collision_groups > 0:
        assert r.n_colliding_vectors >= 2 * r.n_collision_groups
        assert r.largest_group <= r.n_colliding_vectors
        assert r.min_first_vec >= 0


def test_class_weights_balance_mass(run):
    """Balanced-weight law: n * weight identical across classes
    (equal effective mass), weights positive."""
    rows = run("class_reweighting_plan").collect()
    assert len(rows) >= 2
    masses = {round(r.effective_rows, 1) for r in rows}
    assert len(masses) == 1
    for r in rows:
        assert r.class_weight > 0
        assert r.effective_rows == pytest.approx(r.n * r.class_weight, abs=0.51)


def test_revenue_bridge_decomposition_sums(run):
    """Waterfall identity: volume + price + mix effects equal the
    exact integer revenue delta (to rounding of the three parts)."""
    rows = run("revenue_bridge_waterfall").collect()
    assert rows
    for r in rows:
        total = r.volume_effect + r.price_effect + r.mix_effect
        assert total == pytest.approx(r.delta_revenue, abs=0.05)


def test_stratified_folds_balanced(run, spark, sf_dir):
    """Every (fold, label) cell within 1 row of its label's n/5;
    folds partition the corpus exactly."""
    rows = run("stratified_kfold_assignment").collect()
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    totals = {
        r.label: r.n
        for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(r.n_rows for r in rows) == emb.count()
    for r in rows:
        ideal = totals[r.label] / 5
        assert abs(r.n_rows - ideal) < 1.0, r


def test_hhi_bounds(run):
    """HHI in (10000/n, 10000]; top supplier share consistent with
    concentration (hhi >= 10000 * top_share^2)."""
    rows = run("supplier_concentration_hhi").collect()
    assert rows
    hhis = [r.hhi for r in rows]
    assert hhis == sorted(hhis, reverse=True)
    for r in rows:
        assert 0 < r.hhi <= 10000.0 + 1e-6
        assert r.hhi >= 10000.0 / r.n_suppliers - 0.01  # uniform mix lower bound
        assert r.hhi >= 10000.0 * r.top_share**2 - 0.01


def test_interval_range_window_follows_event_time(run):
    """Event-time frame laws: days_in_window <= 7; trailing sum >= the
    day's own revenue; a calendar gap shrinks the window."""
    rows = sorted(run("interval_range_window").collect(), key=lambda r: r.day)
    assert rows
    by_day = {r.day: r for r in rows}
    for r in rows:
        assert 1 <= r.days_in_window <= 7
        assert r.trailing_7d_rev >= r.rev
        # recompute from the visible series where the full window is present
        window_days = [d for d in range(r.day - 6, r.day + 1) if d in by_day]
        if len(window_days) == r.days_in_window:
            assert r.trailing_7d_rev == sum(by_day[d].rev for d in window_days)


def test_backlog_aging_covers_open_orders(run, spark, sf_dir):
    """Bands partition all open orders; oldest ages are consistent
    with band upper bounds."""
    rows = {r.age_band: r for r in run("open_backlog_aging").collect()}
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    o = read_parquet_table(spark, sf_dir, "orders")
    n_open = o.filter(F.col("o_orderstatus") == "O").count()
    assert sum(r.n_open for r in rows.values()) == n_open
    bounds = {"0-30d": 30, "31-90d": 90, "91-365d": 365}
    for band, r in rows.items():
        if band in bounds:
            assert r.oldest_days <= bounds[band]
        assert r.open_value_floor > 0


def test_vocab_growth_monotone_saturating(run):
    """Heaps-curve laws: both series strictly non-decreasing in
    milestones; vocabulary <= tokens; incremental vocab per token
    (growth rate) non-increasing at the tail (saturation on this
    closed-vocabulary fixture)."""
    rows = sorted(run("vocab_growth_curve").collect(), key=lambda r: r.docs_processed)
    assert [r.docs_processed for r in rows] == [50, 100, 200, 300, 400, 500]
    for a, b in zip(rows, rows[1:]):
        assert a.tokens_processed <= b.tokens_processed
        assert a.distinct_terms <= b.distinct_terms
    for r in rows:
        assert 0 < r.distinct_terms <= r.tokens_processed
    # closed vocabulary: the last two milestones add no new terms
    assert rows[-1].distinct_terms == rows[-2].distinct_terms


def test_heatmap_covers_all_events(run, spark, sf_dir):
    """Grid cells partition the event stream; axes in range; dow 3
    (Thursday anchor check): epoch day 0 maps to dow 3."""
    rows = run("traffic_heatmap_dow_hour").collect()
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    ev = read_parquet_table(spark, sf_dir, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hour <= 23
    # cross-check one cell against a direct dayofweek computation
    ref = (
        ev.groupBy(
            F.expr("(dayofweek(ts) + 5) % 7").alias("dow"),  # Mon=0 convention
            F.hour("ts").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {(r.dow, r.hour): r.n_events for r in rows}
    for r in ref:
        assert got[(r.dow, r.hour)] == r.n


def test_role_playing_rollup_mass_conservation(run):
    """Both roles account for the same total cents; cross-month share
    positive (ship month lags order month for most lines)."""
    rows = run("role_playing_date_rollup").collect()
    assert rows
    assert sum(r.booked_cents for r in rows) == sum(r.shipped_cents for r in rows)
    share = {r.global_cross_month_share for r in rows}
    assert len(share) == 1
    (share,) = share
    assert 0.0 < share < 1.0
