"""Misra-Gries heavy hitters: the interesting regime is capacity ≪
distinct keys, which the sf testdata (150 users) never hits — these
tests build a skewed synthetic frame with thousands of distinct keys and
a handful of heavy ones, and pin (a) the mergeable-summaries superset
guarantee, (b) end-to-end exactness of the two-pass operator against a
plain exact groupBy, and (c) that the sketch actually prunes (candidate
set ≪ distinct keys)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from engineering_school_bigdata_project_f1_weather_spark.operators import sketch


def _skewed_df(spark, n_heavy=5, heavy_cnt=500, n_light=4000, parts=8):
    """5 keys with 500 rows each + 4000 singleton keys: 6500 rows,
    4005 distinct. With capacity 32, threshold is 6500/33 ≈ 197 — the
    heavy 5 qualify, nothing else comes close."""
    heavy = spark.range(n_heavy * heavy_cnt).select(
        (F.col("id") % n_heavy).alias("key")
    )
    light = spark.range(n_light).select((F.col("id") + 1_000_000).alias("key"))
    return heavy.unionAll(light).repartition(parts)


def test_two_pass_heavy_hitters_exact_under_pruning(spark):
    cap = 32
    df = _skewed_df(spark)
    cand = sketch.mg_candidates(df, "key", cap)
    n_cand = cand.count()
    # The sketch must prune hard: ≤ cap × partitions candidates out of
    # 4005 distinct keys.
    assert n_cand <= cap * 8
    assert n_cand < 4005
    n = df.count()
    exact = (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") * (cap + 1) > F.lit(n))
    )
    got = (
        df.join(F.broadcast(cand.select("key")), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") * (cap + 1) > F.lit(n))
    )
    assert sorted(r["key"] for r in got.collect()) == sorted(
        r["key"] for r in exact.collect()
    ) == [0, 1, 2, 3, 4]


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_mg_merge_superset_guarantee(values, cap):
    """Pure-python property: after merging arbitrary batches into a
    capacity-C summary, every key with count > n/(C+1) is present, and
    the summary never exceeds C keys."""
    counters: dict = {}
    # split into two arbitrary batches to exercise the merge path
    mid = len(values) // 2
    for chunk in (values[:mid], values[mid:]):
        if chunk:
            counters = sketch._mg_merge(counters, pd.Series(chunk), cap)
    assert len(counters) <= cap
    n = len(values)
    exact = pd.Series(values).value_counts()
    for key, cnt in exact.items():
        if cnt * (cap + 1) > n:
            assert key in counters


def test_events_heavy_hitters_matches_exact(spark, sf_dir):
    got = sketch.events_heavy_hitters(spark, sf_dir).collect()
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import load_events

    e = load_events(spark, sf_dir)
    n = e.count()
    exact = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") * (sketch.MG_CAPACITY + 1) > F.lit(n))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]


def test_hll_corrected_estimate_tracks_exact_dau(spark, sf_dir):
    """The ln small-range correction lives OUTSIDE the hash-checked
    surface (transcendental): apply it here in Python per day and pin
    the corrected estimate within 10% of the exact per-day distinct —
    the fidelity claim the sketch exists to make. (At ~150 users/day
    against m=512 registers every day is in the linear-counting regime,
    where the expected error is a few percent.)"""
    import math

    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )

    rows = sketch.events_dau_hll(spark, sf_dir).collect()
    exact = {
        r.day_us: r.dau
        for r in ev.load_events(spark, sf_dir)
        .groupBy(
            (F.col("ts_us") - F.col("ts_us") % (24 * ev.HOUR_US)).alias(
                "day_us"
            )
        )
        .agg(F.count_distinct("user_id").alias("dau"))
        .collect()
    }
    assert len(rows) == len(exact)
    for r in rows:
        if r.small_range and r.n_zero_regs > 0:
            est = sketch.HLL_M * math.log(sketch.HLL_M / r.n_zero_regs)
        else:
            est = r.hll_raw
        want = exact[r.day_us]
        assert abs(est - want) <= 0.10 * want, (r.day_us, est, want)


def test_hll_registers_merge_by_max(spark, sf_dir):
    """Mergeability — the property that makes HLL the 100 TB answer:
    registers computed over two disjoint halves of the events and merged
    register-wise by MAX must equal the registers computed over the
    whole. (Days here act as the 'partition' axis is not enough — split
    WITHIN days by user parity so the merge actually combines.)"""
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )
    from engineering_school_bigdata_project_f1_weather_spark.functions import (
        texts,
    )

    e = ev.load_events(spark, sf_dir).select(
        (F.col("ts_us") - F.col("ts_us") % (24 * ev.HOUR_US)).alias("day_us"),
        texts.hash32(F.col("user_id").cast("string")).alias("h"),
    )

    def regs_of(df):
        w = F.expr(f"div(h, {sketch.HLL_M})")
        rho = F.when(w == 0, F.lit(sketch.HLL_W_BITS + 1)).otherwise(
            F.lit(sketch.HLL_W_BITS + 1) - F.length(F.bin(w))
        )
        return (
            df.select(
                "day_us", (F.col("h") % sketch.HLL_M).alias("reg"), rho.alias("rho")
            )
            .groupBy("day_us", "reg")
            .agg(F.max("rho").alias("m_reg"))
        )

    whole = {
        (r.day_us, r.reg): r.m_reg for r in regs_of(e).collect()
    }
    merged: dict = {}
    for half in (e.where(F.col("h") % 2 == 0), e.where(F.col("h") % 2 == 1)):
        for r in regs_of(half).collect():
            k = (r.day_us, r.reg)
            merged[k] = max(merged.get(k, 0), r.m_reg)
    assert merged == whole


def test_mau_hll_merged_estimate_tracks_exact_mau(spark, sf_dir):
    """events_mau_hll (round 6): the month estimate produced by MERGING
    daily register frames (register-wise MAX) must track the exact
    month-grain distinct within the same 10% envelope as the day entry —
    merging must cost no accuracy, because the merged registers are
    identical to sketching the month directly (the registry oracle pins
    that identity bit-for-bit; this test pins fidelity)."""
    import math

    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )

    rows = sketch.events_mau_hll(spark, sf_dir).collect()
    exact = {
        r.month_us: r.mau
        for r in ev.load_events(spark, sf_dir)
        .groupBy(
            (F.col("ts_us") - F.col("ts_us") % ev.MONTH_DAYS_US).alias(
                "month_us"
            )
        )
        .agg(F.count_distinct("user_id").alias("mau"))
        .collect()
    }
    assert len(rows) == len(exact) and len(rows) > 0
    for r in rows:
        if r.small_range and r.n_zero_regs > 0:
            est = sketch.HLL_M * math.log(sketch.HLL_M / r.n_zero_regs)
        else:
            est = r.hll_raw
        want = exact[r.month_us]
        assert abs(est - want) <= 0.10 * want, (r.month_us, est, want)


def test_cms_overestimates_and_merges_by_sum(spark, sf_dir):
    """events_user_cms (round 6): (a) every estimate ≥ the exact count
    (the CMS one-sided guarantee), with error bounded by εN (ε = e/w —
    loose but non-vacuous at bench scale); (b) the merge law: counters
    built on two disjoint halves of the events and merged by per-cell
    SUM equal the whole-corpus counters — the property that lets
    per-partition/per-day counter tables roll up without re-scanning."""
    import math

    from engineering_school_bigdata_project_f1_weather_spark.functions import (
        texts,
    )
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )

    rows = sketch.events_user_cms(spark, sf_dir).collect()
    assert rows
    n_total = ev.load_events(spark, sf_dir).count()
    eps_n = math.e / sketch.CMS_W * n_total
    over_envelope = []
    for r in rows:
        # The HARD pin: est >= true is the deterministic CMS guarantee.
        assert r.cms_est >= r.n_true, r
        # EMPIRICAL ENVELOPE ONLY (ADVICE r6/r7): the epsilon-N bound is
        # probabilistic per hash row (deterministic worst case is N), so
        # this inequality is NOT a CMS guarantee — it documents the
        # observed error on the current testdata. A reseeded generation
        # may legitimately exceed it, so exceeding it is a WARNING (the
        # envelope stays visible in test output), never a failure.
        if r.cms_est > r.n_true + eps_n * sketch.CMS_D:
            over_envelope.append(r)
    if over_envelope:
        import warnings

        warnings.warn(
            "CMS estimates exceeded the empirical eps*N*d envelope "
            f"(seed-dependent, not a CMS guarantee): {over_envelope}",
            stacklevel=1,
        )

    e = ev.load_events(spark, sf_dir).select("user_id")
    buck = (
        texts.hash32(
            F.concat(
                F.lit("cms"),
                F.col("r").cast("string"),
                F.lit(":"),
                F.col("user_id").cast("string"),
            )
        )
        % sketch.CMS_W
    ).alias("bucket")

    def counters_of(df):
        return {
            (r.r, r.bucket): r.cnt
            for r in df.select(
                "user_id",
                F.explode(
                    F.array(*[F.lit(i) for i in range(sketch.CMS_D)])
                ).alias("r"),
            )
            .select("r", buck)
            .groupBy("r", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    whole = counters_of(e)
    merged: dict = {}
    for half in (
        e.where(F.col("user_id") % 2 == 0),
        e.where(F.col("user_id") % 2 == 1),
    ):
        for k, v in counters_of(half).items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_cms_monthly_equals_direct_month_sketch(spark, sf_dir):
    """events_user_cms_monthly (round 7): the day→month counter-SUM
    merge must equal sketching the month directly from events (the CMS
    merge law, in-engine), and the day entry's expand-after-distinct
    query set must equal the old distinct-after-expand set."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )

    got = sketch.events_user_cms_monthly(spark, sf_dir).collect()
    assert got
    # Direct month-grain sketch (no day intermediate), built inline:
    e = ev.load_events(spark, sf_dir).select(
        "user_id",
        (
            F.unix_micros("ts")
            - F.unix_micros("ts") % ev.MONTH_DAYS_US
        ).alias("month_us"),
    )
    direct = (
        sketch._cms_expand(e)
        .groupBy("month_us", "r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    direct_counters = {
        (r.month_us, r.r, r.bucket): r.cnt for r in direct.collect()
    }
    for r in got:
        assert r.cms_est >= r.n_true, r
        # the merged estimate must be the min over the DIRECT month
        # counters of the user's buckets — i.e. merge == direct
        buckets = [
            (r.month_us, row.r, row.bucket)
            for row in sketch._cms_expand(
                spark.createDataFrame([(r.user_id,)], "user_id long")
            ).collect()
        ]
        assert r.cms_est == min(direct_counters[b] for b in buckets), r


def test_hll_index_update_merges_and_is_idempotent(spark, sf_dir, tmp_path):
    """Continuous distinct-count shape (round 6): init the register table
    on the first half of the time range, update with the second half —
    the merged table must BIT-EQUAL the full-corpus registers (the
    max-merge law as persisted state, the twin of the minhash/ANN index
    tests); re-delivering the same batch must be a no-op (max(a,a)=a —
    the orchestrator-retry contract)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )

    src = ev.load_events(spark, sf_dir)
    mid = src.agg(F.expr("percentile_approx(ts_us, 0.5, 10000)")).collect()[0][0]
    first = src.where(F.col("ts_us") < mid)
    second = src.where(F.col("ts_us") >= mid)
    idx = str(tmp_path / "hll_index")

    sketch.hll_index_init(spark, first, idx)
    merged = sketch.hll_index_update(spark, second, idx)
    got = {(r.day_us, r.reg): r.m_reg for r in merged.collect()}
    want = {
        (r.day_us, r.reg): r.m_reg
        for r in sketch._daily_registers(spark, sf_dir).collect()
    }
    assert got == want

    again = sketch.hll_index_update(spark, second, idx)
    got2 = {(r.day_us, r.reg): r.m_reg for r in again.collect()}
    assert got2 == want

    # Durability contract (round 7, ADVICE r6): CURRENT always points at
    # a complete snapshot, exactly one snapshot dir is live, and an
    # orphan left by a crashed update is GC'd by the next successful one.
    import os

    live = sketch._hll_live(idx)
    assert os.path.isdir(os.path.join(idx, live))
    snaps = [d for d in os.listdir(idx) if d.startswith("registers_v")]
    assert snaps == [live]
    os.makedirs(os.path.join(idx, "registers_v99"))  # simulated crash debris
    sketch.hll_index_update(spark, second, idx)
    snaps = [d for d in os.listdir(idx) if d.startswith("registers_v")]
    assert snaps == [sketch._hll_live(idx)]


def test_bloom_semi_join_prefilter_selectivity(spark, sf_dir):
    """orders_bloom_semi_join (round 7): what the hash gate can't see —
    the PREFILTER itself. (a) No false negatives: every true match
    passes the bloom test; (b) selectivity: the bloom pass-set is a
    small superset of the true matches (far below the full fact scan);
    (c) the packed-word bitmap encodes exactly the build side's
    position set."""
    import pyspark.sql.functions as F

    from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
        load_table,
    )

    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == sketch.BLOOM_JOIN_SEGMENT)
        .select("c_custkey")
    )
    words = sketch._bloom_bitmap_words(c, "c_custkey")
    # (c) bitmap == position set
    got_bits = {
        i * 64 + b
        for i, w in enumerate(words)
        for b in range(64)
        if (w & ((1 << 64) - 1)) >> b & 1
    }
    want_bits = {
        r.pos
        for r in sketch._bloom_positions(c, "c_custkey")
        .select("pos")
        .distinct()
        .collect()
    }
    assert got_bits == want_bits

    o = load_table(spark, sf_dir, "orders")
    n_total = o.count()
    n_pass = o.where(sketch._bloom_test(F.col("o_custkey"), words)).count()
    n_true = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi"
    ).count()
    # (a) nothing lost, (b) pass-set is a tight superset, well under the
    # full scan (m=16384 bits vs ~segment-sized key set keeps fp low)
    assert n_true <= n_pass < n_total
    assert n_pass - n_true <= 0.2 * n_total, (n_pass, n_true, n_total)


def test_bloom_index_update_merges_and_is_idempotent(spark, sf_dir, tmp_path):
    """Continuous membership shape (round 7): init the bit-set table on
    the first half of the time range, update with the second half — the
    merged table must BIT-EQUAL the full-corpus bit sets (the OR-merge
    law as persisted state, the Bloom twin of the HLL index test);
    re-delivering the same batch must be a no-op (a UNION a = a)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )

    src = ev.load_events(spark, sf_dir)
    mid = src.agg(F.expr("percentile_approx(ts_us, 0.5, 10000)")).collect()[0][0]
    first = src.where(F.col("ts_us") < mid)
    second = src.where(F.col("ts_us") >= mid)
    idx = str(tmp_path / "bloom_index")

    sketch.bloom_index_init(spark, first, idx)
    merged = sketch.bloom_index_update(spark, second, idx)
    got = {(r.day_us, r.pos) for r in merged.collect()}
    want = {(r.day_us, r.pos) for r in sketch._bloom_bits_of(src).collect()}
    assert got == want

    again = sketch.bloom_index_update(spark, second, idx)
    assert {(r.day_us, r.pos) for r in again.collect()} == want
    # durability contract shared with the HLL table
    import os

    live = sketch._snap_live(idx)
    snaps = [d for d in os.listdir(idx) if d.startswith("bits_v")]
    assert snaps == [live]


def test_bloom_prefilter_cuts_shuffle_volume_under_shuffle_join(spark, sf_dir):
    """orders_bloom_semi_join (round 7): at 100 TB the dim side is
    fact-sized and the exact semi-join SHUFFLES — the bloom prefilter's
    payoff is the fact-side shuffle volume it removes.  Reproduce that
    regime by disabling broadcast joins and compare executed
    shuffle-records-written with and without the prefilter: the
    prefiltered plan must shuffle strictly fewer rows, and the fact
    side's reduction must be at least the prefilter's pruning ratio."""
    import pyspark.sql.functions as F

    from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
        load_table,
    )
    from tools.plan_audit import shuffle_rows_of

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        c = (
            load_table(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment") == sketch.BLOOM_JOIN_SEGMENT)
            .select("c_custkey")
        )
        words = sketch._bloom_bitmap_words(c, "c_custkey")
        o = load_table(spark, sf_dir, "orders")

        def agg(df):
            return (
                df.join(c, df.o_custkey == c.c_custkey, "left_semi")
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n_orders"))
            )

        plain = shuffle_rows_of(agg(o))
        filtered = shuffle_rows_of(
            agg(o.where(sketch._bloom_test(F.col("o_custkey"), words)))
        )
        assert filtered < plain, (filtered, plain)
        n_total = o.count()
        n_pass = o.where(
            sketch._bloom_test(F.col("o_custkey"), words)
        ).count()
        # the removed shuffle rows are at least the pruned fact rows
        assert plain - filtered >= n_total - n_pass, (
            plain, filtered, n_total, n_pass,
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_segment_overlap_hll_estimates_within_envelope(spark, sf_dir):
    """segment_overlap_hll (round 7): after the standard small-range
    linear-counting correction (m·ln(m/V) when raw ≤ 5m/2 and V > 0 —
    same out-of-hash-surface postprocess the events_dau_hll test
    applies), each per-segment and union estimate is within 3σ of the
    exact distinct count (σ = 1.04/√m ≈ 4.6% for m = 512, Flajolet et
    al. 2007; +2 absolute slack for the tiny-cardinality sf0.001
    fixture), and the inclusion-exclusion intersection is within 3×
    that envelope of the UNION's scale (I-E error is governed by the
    union sketch's absolute error, not the intersection's size — the
    docstring's 'small overlaps are the hard regime')."""
    import math

    rows = {r.relation: r for r in sketch.segment_overlap_hll(spark, sf_dir).collect()}
    assert set(rows) == {
        sketch.SEG_HLL_A, sketch.SEG_HLL_B, "union", "intersection"
    }

    def corrected(r) -> float:
        if (
            r.hll_raw * 2 <= 5 * sketch.HLL_M
            and r.n_zero_regs
            and r.n_zero_regs > 0
        ):
            return sketch.HLL_M * math.log(sketch.HLL_M / r.n_zero_regs)
        return float(r.hll_raw)

    sigma = 1.04 / sketch.HLL_M**0.5
    for rel in (sketch.SEG_HLL_A, sketch.SEG_HLL_B, "union"):
        r = rows[rel]
        assert abs(corrected(r) - r.n_exact) <= 3 * sigma * r.n_exact + 2, r
    inter, union = rows["intersection"], rows["union"]
    est_inter = (
        corrected(rows[sketch.SEG_HLL_A])
        + corrected(rows[sketch.SEG_HLL_B])
        - corrected(union)
    )
    assert abs(est_inter - inter.n_exact) <= 3 * (
        3 * sigma * union.n_exact + 2
    ), (est_inter, inter, union)
    # I-E consistency: the four RAW estimates satisfy A + B = union + inter
    assert (
        rows[sketch.SEG_HLL_A].hll_raw + rows[sketch.SEG_HLL_B].hll_raw
        == union.hll_raw + inter.hll_raw
    )


def test_value_hist_quantile_bins_match_exact_order_statistics(spark, sf_dir):
    """events_value_hist_monthly (round 7): the histogram percentile bin
    must be EXACTLY the bin of the true ceil(q·n)-th order statistic
    (binning is monotone, so bin(p-th value) = p-th bin of the binned
    multiset — no tolerance needed), and the reported lower bound is
    that bin's left edge."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import (
        MONTH_DAYS_US,
        _cents,
    )

    out = {r.month_us: r for r in sketch.events_value_hist_monthly(spark, sf_dir).collect()}
    assert out
    vals = (
        ev.load_events(spark, sf_dir)
        .select(
            (
                F.unix_micros("ts") - F.unix_micros("ts") % MONTH_DAYS_US
            ).alias("month_us"),
            _cents("value").alias("vc"),
        )
        .collect()
    )
    by_month: dict = {}
    for r in vals:
        by_month.setdefault(r.month_us, []).append(r.vc)
    for month_us, xs in by_month.items():
        xs.sort()
        n = len(xs)
        r = out[month_us]
        assert r.n_events == n
        for q in (50, 90, 99):
            kth = xs[(n * q + 99) // 100 - 1]  # ceil(q·n/100)-th smallest
            want_bin = min(kth // sketch.HIST_BIN_CENTS, sketch.HIST_B - 1)
            got_bin = getattr(r, f"p{q}_bin")
            assert got_bin == want_bin, (month_us, q, got_bin, want_bin)
            assert getattr(r, f"p{q}_lo_cents") == got_bin * sketch.HIST_BIN_CENTS


def test_value_hist_daily_sum_merge_equals_direct_month(spark, sf_dir):
    """The histogram merge law at the register level: per-day bin counts
    SUM-merged to the month grid equal binning the month directly (the
    frame-level twin of the entry's hash gate, pinned here so a merge
    regression localizes to this test instead of a hash mismatch)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import (
        MONTH_DAYS_US,
        _cents,
    )

    e = ev.load_events(spark, sf_dir).select(
        F.unix_micros("ts").alias("us"), _cents("value").alias("vc")
    ).select(
        "us",
        F.expr(
            f"least(div(vc, {sketch.HIST_BIN_CENTS}), {sketch.HIST_B - 1})"
        ).alias("bin"),
    )
    daily = (
        e.groupBy(
            (F.col("us") - F.col("us") % (24 * 3600 * 1_000_000)).alias("day_us"),
            "bin",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = {
        (r.month_us, r.bin): r.cnt
        for r in daily.groupBy(
            (F.col("day_us") - F.col("day_us") % MONTH_DAYS_US).alias("month_us"),
            "bin",
        )
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    direct = {
        (r.month_us, r.bin): r.cnt
        for r in e.groupBy(
            (F.col("us") - F.col("us") % MONTH_DAYS_US).alias("month_us"), "bin"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert merged == direct


def test_hist_index_update_is_exactly_once_via_ledger(spark, sf_dir, tmp_path):
    """hist_index (round 7): SUM merge is NOT idempotent (a+a ≠ a,
    unlike the HLL/Bloom merge laws), so the index twin carries an
    applied-batch ledger inside the atomic snapshot.  Pins: (a) init on
    the first time half + update with the second equals the full-corpus
    daily histogram; (b) re-delivering the SAME batch id is a no-op —
    and the same frame under a FRESH id is NOT, proving the no-op came
    from the ledger, not from accident; (c) the shared snapshot/GC
    durability contract."""
    import os

    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )

    src = ev.load_events(spark, sf_dir)
    mid = src.agg(F.expr("percentile_approx(ts_us, 0.5, 10000)")).collect()[0][0]
    first = src.where(F.col("ts_us") < mid)
    second = src.where(F.col("ts_us") >= mid)
    idx = str(tmp_path / "hist_index")

    sketch.hist_index_init(spark, first, idx)
    merged = sketch.hist_index_update(spark, second, idx, "b1")
    got = {(r.day_us, r.bin): r.cnt for r in merged.collect()}
    want = {
        (r.day_us, r.bin): r.cnt
        for r in sketch._daily_hist_of(src).collect()
    }
    assert got == want

    again = sketch.hist_index_update(spark, second, idx, "b1")
    assert {(r.day_us, r.bin): r.cnt for r in again.collect()} == want

    doubled = sketch.hist_index_update(spark, second, idx, "b2")
    got3 = {(r.day_us, r.bin): r.cnt for r in doubled.collect()}
    assert got3 != want  # fresh id really merges — the ledger did the work
    half = {(r.day_us, r.bin): r.cnt for r in sketch._daily_hist_of(second).collect()}
    assert got3 == {
        k: want[k] + half.get(k, 0) for k in want
    }

    live = sketch._snap_live(idx)
    assert os.path.isdir(os.path.join(idx, live))
    snaps = [d for d in os.listdir(idx) if d.startswith("hist_v")]
    assert snaps == [live]


# ------------------------------------------------- KMV (round 7 tail)
def test_bottom_k_two_level_is_exact(spark):
    """The salted two-level rank (sketch._bottom_k) must equal the naive
    single-window per-group bottom-k on every group — exactness of the
    skew-safe plan, pinned on a frame with groups straddling salt
    buckets unevenly."""
    from pyspark.sql import Window

    df = (
        spark.range(6000)
        .select(
            (F.col("id") % 7).alias("g"),
            F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10
            )
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    got = sorted(
        (r.g, r.h) for r in sketch._bottom_k(df, ["g"], 25).collect()
    )
    w = Window.partitionBy("g").orderBy("h")
    want = sorted(
        (r.g, r.h)
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 25)
        .drop("rn")
        .collect()
    )
    assert got == want


def test_kmv_estimator_envelope_synthetic(spark):
    """The (k−1)·2³²/h_k estimator on a 20 000-key hashed set must land
    within 3σ (σ = 1/√(k−2), Beyer et al. SIGMOD'07) of the true
    cardinality — the truncated regime the sf0.001 testdata never
    reaches (its months hold < k distinct user-days; the module
    convention: synthetic frames for regimes the fixtures can't hit)."""
    n = 20_000
    df = spark.range(n).select(
        F.lit(0).alias("g"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    sk = sketch._bottom_k(df.distinct(), ["g"], sketch.KMV_K)
    row = sk.agg(
        F.count(F.lit(1)).alias("n_kmv"), F.max("h").alias("kth_h")
    ).collect()[0]
    assert row.n_kmv == sketch.KMV_K
    est = (sketch.KMV_K - 1) * sketch.KMV_HASH_SPACE // row.kth_h
    sigma = 1.0 / (sketch.KMV_K - 2) ** 0.5
    assert abs(est - n) <= 3 * sigma * n, est


def test_events_kmv_monthly_regimes(spark, sf_dir):
    """Per month: the sketch never exceeds k rows; below k it IS the
    set, so the estimate equals the exact count bit-for-bit (32-bit
    hash collisions are ~n²/2³³ ≈ 10⁻⁵ at fixture scale and the data is
    fixed-seed — any collision would already flip the oracle hash
    gate); at k the estimator is within the 3σ envelope."""
    rows = sketch.events_kmv_monthly(spark, sf_dir).collect()
    assert rows
    sigma = 1.0 / (sketch.KMV_K - 2) ** 0.5
    for r in rows:
        assert r.n_kmv <= sketch.KMV_K
        if r.n_kmv < sketch.KMV_K:
            assert r.kmv_est == r.n_kmv == r.n_exact, r
        else:
            assert abs(r.kmv_est - r.n_exact) <= 3 * sigma * r.n_exact + 2, r


def test_segment_jaccard_kmv_consistency(spark, sf_dir):
    """Structural pins + regime-conditional accuracy: the union sketch
    is ≤ k rows; in the exact regime (|A∪B| < k) the sketch IS the
    union so match_cnt / union_est equal the exact intersection/union;
    in the truncated regime the Jaccard estimate is binomial —
    |match/|B_∪| − J| ≤ 3√(J(1−J)/k) — and the intersection estimate
    inherits that envelope scaled by the union size."""
    r = sketch.segment_jaccard_kmv(spark, sf_dir).collect()[0]
    assert r.n_union_kmv <= sketch.KMV_K
    assert 0 <= r.match_cnt <= r.n_union_kmv
    assert r.n_a_exact + r.n_b_exact == r.n_union_exact + r.n_inter_exact
    j_exact = r.n_inter_exact / r.n_union_exact
    if r.n_union_kmv < sketch.KMV_K:
        assert r.match_cnt == r.n_inter_exact, r
        assert r.union_est == r.n_union_exact, r
        assert r.inter_est == r.n_inter_exact, r
    else:
        sigma_j = (j_exact * (1 - j_exact) / sketch.KMV_K) ** 0.5
        j_est = r.match_cnt / r.n_union_kmv
        assert abs(j_est - j_exact) <= 3 * sigma_j + 1 / sketch.KMV_K, r
        env = 3 * sigma_j * r.n_union_exact + 0.2 * r.n_union_exact * (
            1.0 / (sketch.KMV_K - 2) ** 0.5
        )
        assert abs(r.inter_est - r.n_inter_exact) <= env + 2, r


def test_kmv_index_update_merges_and_is_idempotent(spark, sf_dir, tmp_path):
    """Continuous-ingest twin for the ORDER-STATISTIC merge: init the
    bottom-k table on the first half of the time range, update with the
    second half — the merged table must BIT-EQUAL the full-corpus daily
    sketches (min-k(∪ partials) = min-k(full), the semilattice law as
    persisted state); a re-delivered batch is a no-op (min-k(S∪S) =
    min-k(S) — no ledger needed, unlike the histogram's SUM); shared
    snapshot durability/GC contract."""
    import os

    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )

    src = ev.load_events(spark, sf_dir)
    mid = src.agg(F.expr("percentile_approx(ts_us, 0.5, 10000)")).collect()[0][0]
    first = src.where(F.col("ts_us") < mid)
    second = src.where(F.col("ts_us") >= mid)
    idx = str(tmp_path / "kmv_index")

    sketch.kmv_index_init(spark, first, idx)
    merged = sketch.kmv_index_update(spark, second, idx)
    got = {(r.day_us, r.h) for r in merged.collect()}
    want = {(r.day_us, r.h) for r in sketch._daily_kmv_of(src).collect()}
    assert got == want

    again = sketch.kmv_index_update(spark, second, idx)
    assert {(r.day_us, r.h) for r in again.collect()} == want

    live = sketch._snap_live(idx)
    assert os.path.isdir(os.path.join(idx, live))
    snaps = [d for d in os.listdir(idx) if d.startswith("kmv_v")]
    assert snaps == [live]
    os.makedirs(os.path.join(idx, "kmv_v99"))  # simulated crash debris
    sketch.kmv_index_update(spark, second, idx)
    snaps = [d for d in os.listdir(idx) if d.startswith("kmv_v")]
    assert snaps == [sketch._snap_live(idx)]


# ------------------------------ Misra-Gries month merge (round 7)


def test_mg_monthly_bracket_on_sf_data(spark, sf_dir):
    """events_heavy_hitters_monthly: the deterministic error bracket the
    output carries — n_true − slack ≤ mg_est ≤ n_true — plus ≤ C
    surviving counters per month (the summary-size invariant)."""
    rows = sketch.events_heavy_hitters_monthly(spark, sf_dir).collect()
    assert rows
    per_month: dict = {}
    for r in rows:
        assert r.mg_est <= r.n_true, r
        assert r.n_true - r.mg_est <= r.slack, r
        assert r.mg_est > 0, r
        per_month[r.month_us] = per_month.get(r.month_us, 0) + 1
    assert all(v <= sketch.MG_MONTHLY_CAPACITY for v in per_month.values())


def test_mg_monthly_truncation_regime_and_superset(spark):
    """The interesting regime — more active users per day than C — on a
    skewed synthetic month: truncations are REAL (slack > 0, estimates
    strictly undercount), and the mergeable-summaries superset guarantee
    holds: every user whose month count exceeds the month's slack
    survives the truncating-union merge."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 days x (5 heavy users with 40 events each + 200 light users with
    # 1-2 events): ~145 distinct users/day >> C=32, so every day truncates.
    for day in range(3):
        for u in range(5):
            for _ in range(40):
                rows.append((eid, base + datetime.timedelta(days=day, seconds=eid % 86399), u, "view", 1.0, "{}"))
                eid += 1
        for u in range(200):
            for _ in range(1 + (u + day) % 2):
                rows.append((eid, base + datetime.timedelta(days=day, seconds=eid % 86399), 100 + u, "view", 1.0, "{}"))
                eid += 1
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = sketch._mg_monthly_of(e).collect()
    assert out
    assert all(r.slack > 0 for r in out)
    assert any(r.mg_est < r.n_true for r in out)
    # superset guarantee per month
    slack = {r.month_us: r.slack for r in out}
    present = {(r.month_us, r.user_id) for r in out}
    day_us = F.unix_micros("ts") - F.unix_micros("ts") % (24 * 3600 * 1_000_000)
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import (
        MONTH_DAYS_US,
    )

    truth = (
        e.groupBy((day_us - day_us % MONTH_DAYS_US).alias("month_us"), "user_id")
        .count()
        .collect()
    )
    for r in truth:
        if r.month_us in slack and r["count"] > slack[r.month_us]:
            assert (r.month_us, r.user_id) in present, r
    # the heavy users clear the slack and must all be present
    assert {u for (_, u) in present} >= {0, 1, 2, 3, 4}


# --------------------- bottom-k sample quantile sketch (round 7)


def test_qsample_quantiles_within_binomial_envelope(spark, sf_dir):
    """events_value_quantiles_monthly: the served quantile's TRUE rank
    fraction must sit within 3σ binomial rank error of q
    (σ = √(q(1−q)/k)) — the guarantee a uniform k-sample's order
    statistic actually carries; plus the structural pins (sample ≤ k,
    estimates are real data values)."""
    import math

    import pyspark.sql.functions as F  # noqa: F811

    from engineering_school_bigdata_project_f1_weather_spark.operators.events import (
        MONTH_DAYS_US,
        _cents,
        load_events,
    )

    rows = sketch.events_value_quantiles_monthly(spark, sf_dir).collect()
    assert rows
    e = load_events(spark, sf_dir).select(
        (
            F.col("ts_us") - F.col("ts_us") % MONTH_DAYS_US
        ).alias("month_us"),
        _cents("value").alias("cents"),
    )
    cents_by_month: dict = {}
    for r in e.collect():
        cents_by_month.setdefault(r.month_us, []).append(r.cents)
    for r in rows:
        assert r.n_sample <= sketch.QSAMPLE_K
        vals = sorted(cents_by_month[r.month_us])
        n = len(vals)
        assert n == r.n_events
        for q, est in ((0.5, r.p50_est), (0.9, r.p90_est), (0.99, r.p99_est)):
            lo = sum(1 for v in vals if v < est) / n
            hi = sum(1 for v in vals if v <= est) / n
            sigma = math.sqrt(q * (1 - q) / r.n_sample)
            # est's true CDF position bracket must intersect q ± 3σ
            assert lo - 3 * sigma <= q <= hi + 3 * sigma, (q, lo, hi, sigma)
            assert est in cents_by_month[r.month_us]  # a real data value


def test_qsample_sub_k_regime_is_exact(spark):
    """With fewer rows than k per month the sample IS the population and
    every estimate equals the exact order statistic."""
    import datetime

    rows = []
    base = datetime.datetime(2024, 3, 1)
    for i in range(120):  # 120 < QSAMPLE_K = 256
        rows.append(
            (i, base + datetime.timedelta(hours=i), i % 7, "view",
             float(i) * 0.25, "{}")
        )
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts_us", F.unix_micros("ts"))
    out = sketch._qsample_monthly_of(e).collect()
    assert out
    for r in out:
        assert r.n_sample == r.n_events
        assert (r.p50_est, r.p90_est, r.p99_est) == (
            r.p50_true, r.p90_true, r.p99_true,
        )


def test_qsample_index_update_merges_and_is_idempotent(spark, sf_dir, tmp_path):
    """Continuous-ingest twin for the quantile row sample: init on the
    first half of the time range, update with the second — the merged
    table must BIT-EQUAL the full-corpus daily sketches including the
    carried cents payload; a re-delivered batch is a no-op; shared
    snapshot durability/GC contract."""
    import os

    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        events as ev,
    )

    src = ev.load_events(spark, sf_dir)
    mid = src.agg(F.expr("percentile_approx(ts_us, 0.5, 10000)")).collect()[0][0]
    first = src.where(F.col("ts_us") < mid)
    second = src.where(F.col("ts_us") >= mid)
    idx = str(tmp_path / "qs_index")

    sketch.qsample_index_init(spark, first, idx)
    merged = sketch.qsample_index_update(spark, second, idx)
    got = {(r.day_us, r.h, r.cents) for r in merged.collect()}
    want = {
        (r.day_us, r.h, r.cents) for r in sketch._daily_qsample_of(src).collect()
    }
    assert got == want

    again = sketch.qsample_index_update(spark, second, idx)
    assert {(r.day_us, r.h, r.cents) for r in again.collect()} == want

    live = sketch._snap_live(idx)
    snaps = [d for d in os.listdir(idx) if d.startswith("qs_v")]
    assert snaps == [live]
    os.makedirs(os.path.join(idx, "qs_v99"))  # simulated crash debris
    sketch.qsample_index_update(spark, second, idx)
    snaps = [d for d in os.listdir(idx) if d.startswith("qs_v")]
    assert snaps == [sketch._snap_live(idx)]


# ---------------------- Sketch-driven planner statistics (round 12)


def test_join_size_estimate_overestimates_and_counters_are_linear(
    spark, sf_dir
):
    """The two contracts that make the CMS join-size estimate usable as
    a planner statistic: (a) AMS overestimate — every hash row's inner
    product carries only non-negative collision cross-terms, so the
    row-wise min still bounds the true join size from above; (b)
    counter linearity — sketching the two halves of the event log
    separately and SUM-merging gives the bit-identical counter table,
    hence the identical estimate, which is what lets the statistic be
    maintained incrementally instead of recomputed."""
    row = sketch.join_size_estimate(spark, sf_dir).collect()[0]
    assert row["true_size"] > 0
    assert row["cms_est"] >= row["true_size"]
    assert row["overestimate"] == row["cms_est"] - row["true_size"]

    e = sketch.load_events(spark, sf_dir).where(
        F.col("event_type") == "view"
    )

    def counters(df):
        per = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        return sketch._cms_counters_of(per)

    whole = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in counters(e).collect()
    }
    merged = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in (
            counters(e.where(F.col("event_id") % 2 == 0))
            .unionByName(counters(e.where(F.col("event_id") % 2 == 1)))
            .groupBy("r", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        ).collect()
    }
    assert whole == merged


def test_ndv_profile_estimates_track_exact_per_column(spark, sf_dir):
    """One profile row per lineitem column; the corrected HLL estimate
    (ln small-range correction applied OUTSIDE the hash-checked
    surface, as in the DAU test) tracks the exact NDV within 15% in
    BOTH regimes — the sf fixture spans them: low-cardinality flag
    columns (linear counting) and the 10k+-distinct key columns (raw
    estimator)."""
    import math

    rows = sketch.lineitem_ndv_profile(spark, sf_dir).collect()
    assert [r["col_name"] for r in rows] == sorted(
        name for name, _ in sketch._NDV_PROFILE_COLS
    )
    regimes = set()
    n_rows = {r["n_rows"] for r in rows}
    assert len(n_rows) == 1  # every column melted from the same scan
    for r in rows:
        assert r["n_null"] == 0  # fixture has no nulls; exactness pin
        assert r["ndv_true"] > 0
        if r["small_range"] and r["n_zero_regs"] > 0:
            est = sketch.HLL_M * math.log(sketch.HLL_M / r["n_zero_regs"])
        else:
            est = r["hll_raw"]
        regimes.add(bool(r["small_range"]))
        assert abs(est - r["ndv_true"]) <= max(3, 0.15 * r["ndv_true"]), (
            r["col_name"],
            est,
            r["ndv_true"],
        )
    assert regimes == {True, False}


def test_ndv_index_update_merges_and_is_exactly_once(spark, sf_dir, tmp_path):
    """Serving parity: init on the even-orderkey half + one update with
    the odd half equals the one-shot batch profile of the whole table
    on every estimator column (register MAX and count SUM merges
    compose exactly).  Exactly-once: re-delivering the same batch_id
    returns the identical profile (ledger absorption), and the
    committed snapshot is the only one on disk (GC)."""
    import os as _os

    from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem")
    idx = str(tmp_path / "ndv_idx")
    sketch.ndv_index_init(spark, li.where(F.col("l_orderkey") % 2 == 0), idx)
    odd = li.where(F.col("l_orderkey") % 2 == 1)
    merged = sorted(
        map(tuple, sketch.ndv_index_update(spark, odd, idx, "b1").collect())
    )
    want = {
        r["col_name"]: r
        for r in sketch.lineitem_ndv_profile(spark, sf_dir).collect()
    }
    assert len(merged) == len(want)
    for r in sketch.ndv_index_profile(spark, idx).collect():
        w = want[r["col_name"]]
        for c in (
            "n_rows",
            "n_null",
            "n_zero_regs",
            "z_scaled",
            "hll_raw",
            "small_range",
        ):
            assert r[c] == w[c], (r["col_name"], c)
    again = sorted(
        map(tuple, sketch.ndv_index_update(spark, odd, idx, "b1").collect())
    )
    assert again == merged
    snaps = [d for d in _os.listdir(idx) if d.startswith("ndv_v")]
    assert snaps == [sketch._snap_live(idx)]
