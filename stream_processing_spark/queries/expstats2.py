"""Experimentation & drift statistics, round 12: Kendall tau-b over a
domain-bounded joint histogram, rolling exact median, IPW (inverse
propensity weighted) treatment-effect readout, Page-Hinkley sequential
drift, and a cohort-LTV matrix.

Beyond-reference surface (build brief: "operations a large-scale
training-data pipeline would need") — the second half of the
experimentation tier started in expstats.py (r11). Same determinism
discipline: integer/DECIMAL sums, ratio terms rounded to 9dp DECIMAL
before summing, ONE fixed double expression per float output,
identical aliases on both engines, window NULL placement pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register

# ------------------------------------------------------ Kendall tau-b


@register(
    "kendall_tau_quantity_discount",
    """
    WITH cells AS (
        SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q,
               CAST(FLOOR(l_discount * 100) AS BIGINT) AS d,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
        SELECT CAST(SUM(CASE WHEN b.d > a.d
                   THEN CAST(a.cnt AS DECIMAL(19,0)) * b.cnt
                   ELSE CAST(0 AS DECIMAL(19,0)) END)
                    AS DECIMAL(38,0)) AS conc,
               CAST(SUM(CASE WHEN b.d < a.d
                   THEN CAST(a.cnt AS DECIMAL(19,0)) * b.cnt
                   ELSE CAST(0 AS DECIMAL(19,0)) END)
                    AS DECIMAL(38,0)) AS disc
        FROM cells a JOIN cells b ON a.q < b.q
    ),
    qm AS (
        SELECT CAST(SUM(CAST(cq AS DECIMAL(19,0)) * (cq - 1))
                    AS DECIMAL(38,0)) AS t1
        FROM (SELECT q, SUM(cnt) AS cq FROM cells GROUP BY q)
    ),
    dm AS (
        SELECT CAST(SUM(CAST(cd AS DECIMAL(19,0)) * (cd - 1))
                    AS DECIMAL(38,0)) AS t2
        FROM (SELECT d, SUM(cnt) AS cd FROM cells GROUP BY d)
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells)
    SELECT n AS n_rows,
           CAST(conc AS DOUBLE) AS conc_pairs,
           CAST(disc AS DOUBLE) AS disc_pairs,
           ROUND(2 * (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
                 / NULLIF(SQRT(
                       (CAST(n AS DOUBLE) * (n - 1) - CAST(t1 AS DOUBLE))
                     * (CAST(n AS DOUBLE) * (n - 1) - CAST(t2 AS DOUBLE))
                   ), 0), 6) AS tau_b
    FROM pairs, qm, dm, tot
    """,
    doc="Kendall tau-b rank correlation between line-item quantity and "
    "discount — the tie-robust monotone-association twin of "
    "spearman_quantity_price, for a pair of DOMAIN-BOUNDED columns "
    "(quantity ≤ ~50 values × discount ≤ ~11 cent-values). Concordant/"
    "discordant pair counts fold over the joint-histogram CELL PAIRS "
    "(≤ ~550² ≈ 300k products — constant in the row count, which is "
    "why tau-b is feasible here and Spearman serves the unbounded "
    "price axis), held exactly in DECIMAL(38); tau-b = 2(P−Q)/"
    "√((n(n−1)−T1)(n(n−1)−T2)) with integer tie terms from the "
    "marginals, one double expression at the end. The cell-pair join "
    "is a broadcast nested-loop by design — both sides are "
    "domain-bounded cell frames. FLOOR before every cast so the "
    "engines agree on fractional inputs.",
)
def kendall_tau_quantity_discount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.select(
            F.floor("l_quantity").cast("bigint").alias("q"),
            F.floor(F.col("l_discount") * 100).cast("bigint").alias("d"),
        )
        .groupBy("q", "d")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = cells.alias("a")
    b = cells.alias("b")
    c19 = F.col("a.cnt").cast("decimal(19,0)")
    zero = F.lit(0).cast("decimal(19,0)")
    pairs = (
        a.join(F.broadcast(b), F.col("a.q") < F.col("b.q"))
        .agg(
            F.sum(
                F.when(F.col("b.d") > F.col("a.d"), c19 * F.col("b.cnt"))
                .otherwise(zero)
            )
            .cast("decimal(38,0)")
            .alias("conc"),
            F.sum(
                F.when(F.col("b.d") < F.col("a.d"), c19 * F.col("b.cnt"))
                .otherwise(zero)
            )
            .cast("decimal(38,0)")
            .alias("disc"),
        )
    )
    qm = (
        cells.groupBy("q")
        .agg(F.sum("cnt").alias("cq"))
        .agg(
            F.sum(
                F.col("cq").cast("decimal(19,0)") * (F.col("cq") - 1)
            )
            .cast("decimal(38,0)")
            .alias("t1")
        )
    )
    dm = (
        cells.groupBy("d")
        .agg(F.sum("cnt").alias("cd"))
        .agg(
            F.sum(
                F.col("cd").cast("decimal(19,0)") * (F.col("cd") - 1)
            )
            .cast("decimal(38,0)")
            .alias("t2")
        )
    )
    tot = cells.agg(F.sum("cnt").cast("bigint").alias("n"))
    m = (
        pairs.crossJoin(F.broadcast(qm))
        .crossJoin(F.broadcast(dm))
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("n").cast("double")
    conc, disc = F.col("conc").cast("double"), F.col("disc").cast("double")
    return m.select(
        F.col("n").alias("n_rows"),
        conc.alias("conc_pairs"),
        disc.alias("disc_pairs"),
        F.round(
            2
            * (conc - disc)
            / F.nullif(
                F.sqrt(
                    (nd * (F.col("n") - 1) - F.col("t1").cast("double"))
                    * (nd * (F.col("n") - 1) - F.col("t2").cast("double"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("tau_b"),
    )


# -------------------------------------------- rolling exact median

_MED_WIN = 7


@register(
    "rolling_median_daily_revenue",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS rev_cents
        FROM orders WHERE o_orderdate IS NOT NULL
        GROUP BY 1
    )
    SELECT day, rev_cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
           CAST(MEDIAN(rev_cents) OVER w AS DOUBLE) AS med_cents
    FROM daily
    WINDOW w AS (ORDER BY day ASC
                 ROWS BETWEEN {_MED_WIN - 1} PRECEDING AND CURRENT ROW)
    """,
    doc=f"Rolling {_MED_WIN}-day EXACT median of daily order revenue — "
    "the outlier-robust smoother dashboards put beside the EWMA "
    "forecast (ewma_daily_forecast): a single spiky day moves a mean "
    "but not a median. Revenue is summed exactly in DECIMAL and "
    "carried as integer CENTS, so the median is an exact integer (odd "
    "window) or an exact .5 midpoint (even ramp-up windows) — "
    "identical doubles on both engines, no float percentile "
    "interpolation ambiguity. Scale shape: one corpus aggregation to "
    "the day-DOMAIN-bounded daily frame; the rolling window walks "
    "that frame only (WINDOW_OK: day domain). NULL order dates are "
    "excluded — a dateless order has no place on a time axis.",
)
def rolling_median_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
            )
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = (
        Window.orderBy(F.asc("day"))
        .rowsBetween(-(_MED_WIN - 1), Window.currentRow)
    )
    # Spark's median() rejects ORDER BY window frames; an exact median
    # over a ≤7-element frame is just the sorted middle — array_sort of
    # the frame's collect_list, midpoint-averaged for even ramp-up
    # windows: identical to DuckDB's windowed MEDIAN on integers.
    arr = F.array_sort(F.collect_list("rev_cents").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (F.floor((n - 1) / 2) + 1).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    return daily.select(
        "day",
        "rev_cents",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_win"),
        ((lo + hi) / 2.0).cast("double").alias("med_cents"),
    )


# ------------------------------------ IPW treatment-effect readout

_IPW_MAX_BUCKET = 7


@register(
    "ipw_conversion_effect",
    f"""
    WITH per_user AS (
        SELECT user_id % 2 AS t,
               LEAST(CAST(FLOOR(LOG2(COUNT(*))) AS BIGINT),
                     {_IPW_MAX_BUCKET}) AS b,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS y
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id
    ),
    strata AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS n_x,
               CAST(SUM(t) AS BIGINT) AS t_x,
               CAST(SUM(t * y) AS BIGINT) AS c1_x,
               CAST(SUM((1 - t) * y) AS BIGINT) AS c0_x
        FROM per_user GROUP BY b
    ),
    terms AS (
        SELECT n_x, t_x,
               CASE WHEN t_x > 0 THEN n_x ELSE 0 END AS den1,
               CASE WHEN t_x < n_x THEN n_x ELSE 0 END AS den0,
               CAST(ROUND(CASE WHEN t_x > 0
                   THEN c1_x * CAST(n_x AS DOUBLE) / t_x
                   ELSE 0 END, 9) AS DECIMAL(28,9)) AS num1,
               CAST(ROUND(CASE WHEN t_x < n_x
                   THEN c0_x * CAST(n_x AS DOUBLE) / (n_x - t_x)
                   ELSE 0 END, 9) AS DECIMAL(28,9)) AS num0
        FROM strata
    )
    SELECT CAST(SUM(n_x) AS BIGINT) AS n_users,
           CAST(SUM(t_x) AS BIGINT) AS n_treated,
           ROUND(CAST(SUM(num1) AS DOUBLE) / NULLIF(SUM(den1), 0), 6)
               AS mean_treated,
           ROUND(CAST(SUM(num0) AS DOUBLE) / NULLIF(SUM(den0), 0), 6)
               AS mean_control,
           ROUND(CAST(SUM(num1) AS DOUBLE) / NULLIF(SUM(den1), 0)
                 - CAST(SUM(num0) AS DOUBLE) / NULLIF(SUM(den0), 0), 6)
               AS ate_ipw
    FROM terms
    """,
    doc="Inverse-propensity-weighted (Hájek) conversion effect of the "
    "hash-assigned treatment (user_id parity — same assignment as "
    "ab_conversion_ztest/CUPED): users are stratified by "
    "log2-activity bucket (≤ 8 strata — domain-bounded), the "
    "propensity e(x)=t_x/n_x is the exact within-stratum treated "
    "share, and because e is constant per stratum the user-level "
    "Σ t·y/e collapses ALGEBRAICALLY to per-stratum aggregates "
    "(c1_x·n_x/t_x — no per-user weights materialized). Each "
    "stratum's term is one fixed double expression rounded to 9dp "
    "and DECIMAL-summed; strata with no treated (resp. no control) "
    "users drop out of that arm, the standard positivity handling. "
    "Scale shape: ONE per-user aggregation, then everything runs on "
    "the ≤ 8-row strata frame. Exactly one output row.",
)
def ipw_conversion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    per_user = ev.groupBy("user_id").agg(
        F.least(
            F.floor(F.log2(F.count(F.lit(1)))).cast("bigint"),
            F.lit(_IPW_MAX_BUCKET).cast("bigint"),
        ).alias("b"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    ).select((F.col("user_id") % 2).alias("t"), "b", "y")
    strata = per_user.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_x"),
        F.sum("t").cast("bigint").alias("t_x"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("c1_x"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("bigint").alias("c0_x"),
    )
    nx, tx = F.col("n_x"), F.col("t_x")
    terms = strata.select(
        "n_x",
        "t_x",
        F.when(tx > 0, nx).otherwise(0).alias("den1"),
        F.when(tx < nx, nx).otherwise(0).alias("den0"),
        F.round(
            F.when(
                tx > 0, F.col("c1_x") * nx.cast("double") / tx
            ).otherwise(0.0),
            9,
        )
        .cast("decimal(28,9)")
        .alias("num1"),
        F.round(
            F.when(
                tx < nx,
                F.col("c0_x") * nx.cast("double") / (nx - tx),
            ).otherwise(0.0),
            9,
        )
        .cast("decimal(28,9)")
        .alias("num0"),
    )
    m1 = F.sum("num1").cast("double") / F.nullif(
        F.sum("den1").cast("double"), F.lit(0.0)
    )
    m0 = F.sum("num0").cast("double") / F.nullif(
        F.sum("den0").cast("double"), F.lit(0.0)
    )
    return terms.agg(
        F.sum("n_x").cast("bigint").alias("n_users"),
        F.sum("t_x").cast("bigint").alias("n_treated"),
        F.round(m1, 6).alias("mean_treated"),
        F.round(m0, 6).alias("mean_control"),
        F.round(m1 - m0, 6).alias("ate_ipw"),
    )


# ------------------------------------------ Page-Hinkley drift test

_PH_DELTA_CENTS = 5.0  # drift slack per step, in cents
_PH_LAMBDA_CENTS = 500.0  # alarm threshold, in cents


@register(
    "page_hinkley_value_drift",
    f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS sc,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1
    ),
    cum AS (
        SELECT day, sc, cnt,
               SUM(sc) OVER (ORDER BY day ASC) AS cs,
               SUM(cnt) OVER (ORDER BY day ASC) AS cc
        FROM daily
    ),
    inc AS (
        SELECT day,
               CAST(ROUND(CAST(sc AS DOUBLE) / cnt
                          - CAST(cs AS DOUBLE) / cc
                          - {_PH_DELTA_CENTS}, 9)
                    AS DECIMAL(18,9)) AS step
        FROM cum
    ),
    walk AS (
        SELECT day,
               SUM(step) OVER (ORDER BY day ASC) AS m
        FROM inc
    ),
    ph AS (
        SELECT day, m, MIN(m) OVER (ORDER BY day ASC) AS m_min
        FROM walk
    )
    SELECT day, CAST(m AS DOUBLE) AS m_t,
           CAST(m - m_min AS DOUBLE) AS ph_t,
           (m - m_min) > {_PH_LAMBDA_CENTS} AS alarm
    FROM ph
    """,
    doc="Page-Hinkley sequential upward-drift test on the daily mean "
    "event value (cents): m_t = Σ (x̄_day − running-mean − δ), "
    f"PH_t = m_t − min m, alarm when PH_t > λ ({_PH_LAMBDA_CENTS:g} "
    "cents) — the classic sequential changepoint monitor beside the "
    "CUSUM query (changepoint_cusum_daily_events), but against the "
    "RUNNING mean instead of a frozen baseline, so it needs no "
    "training period. Each day's increment is one fixed double "
    "expression rounded to 9dp and DECIMAL-cumulated; the running "
    "min runs on the same day frame. Scale shape: one corpus "
    "aggregation to the day-DOMAIN-bounded daily frame; every window "
    "walks that frame only (WINDOW_OK: day domain). NULL-value and "
    "NULL-ts rows are excluded — an undated point has no place in a "
    "sequential test.",
)
def page_hinkley_value_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("sc"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    wd = Window.orderBy(F.asc("day"))
    cum = daily.select(
        "day",
        "sc",
        "cnt",
        F.sum("sc").over(wd).alias("cs"),
        F.sum("cnt").over(wd).alias("cc"),
    )
    step = F.round(
        F.col("sc").cast("double") / F.col("cnt")
        - F.col("cs").cast("double") / F.col("cc")
        - _PH_DELTA_CENTS,
        9,
    ).cast("decimal(18,9)")
    walk = cum.select("day", step.alias("step")).select(
        "day", F.sum("step").over(wd).alias("m")
    )
    ph = walk.select(
        "day", "m", F.min("m").over(wd).alias("m_min")
    )
    return ph.select(
        "day",
        F.col("m").cast("double").alias("m_t"),
        (F.col("m") - F.col("m_min")).cast("double").alias("ph_t"),
        ((F.col("m") - F.col("m_min")) > _PH_LAMBDA_CENTS).alias(
            "alarm"
        ),
    )


# ------------------------------------------------ cohort LTV matrix


@register(
    "cohort_ltv_matrix",
    """
    WITH firsts AS (
        SELECT user_id,
               EXTRACT(year FROM MIN(ts)) * 12
                   + EXTRACT(month FROM MIN(ts)) AS cm
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY user_id
    ),
    sizes AS (
        SELECT cm, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM firsts GROUP BY cm
    ),
    rev AS (
        SELECT f.cm,
               CAST(EXTRACT(year FROM e.ts) * 12
                    + EXTRACT(month FROM e.ts) - f.cm AS BIGINT)
                   AS age_months,
               SUM(COALESCE(CAST(e.value AS DECIMAL(18,2)),
                            CAST(0 AS DECIMAL(18,2)))) AS rev
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.ts IS NOT NULL
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cm, age_months, rev,
               SUM(rev) OVER (PARTITION BY cm ORDER BY age_months ASC)
                   AS cum_rev
        FROM rev
    )
    SELECT CAST((c.cm - 1) // 12 AS BIGINT) * 100
               + ((c.cm - 1) % 12 + 1) AS cohort_ym,
           c.age_months, s.n_users,
           CAST(c.rev AS DOUBLE) AS rev,
           ROUND(CAST(c.cum_rev AS DOUBLE) / s.n_users, 6)
               AS ltv_per_user
    FROM cum c JOIN sizes s ON s.cm = c.cm
    """,
    doc="Cohort lifetime-value matrix: users cohorted by first-event "
    "month, revenue rolled up by months-since-cohort, cumulative LTV "
    "per user — the (cohort × age) triangle every growth/retention "
    "dashboard draws. Month arithmetic is pure integers "
    "(year·12+month), cohort_ym renders as yyyymm arithmetically (no "
    "cross-engine date formatting); revenue sums are exact DECIMAL "
    "with NULL values counting 0 (an event with no value is activity, "
    "not revenue). The cumulative runs PARTITIONED by cohort over the "
    "month-domain age axis. Scale shape: one per-user first-event "
    "aggregation + one (user→cohort) equi-join shuffle, then "
    "everything is month-domain-bounded. NULL-ts events are excluded "
    "(no month); NULL users are not cohortable.",
)
def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dated = ev.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    firsts = dated.groupBy("user_id").agg(
        (
            F.year(F.min("ts")) * 12 + F.month(F.min("ts"))
        ).alias("cm")
    )
    sizes = firsts.groupBy("cm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    dec0 = F.lit(0).cast("decimal(18,2)")
    rev = (
        dated.join(firsts, "user_id")
        .groupBy(
            "cm",
            (
                F.year("ts") * 12 + F.month("ts") - F.col("cm")
            )
            .cast("bigint")
            .alias("age_months"),
        )
        .agg(
            F.sum(
                F.coalesce(F.col("value").cast("decimal(18,2)"), dec0)
            ).alias("rev")
        )
    )
    wc = Window.partitionBy("cm").orderBy(F.asc("age_months"))
    cum = rev.select(
        "cm",
        "age_months",
        "rev",
        F.sum("rev").over(wc).alias("cum_rev"),
    )
    ym = (
        F.floor((F.col("cm") - 1) / 12).cast("bigint") * 100
        + ((F.col("cm") - 1) % 12 + 1)
    )
    return cum.join(F.broadcast(sizes), "cm").select(
        ym.alias("cohort_ym"),
        "age_months",
        "n_users",
        F.col("rev").cast("double").alias("rev"),
        F.round(
            F.col("cum_rev").cast("double") / F.col("n_users"), 6
        ).alias("ltv_per_user"),
    )
