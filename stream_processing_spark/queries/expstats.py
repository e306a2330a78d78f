"""Experimentation & nonparametric-statistics operators (round 11):
Mann-Whitney U drift test, CUPED variance-reduced A/B readout, Spearman
rank correlation, Nelson-Aalen cumulative hazard, a chi-squared
contingency drift test with Cramér's V, and the streaming PSI twin.

Beyond-reference surface (build brief: "operations a large-scale
training-data pipeline would need") — the statistics an experimentation
or data-drift platform computes over event logs, re-expressed as
fixed-width-aggregate Spark plans. Determinism discipline as everywhere
in the registry: integer/DECIMAL sums (order-independent), ln/ratio
terms rounded to 9dp DECIMAL before summing, ONE fixed double
expression per float output, identical aliases on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.operators.prefixsum import range_prefix_sum
from stream_processing_spark.queries import register
from stream_processing_spark.queries.mlfeat import (
    _KM_CENSOR_DAYS,
    _PSI_ORACLE_SQL,
    _SPLIT_SQL,
    _psi_from_hist,
    _split_halves,
)

# ------------------------------------------------ Mann-Whitney U drift


@register(
    "mann_whitney_value_drift",
    f"""
    WITH {_SPLIT_SQL},
    hist AS (
        SELECT cents,
               CAST(SUM(in_a) AS BIGINT) AS ca,
               CAST(SUM(1 - in_a) AS BIGINT) AS cb
        FROM vals GROUP BY cents
    ),
    lev AS (
        SELECT cents, ca, cb, ca + cb AS n,
               SUM(ca + cb) OVER (ORDER BY cents) - (ca + cb) AS prev
        FROM hist
    ),
    s AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS na,
               CAST(SUM(cb) AS BIGINT) AS nb,
               CAST(SUM(CAST(ca AS DECIMAL(18,0))
                        * CAST(2 * prev + n + 1 AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS r2a,
               CAST(SUM(CAST(n AS DECIMAL(12,0)) * CAST(n AS DECIMAL(12,0))
                        * CAST(n AS DECIMAL(12,0))
                        - CAST(n AS DECIMAL(12,0)))
                    AS DECIMAL(38,0)) AS ties
        FROM lev
    )
    SELECT na AS n_first, nb AS n_second,
           CAST(r2a - CAST(na AS DECIMAL(38,0)) * (na + 1) AS DOUBLE) / 2
               AS u_first,
           ROUND((CAST(r2a - CAST(na AS DECIMAL(38,0)) * (na + 1)
                       AS DOUBLE)
                  - CAST(na AS DOUBLE) * nb)
                 / NULLIF(2 * SQRT(CAST(na AS DOUBLE) * nb / 12.0
                          * ((na + nb + 1)
                             - CAST(ties AS DOUBLE)
                               / NULLIF(CAST(na + nb AS DOUBLE)
                                        * (na + nb - 1), 0))), 0), 6)
               AS z_mw
    FROM s
    """,
    doc="Mann-Whitney (Wilcoxon rank-sum) U test between the two halves "
    "of the event value stream — the nonparametric sibling of the KS "
    "drift report (same day-span midpoint split): rank sums are "
    "computed EXACTLY over the per-cent-value histogram with midrank "
    "tie handling held in INTEGERS (2x the rank sum = Σ ca·(2·prev + "
    "n + 1)), the tie-corrected normal approximation z is one fixed "
    "double expression at the end. Scale shape: one corpus aggregation "
    "to the value-DOMAIN-bounded histogram; the rank walk's cumulative "
    "is a range-partitioned two-pass prefix scan (operators/prefixsum) "
    "— P parallel local scans + a P-row offset broadcast, never a "
    "single-partition window over the histogram. DECIMAL(38) rank/tie "
    "sums so the integers survive petabyte row counts. Exactly one "
    "output row; degenerate halves yield NULL z.",
)
def mann_whitney_value_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    vals = _split_halves(spark, sf_dir)
    hist = vals.groupBy("cents").agg(
        F.sum("in_a").cast("bigint").alias("ca"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("cb"),
    )
    # the rank walk's cumulative runs over the cent-value histogram,
    # which saturates a ~10M-value domain at scale: a single-partition
    # ORDER BY window would make one executor walk it all (VERDICT r11
    # weak #1) — the range-partitioned two-pass scan is bit-identical
    # (integer sums) and P-way parallel
    lev = range_prefix_sum(
        hist.select(
            "cents", "ca", "cb", (F.col("ca") + F.col("cb")).alias("n")
        ),
        "cents",
        {"cumn": F.col("n")},
    ).select(
        "cents",
        "ca",
        "cb",
        "n",
        (F.col("cumn") - F.col("n")).alias("prev"),
    )
    n12 = F.col("n").cast("decimal(12,0)")
    s = lev.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.sum(
            F.col("ca").cast("decimal(18,0)")
            * (2 * F.col("prev") + F.col("n") + 1).cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("r2a"),
        F.sum(n12 * n12 * n12 - n12).cast("decimal(38,0)").alias("ties"),
    )
    na, nb = F.col("na"), F.col("nb")
    u2 = (
        F.col("r2a") - na.cast("decimal(38,0)") * (na + 1)
    ).cast("double")
    sigma2 = 2 * F.sqrt(
        na.cast("double") * nb / 12.0
        * (
            (na + nb + 1)
            - F.col("ties").cast("double")
            / F.nullif((na + nb).cast("double") * (na + nb - 1), F.lit(0.0))
        )
    )
    return s.select(
        na.alias("n_first"),
        nb.alias("n_second"),
        (u2 / 2).alias("u_first"),
        F.round(
            (u2 - na.cast("double") * nb) / F.nullif(sigma2, F.lit(0.0)), 6
        ).alias("z_mw"),
    )


# ------------------------------------------------ CUPED adjusted A/B

@register(
    "cuped_adjusted_ab_metric",
    """
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS d0,
               CAST(MIN(CAST(ts AS DATE))
                    + CAST(FLOOR(date_diff('day',
                          MIN(CAST(ts AS DATE)),
                          MAX(CAST(ts AS DATE))) / 2) AS INT)
                    AS DATE) AS dmid
        FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ),
    per_user AS (
        SELECT e.user_id % 2 AS variant,
               SUM(CASE WHEN CAST(e.ts AS DATE) <= b.dmid
                   THEN CAST(e.value AS DECIMAL(18,2))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
               SUM(CASE WHEN CAST(e.ts AS DATE) <= b.dmid
                   THEN CAST(0 AS DECIMAL(18,2))
                   ELSE CAST(e.value AS DECIMAL(18,2)) END) AS y
        FROM events e, bounds b
        WHERE e.value IS NOT NULL AND e.user_id IS NOT NULL
        GROUP BY e.user_id
    ),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx
        FROM per_user
    ),
    v AS (
        SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(x) AS DOUBLE) AS svx,
               CAST(SUM(y) AS DOUBLE) AS svy
        FROM per_user GROUP BY variant
    )
    SELECT v.variant, v.n_users,
           ROUND(v.svy / NULLIF(v.n_users, 0), 6) AS mean_y,
           ROUND((v.svy - (g.n * g.sxy - g.sx * g.sy)
                          / NULLIF(g.n * g.sxx - g.sx * g.sx, 0)
                          * (v.svx - v.n_users * g.sx / NULLIF(g.n, 0)))
                 / NULLIF(v.n_users, 0), 6) AS mean_y_adj,
           ROUND((g.n * g.sxy - g.sx * g.sy)
                 / NULLIF(g.n * g.sxx - g.sx * g.sx, 0), 6) AS theta
    FROM v, g
    """,
    doc="CUPED variance reduction for the hash-assigned A/B split "
    "(user_id parity — the same assignment as ab_conversion_ztest): "
    "per user, the pre-period covariate x = Σ value over the FIRST "
    "half of the day span and the experiment metric y = Σ value over "
    "the second; θ = cov(x,y)/var(x) is fit on the pooled population "
    "and each variant's adjusted mean is mean(y) − θ·(mean(x) − "
    "mean_all(x)) — the Deng et al. 2013 estimator every "
    "experimentation platform ships. All sums are exact DECIMAL "
    "(per-user metrics, cross-products capped at DECIMAL(38,4)); θ "
    "and the adjusted means are fixed double expressions over those "
    "exact aggregates. Scale shape: ONE per-user aggregation "
    "(corpus-sized shuffle), then a 2-row per-variant frame joined "
    "with a 1-row pooled-stats broadcast. NULL value/user_id rows are "
    "excluded; NULL-ts rows count into the second half (the split "
    "CASE's ELSE), mirroring the drift monitors.",
)
def cuped_adjusted_ab_metric(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    ).select(
        F.date_add(
            F.col("d0"),
            F.floor(F.datediff("d1", "d0") / 2).cast("int"),
        ).alias("dmid")
    )
    dec0 = F.lit(0).cast("decimal(18,2)")
    in_a = F.to_date("ts") <= F.col("dmid")
    per_user = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(in_a, F.col("value").cast("decimal(18,2)"))
                .otherwise(dec0)
            ).alias("x"),
            F.sum(
                F.when(in_a, dec0)
                .otherwise(F.col("value").cast("decimal(18,2)"))
            ).alias("y"),
        )
        .select((F.col("user_id") % 2).alias("variant"), "x", "y")
    )
    # ONE corpus pass (r14): the pooled stats are derivable from the
    # per-variant sufficient statistics because every sum below is an
    # exact DECIMAL — decimal sums regroup bit-identically, and each
    # double is produced by ONE final cast of the same exact total the
    # pooled-pass spelling summed directly. This removes both the r13
    # eager checkpoint barrier (0.73× on the driver box) and the second
    # aggregation pass over the per-user frame; `v` is a 2-row frame,
    # so its eager checkpoint is free and stops the corpus re-running
    # for the pooled fold.
    v = (
        per_user.groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("x").alias("sxd"),
            F.sum("y").alias("syd"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)")).alias(
                "sxyd"
            ),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)")).alias(
                "sxxd"
            ),
        )
        .localCheckpoint(eager=True)
    )
    g = v.agg(
        F.sum("n_users").cast("bigint").alias("n"),
        F.sum("sxd").cast("double").alias("sx"),
        F.sum("syd").cast("double").alias("sy"),
        F.sum("sxyd").cast("double").alias("sxy"),
        F.sum("sxxd").cast("double").alias("sxx"),
    )
    v = v.select(
        "variant",
        "n_users",
        F.col("sxd").cast("double").alias("svx"),
        F.col("syd").cast("double").alias("svy"),
    )
    theta = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    nv = F.nullif(F.col("n_users").cast("double"), F.lit(0.0))
    return v.crossJoin(F.broadcast(g)).select(
        "variant",
        "n_users",
        F.round(F.col("svy") / nv, 6).alias("mean_y"),
        F.round(
            (
                F.col("svy")
                - theta
                * (
                    F.col("svx")
                    - F.col("n_users") * F.col("sx")
                    / F.nullif(F.col("n").cast("double"), F.lit(0.0))
                )
            )
            / nv,
            6,
        ).alias("mean_y_adj"),
        F.round(theta, 6).alias("theta"),
    )


# ------------------------------------------- Spearman rank correlation

@register(
    "spearman_quantity_price",
    """
    WITH rows_kv AS (
        -- FLOOR before the bigint cast: DuckDB rounds double->bigint to
        -- nearest while Spark truncates toward zero; FLOOR makes the
        -- two engines agree by construction on fractional quantities
        -- (ADVICE r11). Pairwise deletion: a rank statistic is only
        -- defined on complete (q, p) pairs, and NULL keys would sort
        -- to different ends of the two engines' cumulatives (r12).
        SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q,
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS p
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    joint AS (
        SELECT q, p, COUNT(*) AS cnt FROM rows_kv GROUP BY q, p
    ),
    qh AS (
        SELECT q, SUM(cnt) AS cq FROM joint GROUP BY q
    ),
    qr AS (
        SELECT q, 2 * (SUM(cq) OVER (ORDER BY q) - cq) + cq + 1 AS u2
        FROM qh
    ),
    ph AS (
        SELECT p, SUM(cnt) AS cp FROM joint GROUP BY p
    ),
    pr AS (
        SELECT p, 2 * (SUM(cp) OVER (ORDER BY p) - cp) + cp + 1 AS v2
        FROM ph
    ),
    s AS (
        SELECT CAST(SUM(j.cnt) AS BIGINT) AS n,
               CAST(SUM(CAST(j.cnt AS DECIMAL(38,0)) * qr.u2)
                    AS DECIMAL(38,0)) AS su,
               CAST(SUM(CAST(j.cnt AS DECIMAL(38,0)) * pr.v2)
                    AS DECIMAL(38,0)) AS sv,
               CAST(SUM(CAST(j.cnt AS DECIMAL(38,0)) * qr.u2 * qr.u2)
                    AS DECIMAL(38,0)) AS suu,
               CAST(SUM(CAST(j.cnt AS DECIMAL(38,0)) * pr.v2 * pr.v2)
                    AS DECIMAL(38,0)) AS svv,
               CAST(SUM(CAST(j.cnt AS DECIMAL(38,0)) * qr.u2 * pr.v2)
                    AS DECIMAL(38,0)) AS suv
        FROM joint j
        JOIN qr ON j.q = qr.q
        JOIN pr ON j.p = pr.p
    )
    SELECT n AS n_rows,
           ROUND((CAST(n AS DOUBLE) * CAST(suv AS DOUBLE)
                  - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE))
                 / NULLIF(SQRT((CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
                                - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
                               * (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
                                  - CAST(sv AS DOUBLE)
                                    * CAST(sv AS DOUBLE))), 0), 6)
               AS spearman_rho
    FROM s
    """,
    doc="Spearman rank correlation between line-item quantity and price "
    "— the monotone-association check a feature-audit pipeline runs "
    "before trusting a linear correlation. Midrank (average-rank) tie "
    "handling is held in INTEGERS by working with 2·rank (u2 = "
    "2·prev + cnt + 1 over each value's histogram), ρ is Pearson on "
    "those doubled ranks (scale-invariant), one fixed double "
    "expression over DECIMAL(38)-exact moment sums. Scale shape: one "
    "aggregation to the JOINT (quantity, price-cent) histogram; each "
    "marginal's rank map is a range-partitioned two-pass prefix scan "
    "(operators/prefixsum — the price-cents marginal grows to a ~10M "
    "domain, so no single-partition window walks it) joined back to "
    "the joint frame. FLOOR before every bigint cast so Spark "
    "(truncate) and DuckDB (round-to-nearest) agree on fractional "
    "inputs.",
)
def spearman_quantity_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    joint = (
        li.filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .select(
            F.floor(F.col("l_quantity")).cast("bigint").alias("q"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("p"),
        )
        .groupBy("q", "p")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # the joint histogram feeds FIVE branches (two marginals, each
        # with the prefix scan's extent/local subplans, plus the final
        # moment join): EAGER checkpoint computes it once — lazy never
        # materializes before the single final action (the LPA r12
        # profile lesson); sf0.1 wall 10.1 s → 4.8 s when this landed
        # (r12 d65e9ff); the marginal frames qh/ph below materialize
        # inside range_prefix_sum (r13 default)
        .localCheckpoint(eager=True)
    )
    # marginal rank maps: the price-cents marginal GROWS with data until
    # it saturates its ~10M-cent domain, so its cumulative must not be a
    # single-partition ORDER BY window (VERDICT r11 weak #1) — both
    # marginals use the range-partitioned two-pass scan (bit-identical
    # integer fold, P-way parallel)
    qh = joint.groupBy("q").agg(F.sum("cnt").alias("cq"))
    qr = range_prefix_sum(qh, "q", {"cumq": "cq"}).select(
        "q",
        (
            2 * (F.col("cumq") - F.col("cq")) + F.col("cq") + 1
        ).alias("u2"),
    )
    ph = joint.groupBy("p").agg(F.sum("cnt").alias("cp"))
    pr = range_prefix_sum(ph, "p", {"cump": "cp"}).select(
        "p",
        (
            2 * (F.col("cump") - F.col("cp")) + F.col("cp") + 1
        ).alias("v2"),
    )
    cnt38 = F.col("cnt").cast("decimal(38,0)")
    s = (
        joint.join(F.broadcast(qr), "q")
        .join(pr, "p")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum(cnt38 * F.col("u2")).cast("decimal(38,0)").alias("su"),
            F.sum(cnt38 * F.col("v2")).cast("decimal(38,0)").alias("sv"),
            F.sum(cnt38 * F.col("u2") * F.col("u2"))
            .cast("decimal(38,0)")
            .alias("suu"),
            F.sum(cnt38 * F.col("v2") * F.col("v2"))
            .cast("decimal(38,0)")
            .alias("svv"),
            F.sum(cnt38 * F.col("u2") * F.col("v2"))
            .cast("decimal(38,0)")
            .alias("suv"),
        )
    )
    n = F.col("n").cast("double")
    su, sv = F.col("su").cast("double"), F.col("sv").cast("double")
    return s.select(
        F.col("n").alias("n_rows"),
        F.round(
            (n * F.col("suv").cast("double") - su * sv)
            / F.nullif(
                F.sqrt(
                    (n * F.col("suu").cast("double") - su * su)
                    * (n * F.col("svv").cast("double") - sv * sv)
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("spearman_rho"),
    )


# --------------------------------------- Nelson-Aalen cumulative hazard

@register(
    "nelson_aalen_cumulative_hazard",
    f"""
    WITH users AS (
        SELECT user_id,
               date_diff('day', MIN(CAST(ts AS DATE)),
                         MAX(CAST(ts AS DATE))) AS lt,
               MAX(CAST(ts AS DATE)) AS last_day
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    horizon AS (SELECT MAX(CAST(ts AS DATE)) AS hmax FROM events),
    marked AS (
        SELECT u.lt,
               CASE WHEN date_diff('day', u.last_day, h.hmax)
                         < {_KM_CENSOR_DAYS} THEN 1 ELSE 0 END AS censored
        FROM users u, horizon h
    ),
    lev AS (
        SELECT lt, COUNT(*) AS n_total,
               CAST(SUM(1 - censored) AS BIGINT) AS n_deaths
        FROM marked GROUP BY lt
    ),
    risk AS (
        SELECT lt, n_deaths,
               SUM(n_total) OVER (ORDER BY lt DESC NULLS FIRST)
                   AS n_at_risk
        FROM lev
    ),
    walk AS (
        SELECT lt, n_deaths, CAST(n_at_risk AS BIGINT) AS n_at_risk,
               SUM(CAST(ROUND(CAST(n_deaths AS DOUBLE) / n_at_risk, 9)
                        AS DECIMAL(18,9)))
                   OVER (ORDER BY lt NULLS LAST) AS cum_h
        FROM risk
    )
    SELECT CAST(lt AS BIGINT) AS lifetime_days, n_at_risk, n_deaths,
           CAST(cum_h AS DOUBLE) AS cum_hazard,
           ROUND(EXP(-CAST(cum_h AS DOUBLE)), 6) AS survival_na
    FROM walk
    """,
    doc="Nelson-Aalen cumulative hazard over user lifetimes — the "
    "hazard-side sibling of kaplan_meier_user_lifetime (same lifetime "
    "levels, risk sets, and right-censoring rule): H(t) = Σ dᵢ/nᵢ as a "
    "cumulative DECIMAL sum of 9dp-rounded hazard increments "
    "(order-independent and engine-portable), with the Fleming-"
    "Harrington survival exp(−H) as the smooth twin of the KM curve. "
    "Window NULL placement is pinned on both engines (NULLS LAST asc / "
    "FIRST desc) so an all-NULL-ts user's NULL lifetime level agrees. "
    "Scale shape: one user_id aggregation (the only corpus shuffle); "
    "everything after runs on the lifetime-DOMAIN-bounded frame.",
)
def nelson_aalen_cumulative_hazard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.max(F.to_date("ts")), F.min(F.to_date("ts"))
            ).alias("lt"),
            F.max(F.to_date("ts")).alias("last_day"),
        )
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("hmax"))
    marked = users.crossJoin(F.broadcast(horizon)).select(
        "lt",
        F.when(
            F.datediff("hmax", "last_day") < _KM_CENSOR_DAYS, 1
        ).otherwise(0).alias("censored"),
    )
    lev = marked.groupBy("lt").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(1 - F.col("censored")).cast("bigint").alias("n_deaths"),
    )
    risk = lev.select(
        "lt",
        "n_deaths",
        F.sum("n_total")
        .over(Window.orderBy(F.desc_nulls_first("lt")))
        .alias("n_at_risk"),
    )
    inc = F.round(
        F.col("n_deaths").cast("double") / F.col("n_at_risk"), 9
    ).cast("decimal(18,9)")
    walk = risk.select(
        "lt",
        "n_deaths",
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.sum(inc)
        .over(Window.orderBy(F.asc_nulls_last("lt")))
        .alias("cum_h"),
    )
    return walk.select(
        F.col("lt").cast("bigint").alias("lifetime_days"),
        "n_at_risk",
        "n_deaths",
        F.col("cum_h").cast("double").alias("cum_hazard"),
        F.round(F.exp(-F.col("cum_h").cast("double")), 6).alias(
            "survival_na"
        ),
    )


# --------------------------------------- chi-squared contingency drift

@register(
    "chi2_event_type_drift",
    """
    WITH bounds AS (
        SELECT CAST(MIN(CAST(ts AS DATE))
                    + CAST(FLOOR(date_diff('day',
                          MIN(CAST(ts AS DATE)),
                          MAX(CAST(ts AS DATE))) / 2) AS INT)
                    AS DATE) AS dmid
        FROM events
    ),
    cells AS (
        SELECT COALESCE(e.event_type, '(null)') AS etype,
               CASE WHEN CAST(e.ts AS DATE) <= b.dmid
                    THEN 1 ELSE 0 END AS in_a,
               COUNT(*) AS o
        FROM events e, bounds b
        GROUP BY 1, 2
    ),
    rm AS (SELECT etype, SUM(o) AS rx FROM cells GROUP BY etype),
    cm AS (SELECT in_a, SUM(o) AS cy FROM cells GROUP BY in_a),
    dense AS (
        -- ABSENT cells contribute (0-e)^2/e too: densify to the full
        -- marginal grid (types x halves, domain-bounded) before the
        -- term walk — observed-cells-only understates chi2 on sparse
        -- tables (caught by the perfect-association fixture test)
        SELECT rm.etype, cm.in_a, rm.rx, cm.cy, COALESCE(x.o, 0) AS o
        FROM rm CROSS JOIN cm
        LEFT JOIN cells x ON x.etype = rm.etype AND x.in_a = cm.in_a
    ),
    m AS (
        SELECT etype, in_a, o, rx, cy, SUM(o) OVER () AS n
        FROM dense
    ),
    t AS (
        SELECT etype, in_a, o, n,
               CAST(ROUND(
                   (CAST(o AS DOUBLE)
                    - CAST(rx AS DOUBLE) * cy / n)
                   * (CAST(o AS DOUBLE)
                      - CAST(rx AS DOUBLE) * cy / n)
                   / (CAST(rx AS DOUBLE) * cy / n), 9)
                    AS DECIMAL(18,9)) AS term
        FROM m
    ),
    s AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT etype) AS BIGINT) AS n_types,
               CAST(COUNT(DISTINCT in_a) AS BIGINT) AS n_halves,
               CAST(SUM(term) AS DOUBLE) AS chi2
        FROM t
    )
    SELECT n_events, n_types,
           (n_types - 1) * (n_halves - 1) AS dof, chi2,
           ROUND(SQRT(chi2 / NULLIF(CAST(n_events AS DOUBLE)
                 * LEAST(n_types - 1, n_halves - 1), 0)), 6)
               AS cramers_v
    FROM s
    """,
    doc="Chi-squared test of independence between event type and stream "
    "half (same day-span midpoint split as the drift monitors; NULL "
    "event_type is a first-class '(null)' level, NULL-ts rows fall in "
    "the second half via the CASE's ELSE) plus Cramér's V effect size "
    "— the categorical-drift alarm that complements the numeric "
    "KS/PSI pair. Observed counts are exact integers; each cell's "
    "(o−e)²/e term is one fixed double expression rounded to 9dp "
    "DECIMAL and summed order-independently. Scale shape: one corpus "
    "aggregation to the (type × half) cell frame (type-DOMAIN-bounded) "
    "crossed with a 1-row midpoint broadcast; the chi-squared walk "
    "runs on that tiny frame. Exactly one output row.",
)
def chi2_event_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    ).select(
        F.date_add(
            F.col("d0"),
            F.floor(F.datediff("d1", "d0") / 2).cast("int"),
        ).alias("dmid")
    )
    cells = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            F.coalesce("event_type", F.lit("(null)")).alias("etype"),
            F.when(F.to_date("ts") <= F.col("dmid"), 1)
            .otherwise(0)
            .alias("in_a"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    # densify to the full marginal grid: ABSENT cells contribute
    # (0-e)^2/e too — observed-cells-only understates chi2 on sparse
    # tables (caught by the perfect-association fixture test)
    rm = cells.groupBy("etype").agg(F.sum("o").alias("rx"))
    cm = cells.groupBy("in_a").agg(F.sum("o").alias("cy"))
    dense = (
        rm.crossJoin(cm)
        .join(cells, ["etype", "in_a"], "left")
        .select(
            "etype", "in_a", "rx", "cy",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    m = dense.select(
        "etype",
        "in_a",
        "o",
        "rx",
        "cy",
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("rx").cast("double") * F.col("cy") / F.col("n")
    term = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e)
        / e,
        9,
    ).cast("decimal(18,9)")
    s = m.select("etype", "in_a", "o", "n", term.alias("term")).agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.countDistinct("etype").cast("bigint").alias("n_types"),
        F.countDistinct("in_a").cast("bigint").alias("n_halves"),
        F.sum("term").cast("double").alias("chi2"),
    )
    return s.select(
        "n_events",
        "n_types",
        ((F.col("n_types") - 1) * (F.col("n_halves") - 1)).alias("dof"),
        "chi2",
        F.round(
            F.sqrt(
                F.col("chi2")
                / F.nullif(
                    F.col("n_events").cast("double")
                    * F.least(F.col("n_types") - 1, F.col("n_halves") - 1),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# ------------------------------------------------ streaming PSI twin

@register(
    "streaming_psi_drift_monitor",
    _PSI_ORACLE_SQL,
    doc="Streaming twin of psi_value_drift (the same pattern as "
    "streaming_ks_drift_monitor): the FIRST half of the day span is "
    "the frozen control period — served from a cached (cents, day) "
    "histogram built by the query's ONE batch scan of events, from "
    "which the date bounds also derive — and the SECOND half is "
    "ingested as a REAL file stream whose per-cent-value counts "
    "aggregate in complete mode (availableNow drain). The live filter "
    "is the exact complement of the reference split (NULL-ts rows "
    "stream into the second half, like the oracle's CASE ELSE). The "
    "merged histograms run the identical PSI bucket math, so the "
    "final state equals the batch answer and the batch oracle "
    "certifies the streaming path. Stream state is (cent-value, "
    "count) rows — bounded by the value DOMAIN, not the event count.",
)
def streaming_psi_drift_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import datetime as _dt

    from stream_processing_spark.queries.streaming_queries import (
        _drain_complete,
        _events_stream,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    day_hist = (
        ev.groupBy(
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            F.to_date("ts").alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()
    )
    bounds = day_hist.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    ).collect()[0]
    if bounds["d0"] is None:
        dmid = None
    else:
        dmid = bounds["d0"] + _dt.timedelta(
            days=(bounds["d1"] - bounds["d0"]).days // 2
        )
    dmid_lit = F.lit(dmid).cast("date")
    ref = (
        day_hist.filter(F.col("d") <= dmid_lit)
        .groupBy("cents")
        .agg(F.sum("cnt").cast("bigint").alias("ca"))
    )
    live = (
        _events_stream(spark, sf_dir)
        .filter(
            F.col("value").isNotNull()
            & ~F.coalesce(F.to_date("ts") <= dmid_lit, F.lit(False))
        )
        .groupBy(
            F.floor(F.col("value") * 100).cast("bigint").alias("cents")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    )
    drained = _drain_complete(live, spark)
    hist = ref.join(drained, "cents", "full_outer").select(
        "cents",
        F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
        F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb"),
    )
    # eager-materialize the (≤10-row) report, then release the cached
    # control-period histogram — the persist-without-unpersist leaked
    # one cache per monitor call into long-lived sessions (ADVICE r11)
    out = _psi_from_hist(hist).localCheckpoint(eager=True)
    day_hist.unpersist()
    return out
