package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Stats, TextOps}

/** Statistical-analytics query inventory (session 6): trend fits,
  * dependence tests, tradeoff frontiers, leakage-safe encodings,
  * preference-pair construction. Each entry wraps a graft.ops operator
  * and carries an exact DuckDB oracle — all statistics are assembled
  * from integer sufficient statistics (Stats scaladoc), so the oracle
  * matches bit-for-bit, not approximately.
  */
object Analytics {

  val defs: Seq[QueryDef] = Seq(

    // ols1 — per-group linear trend (price-vs-quantity by return flag):
    // ONE map-combined hash aggregate of six exact moments, then ppm
    // ratios. The oracle rebuilds the identical sufficient statistics
    // in HUGEINT (DuckDB's sum(BIGINT) is exact 128-bit, mirroring the
    // DECIMAL(38,0) sums Spark uses), so slope/intercept/r² match to
    // the last ppm digit. The 100 TB story is the aggregate's: no
    // window, no join, no second scan.
    QueryDef.views("ols1_linear_fit",
      """WITH p AS (SELECT l_returnflag,
        |             CAST(floor(l_quantity) AS BIGINT) AS x,
        |             CAST(floor(l_extendedprice) AS BIGINT) AS y
        |           FROM lineitem),
        |     m AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
        |             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
        |             sum(x*x) AS sxx, sum(y*y) AS syy
        |           FROM p GROUP BY 1),
        |     d AS (SELECT l_returnflag, n, sx, sy,
        |             n*sxy - sx*sy AS num, n*sxx - sx*sx AS den,
        |             n*syy - sy*sy AS deny
        |           FROM m)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |       CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
        |       CAST(CASE WHEN den <> 0 THEN (1000000*num) // den END
        |         AS BIGINT) AS slope_ppm,
        |       CAST(CASE WHEN den <> 0 THEN
        |           (1000000*(sy*den - num*sx)) // (n*den) END
        |         AS BIGINT) AS intercept_ppm,
        |       CAST(CASE WHEN den <> 0 AND deny <> 0 THEN
        |           (((1000000*num) // den) * num) // deny END
        |         AS BIGINT) AS r2_ppm
        |FROM d ORDER BY l_returnflag""".stripMargin) { spark =>
      Stats.linearFit(
        spark.table("lineitem").select(col("l_returnflag"),
          floor(col("l_quantity")).cast("long").as("x"),
          floor(col("l_extendedprice")).cast("long").as("y")),
        Seq("l_returnflag"), "x", "y")
        .orderBy("l_returnflag")
    },

    // chi1 — χ² independence of event mix across user cohorts, plus
    // Cramér's V. Row-count work is the contingency aggregate only;
    // margins/statistics run over the |A|·|B| cells. Exact rational
    // per-cell contributions (scaled integral division); sqrt is the
    // one IEEE op, micro-rounded back to ℤ (ny1's argument).
    QueryDef.views("chi1_chisq_independence",
      """WITH c0 AS (SELECT event_type AS a, user_id % 8 AS b,
        |             CAST(count(*) AS HUGEINT) AS o
        |           FROM events GROUP BY 1, 2),
        |     g AS (SELECT * FROM (SELECT DISTINCT a FROM c0),
        |             (SELECT DISTINCT b FROM c0)),
        |     c AS (SELECT g.a, g.b, coalesce(o, CAST(0 AS HUGEINT)) AS o
        |           FROM g LEFT JOIN c0 ON g.a = c0.a AND g.b = c0.b),
        |     m AS (SELECT a, b, o,
        |             sum(o) OVER (PARTITION BY a) AS ra,
        |             sum(o) OVER (PARTITION BY b) AS cb,
        |             sum(o) OVER () AS n
        |           FROM c),
        |     x AS (SELECT n, a, b,
        |             (1000000*(n*o - ra*cb)*(n*o - ra*cb)) // (n*ra*cb) AS cell
        |           FROM m)
        |SELECT CAST(max(n) AS BIGINT) AS n,
        |       CAST(count(*) AS BIGINT) AS cells,
        |       CAST(sum(cell) AS BIGINT) AS chi2_ppm,
        |       CAST(floor(sqrt(CAST((sum(cell)*1000000) //
        |           (max(n)*least(count(DISTINCT a)-1, count(DISTINCT b)-1))
        |         AS DOUBLE))) AS BIGINT) AS cramers_v_ppm
        |FROM x""".stripMargin) { spark =>
      Stats.chiSquare(
        spark.table("events").select(col("event_type"),
          (col("user_id") % 8).as("cohort")),
        "event_type", "cohort")
    },

    // sky1 — Pareto frontier (skyline) of orders on price × recency:
    // the orders no other order beats on both axes. The Spark plan is
    // the distributed skyline (per-x candidates → range exchange →
    // per-partition prefix scan → P-row driver fold → broadcast
    // verify), NOT an O(n²) dominance join; the oracle exploits the
    // same per-distinct-x reduction with a lag-max window, which is
    // exact on the same integers.
    QueryDef.views("sky1_pareto_frontier",
      """WITH p AS (SELECT o_orderkey,
        |             CAST(floor(o_totalprice*100) AS BIGINT) AS price_c,
        |             CAST(date_diff('day', DATE '1990-01-01',
        |               CAST(o_orderdate AS DATE)) AS BIGINT) AS rec_day
        |           FROM orders),
        |     c AS (SELECT price_c, max(rec_day) AS dmax FROM p GROUP BY 1),
        |     m AS (SELECT price_c, dmax, max(dmax) OVER
        |             (ORDER BY price_c DESC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |             AS mprev
        |           FROM c)
        |SELECT p.o_orderkey, p.price_c, p.rec_day
        |FROM p JOIN m ON p.price_c = m.price_c AND p.rec_day = m.dmax
        |WHERE m.mprev IS NULL OR m.dmax > m.mprev
        |ORDER BY o_orderkey""".stripMargin) { spark =>
      Stats.paretoFrontier2D(
        spark.table("orders").select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("price_c"),
          datediff(col("o_orderdate").cast("date"),
            lit("1990-01-01").cast("date")).cast("long").as("rec_day")),
        "price_c", "rec_day")
        .select("o_orderkey", "price_c", "rec_day")
        .orderBy("o_orderkey")
    },

    // tg1 — leave-one-out target encoding of event_type against the
    // event value (µ-scaled): the leakage-safe categorical feature.
    // One window exchange + a broadcast 1-row prior; exact integral
    // division at the target's scale on both engines.
    QueryDef.views("tg1_target_encode_loo",
      """WITH p AS (SELECT event_id, event_type,
        |             CAST(floor(value*1000000) AS BIGINT) AS y_ppm
        |           FROM events),
        |     g AS (SELECT *, sum(y_ppm) OVER (PARTITION BY event_type) AS sg,
        |             count(*) OVER (PARTITION BY event_type) AS ng
        |           FROM p),
        |     t AS (SELECT sum(y_ppm) AS gs, CAST(count(*) AS HUGEINT) AS gn
        |           FROM p)
        |SELECT event_id, event_type, y_ppm,
        |       CAST(CASE WHEN ng > 1 THEN (sg - y_ppm) // (ng - 1)
        |            ELSE gs // gn END AS BIGINT) AS loo_ppm
        |FROM g, t ORDER BY event_id""".stripMargin) { spark =>
      Stats.targetEncodeLoo(
        spark.table("events").select(col("event_id"), col("event_type"),
          floor(col("value") * 1000000).cast("long").as("y_ppm")),
        "event_type", "y_ppm", "loo_ppm")
        .select("event_id", "event_type", "y_ppm", "loo_ppm")
        .orderBy("event_id")
    },

    // bars1 — hourly OHLC bars per event type: ONE map-combined hash
    // aggregate where min_by/max_by over a (ts,id) struct replace the
    // two ranked windows the oracle (and the naive SQL) needs — no
    // per-row rank materialization, partials combine associatively.
    QueryDef.views("bars1_ohlc_bars",
      """WITH p AS (SELECT event_id, ts, event_type,
        |             CAST(floor(value*1000000) AS BIGINT) AS v,
        |             strftime(date_trunc('hour', ts),
        |               '%Y-%m-%d %H:%M:%S') AS bar
        |           FROM events),
        |     r AS (SELECT *,
        |             row_number() OVER (PARTITION BY event_type, bar
        |               ORDER BY ts, event_id) AS ra,
        |             row_number() OVER (PARTITION BY event_type, bar
        |               ORDER BY ts DESC, event_id DESC) AS rd
        |           FROM p)
        |SELECT event_type, bar,
        |       max(CASE WHEN ra = 1 THEN v END) AS open,
        |       max(v) AS high, min(v) AS low,
        |       max(CASE WHEN rd = 1 THEN v END) AS close,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(v) AS BIGINT) AS sum_v
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { spark =>
      Stats.timeBars(
        spark.table("events").select(col("event_id"), col("ts"),
          col("event_type"),
          floor(col("value") * 1000000).cast("long").as("v")),
        Seq("event_type"), "ts", "event_id", "v")
        .orderBy("event_type", "bar")
    },

    // gini1 — Gini concentration of document length per language: the
    // sorted-index identity makes it one rank window + one aggregate,
    // exact in DECIMAL(38,0)/HUGEINT on both engines.
    QueryDef.views("gini1_length_concentration",
      """WITH r AS (SELECT lang, n_chars,
        |             row_number() OVER (PARTITION BY lang
        |               ORDER BY n_chars, doc_id) AS i
        |           FROM documents),
        |     a AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n,
        |             CAST(sum(n_chars) AS HUGEINT) AS s,
        |             sum((2*CAST(i AS HUGEINT) - 1)*n_chars) AS a
        |           FROM r GROUP BY 1)
        |SELECT lang, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS sum_v,
        |       CAST(CASE WHEN s > 0 THEN (1000000*(a - n*s)) // (n*s) END
        |         AS BIGINT) AS gini_ppm
        |FROM a ORDER BY lang""".stripMargin) { spark =>
      Stats.gini(spark.table("documents"), Seq("lang"), "n_chars", "doc_id")
        .orderBy("lang")
    },

    // mw1 — Mann–Whitney U per event type between user-parity cohorts:
    // midranks at 2× scale keep everything in ℤ (tie blocks get the
    // same doubled midrank whatever order row_number assigns, so the
    // statistic is tie-order-invariant on both engines).
    QueryDef.views("mw1_mann_whitney",
      """WITH p AS (SELECT event_type,
        |             CAST(floor(value*1000000) AS BIGINT) AS v,
        |             CAST(user_id % 2 AS BIGINT) AS cohort
        |           FROM events),
        |     r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |             ORDER BY v) AS rn FROM p),
        |     t AS (SELECT *,
        |             CAST(min(rn) OVER (PARTITION BY event_type, v)
        |               + max(rn) OVER (PARTITION BY event_type, v)
        |               AS HUGEINT) AS r2
        |           FROM r),
        |     g AS (SELECT event_type,
        |             CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)
        |               AS HUGEINT) AS n1,
        |             CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)
        |               AS HUGEINT) AS n2,
        |             sum(CASE WHEN cohort = 1 THEN r2 ELSE 0 END) AS rs1
        |           FROM t GROUP BY 1)
        |SELECT event_type, CAST(n1 AS BIGINT) AS n1,
        |       CAST(n2 AS BIGINT) AS n2,
        |       CAST(rs1 - n1*(n1+1) AS BIGINT) AS u1_2x,
        |       CAST(CASE WHEN n1 > 0 AND n2 > 0 THEN
        |           (1000000*(rs1 - n1*(n1+1))) // (2*n1*n2) END
        |         AS BIGINT) AS cles_ppm
        |FROM g ORDER BY event_type""".stripMargin) { spark =>
      Stats.mannWhitneyU(
        spark.table("events").select(col("event_type"),
          floor(col("value") * 1000000).cast("long").as("v"),
          (col("user_id") % 2).as("cohort")),
        Seq("event_type"), "v", "cohort")
        .orderBy("event_type")
    },

    // srk1 — Spearman rank correlation (quantity vs price by return
    // flag): 2×-midranks turn both axes into integers, then ρ² falls
    // out of the same staged exact-moment division ols1 uses for r².
    QueryDef.views("srk1_spearman",
      """WITH p AS (SELECT l_returnflag AS g,
        |             CAST(floor(l_quantity) AS BIGINT) AS x,
        |             CAST(floor(l_extendedprice) AS BIGINT) AS y
        |           FROM lineitem),
        |     rx AS (SELECT *, row_number() OVER (PARTITION BY g
        |              ORDER BY x) AS rnx FROM p),
        |     r1 AS (SELECT *, CAST(min(rnx) OVER (PARTITION BY g, x)
        |              + max(rnx) OVER (PARTITION BY g, x) AS HUGEINT)
        |              AS rx2 FROM rx),
        |     ry AS (SELECT *, row_number() OVER (PARTITION BY g
        |              ORDER BY y) AS rny FROM r1),
        |     r2 AS (SELECT *, CAST(min(rny) OVER (PARTITION BY g, y)
        |              + max(rny) OVER (PARTITION BY g, y) AS HUGEINT)
        |              AS ry2 FROM ry),
        |     m AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
        |             sum(rx2) AS sx, sum(ry2) AS sy, sum(rx2*ry2) AS sxy,
        |             sum(rx2*rx2) AS sxx, sum(ry2*ry2) AS syy
        |           FROM r2 GROUP BY 1),
        |     d AS (SELECT g, n, n*sxy - sx*sy AS num,
        |             n*sxx - sx*sx AS den, n*syy - sy*sy AS deny
        |           FROM m)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |       CAST(CASE WHEN den <> 0 AND deny <> 0 THEN sign(num) END
        |         AS BIGINT) AS rho_sign,
        |       CAST(CASE WHEN den <> 0 AND deny <> 0 THEN
        |           (((1000000*num) // den) * num) // deny END
        |         AS BIGINT) AS rho2_ppm
        |FROM d ORDER BY l_returnflag""".stripMargin) { spark =>
      Stats.spearman(
        spark.table("lineitem").select(col("l_returnflag"),
          floor(col("l_quantity")).cast("long").as("x"),
          floor(col("l_extendedprice")).cast("long").as("y")),
        Seq("l_returnflag"), "x", "y")
        .orderBy("l_returnflag")
    },

    // pmi1 — top-100 adjacent-bigram collocations scored by exact
    // integer PMI-lift over the bigram contingency (log is monotone;
    // lift keeps the oracle in ℤ). One corpus pass to the (w1,w2)
    // count table; marginals and the total roll up vocab-bounded.
    QueryDef.views("pmi1_bigram_lift",
      """WITH t AS (SELECT doc_id,
        |             list_filter(string_split(text, ' '),
        |               x -> len(x) > 0) AS w
        |           FROM documents),
        |     g AS (SELECT unnest(CASE WHEN len(w) >= 2
        |             THEN list_transform(range(1, len(w)),
        |               i -> struct_pack(w1 := w[i], w2 := w[i + 1]))
        |             ELSE [] END) AS bg FROM t),
        |     c2 AS (SELECT bg.w1 AS w1, bg.w2 AS w2,
        |              CAST(count(*) AS HUGEINT) AS c_ab
        |            FROM g GROUP BY 1, 2),
        |     ra AS (SELECT w1, sum(c_ab) AS r_a FROM c2 GROUP BY 1),
        |     cb AS (SELECT w2, sum(c_ab) AS c_b FROM c2 GROUP BY 1),
        |     nn AS (SELECT sum(c_ab) AS nb FROM c2),
        |     j AS (SELECT c2.w1, c2.w2, c_ab, r_a, c_b, nb
        |           FROM c2 JOIN ra USING (w1) JOIN cb USING (w2)
        |           CROSS JOIN nn),
        |     k AS (SELECT * FROM j ORDER BY c_ab DESC, w1, w2 LIMIT 100)
        |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
        |       CAST(r_a AS BIGINT) AS c_left,
        |       CAST(c_b AS BIGINT) AS c_right,
        |       CAST((1000000*c_ab*nb) // (r_a*c_b) AS BIGINT) AS lift_ppm
        |FROM k ORDER BY c_ab DESC, w1, w2""".stripMargin) { spark =>
      TextOps.pmiLift(spark.table("documents"), "doc_id", "text", 100)
        .orderBy(col("c_ab").desc, col("w1"), col("w2"))
    },

    // xc1 — cross-metric correlation: do hourly click volumes move
    // with view volumes? Hourly counts of the two event types pivot
    // from ONE conditional aggregate (no join of two filtered scans),
    // then ols1's exact moment fold gives slope and r² in ppm — an
    // operator COMPOSITION entry (timeBars shape → linearFit).
    QueryDef.views("xc1_cross_correlation",
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
        |             sum(CASE WHEN event_type = 'click' THEN 1
        |                 ELSE 0 END) AS x,
        |             sum(CASE WHEN event_type = 'view' THEN 1
        |                 ELSE 0 END) AS y
        |           FROM events GROUP BY 1),
        |     m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
        |             sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx,
        |             sum(y*y) AS syy
        |           FROM h),
        |     d AS (SELECT n, n*sxy - sx*sy AS num, n*sxx - sx*sx AS den,
        |             n*syy - sy*sy AS deny FROM m)
        |SELECT CAST(n AS BIGINT) AS n_hours,
        |       CAST(CASE WHEN den <> 0 THEN (1000000*num) // den END
        |         AS BIGINT) AS slope_ppm,
        |       CAST(CASE WHEN den <> 0 AND deny <> 0 THEN
        |           (((1000000*num) // den) * num) // deny END
        |         AS BIGINT) AS r2_ppm
        |FROM d""".stripMargin) { spark =>
      val hourly = spark.table("events")
        .groupBy(expr("unix_micros(cast(ts as timestamp)) div 3600000000")
          .as("hr"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("y"))
      Stats.linearFit(hourly, Seq.empty, "x", "y")
        .select(col("n").as("n_hours"), col("slope_ppm"), col("r2_ppm"))
    },

    // dow1 — seasonality matrix (event_type × day-of-week × hour):
    // pure-integer calendar arithmetic on epoch µs (dow 0 = Sunday via
    // the epoch-starts-Thursday offset) — no locale-dependent
    // dayofweek() numbering; one scan projection + hash aggregate.
    QueryDef.views("dow1_seasonality",
      """WITH p AS (SELECT event_type,
        |             epoch_us(ts) // 86400000000 AS d,
        |             epoch_us(ts) % 86400000000 AS r
        |           FROM events)
        |SELECT event_type, (d + 4) % 7 AS dow, r // 3600000000 AS hour,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM p GROUP BY 1, 2, 3
        |ORDER BY event_type, dow, hour""".stripMargin) { spark =>
      Stats.seasonality(spark.table("events"), Seq("event_type"), "ts")
        .orderBy("event_type", "dow", "hour")
    },

    // dau1 — daily growth accounting (active / new / returning users):
    // first-seen reduces events to the user-bounded (user, min day)
    // table, so days join |users|-sized aggregates.
    QueryDef.views("dau1_growth_accounting",
      """WITH d AS (SELECT user_id AS u,
        |             epoch_us(ts) // 86400000000 AS day
        |           FROM events),
        |     a AS (SELECT day, CAST(count(DISTINCT u) AS BIGINT)
        |             AS active_users FROM d GROUP BY 1),
        |     f AS (SELECT u, min(day) AS day FROM d GROUP BY 1),
        |     nw AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
        |            FROM f GROUP BY 1)
        |SELECT a.day, active_users, coalesce(new_users, 0) AS new_users,
        |       active_users - coalesce(new_users, 0) AS returning_users
        |FROM a LEFT JOIN nw USING (day)
        |ORDER BY day""".stripMargin) { spark =>
      Stats.growthAccounting(spark.table("events"), "user_id", "ts")
        .orderBy("day")
    },

    // pz1 — two-proportion z-test on purchase conversion between the
    // user-parity cohorts (the A/B readout for RATES; ab1 covers
    // means, mw1/ks1 distributions): z² in ppm with every denominator
    // cleared, the squared numerator staged through HUGEINT/DECIMAL.
    QueryDef.views("pz1_two_proportion",
      """WITH u AS (SELECT user_id,
        |             CAST(max(user_id % 2) AS BIGINT) AS c,
        |             max(CASE WHEN event_type = 'purchase' THEN 1
        |                 ELSE 0 END) AS k
        |           FROM events GROUP BY 1),
        |     a AS (SELECT
        |             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |               AS BIGINT) AS n1,
        |             CAST(sum(CASE WHEN c = 1 THEN k ELSE 0 END)
        |               AS BIGINT) AS k1,
        |             CAST(sum(CASE WHEN c <> 1 THEN 1 ELSE 0 END)
        |               AS BIGINT) AS n2,
        |             CAST(sum(CASE WHEN c <> 1 THEN k ELSE 0 END)
        |               AS BIGINT) AS k2
        |           FROM u)
        |SELECT n1, k1, n2, k2,
        |       CAST(CASE WHEN n1 > 0 AND n2 > 0 AND k1 + k2 > 0
        |                  AND k1 + k2 < n1 + n2 THEN
        |           (1000000 * CAST(k1*n2 - k2*n1 AS HUGEINT)
        |              * CAST(k1*n2 - k2*n1 AS HUGEINT) * (n1 + n2))
        |           // (CAST(n1 AS HUGEINT) * n2 * (k1 + k2)
        |              * (n1 + n2 - k1 - k2)) END AS BIGINT) AS z2_ppm
        |FROM a""".stripMargin) { spark =>
      Stats.twoProportionZ(
        spark.table("events").select(col("user_id"),
          (col("user_id") % 2).as("cohort"),
          (col("event_type") === "purchase").as("conv")),
        "user_id", "cohort", "conv")
    },

    // psi1 — Population Stability Index per event type between the
    // user-parity cohorts (completing the drift family: TVD, KL, KS):
    // reference-ECDF decile bins assigned positionally from the same
    // cumulative step-point window ks1 uses (no edge list ever
    // materializes), Laplace-smoothed log-ratios in micro-nats (lm1's
    // ln precedent), everything else exact integer.
    QueryDef.views("psi1_population_stability",
      """WITH p AS (SELECT event_type,
        |             CAST(floor(value*1000000) AS BIGINT) AS v,
        |             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS c
        |           FROM events),
        |     s AS (SELECT event_type, v,
        |             sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS c0,
        |             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS c1
        |           FROM p GROUP BY 1, 2),
        |     w AS (SELECT event_type, v, c0, c1,
        |             sum(c0) OVER (PARTITION BY event_type) AS n0,
        |             sum(c1) OVER (PARTITION BY event_type) AS n1,
        |             sum(c0) OVER (PARTITION BY event_type ORDER BY v
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               - c0 AS below
        |           FROM s),
        |     b AS (SELECT event_type,
        |             least((10*below) // n0, 9) AS bin,
        |             max(n0) AS n0, max(n1) AS n1,
        |             sum(c0) AS k0, sum(c1) AS k1
        |           FROM w GROUP BY 1, 2),
        |     l AS (SELECT *, CAST(round(ln(
        |             (CAST(k1 + 1 AS DOUBLE) * (n0 + 10)) /
        |             (CAST(k0 + 1 AS DOUBLE) * (n1 + 10))) * 1000000)
        |             AS BIGINT) AS lp
        |           FROM b)
        |SELECT event_type, CAST(max(n0) AS BIGINT) AS n0,
        |       CAST(max(n1) AS BIGINT) AS n1,
        |       CAST(count(*) AS BIGINT) AS n_bins,
        |       CAST(sum(CAST(k1*n0 - k0*n1 AS HUGEINT) * lp)
        |         // (CAST(max(n0) AS HUGEINT) * max(n1)) AS BIGINT)
        |         AS psi_micro
        |FROM l GROUP BY 1 ORDER BY event_type""".stripMargin) { spark =>
      Stats.psi(
        spark.table("events").select(col("event_type"),
          floor(col("value") * 1000000).cast("long").as("v"),
          (col("user_id") % 2).as("cohort")),
        Seq("event_type"), "v", "cohort")
        .orderBy("event_type")
    },

    // ks1 — two-sample Kolmogorov–Smirnov per event type (user-parity
    // cohorts): denominators cleared so D = max|cum1·n2 − cum2·n1|
    // stays in ℤ; the cumulative window runs over the distinct-value
    // step points, not rows.
    QueryDef.views("ks1_kolmogorov_smirnov",
      """WITH p AS (SELECT event_type,
        |             CAST(floor(value*1000000) AS BIGINT) AS v,
        |             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS c
        |           FROM events),
        |     s AS (SELECT event_type, v,
        |             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS c2
        |           FROM p GROUP BY 1, 2),
        |     w AS (SELECT event_type, v,
        |             sum(c1) OVER (PARTITION BY event_type) AS n1,
        |             sum(c2) OVER (PARTITION BY event_type) AS n2,
        |             sum(c1) OVER (PARTITION BY event_type ORDER BY v
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS k1,
        |             sum(c2) OVER (PARTITION BY event_type ORDER BY v
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS k2
        |           FROM s),
        |     a AS (SELECT event_type, max(n1) AS n1, max(n2) AS n2,
        |             max(abs(k1*n2 - k2*n1)) AS d
        |           FROM w GROUP BY 1)
        |SELECT event_type, CAST(n1 AS BIGINT) AS n1,
        |       CAST(n2 AS BIGINT) AS n2, CAST(d AS BIGINT) AS d_num,
        |       CAST(CASE WHEN n1 > 0 AND n2 > 0
        |            THEN (1000000*d) // (n1*n2) END AS BIGINT) AS d_ppm
        |FROM a ORDER BY event_type""".stripMargin) { spark =>
      Stats.ksTest(
        spark.table("events").select(col("event_type"),
          floor(col("value") * 1000000).cast("long").as("v"),
          (col("user_id") % 2).as("cohort")),
        Seq("event_type"), "v", "cohort")
        .orderBy("event_type")
    },

    // cpd1 — CUSUM change-point per event type: the index where the
    // running sum departs furthest from the 0→total straight line,
    // denominator-cleared (drift = |n·S_i − i·S_n|); cumsum and row
    // index share one ordered window pass, argmax via max_by.
    QueryDef.views("cpd1_cusum_changepoint",
      """WITH p AS (SELECT event_type, epoch_us(ts) AS us, event_id,
        |             CAST(floor(value*1000000) AS BIGINT) AS v
        |           FROM events),
        |     w AS (SELECT event_type,
        |             row_number() OVER (PARTITION BY event_type
        |               ORDER BY us, event_id) AS rn,
        |             sum(CAST(v AS HUGEINT)) OVER (PARTITION BY event_type
        |               ORDER BY us, event_id ROWS BETWEEN UNBOUNDED
        |               PRECEDING AND CURRENT ROW) AS s,
        |             count(*) OVER (PARTITION BY event_type) AS n,
        |             sum(CAST(v AS HUGEINT)) OVER
        |               (PARTITION BY event_type) AS tot
        |           FROM p),
        |     d AS (SELECT event_type, rn, n,
        |             abs(n*s - rn*tot) AS drift FROM w),
        |     r AS (SELECT event_type, rn, n, drift, row_number() OVER
        |             (PARTITION BY event_type ORDER BY drift DESC, rn)
        |             AS rk FROM d)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |       CAST(rn AS BIGINT) AS change_idx,
        |       CAST(drift AS BIGINT) AS max_drift
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin) { spark =>
      Stats.cusumChangePoint(
        spark.table("events").select(col("event_type"), col("ts"),
          col("event_id"),
          floor(col("value") * 1000000).cast("long").as("v")),
        Seq("event_type"), "ts", "event_id", "v")
        .orderBy("event_type")
    },

    // li1 — linear interpolation onto the hourly grid (rs1's gap-fill
    // twin with VALUE interpolation): events and grid points union
    // into one stream, one ordered window pass per direction with
    // IGNORE NULLS — no as-of join, no per-grid-point probe; exact
    // integral division at the value scale.
    QueryDef.views("li1_interpolate_grid",
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS us,
        |              event_id AS id,
        |              CAST(floor(value*1000000) AS BIGINT) AS v, 1 AS isev
        |            FROM events),
        |     mm AS (SELECT event_type, min(us) AS lo, max(us) AS hi
        |            FROM ev GROUP BY 1),
        |     grid AS (SELECT event_type,
        |                unnest(generate_series(
        |                  ((lo + 3599999999) // 3600000000) * 3600000000,
        |                  (hi // 3600000000) * 3600000000,
        |                  3600000000)) AS us,
        |                CAST(-1 AS BIGINT) AS id,
        |                CAST(NULL AS BIGINT) AS v, 0 AS isev
        |              FROM mm),
        |     u AS (SELECT * FROM ev UNION ALL SELECT * FROM grid),
        |     w AS (SELECT *,
        |             last_value(v IGNORE NULLS) OVER win1 AS pv,
        |             last_value(CASE WHEN isev = 1 THEN us END
        |               IGNORE NULLS) OVER win1 AS pu,
        |             first_value(v IGNORE NULLS) OVER win2 AS nv,
        |             first_value(CASE WHEN isev = 1 THEN us END
        |               IGNORE NULLS) OVER win2 AS nu
        |           FROM u
        |           WINDOW win1 AS (PARTITION BY event_type
        |               ORDER BY us, isev DESC, id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             win2 AS (PARTITION BY event_type
        |               ORDER BY us, isev DESC, id
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, us AS grid_us,
        |       CAST(CASE WHEN nu IS NOT NULL AND nu > pu
        |            THEN pv + (CAST(nv - pv AS HUGEINT) * (us - pu))
        |                 // (nu - pu)
        |            ELSE pv END AS BIGINT) AS v_interp
        |FROM w WHERE isev = 0 AND pv IS NOT NULL
        |ORDER BY event_type, grid_us""".stripMargin) { spark =>
      Stats.interpolateGrid(
        spark.table("events").select(col("event_type"), col("ts"),
          col("event_id"),
          floor(col("value") * 1000000).cast("long").as("v")),
        Seq("event_type"), "ts", "event_id", "v", stepUs = 3600000000L)
        .orderBy("event_type", "grid_us")
    },

    // ent1 — per-source unigram entropy + KL vs the corpus (diversity /
    // drift census): log-probs are micro-nat integers (lm1's ln
    // precedent — the one IEEE op, identical on both engines), the
    // rest exact integer arithmetic over the vocab-bounded count table.
    QueryDef.views("ent1_source_entropy",
      """WITH tok AS (SELECT source, unnest(list_filter(
        |               string_split(text, ' '), x -> len(x) > 0)) AS t
        |             FROM documents),
        |     c AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
        |           FROM tok GROUP BY 1, 2),
        |     ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |              CAST(count(*) AS BIGINT) AS vocab
        |            FROM c GROUP BY 1),
        |     cc AS (SELECT t, CAST(sum(c) AS BIGINT) AS cc
        |            FROM c GROUP BY 1),
        |     nn AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM c),
        |     s AS (SELECT c.source, c.c, ns.n, ns.vocab,
        |             CAST(round(ln(CAST(c.c AS DOUBLE)
        |               / CAST(ns.n AS DOUBLE)) * 1000000) AS BIGINT) AS lps,
        |             CAST(round(ln(CAST(cc.cc AS DOUBLE)
        |               / CAST(nn.nn AS DOUBLE)) * 1000000) AS BIGINT) AS lpc
        |           FROM c JOIN ns USING (source) JOIN cc USING (t)
        |           CROSS JOIN nn)
        |SELECT source, max(n) AS n_tokens, max(vocab) AS vocab,
        |       CAST((-sum(CAST(c AS HUGEINT) * lps)) // max(n) AS BIGINT)
        |         AS entropy_micro,
        |       CAST(sum(CAST(c AS HUGEINT) * (lps - lpc)) // max(n)
        |         AS BIGINT) AS kl_micro
        |FROM s GROUP BY 1 ORDER BY source""".stripMargin) { spark =>
      TextOps.sourceEntropy(spark.table("documents"), "source", "text")
        .orderBy("source")
    },

    // mad1 — median/MAD robust outlier census per event type: exact
    // lower medians via the cum·2 ≥ total rank rule (weightedMedian
    // with unit weights), MAD over |x − med|, outlier iff ad > 3·MAD —
    // all in ℤ; the oracle replays the identical rank arithmetic.
    QueryDef.views("mad1_robust_outliers",
      """WITH p AS (SELECT event_type, event_id,
        |             CAST(floor(value*1000000) AS BIGINT) AS v
        |           FROM events),
        |     r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |             ORDER BY v, event_id) AS rn,
        |             count(*) OVER (PARTITION BY event_type) AS n
        |           FROM p),
        |     m AS (SELECT event_type, min(v) AS med
        |           FROM r WHERE 2*rn >= n GROUP BY 1),
        |     d AS (SELECT p.event_type, p.event_id, p.v,
        |             abs(p.v - m.med) AS ad, m.med
        |           FROM p JOIN m USING (event_type)),
        |     r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |              ORDER BY ad, event_id) AS rn,
        |              count(*) OVER (PARTITION BY event_type) AS n
        |            FROM d),
        |     md AS (SELECT event_type, min(ad) AS mad
        |            FROM r2 WHERE 2*rn >= n GROUP BY 1)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(max(d.med) AS BIGINT) AS median,
        |       CAST(max(md.mad) AS BIGINT) AS mad,
        |       CAST(sum(CASE WHEN d.ad > 3*md.mad THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { spark =>
      Stats.robustOutliers(
        spark.table("events").select(col("event_type"), col("event_id"),
          floor(col("value") * 1000000).cast("long").as("v")),
        Seq("event_type"), "v", "event_id", k = 3)
        .orderBy("event_type")
    },

    // ph1 — exact phrase search ("hash join") over positional postings:
    // postings are filtered to the phrase's two terms BEFORE any
    // exchange, adjacency is an equi-join on (doc, pos+1) — the corpus
    // index never shuffles, only the phrase terms' postings do.
    QueryDef.views("ph1_phrase_search",
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '),
        |             x -> len(x) > 0) AS w FROM documents),
        |     p AS (SELECT doc_id, j AS pos, w[j] AS tok
        |           FROM t, UNNEST(generate_series(1, len(w))) AS s(j)),
        |     h AS (SELECT doc_id, pos FROM p WHERE tok = 'hash'),
        |     jn AS (SELECT doc_id, pos FROM p WHERE tok = 'join'),
        |     m AS (SELECT h.doc_id, h.pos FROM h JOIN jn
        |           ON jn.doc_id = h.doc_id AND jn.pos = h.pos + 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
        |       CAST(min(pos) AS BIGINT) AS first_pos
        |FROM m GROUP BY 1 ORDER BY doc_id""".stripMargin) { spark =>
      TextOps.phraseSearch(spark.table("documents"), "doc_id", "text",
          Seq("hash", "join"))
        .orderBy("doc_id")
    },

    // twap1 — time-weighted average of the event value per type: each
    // value weighted by how long it stayed current (gap to the key's
    // next event), exact integral division. One lead window + partial
    // aggregate on a single exchange.
    QueryDef.views("twap1_time_weighted_avg",
      """WITH p AS (SELECT event_type, epoch_us(ts) AS us, event_id,
        |             CAST(floor(value*1000000) AS BIGINT) AS v
        |           FROM events),
        |     g AS (SELECT event_type, v,
        |             lead(us) OVER (PARTITION BY event_type
        |               ORDER BY us, event_id) - us AS gap
        |           FROM p),
        |     a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |             CAST(sum(gap) AS HUGEINT) AS span,
        |             sum(CAST(v AS HUGEINT) * gap) AS wv
        |           FROM g GROUP BY 1)
        |SELECT event_type, n_events, CAST(span AS BIGINT) AS span_us,
        |       CAST(CASE WHEN span > 0 THEN wv // span END AS BIGINT)
        |         AS twap
        |FROM a ORDER BY event_type""".stripMargin) { spark =>
      Stats.twap(
        spark.table("events").select(col("event_type"), col("ts"),
          col("event_id"),
          floor(col("value") * 1000000).cast("long").as("v")),
        Seq("event_type"), "ts", "event_id", "v")
        .orderBy("event_type")
    },

    // ia1 — inter-arrival histogram on log2 buckets per event type:
    // bucket = bit-length − 1, exact on both engines (no float log at
    // bucket boundaries). Lead window + hash aggregate.
    QueryDef.views("ia1_interarrival_hist",
      """WITH p AS (SELECT event_type, epoch_us(ts) AS us, event_id
        |           FROM events),
        |     g AS (SELECT event_type,
        |             lead(us) OVER (PARTITION BY event_type
        |               ORDER BY us, event_id) - us AS gap
        |           FROM p)
        |SELECT event_type, CAST(length(bin(gap)) - 1 AS BIGINT) AS log2_gap,
        |       CAST(count(*) AS BIGINT) AS n_gaps
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, log2_gap""".stripMargin) { spark =>
      Stats.interArrivalLog2(spark.table("events"),
          Seq("event_type"), "ts", "event_id")
        .orderBy("event_type", "log2_gap")
    },

    // pt3 — top-50 event-type TRIGRAM paths within a 24-hour window
    // per user: two leads over ONE per-user sort, a hash aggregate on
    // the tiny trigram space, TakeOrderedAndProject for the top-k.
    QueryDef.views("pt3_path_trigrams",
      """WITH p AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |             event_id FROM events),
        |     q AS (SELECT user_id, event_type AS s1,
        |             lead(event_type, 1) OVER w AS s2,
        |             lead(event_type, 2) OVER w AS s3,
        |             lead(us, 2) OVER w - us AS dt
        |           FROM p WINDOW w AS (PARTITION BY user_id
        |             ORDER BY us, event_id)),
        |     c AS (SELECT s1 AS step1, s2 AS step2, s3 AS step3,
        |             CAST(count(*) AS BIGINT) AS n_paths
        |           FROM q WHERE s3 IS NOT NULL AND dt <= 86400000000
        |           GROUP BY 1, 2, 3)
        |SELECT * FROM c
        |ORDER BY n_paths DESC, step1, step2, step3
        |LIMIT 50""".stripMargin) { spark =>
      Stats.pathTrigrams(spark.table("events"), "user_id", "ts",
          "event_id", "event_type", windowUs = 86400000000L, k = 50)
        .orderBy(col("n_paths").desc, col("step1"), col("step2"),
          col("step3"))
    },

    // vo1 — pairwise source-vocabulary overlap (exact Jaccard, ppm):
    // the corpus reduces once to the distinct (source, token) table;
    // the intersection is a token self-join with a < b; sizes
    // broadcast back. |groups|² rows out, corpus exchanged once.
    QueryDef.views("vo1_vocab_overlap",
      """WITH v AS (SELECT DISTINCT g, t FROM (
        |             SELECT source AS g,
        |               unnest(list_filter(string_split(text, ' '),
        |                 x -> len(x) > 0)) AS t
        |             FROM documents)),
        |     sz AS (SELECT g, CAST(count(*) AS BIGINT) AS n
        |            FROM v GROUP BY 1),
        |     i AS (SELECT a.g AS src_a, b.g AS src_b,
        |             CAST(count(*) AS BIGINT) AS n_common
        |           FROM v a JOIN v b ON a.t = b.t AND a.g < b.g
        |           GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common, sa.n AS n_a, sb.n AS n_b,
        |       (1000000 * n_common) // (sa.n + sb.n - n_common)
        |         AS jaccard_ppm
        |FROM i JOIN sz sa ON sa.g = src_a JOIN sz sb ON sb.g = src_b
        |ORDER BY src_a, src_b""".stripMargin) { spark =>
      TextOps.vocabOverlap(spark.table("documents"), "source", "text")
        .orderBy("src_a", "src_b")
    },

    // hp1 — Heaps-law vocabulary growth at 100-doc checkpoints: corpus
    // shuffled never (per-doc token counts are a scan-local size(),
    // distinct side reduces to the vocab-bounded (token, min_doc)
    // table); the cumulative window sorts |checkpoints| rows.
    QueryDef.views("hp1_vocab_growth",
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split(text, ' '),
        |               x -> len(x) > 0) AS w
        |           FROM documents),
        |     pb AS (SELECT (doc_id // 100) * 100 + 100 AS checkpoint,
        |              count(*) AS nd, sum(len(w)) AS tok
        |            FROM d GROUP BY 1),
        |     t AS (SELECT doc_id, unnest(w) AS tk FROM d),
        |     f AS (SELECT tk, min(doc_id) AS fd FROM t GROUP BY 1),
        |     nv AS (SELECT (fd // 100) * 100 + 100 AS checkpoint,
        |              count(*) AS newv FROM f GROUP BY 1)
        |SELECT pb.checkpoint,
        |       CAST(sum(nd) OVER (ORDER BY pb.checkpoint) AS BIGINT)
        |         AS n_docs,
        |       CAST(sum(tok) OVER (ORDER BY pb.checkpoint) AS BIGINT)
        |         AS cum_tokens,
        |       CAST(sum(coalesce(newv, 0)) OVER (ORDER BY pb.checkpoint)
        |         AS BIGINT) AS cum_vocab
        |FROM pb LEFT JOIN nv USING (checkpoint)
        |ORDER BY checkpoint""".stripMargin) { spark =>
      TextOps.vocabGrowth(spark.table("documents"), "doc_id", "text", 100L)
        .orderBy("checkpoint")
    },

    // cdk1 — content-defined chunking (LBFS/rsync-style): boundaries
    // where the trailing 4-gram's polynomial hash ≡ 0 (mod 16), so an
    // insertion reflows chunks locally instead of shifting every
    // fixed-width span. Boundary detect + slice are ONE codegen HOF
    // projection; the recurrence join is a hash-agg on the chunk key.
    // The oracle replays the hash per position, rebuilds chunks with a
    // boundaries-before-me running count, and re-counts recurrence.
    QueryDef.views("cdk1_content_chunks",
      """WITH d AS (SELECT doc_id, text, length(text) AS n
        |           FROM documents WHERE length(text) >= 4),
        |     pos AS (SELECT doc_id, j,
        |               (unicode(substr(text, j-3, 1)) * 29791
        |                + unicode(substr(text, j-2, 1)) * 961
        |                + unicode(substr(text, j-1, 1)) * 31
        |                + unicode(substr(text, j, 1))) % 16 = 0 AS isb
        |             FROM d, UNNEST(generate_series(4, n)) AS t(j)),
        |     ch AS (SELECT d.doc_id, p, substr(text, p, 1) AS c
        |            FROM d, UNNEST(generate_series(1, n)) AS t(p)),
        |     k AS (SELECT ch.doc_id, ch.p, ch.c,
        |             coalesce(sum(CASE WHEN pos.isb THEN 1 ELSE 0 END)
        |               OVER (PARTITION BY ch.doc_id ORDER BY ch.p
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS cid
        |           FROM ch LEFT JOIN pos
        |             ON pos.doc_id = ch.doc_id AND pos.j = ch.p),
        |     cks AS (SELECT doc_id, cid,
        |               string_agg(c, '' ORDER BY p) AS chunk
        |             FROM k GROUP BY 1, 2),
        |     rec AS (SELECT chunk, count(DISTINCT doc_id) AS nd
        |             FROM cks GROUP BY 1)
        |SELECT cks.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(min(length(chunk)) AS BIGINT) AS min_len,
        |       CAST(max(length(chunk)) AS BIGINT) AS max_len,
        |       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_shared
        |FROM cks JOIN rec USING (chunk)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin) { spark =>
      TextOps.contentChunks(spark.table("documents"), "doc_id", "text", 16)
        .orderBy("doc_id")
    },

    // vad1 — energy-threshold voice-activity segmentation over DECODED
    // PCM frames (m3's decode seam, regrouped into 160-sample frames):
    // a frame is active iff its energy strictly beats the asset mean
    // (exact-integer form e·nf > Σe), runs merge via gaps-and-islands.
    // The oracle replays the identical sample reconstruction from the
    // document bytes, frame bucketing, threshold and island fold.
    QueryDef("vad1_energy_segments", (spark, dir) => {
      val assets = graft.ops.Multimodal.assetsFromDocuments(spark, dir)
        .filter(col("modality") === "audio")
      graft.ops.Multimodal.vadSegments(
        graft.ops.Multimodal.pcmFrameEnergy(assets, 160).toDF())
        .orderBy("asset_id")
    }, Option(
      """WITH a AS (SELECT doc_id, encode(text) AS b,
        |                  2 * (1 + doc_id % 2) AS ba
        |           FROM documents WHERE n_chars % 3 = 1),
        |     s AS (SELECT doc_id, j,
        |                  ('0x' || substr(hex(b), 4*j-3, 2))::INT
        |                  + 256 * ('0x' || substr(hex(b), 4*j-1, 2))::INT AS u
        |           FROM a, UNNEST(generate_series(
        |                  1, (octet_length(b) // ba) * ba // 2)) AS t(j)),
        |     v AS (SELECT doc_id, j,
        |                  CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS smp
        |           FROM s),
        |     f AS (SELECT doc_id, (j-1) // 160 AS fi,
        |                  sum(abs(smp)) AS e, count(*) AS c
        |           FROM v GROUP BY 1, 2),
        |     ff AS (SELECT * FROM f WHERE c = 160),
        |     t2 AS (SELECT doc_id, count(*) AS nf, sum(e) AS tot
        |            FROM ff GROUP BY 1),
        |     act AS (SELECT ff.doc_id, fi,
        |               row_number() OVER (PARTITION BY ff.doc_id
        |                 ORDER BY fi) AS rn
        |             FROM ff JOIN t2 USING (doc_id) WHERE e * nf > tot),
        |     seg AS (SELECT doc_id, fi - rn AS sid,
        |               CAST(count(*) AS BIGINT) AS len
        |             FROM act GROUP BY 1, 2),
        |     sa AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
        |              CAST(sum(len) AS BIGINT) AS n_active,
        |              max(len) AS longest FROM seg GROUP BY 1)
        |SELECT t2.doc_id AS asset_id, CAST(nf AS BIGINT) AS n_frames,
        |       CAST(tot AS BIGINT) AS sum_abs,
        |       COALESCE(n_active, 0) AS n_active,
        |       COALESCE(n_segments, 0) AS n_segments,
        |       COALESCE(longest, 0) AS longest_seg
        |FROM t2 LEFT JOIN sa USING (doc_id)
        |ORDER BY asset_id""".stripMargin)),

    // vp1 — ViT-style patch grid over DECODED pixels (m4's decode
    // seam): full 4×4 patches with exact integer luma mass, reduced
    // per asset to patch count, total luma, and the brightest patch
    // (luma-desc, then (py,px) — the deterministic argmax). The oracle
    // rebuilds every pixel from the document bytes, assigns patch
    // coordinates by integer index math, and replays the argmax.
    QueryDef("vp1_vit_patches", (spark, dir) => {
      val assets = graft.ops.Multimodal.ppmAssetsFromDocuments(spark, dir)
      graft.ops.Multimodal.patchLuma(assets, 4).toDF()
        .groupBy("asset_id")
        .agg(
          count(lit(1)).as("n_patches"),
          sum("sum_luma").as("total_luma"),
          max_by(
            struct(col("px").cast("long").as("best_px"),
              col("py").cast("long").as("best_py"),
              col("sum_luma").as("best_luma")),
            struct(col("sum_luma"), (-col("py")).cast("int"),
              (-col("px")).cast("int"))).as("__b"))
        .select(col("asset_id"), col("n_patches"), col("total_luma"),
          col("__b.best_px"), col("__b.best_py"), col("__b.best_luma"))
        .orderBy("asset_id")
    }, Option(
      """WITH a AS (SELECT doc_id, encode(text) AS b,
        |                  4 + (doc_id % 5) * 2 AS w
        |           FROM documents WHERE n_chars % 3 = 0),
        |     d AS (SELECT doc_id, w, octet_length(b) // (3 * w) AS h, b
        |           FROM a WHERE octet_length(b) >= 3 * w),
        |     p AS (SELECT doc_id, w, h,
        |                  ((j-1) % w) // 4 AS px, ((j-1) // w) // 4 AS py,
        |                  299 * ('0x' || substr(hex(b), 6*j-5, 2))::INT
        |                  + 587 * ('0x' || substr(hex(b), 6*j-3, 2))::INT
        |                  + 114 * ('0x' || substr(hex(b), 6*j-1, 2))::INT AS luma
        |           FROM d, UNNEST(generate_series(1, w * h)) AS t(j)),
        |     q AS (SELECT doc_id, px, py,
        |                  CAST(sum(luma) AS BIGINT) AS sum_luma
        |           FROM p WHERE px < w // 4 AND py < h // 4
        |           GROUP BY 1, 2, 3),
        |     r AS (SELECT doc_id, px, py, sum_luma,
        |             row_number() OVER (PARTITION BY doc_id
        |               ORDER BY sum_luma DESC, py, px) AS rn,
        |             count(*) OVER (PARTITION BY doc_id) AS np,
        |             sum(sum_luma) OVER (PARTITION BY doc_id) AS tl
        |           FROM q)
        |SELECT doc_id AS asset_id, CAST(np AS BIGINT) AS n_patches,
        |       CAST(tl AS BIGINT) AS total_luma,
        |       CAST(px AS BIGINT) AS best_px, CAST(py AS BIGINT) AS best_py,
        |       sum_luma AS best_luma
        |FROM r WHERE rn = 1 ORDER BY asset_id""".stripMargin)),

    // pp1 — preference-pair construction (the RLHF/DPO data op): per
    // (lang, source) prompt group, pair the longest candidate with the
    // shortest, keep groups with margin ≥ 64 chars. One window
    // exchange, |groups| output rows, no join.
    QueryDef.views("pp1_preference_pairs",
      """WITH b AS (SELECT lang, source, doc_id, n_chars,
        |             row_number() OVER (PARTITION BY lang, source
        |               ORDER BY n_chars DESC, doc_id) AS rb,
        |             row_number() OVER (PARTITION BY lang, source
        |               ORDER BY n_chars, doc_id) AS rw
        |           FROM documents),
        |     g AS (SELECT lang, source,
        |             max(CASE WHEN rb = 1 THEN doc_id END) AS chosen_id,
        |             max(CASE WHEN rw = 1 THEN doc_id END) AS rejected_id,
        |             max(CASE WHEN rb = 1 THEN n_chars END) AS chosen_score,
        |             max(CASE WHEN rw = 1 THEN n_chars END) AS rejected_score
        |           FROM b WHERE rb = 1 OR rw = 1 GROUP BY 1, 2)
        |SELECT lang, source, chosen_id, rejected_id, chosen_score,
        |       rejected_score, chosen_score - rejected_score AS margin
        |FROM g
        |WHERE chosen_score - rejected_score >= 64
        |  AND chosen_id <> rejected_id
        |ORDER BY lang, source""".stripMargin) { spark =>
      TextOps.preferencePairs(spark.table("documents"),
          Seq("lang", "source"), "doc_id", "n_chars", minMargin = 64L)
        .select("lang", "source", "chosen_id", "rejected_id",
          "chosen_score", "rejected_score", "margin")
        .orderBy("lang", "source")
    })
}
