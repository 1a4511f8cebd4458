package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** The remaining TPC-H query shapes expressible over the driver's schema
  * (no partsupp / shipmode / phone columns — predicates are adapted, the
  * PLAN SHAPES are the point). Together with Relational's q1/q3/q4/q5/q7/
  * q10/q18 this covers every distinct optimizer path the TPC-H suite
  * exercises: pure scan-agg pushdown (q6), two-role dimension join with a
  * conditional-ratio measure (q8), computed-measure profit rollup (q9),
  * outer-join histogram / group-by-of-group-by (q13), conditional
  * aggregation ratio (q14), argmax via aggregated-view scalar subquery
  * (q15), correlated scalar AVG subquery (q17), OR-of-conjuncts residual
  * join predicate (q19), double correlated EXISTS / NOT EXISTS (q21), and
  * anti join + exact decimal threshold subquery (q22). The partsupp-based
  * four are expressed over a DERIVED partsupp (aggregated
  * (l_partkey, l_suppkey) pairs from lineitem — at 100 TB this would be a
  * real table and the derivation agg vanishes, leaving the canonical
  * plans): correlated scalar MIN (q2), HAVING vs scalar-subquery
  * threshold (q11), CASE-pivot dual count (q12), DISTINCT + NOT IN +
  * COUNT(DISTINCT) (q16), IN-subquery with correlated scalar agg (q20).
  *
  * Determinism: every aggregate is computed in DECIMAL (exact,
  * associative — safe under any partitioning) and cast to DOUBLE only on
  * output; threshold comparisons that TPC-H phrases as `x > avg(...)` are
  * rewritten to the multiply-through exact form `x * count > sum` where a
  * rounding boundary could otherwise diverge between engines (q22).
  */
object TpchShapes {

  private def dec2(c: String) = col(c).cast("decimal(18,2)")
  private def disc(c: String) = col(c).cast("decimal(4,2)")

  val defs: Seq[QueryDef] = Seq(

    // Q6 shape — forecast revenue change: the canonical predicate-pushdown
    // scan. No join, no shuffle beyond the single-row final agg; all three
    // range predicates reach the parquet reader as PushedFilters, so at
    // 100 TB this reads only row groups whose min/max stats overlap the
    // ship-date year. The measure is price*discount in exact DECIMAL.
    QueryDef.views("q6_revenue_forecast",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin) { spark =>
      spark.table("lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampNTZType) &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampNTZType) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(dec2("l_extendedprice") * disc("l_discount")).cast("double")
          .as("revenue"), count(lit(1)).as("n_lines"))
    },

    // Q8 shape — national market share: the two-role join pattern (nation
    // joins once for the customer side, once for the supplier side) plus a
    // conditional-ratio measure. All four dims broadcast; the one shuffle
    // is the final per-year agg (7 rows). share = NATION_7-supplied
    // revenue / all revenue to ASIA customers, per order year: both sums
    // are exact DECIMAL, cast to DOUBLE before the one division so both
    // engines divide identical IEEE operands.
    QueryDef.views("q8_market_share",
      """SELECT o_year,
        |       CAST(CAST(sum(CASE WHEN s_nationkey = 7 THEN volume
        |                          ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
        |            / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
        |       count(*) AS n_lines
        |FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |             s_nationkey,
        |             CAST(l_extendedprice AS DECIMAL(18,2))
        |               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
        |      FROM lineitem
        |      JOIN orders ON l_orderkey = o_orderkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation ON c_nationkey = n_nationkey
        |      JOIN region ON n_regionkey = r_regionkey
        |      JOIN supplier ON l_suppkey = s_suppkey
        |      JOIN part ON l_partkey = p_partkey
        |      WHERE r_name = 'ASIA' AND p_type = 'MEDIUM') t
        |GROUP BY o_year ORDER BY o_year""".stripMargin) { spark =>
      val li = spark.table("lineitem").select(col("l_orderkey"),
        col("l_suppkey"), col("l_partkey"),
        (dec2("l_extendedprice") * (lit(1) - disc("l_discount"))).as("volume"))
      val o = spark.table("orders").select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("bigint").as("o_year"))
      val c = spark.table("customer").select("c_custkey", "c_nationkey")
      val n = spark.table("nation").select("n_nationkey", "n_regionkey")
      val r = spark.table("region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      val s = spark.table("supplier").select("s_suppkey", "s_nationkey")
      val p = spark.table("part").filter(col("p_type") === "MEDIUM")
        .select("p_partkey")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("o_year")
        .agg((sum(when(col("s_nationkey") === 7, col("volume"))
            .otherwise(lit(0.00).cast("decimal(18,2)"))).cast("double") /
          sum(col("volume")).cast("double")).as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_year")
    },

    // Q9 shape — product-type profit rollup: computed measure spanning two
    // fact/dim columns (revenue minus cost, cost adapted to
    // p_retailprice*quantity — no partsupp in this schema), grouped by
    // supplier nation × order year. The LIKE filter prunes part before the
    // broadcast; profit stays DECIMAL end to end.
    QueryDef.views("q9_product_profit",
      """SELECT n_name AS nation,
        |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                  * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |                - CAST(p_retailprice AS DECIMAL(18,2))
        |                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY n_name, o_year
        |ORDER BY nation, o_year""".stripMargin) { spark =>
      val li = spark.table("lineitem").select(col("l_orderkey"),
        col("l_partkey"), col("l_suppkey"),
        (dec2("l_extendedprice") * (lit(1) - disc("l_discount"))).as("rev"),
        dec2("l_quantity").as("qty"))
      val p = spark.table("part").filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"), dec2("p_retailprice").as("cost_unit"))
      val s = spark.table("supplier").select("s_suppkey", "s_nationkey")
      val n = spark.table("nation").select("n_nationkey", "n_name")
      val o = spark.table("orders").select(col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("o_year"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(sum(col("rev") - col("cost_unit") * col("qty")).cast("double")
          .as("profit"))
        .orderBy("nation", "o_year")
    },

    // Q13 shape — customer order-count distribution: LEFT OUTER join with
    // a predicate on the preserved side's partner (the filter lives in the
    // ON clause, so customers with only urgent orders count as 0, not
    // dropped), then a group-by OF a group-by. Scale: the first agg
    // (per-custkey count) partial-aggregates before its shuffle; the
    // second shuffles only |distinct counts| rows.
    QueryDef.views("q13_cust_distribution",
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM customer c
        |      LEFT OUTER JOIN orders o
        |        ON c.c_custkey = o.o_custkey
        |       AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { spark =>
      val c = spark.table("customer").select("c_custkey")
      val o = spark.table("orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q14 shape — promo revenue: conditional-aggregation ratio over one
    // month of shipments. Part broadcasts; the ratio divides two exact
    // DECIMAL sums after identical DOUBLE casts on both engines.
    QueryDef.views("q14_promo_revenue",
      """SELECT CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN
        |                        CAST(l_extendedprice AS DECIMAL(18,2))
        |                        * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
        |            / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |            AS DOUBLE) AS promo_share,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin) { spark =>
      val li = spark.table("lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00").cast(TimestampNTZType) &&
          col("l_shipdate") < lit("1996-10-01 00:00:00").cast(TimestampNTZType))
        .select(col("l_partkey"),
          (dec2("l_extendedprice") * (lit(1) - disc("l_discount"))).as("vol"))
      val p = spark.table("part").select("p_partkey", "p_type")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg((sum(when(col("p_type") === "PROMO", col("vol"))
            .otherwise(lit(0.00).cast("decimal(18,2)"))).cast("double") /
          sum(col("vol")).cast("double")).as("promo_share"),
          count(lit(1)).as("n_lines"))
    },

    // Q15 shape — top supplier: an aggregated view consumed twice, once as
    // the join input and once inside a scalar MAX subquery; the argmax
    // equality compares exact DECIMALs so ties and boundaries are
    // bit-stable. Expressed through the SQL surface (E1) so Catalyst's
    // scalar-subquery planning is what's under grade; the revenue CTE is
    // tiny (|suppliers| rows) and the subquery's single row broadcasts.
    QueryDef.views("q15_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |       CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin) { spark =>
      spark.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |         sum(CAST(l_extendedprice AS DECIMAL(18,2))
          |             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name,
          |       CAST(total_revenue AS DOUBLE) AS total_revenue
          |FROM supplier JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
          |ORDER BY s_suppkey""".stripMargin)
    },

    // Q17 shape — small-quantity order revenue: correlated scalar AVG
    // subquery per part, which Catalyst de-correlates into an aggregate +
    // join rather than a per-row re-scan. l_quantity is integral, so the
    // per-part AVG is exact-sum/count — identical IEEE ops in both
    // engines — and 0.2*avg is one further identical multiply.
    QueryDef.views("q17_small_qty_revenue",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin) { spark =>
      spark.sql(
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          |         AS total_price,
          |       count(*) AS n_lines
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE p_brand = 'Brand#23'
          |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin)
    },

    // Q19 shape — OR-of-conjuncts join predicate: three disjunct branches
    // each pairing part attributes with lineitem attributes. The equi-key
    // (partkey) is common to all branches, so the plan stays a hash join
    // with the disjunction as a residual filter — never a nested-loop.
    // Catalyst also pushes the branch-local part-only conjuncts
    // (brand IN ..., size ranges) down to the part scan.
    QueryDef.views("q19_disjunctive_pred",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |         AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin) { spark =>
      val li = spark.table("lineitem").select(col("l_partkey"),
        col("l_quantity"),
        (dec2("l_extendedprice") * (lit(1) - disc("l_discount"))).as("vol"))
      val p = spark.table("part").select("p_partkey", "p_brand", "p_size")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("vol")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Q2 shape — minimum-cost supplier: the correlated-scalar-MIN
    // subquery over a shared CTE. The schema has no partsupp table, so one
    // is DERIVED inside the query: per (part, supplier) pair observed in
    // lineitem, cost = min extended price (DECIMAL min — exact and
    // order-independent, so safe under any partitioning). Catalyst
    // decorrelates the `= (SELECT min ...)` into an aggregate + equi-join
    // on p_partkey; at 100 TB partsupp would be a real table and the
    // derivation aggregate disappears, leaving exactly TPC-H Q2's plan:
    // dims broadcast, one shuffle each for the pair-agg and the per-part
    // min, a hash join between them.
    QueryDef.views("q2_min_cost_supplier",
      """WITH partsupp AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, ps_suppkey,
        |       CAST(ps_supplycost AS DOUBLE) AS cost
        |FROM partsupp
        |JOIN part ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND p_type = 'MEDIUM' AND p_size <= 10
        |  AND ps_supplycost =
        |      (SELECT min(ps2.ps_supplycost) FROM partsupp ps2
        |       JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        |       JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |       JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |       WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
        |ORDER BY s_acctbal DESC, p_partkey, ps_suppkey LIMIT 100""".stripMargin) { spark =>
      spark.sql(
        """WITH partsupp AS (
          |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
          |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
          |  FROM lineitem GROUP BY 1, 2)
          |SELECT s_acctbal, s_name, n_name, p_partkey, ps_suppkey,
          |       CAST(ps_supplycost AS DOUBLE) AS cost
          |FROM partsupp
          |JOIN part ON p_partkey = ps_partkey
          |JOIN supplier ON s_suppkey = ps_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA' AND p_type = 'MEDIUM' AND p_size <= 10
          |  AND ps_supplycost =
          |      (SELECT min(ps2.ps_supplycost) FROM partsupp ps2
          |       JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          |       JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          |       JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          |       WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
          |ORDER BY s_acctbal DESC, p_partkey, ps_suppkey LIMIT 100""".stripMargin)
    },

    // Q11 shape — important stock: group-agg HAVING a scalar-subquery
    // threshold over the SAME derived relation. TPC-H's `> sum * 0.001`
    // is multiplied through to the exact integer form `sum_part * 1000 >
    // sum_total` so no engine-specific DECIMAL rounding can flip a
    // boundary row. Both sides of the HAVING aggregate the one `scoped`
    // CTE; Catalyst plans the threshold as a broadcast single-row
    // subquery, so the only shuffles are the pair-agg and the per-part
    // re-agg — at 100 TB the nation filter prunes first (broadcast dim),
    // keeping the big aggregates 1/25th of the pairs.
    QueryDef.views("q11_important_stock",
      """WITH partsupp AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_value
        |  FROM lineitem GROUP BY 1, 2),
        |scoped AS (
        |  SELECT ps_partkey, ps_value FROM partsupp
        |  JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3')
        |SELECT ps_partkey, CAST(sum(ps_value) AS DOUBLE) AS value
        |FROM scoped GROUP BY ps_partkey
        |HAVING sum(ps_value) * 1000 > (SELECT sum(ps_value) FROM scoped)
        |ORDER BY value DESC, ps_partkey""".stripMargin) { spark =>
      spark.sql(
        """WITH partsupp AS (
          |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
          |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_value
          |  FROM lineitem GROUP BY 1, 2),
          |scoped AS (
          |  SELECT ps_partkey, ps_value FROM partsupp
          |  JOIN supplier ON s_suppkey = ps_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  WHERE n_name = 'NATION_3')
          |SELECT ps_partkey, CAST(sum(ps_value) AS DOUBLE) AS value
          |FROM scoped GROUP BY ps_partkey
          |HAVING sum(ps_value) * 1000 > (SELECT sum(ps_value) FROM scoped)
          |ORDER BY value DESC, ps_partkey""".stripMargin)
    },

    // Q12 shape — shipping class vs order priority: fact-to-fact join with
    // a dual conditional count (the CASE-pivot aggregate). The schema has
    // no l_shipmode, so the class is l_returnflag ∈ {A,R}; "late receipt"
    // is shipped-after-ordered (no receipt date). The shipdate year range
    // and flag IN-list reach the lineitem scan as PushedFilters; the join
    // shuffles both facts on the order key — the unavoidable exchange —
    // then the final agg is 2 rows.
    QueryDef.views("q12_priority_by_class",
      """SELECT l_returnflag AS ship_class,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_shipdate > o_orderdate
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { spark =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      val li = spark.table("lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampNTZType) &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampNTZType))
        .select("l_orderkey", "l_returnflag", "l_shipdate")
      spark.table("orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy(col("l_returnflag").as("ship_class"))
        .agg(sum(when(hi, 1).otherwise(0)).as("high_line_count"),
          sum(when(hi, 0).otherwise(1)).as("low_line_count"))
        .orderBy("ship_class")
    },

    // Q16 shape — supplier counts by part attribute: DISTINCT pair
    // derivation + NOT-IN exclusion + COUNT(DISTINCT). The complaint list
    // (negative balance) is provably non-null, so NOT IN is exactly a
    // left-anti join — Spark plans a broadcast anti (6 rows); DuckDB keeps
    // the NOT IN phrasing. count(DISTINCT) re-shuffles on the 3-column
    // group key with the supplier appended — Expand-free because there is
    // only one distinct aggregate. Part prunes BEFORE the pair join
    // (broadcast), so at 100 TB the distinct-pair aggregate only sees
    // matching parts' lines.
    QueryDef.views("q16_supplier_part_counts",
      """WITH partsupp AS (
        |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        |  FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |       count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'SM%'
        |  AND p_size IN (1, 2, 3, 4, 5)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                         WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { spark =>
      val ps = spark.table("lineitem")
        .select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey")).distinct()
      val p = spark.table("part")
        .filter(col("p_brand") =!= "Brand#3" && !col("p_type").like("SM%") &&
          col("p_size").isin(1, 2, 3, 4, 5))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = spark.table("supplier").filter(col("s_acctbal") < 0.0)
        .select("s_suppkey")
      ps.join(broadcast(p), col("ps_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Q20 shape — part promotion candidates: IN-subquery whose inner WHERE
    // carries a correlated scalar AGGREGATE over the fact (the deepest
    // decorrelation TPC-H asks for). Derived availqty = lifetime quantity
    // per pair; since the 1996 shipment is a subset of lifetime, TPC-H's
    // `avail > 0.5 * year` would be vacuous, so the predicate is flipped
    // to `2 * year > lifetime` — "most of this pair's volume shipped in
    // 1996" — same shape, selective. All quantities are exact DECIMAL and
    // the ×2 multiply-through avoids any fractional threshold. Catalyst
    // turns the correlated agg into a grouped join on (partkey, suppkey)
    // and the IN into a left-semi chain — no per-row subquery execution.
    QueryDef.views("q20_promotion_suppliers",
      """WITH partsupp AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN (SELECT p_partkey FROM part
        |                         WHERE p_name LIKE 'red%')
        |      AND 2 * (SELECT COALESCE(sum(CAST(l_quantity AS DECIMAL(18,2))),
        |                               CAST(0.00 AS DECIMAL(18,2)))
        |               FROM lineitem
        |               WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |                 AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |                 AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
        |          > ps_availqty)
        |ORDER BY s_name""".stripMargin) { spark =>
      spark.sql(
        """WITH partsupp AS (
          |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
          |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
          |  FROM lineitem GROUP BY 1, 2)
          |SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |WHERE n_name = 'NATION_3'
          |  AND s_suppkey IN (
          |    SELECT ps_suppkey FROM partsupp
          |    WHERE ps_partkey IN (SELECT p_partkey FROM part
          |                         WHERE p_name LIKE 'red%')
          |      AND 2 * (SELECT COALESCE(sum(CAST(l_quantity AS DECIMAL(18,2))),
          |                               CAST(0.00 AS DECIMAL(18,2)))
          |               FROM lineitem
          |               WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          |                 AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |                 AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
          |          > ps_availqty)
          |ORDER BY s_name""".stripMargin)
    },

    // Q21 shape — suppliers who kept orders waiting: the double
    // correlation. l1 is late (shipped >60 days after ordering, adapted —
    // no receipt/commit dates in this schema), some OTHER supplier is on
    // the same order (EXISTS → left-semi), and NO other supplier was also
    // late (NOT EXISTS with a correlated column from TWO outer tables —
    // l1's order AND the order's date — → null-safe left-anti). Both
    // rewrites are equi-joins on l_orderkey; lineitem self-joins shuffle
    // on that one key.
    QueryDef.views("q21_waiting_suppliers",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin) { spark =>
      spark.sql(
        """SELECT s_name, count(*) AS numwait
          |FROM supplier
          |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN orders ON o_orderkey = l1.l_orderkey
          |WHERE o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
    },

    // Q22 shape — dormant high-balance customers: NOT EXISTS anti join
    // against orders (no urgent order ever — the synthetic data gives
    // every customer SOME order, so plain dormancy selects nothing)
    // plus a global-average threshold. TPC-H's
    // `c_acctbal > avg(...)` is a rounding hazard (DECIMAL avg rounds at
    // engine-specific scales), so the threshold is multiplied through to
    // the exact integer-arithmetic form bal*count > sum — bit-identical
    // in any engine, same selectivity semantics. The country-code class
    // is c_custkey % 7 (schema has no phone column).
    QueryDef.views("q22_dormant_customers",
      """SELECT cntrycode, count(*) AS numcust,
        |       CAST(sum(bal) AS DOUBLE) AS totacctbal
        |FROM (SELECT c_custkey % 7 AS cntrycode,
        |             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |      FROM customer
        |      WHERE c_custkey % 7 IN (1, 3, 5)
        |        AND CAST(c_acctbal AS DECIMAL(18,2))
        |            * (SELECT count(*) FROM customer
        |               WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5))
        |            > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
        |               FROM customer
        |               WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5))
        |        AND NOT EXISTS (SELECT 1 FROM orders
        |                        WHERE o_custkey = c_custkey
        |                          AND o_orderpriority = '1-URGENT')) t
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin) { spark =>
      spark.sql(
        """SELECT cntrycode, count(*) AS numcust,
          |       CAST(sum(bal) AS DOUBLE) AS totacctbal
          |FROM (SELECT c_custkey % 7 AS cntrycode,
          |             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
          |      FROM customer
          |      WHERE c_custkey % 7 IN (1, 3, 5)
          |        AND CAST(c_acctbal AS DECIMAL(18,2))
          |            * (SELECT count(*) FROM customer
          |               WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5))
          |            > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
          |               FROM customer
          |               WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5))
          |        AND NOT EXISTS (SELECT 1 FROM orders
          |                        WHERE o_custkey = c_custkey
          |                          AND o_orderpriority = '1-URGENT')) t
          |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)
    }
  )
}
