package graft.queries

import graft.{GraftQuery, Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-surface + frame-window breadth (SURVEY §2.3 J2, §2.5): semi and
  * anti joins, rollup aggregation, running-frame windows — engine surface
  * beyond the reference's own usage, all oracle-checked.
  */
object JoinWindowQueries extends QueryPack {

  /** Left-semi: order priorities of orders containing any high-quantity
    * line (EXISTS).
    */
  val semi: GraftQuery = GraftQuery(
    "semi_big_orders",
    (s, dir) => {
      val big = Tables(s, dir, "lineitem")
        .filter(col("l_quantity") > 45).select("l_orderkey")
      Tables(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Left-anti: customers who never ordered (NOT EXISTS). */
  val anti: GraftQuery = GraftQuery(
    "anti_customers_no_orders",
    (s, dir) => {
      val o = Tables(s, dir, "orders").select("o_custkey")
      Tables(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Rollup: customer counts per region/nation with subtotals and grand
    * total (nulls coalesced to 'ALL' for cross-engine stability).
    */
  val rollup: GraftQuery = GraftQuery(
    "rollup_region_nation_customers",
    (s, dir) => {
      // via spark.sql: Spark 4.1's rollup analysis false-positives the
      // ambiguous-self-join check on the DataFrame API after a dim join;
      // the SQL surface plans the identical Expand + broadcast-join
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      Tables(s, dir, "nation").createOrReplaceTempView("nation_v")
      Tables(s, dir, "region").createOrReplaceTempView("region_v")
      s.sql("""
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               COUNT(*) AS n
        FROM customer_v
        JOIN nation_v ON c_nationkey = n_nationkey
        JOIN region_v ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region, nation""")
    },
    Some("""
      SELECT COALESCE(r_name, 'ALL') AS region,
             COALESCE(n_name, 'ALL') AS nation,
             COUNT(*) AS n
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region, nation"""))

  /** Frame window: per-customer running order-value total in date order. */
  val runningTotal: GraftQuery = GraftQuery(
    "running_revenue_per_customer",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .withColumn("running_cents", sum(Q.cents("o_totalprice")).over(w))
        .select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("running_cents"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS running_cents
      FROM orders WHERE o_custkey < 50
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** Pivot (long->wide): order counts per priority pivoted on status —
    * the reshape surface of pandas pivot_table / crosstab as a first-class
    * wide-schema operator (fixed pivot values => static schema, one
    * shuffle; the oracle is the equivalent conditional aggregation).
    */
  val pivot: GraftQuery = GraftQuery(
    "pivot_priority_status",
    (s, dir) => Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"),
        col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
      .orderBy("o_orderpriority"),
    Some("""
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Cube: all four grouping combinations of (status, priority) in one
    * Expand pass (rollup's full-lattice sibling).
    */
  val cubeQ: GraftQuery = GraftQuery(
    "cube_status_priority",
    (s, dir) => Tables(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        col("n"))
      .orderBy("status", "prio"),
    Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS prio,
             COUNT(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, prio"""))

  /** Ranking-window breadth in one pass: ntile quartiles, lag deltas,
    * percent_rank and cume_dist per nation over balance cents (unique
    * (cents, custkey) order key => no peer-group ambiguity cross-engine).
    */
  val analytic: GraftQuery = GraftQuery(
    "analytic_acctbal_windows",
    (s, dir) => {
      val w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
      Tables(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          Q.cents("c_acctbal").as("cents"))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("delta_prev", col("cents") - lag("cents", 1).over(w))
        .withColumn("pct_rank", Q.r6(percent_rank().over(w)))
        .withColumn("cum_dist", Q.r6(cume_dist().over(w)))
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("""
      WITH c AS (
        SELECT c_nationkey, c_custkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer)
      SELECT c_nationkey, c_custkey, cents,
             ntile(4) OVER w AS quartile,
             cents - lag(cents, 1) OVER w AS delta_prev,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cum_dist
      FROM c
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY cents, c_custkey)
      ORDER BY c_nationkey, c_custkey"""))

  /** Bloom-pruned big-big semi join gate: lineitem rows of URGENT orders
    * via `BloomJoin.bloomSemiJoin` — the probe scan drops non-matching
    * rows with the codegen'd bit test BEFORE the exact semi join, so the
    * shuffle carries ~1/5th of lineitem. Output is row-identical to the
    * plain semi join, which is exactly what the oracle asserts (the
    * Bloom stage must be invisible in results).
    */
  val bloomSemi: GraftQuery = GraftQuery(
    "bloom_semi_urgent_revenue",
    (s, dir) => {
      val urgent = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val li = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      graft.joins.BloomJoin
        .bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(Q.cents("l_extendedprice") * (lit(100L) - Q.cents("l_discount")))
            .as("revenue_e4"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n_lines,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS BIGINT) AS revenue_e4
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_orderpriority = '1-URGENT')
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Explicit GROUPING SETS (the construct rollup/cube sugar over):
    * detail, per-priority subtotal, and grand total in one pass, with a
    * value-derived level tag instead of grouping_id so the label is
    * engine-neutral. Dataset.groupingSets is the Spark 4 API form.
    */
  val groupingSets: GraftQuery = GraftQuery(
    "grouping_sets_report",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(Q.cents("o_totalprice")).as("sum_cents"))
        .withColumn("level",
          when(col("o_orderpriority").isNull && col("o_orderstatus").isNull,
            "total")
            .when(col("o_orderstatus").isNull, "priority")
            .otherwise("detail"))
        .orderBy(asc_nulls_first("o_orderpriority"),
          asc_nulls_first("o_orderstatus"))
    },
    Some("""
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
             CASE WHEN o_orderpriority IS NULL AND o_orderstatus IS NULL
                    THEN 'total'
                  WHEN o_orderstatus IS NULL THEN 'priority'
                  ELSE 'detail' END AS level
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                              (o_orderpriority), ())
      ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""))

  /** Delta-style MERGE / CDC apply over customers
    * ([[graft.transform.Merge.applyChanges]]): a deterministic change
    * batch (delete keys ≡ 0 mod 7, update acctbal +100 for keys ≡ 0
    * mod 3 not deleted, insert mirrored negative keys for keys ≡ 5 mod
    * 11) applied to the snapshot in ONE full-outer key join. The oracle
    * replays the identical FULL OUTER JOIN in DuckDB; acctbal stays an
    * untouched or exactly-once-added double, so the merged table
    * hash-matches bit-for-bit.
    */
  val mergeUpsert: GraftQuery = GraftQuery(
    "merge_upsert_customers",
    (s, dir) => {
      val snap = Tables(s, dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
      val deletes = snap.filter(col("c_custkey") % 7 === 0)
        .withColumn("op", lit("D"))
      val updates = snap
        .filter(col("c_custkey") % 7 =!= 0 && col("c_custkey") % 3 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        .withColumn("op", lit("U"))
      val inserts = snap.filter(col("c_custkey") % 11 === 5)
        .withColumn("c_custkey", -col("c_custkey"))
        .withColumn("op", lit("I"))
      val changes = deletes.unionByName(updates).unionByName(inserts)
      graft.transform.Merge
        .applyChanges(snap, changes, "c_custkey", "op")
        .orderBy("c_custkey")
    },
    Some("""
      WITH snap AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer),
      ch AS (
        SELECT c_custkey AS k, 'D' AS op, c_nationkey, c_acctbal
        FROM snap WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, 'U', c_nationkey, c_acctbal + 100.0
        FROM snap WHERE c_custkey % 7 <> 0 AND c_custkey % 3 = 0
        UNION ALL
        SELECT -c_custkey, 'I', c_nationkey, c_acctbal
        FROM snap WHERE c_custkey % 11 = 5),
      j AS (
        SELECT s.c_custkey AS sk, ch.k, ch.op,
               s.c_nationkey AS sn, s.c_acctbal AS sa,
               ch.c_nationkey AS cn, ch.c_acctbal AS ca
        FROM snap s FULL OUTER JOIN ch ON ch.k = s.c_custkey)
      SELECT COALESCE(sk, k) AS c_custkey,
             CASE WHEN op IS NULL THEN sn ELSE cn END AS c_nationkey,
             CASE WHEN op IS NULL THEN sa ELSE ca END AS c_acctbal,
             CASE WHEN op IS NULL THEN 'kept'
                  WHEN sk IS NULL THEN 'inserted'
                  ELSE 'updated' END AS src
      FROM j
      WHERE op IS NULL OR op <> 'D'
      ORDER BY c_custkey"""))

  override def queries: Seq[GraftQuery] =
    Seq(semi, anti, rollup, runningTotal, pivot, cubeQ, analytic, bloomSemi,
      groupingSets, mergeUpsert)
}
