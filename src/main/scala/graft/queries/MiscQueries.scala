package graft.queries

import graft.{GraftQuery, Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2 surface: vertical concat (S4/O4), per-group top-k
  * window (W1), sort-by-abs ranking (W2), distinct values (O5).
  */
object MiscQueries extends QueryPack {

  /** S4/O4: union of customer and supplier account balances (the
    * reference concatenates train∪test to fit encoders).
    */
  val unionConcat: GraftQuery = GraftQuery(
    "union_concat_acctbal",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(lit("customer").as("side"), col("c_acctbal").as("acctbal"))
      val sup = Tables(s, dir, "supplier")
        .select(lit("supplier").as("side"), col("s_acctbal").as("acctbal"))
      c.unionByName(sup)
        .groupBy("side")
        .agg(count(lit(1)).as("n"), sum(Q.cents(col("acctbal"))).as("sum_cents"))
        .orderBy("side")
    },
    Some("""
      WITH u AS (
        SELECT 'customer' AS side, c_acctbal AS acctbal FROM customer
        UNION ALL
        SELECT 'supplier' AS side, s_acctbal AS acctbal FROM supplier)
      SELECT side, COUNT(*) AS n,
             CAST(SUM(CAST(round(acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM u GROUP BY side ORDER BY side"""))

  /** W1: top-2 parts per brand by retail price (row_number window). */
  val topkPerBrand: GraftQuery = GraftQuery(
    "topk_parts_per_brand",
    (s, dir) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(desc("p_retailprice"), col("p_partkey"))
      Tables(s, dir, "part")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("p_brand"), col("rk"), col("p_partkey"),
          Q.cents(col("p_retailprice")).as("price_cents"))
        .orderBy("p_brand", "rk")
    },
    Some("""
      SELECT p_brand, rk, p_partkey, price_cents
      FROM (SELECT p_brand, p_partkey,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
                   row_number() OVER (PARTITION BY p_brand
                     ORDER BY p_retailprice DESC, p_partkey) AS rk
            FROM part)
      WHERE rk <= 2 ORDER BY p_brand, rk"""))

  /** W2/O5: distinct order priorities ranked by |share - 0.2| (sort by an
    * absolute-value expression, reference Sol_2 cell 5).
    */
  val absRank: GraftQuery = GraftQuery(
    "priority_abs_deviation",
    (s, dir) => {
      val counts = Tables(s, dir, "orders")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      counts
        .withColumn(
          "dev",
          Q.r6(abs(col("n") * 1.0 / sum("n").over(Window.partitionBy()) - 0.2)))
        .select("o_orderpriority", "n", "dev")
        .orderBy(desc("dev"), col("o_orderpriority"))
    },
    Some("""
      WITH c AS (SELECT o_orderpriority, COUNT(*) AS n
                 FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, n,
             round(abs(n * 1.0 / (SELECT SUM(n) FROM c) - 0.2), 6) AS dev
      FROM c ORDER BY dev DESC, o_orderpriority"""))

  /** O6: intersect/except — nations with high-balance customers vs
    * nations with suppliers, tagged by membership. Both ops shuffle on
    * already-distinct keys (tiny after dedup — scales).
    */
  val setOps: GraftQuery = GraftQuery(
    "nation_set_ops",
    (s, dir) => {
      val cust = Tables(s, dir, "customer")
        .filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nationkey")).distinct()
      val supp = Tables(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey")).distinct()
      cust.intersect(supp).select(lit("both").as("side"), col("nationkey"))
        .unionByName(cust.except(supp)
          .select(lit("customer_only").as("side"), col("nationkey")))
        .unionByName(supp.except(cust)
          .select(lit("supplier_only").as("side"), col("nationkey")))
        .orderBy("side", "nationkey")
    },
    Some("""
      WITH c AS (SELECT DISTINCT c_nationkey AS nationkey
                 FROM customer WHERE c_acctbal > 9000),
           s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      SELECT 'both' AS side, nationkey
      FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
      UNION ALL
      SELECT 'customer_only' AS side, nationkey
      FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
      UNION ALL
      SELECT 'supplier_only' AS side, nationkey
      FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
      ORDER BY side, nationkey"""))

  override def queries: Seq[GraftQuery] =
    Seq(unionConcat, topkPerBrand, absRank, setOps)
}
