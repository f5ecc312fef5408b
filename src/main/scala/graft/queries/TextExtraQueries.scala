package graft.queries

import graft.{GraftQuery, Q, QueryPack, Tables}
import graft.stats.Stats
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic corpus/date operators rounding out the surface: word count
  * (explode-aggregate), string-column describe (count/distinct/top/freq),
  * calendar extraction.
  */
object TextExtraQueries extends QueryPack {

  /** The canonical word-count: explode tokens, count, top 20. */
  val wordCount: GraftQuery = GraftQuery(
    "word_count_docs",
    (s, dir) => Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("word"))
      .limit(20),
    Some("""
      SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word ORDER BY n DESC, word LIMIT 20"""))

  /** describe(include='all') for string columns: count, distinct, top
    * value, top frequency (pandas semantics; ties -> lexicographically
    * smallest top).
    */
  val describeStrings: GraftQuery = GraftQuery(
    "describe_strings_orders",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      Seq("o_orderstatus", "o_orderpriority").map { c =>
        val counts = o.groupBy(col(c).as("v")).agg(count(lit(1)).as("n"))
        val top = counts
          .withColumn("rk", row_number().over(
            Window.partitionBy().orderBy(desc("n"), col("v"))))
          .filter(col("rk") === 1)
        o.agg(
          count(col(c)).as("n_rows"),
          countDistinct(col(c)).as("n_distinct"))
          .crossJoin(top.select(col("v").as("top"), col("n").as("top_freq")))
          .select(lit(c).as("column"), col("n_rows"), col("n_distinct"),
            col("top"), col("top_freq"))
      }.reduce(_.unionByName(_)).orderBy("column")
    },
    Some(Seq("o_orderstatus", "o_orderpriority").map { c =>
      s"""SELECT '$c' AS "column", COUNT($c) AS n_rows,
         COUNT(DISTINCT $c) AS n_distinct, t.top, t.top_freq
         FROM orders,
           (SELECT $c AS top, COUNT(*) AS top_freq FROM orders
            GROUP BY $c ORDER BY top_freq DESC, top LIMIT 1) t
         GROUP BY t.top, t.top_freq"""
    }.mkString("", " UNION ALL ", " ORDER BY \"column\"")))

  /** Calendar extraction + monthly order counts (date surface). */
  val monthly: GraftQuery = GraftQuery(
    "orders_monthly_counts",
    (s, dir) => Tables(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(
        count(lit(1)).as("n"),
        sum(Q.cents("o_totalprice")).as("sum_cents"))
      .orderBy("y", "m"),
    Some("""
      SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS y,
             CAST(date_part('month', o_orderdate) AS INTEGER) AS m,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM orders GROUP BY y, m ORDER BY y, m"""))

  override def queries: Seq[GraftQuery] = Seq(wordCount, describeStrings, monthly)
}
