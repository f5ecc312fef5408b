package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-rung demo of the bucketed co-located join (graft.sources
  * .Bucketing): pre-shuffle lineitem and orders ONCE at write time,
  * bucketed+sorted by orderkey, then run the q3-shape fact-fact join
  * off the bucketed tables — SortMergeJoin with no Exchange on either
  * side. This is the 100-TB answer to the shuffle cost the plain rung
  * measures on q3/q18: a fact table is written once and joined many
  * times, so the per-query shuffle disappears into the (amortized)
  * layout.
  *
  * Prints one JSON line:
  *   {"bucketed_write_s":…,"bucketed_join_s":…,"plain_join_s":…,
  *    "join_exchanges":N,"rows":N}
  * `join_exchanges` counts Exchange nodes in the bucketed join's
  * executed plan — 0 proves co-location (the single post-agg exchange
  * for the final order-by is excluded by counting before the sort).
  *
  * Usage: spark-submit --class graft.BucketBench <jar>
  *   env SPARK_GRAFT_SF_DIR (rung dir), SPARK_GRAFT_CPUS,
  *   SPARK_GRAFT_BUCKETS (default 64).
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE",
          "/root/repo/target/scale/warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")

    // The q3-shape fact-fact join + aggregation, parameterized by source.
    def q3Shape(
        l: org.apache.spark.sql.DataFrame,
        o: org.apache.spark.sql.DataFrame) =
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(sum(Q.cents(l("l_extendedprice") * (lit(1.0) - l("l_discount"))))
          .as("revenue_cents"))

    // In-memory catalog: a previous run's warehouse dir is an unknown
    // location, so "overwrite" refuses it — clear the locations first.
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("bb_lineitem", "bb_orders").foreach { t =>
      val d = new java.io.File(s"$wh/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(d)
      }
    }

    // One-time layout cost: repartition BY THE BUCKET HASH first so each
    // bucket lands in one file (without it, every write task emits a
    // file per bucket -> tasks x buckets small files).
    val (_, wL) = time {
      graft.sources.Bucketing.writeBucketed(
        lineitem.repartition(buckets, col("l_orderkey")),
        "bb_lineitem", "l_orderkey", buckets)
    }
    val (_, wO) = time {
      graft.sources.Bucketing.writeBucketed(
        orders.repartition(buckets, col("o_orderkey")),
        "bb_orders", "o_orderkey", buckets)
    }

    val bl = spark.table("bb_lineitem")
    val bo = spark.table("bb_orders")
    val bucketedQ = q3Shape(bl, bo)
    val (bRows, tB) = time { bucketedQ.count() }
    // Count Exchange nodes feeding the join (co-location proof): walk
    // the executed plan below the first aggregate.
    val planStr = bucketedQ.queryExecution.executedPlan.toString
    val exchanges = planStr.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")

    val (pRows, tP) = time { q3Shape(lineitem, orders).count() }
    require(bRows == pRows, s"bucketed $bRows != plain $pRows")

    val json = f"""{"bucketed_write_s":${(wL + wO)}%.3f,""" +
      f""""bucketed_join_s":$tB%.3f,"plain_join_s":$tP%.3f,""" +
      s""""join_exchanges":$exchanges,"rows":$bRows}"""
    println(json)
    System.err.println(json)
    spark.sql("DROP TABLE IF EXISTS bb_lineitem")
    spark.sql("DROP TABLE IF EXISTS bb_orders")
    spark.stop()
  }
}
