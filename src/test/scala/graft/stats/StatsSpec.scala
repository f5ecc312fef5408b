package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("entropy/gini closed-form: uniform binary = (1.0, 0.5)") {
    val df = Seq(0, 0, 1, 1).toDF("label")
    val r = Stats.entropyGini(df, "label").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.5)
  }

  test("entropy of pure column is 0") {
    val df = Seq(7, 7, 7).toDF("label")
    val r = Stats.entropyGini(df, "label").head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("profile covers count/nulls/distinct/mean/min/max") {
    val df = Seq(Some(1.0), Some(2.0), Some(2.0), None).toDF("x")
    val r = Stats.profileNumeric(df, Seq("x" -> 0)).head()
    assert(r.getAs[Long]("n_rows") == 3)
    assert(r.getAs[Long]("n_nulls") == 1)
    assert(r.getAs[Long]("n_distinct") == 2)
    assert(r.getAs[Double]("mean") == (5.0 / 3 * 1e6).round / 1e6)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 2.0)
  }

  test("valueCounts shares sum to 1") {
    val df = Seq("a", "a", "b", "c").toDF("v")
    val shares = Stats.valueCounts(df, "v").select("share").as[Double].collect()
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("skew/kurtosis match pandas on a known sample") {
    // pandas: pd.Series([1,2,3,4,10]).skew() = 1.697056, .kurt() = 3.152
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("x")
    val r = Stats.skewKurtosis(df, Seq("x" -> 0)).head()
    assert(math.abs(r.getDouble(1) - 1.697056) < 1e-5)
    assert(math.abs(r.getDouble(2) - 3.152) < 1e-5)
  }

  test("chiSquare on a hand-computed 2x2 table") {
    // counts: (x,p)=10 (x,q)=20 (y,p)=20 (y,q)=10; every expected cell
    // is 15, so chi2 = 4 * 25/15 = 6.666667, dof = 1, V = sqrt(1/9).
    val rows = Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(10)(("y", "q"))
    val r = Stats.chiSquare(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n") == 60 && r.getAs[Long]("dof") == 1)
    assert(r.getAs[Double]("chi2") == 6.666667)
    assert(r.getAs[Double]("cramers_v") == 0.333333)
  }

  test("ksStatistic on a hand-computed two-sample case") {
    // A = {1,2,3}, B = {3,4}: ECDF gaps are 1/3, 2/3, 1/2, 0 -> D = 2/3.
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, true), (2L, true), (3L, true), (3L, false),
      (4L, false)).toDF("v", "isa")
    val r = Stats.ksStatistic(df, col("v"), col("isa")).head()
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("n_values") == 4)
    assert(r.getAs[Double]("ks") == 0.666667)
  }

  test("fdViolation: exact FD -> 0, counter-majority rows counted") {
    // x=1 -> {a,a,b}: 1 violation; x=2 -> {c,c}: 0 -> rate 1/5
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "c"), (2, "c"))
      .toDF("x", "y")
    val r = Stats.fdViolation(df, "x", "y").head()
    assert(r.getAs[Long]("n_groups") == 2)
    assert(r.getAs[Long]("n_rows") == 5)
    assert(r.getAs[Long]("n_violations") == 1)
    assert(r.getAs[Double]("violation_rate") == 0.2)
    // exact FD: every x maps to a single y
    val ok = Seq((1, "a"), (2, "b"), (2, "b")).toDF("x", "y")
    assert(Stats.fdViolation(ok, "x", "y").head()
      .getAs[Long]("n_violations") == 0)
    // majority ties must not double-count the group
    val tie = Seq((1, "a"), (1, "b")).toDF("x", "y")
    val rt = Stats.fdViolation(tie, "x", "y").head()
    assert(rt.getAs[Long]("n_groups") == 1 && rt.getAs[Long]("n_rows") == 2)
    assert(rt.getAs[Long]("n_violations") == 1)
  }

  test("mutualInfo: identity gives MI = H and NMI = 1; independence gives 0") {
    // perfectly dependent: a == b uniform over {x,y} -> MI = H = ln 2
    val dep = (Seq.fill(2)(("x", "x")) ++ Seq.fill(2)(("y", "y")))
      .toDF("a", "b")
    val rd = Stats.mutualInfo(dep, "a", "b").head()
    assert(rd.getAs[Long]("n") == 4)
    assert(rd.getAs[Double]("mi") == 0.693147)
    assert(rd.getAs[Double]("h_a") == 0.693147)
    assert(rd.getAs[Double]("h_b") == 0.693147)
    assert(rd.getAs[Double]("nmi") == 1.0)
    // independent uniform 2x2 -> MI = 0, entropies ln 2
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val ri = Stats.mutualInfo(ind, "a", "b").head()
    assert(ri.getAs[Double]("mi") == 0.0)
    assert(ri.getAs[Double]("h_a") == 0.693147)
    assert(ri.getAs[Double]("nmi") == 0.0)
  }

  test("welchTTest matches the hand-computed closed form") {
    import org.apache.spark.sql.functions.col
    // A = {1..5} cents (mean 3, var 2.5), B = {2,4,..,12} (mean 7, var 14)
    // t = (3-7)/sqrt(2.5/5 + 14/6) = -2.376354, Welch df = 6.972256
    val df = (Seq(1L, 2L, 3L, 4L, 5L).map((_, true)) ++
      Seq(2L, 4L, 6L, 8L, 10L, 12L).map((_, false))).toDF("v", "a")
    val r = Stats.welchTTest(df, col("v"), col("a")).head()
    assert(r.getAs[Long]("n_a") == 5 && r.getAs[Long]("n_b") == 6)
    assert(r.getAs[Double]("mean_a") == 0.03)
    assert(r.getAs[Double]("mean_b") == 0.07)
    assert(r.getAs[Double]("t_stat") == -2.376354)
    assert(r.getAs[Double]("dof") == 6.972256)
  }

  test("mannWhitneyU with ties: midranks, tie correction, exact U") {
    import org.apache.spark.sql.functions.col
    // A = {1,2,3}, B = {2,3,4}: midranks 1, 2.5, 4.5, 6 -> R_a = 8,
    // U_a = 2, mu = 4.5; ties at 2 and 3 -> var = 4.95,
    // z = -2.5/sqrt(4.95) = -1.123666, CLES = 2/9
    val df = (Seq(1L, 2L, 3L).map((_, true)) ++
      Seq(2L, 3L, 4L).map((_, false))).toDF("v", "a")
    val r = Stats.mannWhitneyU(df, col("v"), col("a")).head()
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Long]("n_values") == 4)
    assert(r.getAs[Double]("u_a") == 2.0)
    assert(r.getAs[Double]("mu_u") == 4.5)
    assert(r.getAs[Double]("z") == -1.123666)
    assert(r.getAs[Double]("cles") == 0.222222)
  }

  test("benfordDigits: digit spine keeps absent digits; TV halves the L1") {
    import org.apache.spark.sql.functions.col
    // cents {1,1,2,900} -> digits 1,1,2,9; digits 3-8 absent but reported
    val df = Seq(1L, 1L, 2L, 900L).toDF("v")
    val rs = Stats.benfordDigits(df, col("v")).collect()
    assert(rs.length == 9)
    val d1 = rs.find(_.getInt(0) == 1).get
    assert(d1.getAs[Long]("n") == 2 && d1.getAs[Double]("share") == 0.5)
    assert(d1.getAs[Double]("expected") == 0.30103)
    assert(d1.getAs[Long]("dev_micro") == 198970L)
    val d5 = rs.find(_.getInt(0) == 5).get
    assert(d5.getAs[Long]("n") == 0 && d5.getAs[Long]("dev_micro") == -79181L)
    assert(rs.map(_.getAs[Long]("tv_micro")).distinct.toSeq == Seq(477122L))
  }

  test("madOutliers: exact doubled-grid medians and the 3-sigma MAD fence") {
    import org.apache.spark.sql.functions.col
    // cents {1,2,3,4,100}: median 3 cents, MAD 1 cent; only 100 is outside
    // |v-med| > 3*1.4826*MAD
    val df = Seq(1L, 2L, 3L, 4L, 100L).toDF("v")
    val r = Stats.madOutliers(df, col("v")).head()
    assert(r.getAs[Long]("n") == 5)
    assert(r.getAs[Double]("median") == 0.03)
    assert(r.getAs[Double]("mad_scaled") == 0.014826)
    assert(r.getAs[Long]("n_outliers") == 1)
  }

  test("cusumChangepoint localizes the level shift with integer argmax") {
    import org.apache.spark.sql.functions.col
    // daily cents {10,10,50,50}: mean 30; n*CUSUM peaks after day 2
    // (|dev2| = 160), pre-shift direction is negative
    val df = Seq((1L, 10L), (2L, 10L), (3L, 50L), (4L, 50L)).toDF("d", "v")
    val r = Stats.cusumChangepoint(df, col("d"), col("v")).head()
    assert(r.getAs[Long]("n_buckets") == 4)
    assert(r.getAs[Long]("cp_bucket") == 2L)
    assert(r.getAs[Double]("cusum_max") == 0.4) // 160/4/100
    assert(r.getAs[Int]("direction") == -1)
  }

  test("cupedAdjusted removes the covariate-explained variance") {
    import org.apache.spark.sql.functions.col
    // y = 2x + group effect: theta = 2 exactly, adjusted means strip the
    // covariate imbalance; pooled r2 = 0.8
    val df = Seq(
      (100L, 300L, true), (200L, 500L, true),
      (100L, 200L, false), (200L, 400L, false)).toDF("x", "y", "a")
    val r = Stats.cupedAdjusted(df, col("x"), col("y"), col("a")).head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("mean_a_adj") == 4.0)
    assert(r.getAs[Double]("mean_b_adj") == 3.0)
    assert(r.getAs[Double]("diff_adj") == 1.0)
    assert(r.getAs[Double]("var_reduction") == 0.8)
  }

  test("groupedOls recovers exact and noisy linear fits per group") {
    import org.apache.spark.sql.functions.col
    // g1: y = 200x cents exactly -> slope 2.0 dollars, r2 = 1
    // g2: (1,100),(2,200),(3,400) cents -> slope 150 cents = 1.5 dollars,
    //     intercept -200/3 cents, r2 = 81/84
    val df = (Seq((1L, 200L), (2L, 400L), (3L, 600L)).map {
      case (x, y) => ("g1", x, y)
    } ++ Seq((1L, 100L), (2L, 200L), (3L, 400L)).map {
      case (x, y) => ("g2", x, y)
    }).toDF("g", "x", "y")
    val rs = Stats.groupedOls(df, "g", col("x"), col("y")).collect()
    val g1 = rs.find(_.getString(0) == "g1").get
    assert(g1.getAs[Long]("n") == 3)
    assert(g1.getAs[Double]("slope") == 2.0)
    assert(g1.getAs[Double]("intercept") == 0.0)
    assert(g1.getAs[Double]("r2") == 1.0)
    val g2 = rs.find(_.getString(0) == "g2").get
    assert(g2.getAs[Double]("slope") == 1.5)
    assert(g2.getAs[Double]("intercept") == -0.666667)
    assert(g2.getAs[Double]("r2") == 0.964286)
  }

  test("welchTTest and mannWhitneyU drop NULL values at entry") {
    import org.apache.spark.sql.functions.col
    // same fixtures as above with null rows interleaved in both groups:
    // results must be identical to the null-free runs
    val wNulls = (Seq(Option(1L), Option(2L), Option(3L), Option(4L),
      Option(5L), None).map((_, true)) ++
      Seq(Option(2L), Option(4L), Option(6L), Option(8L), Option(10L),
        Option(12L), None).map((_, false))).toDF("v", "a")
    val w = Stats.welchTTest(wNulls, col("v"), col("a")).head()
    assert(w.getAs[Long]("n_a") == 5 && w.getAs[Long]("n_b") == 6)
    assert(w.getAs[Double]("t_stat") == -2.376354)
    assert(w.getAs[Double]("dof") == 6.972256)
    val mNulls = (Seq(Option(1L), Option(2L), Option(3L), None)
      .map((_, true)) ++
      Seq(Option(2L), Option(3L), Option(4L), None).map((_, false)))
      .toDF("v", "a")
    val m = Stats.mannWhitneyU(mNulls, col("v"), col("a")).head()
    assert(m.getAs[Long]("n_a") == 3 && m.getAs[Long]("n_b") == 3)
    assert(m.getAs[Double]("u_a") == 2.0)
    assert(m.getAs[Double]("z") == -1.123666)
  }

  test("cusumChangepoint stays exact past Long-overflow magnitudes") {
    import org.apache.spark.sql.functions.col
    // prefix sums reach 8e18 (still Long-safe) but nd*prefix = 3.2e19
    // would wrap a Long; decimal(38,0) dev2 keeps the argmax exact.
    // v = {1e18,1e18,3e18,3e18}: dev2 = {-4e18,-8e18,-4e18,0} -> peak
    // after bucket 2, magnitude 8e18/4/100 = 2e16, direction negative
    val big = 1000000000000000000L
    val df = Seq((1L, big), (2L, big), (3L, 3 * big), (4L, 3 * big))
      .toDF("d", "v")
    val r = Stats.cusumChangepoint(df, col("d"), col("v")).head()
    assert(r.getAs[Long]("cp_bucket") == 2L)
    assert(r.getAs[Double]("cusum_max") == 2.0e16)
    assert(r.getAs[Int]("direction") == -1)
  }

  test("groupedOls handles cents-scaled x past Long-overflow squares") {
    import org.apache.spark.sql.functions.col
    // x = y = {4e9, 8e9, 12e9} cents: x*x = 1.6e19 > Long.MaxValue per
    // term; decimal(38,0) sufficient statistics keep slope = 1 exact
    // (reported /100 in dollars-per-cent units)
    val b = 4000000000L
    val df = Seq((b, b), (2 * b, 2 * b), (3 * b, 3 * b)).toDF("x", "y")
      .withColumn("g", org.apache.spark.sql.functions.lit("g"))
    val r = Stats.groupedOls(df, "g", col("x"), col("y")).head()
    assert(r.getAs[Double]("slope") == 0.01)
    assert(r.getAs[Double]("r2") == 1.0)
  }
}
