package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import org.apache.spark.sql.functions._

class PsiSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def psi(vals: Seq[(Long, Boolean)]) =
    Stats.psiDeciles(vals.toDF("v", "ref"), col("v"), col("ref"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("identical halves give PSI exactly 0 with all 10 bins populated") {
    // 1..100 in both halves. Lower-quantile edges land at 10,20,..,90 and
    // bin = #edges <= v, so the bins hold (9, 10 x 8, 11) of EACH half —
    // per-bin ref == cur, hence psi_micro is exactly 0.
    val rows = (1L to 100L).flatMap(v => Seq((v, true), (v, false)))
    val out = psi(rows)
    assert(out.length === 10)
    assert(out.map(_._1).toSeq === (0L to 9L))
    val expected = 9L +: Seq.fill(8)(10L) :+ 11L
    assert(out.map(_._2).toSeq === expected)
    assert(out.map(_._3).toSeq === expected)
    assert(out.forall(_._5 === 0L)) // psi_micro exactly 0
  }

  test("a shifted current half yields a positive PSI") {
    val ref = (1L to 100L).map(v => (v, true))
    val cur = (51L to 150L).map(v => (v, false))
    val out = psi(ref ++ cur)
    assert(out.length === 10)
    val psiTotal = out.head._5
    assert(psiTotal > 100000L) // > 0.1 in micro-units: drifted
    assert(out.forall(_._5 === psiTotal)) // total repeated on every row
  }

  test("an empty current half stays finite via Laplace smoothing") {
    // smoothing maps the empty half to uniform 1/10 per bin; the ref
    // deciles hold (9, 10 x 8, 11) so PSI is a small positive residual
    // instead of the unsmoothed ln(0) blowup — finiteness is the point
    val out = psi((1L to 100L).map(v => (v, true)))
    assert(out.length === 10)
    assert(out.forall(_._3 === 0L))
    val psiTotal = out.head._5
    assert(psiTotal >= 0L && psiTotal < 5000L) // < 0.005: no-drift band
  }

  test("one constant value collapses the deciles into a single bin") {
    // all 9 edges equal 5 -> every row lands in bin 9, bins 0-8 empty
    val out = psi(Seq.fill(20)((5L, true)) ++ Seq.fill(20)((5L, false)))
    assert(out.length === 10)
    assert(out.filter(_._1 < 9L).forall(r => r._2 === 0L && r._3 === 0L))
    assert(out.find(_._1 === 9L).exists(r => r._2 === 20L && r._3 === 20L))
  }
}
