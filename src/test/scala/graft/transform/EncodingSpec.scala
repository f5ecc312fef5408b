package graft.transform

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EncodingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("label encoding is alphabetical (sklearn parity), unseen -> -1") {
    val train = Seq("banana", "apple", "cherry", "apple").toDF("fruit")
    val test = Seq("cherry", "durian", "apple").toDF("fruit")
    val m = LabelEncoder.fit(train, "fruit")
    val got = m.transform(test, "code")
      .select("fruit", "code").as[(String, Int)].collect().toMap
    assert(got == Map("apple" -> 0, "cherry" -> 2, "durian" -> -1))
  }

  test("fitConcat covers categories from both tables") {
    val a = Seq("x").toDF("c")
    val b = Seq("y").toDF("c")
    val m = LabelEncoder.fitConcat(a, b, "c")
    val got = m.transform(b, "code").select("code").as[Int].head()
    assert(got == 1) // x -> 0, y -> 1
  }

  test("large-vocab offset path assigns identical codes to the window path") {
    val vals = scala.util.Random.shuffle((0 until 500).map(i => f"v$i%04d"))
    val df = vals.toDF("c")
    val small = LabelEncoder.fit(df, "c")
    val large = LabelEncoder.fit(df, "c", smallVocabThreshold = 0L)
    val sm = small.vocab.as[(String, Int)].collect().toMap
    val lg = large.vocab.as[(String, Int)].collect().toMap
    assert(lg == sm)
    assert(sm.size == 500 && sm(f"v${0}%04d") == 0 && sm(f"v${499}%04d") == 499)
    // codes stay stable across re-executions of the vocab plan
    assert(large.vocab.as[(String, Int)].collect().toMap == lg)
  }

  test("standardize matches sklearn ddof=0 closed form") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val m = Standardizer.fit(df, "x", decimals = 0)
    // mean 2.5, population std = sqrt(1.25)
    assert(math.abs(m.mean - 2.5) < 1e-12)
    assert(math.abs(m.std - math.sqrt(1.25)) < 1e-12)
    val z = m.transform(df, "z").select("z").as[Double].collect()
    assert(math.abs(z.sum) < 1e-9)
  }
}
