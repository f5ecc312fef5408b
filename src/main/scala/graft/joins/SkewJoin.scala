package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins. AQE's skew-join handles sort-merge skew
  * automatically; salting is the explicit tool when one hot key dwarfs
  * everything (e.g. a null-ish default id owning 10% of 100 TB).
  */
object SkewJoin {

  /** Salted inner equi-join: the big side gets a seeded random salt in
    * [0, salt); the small side is replicated `salt` times. The hot key's
    * rows spread over `salt` reducers instead of one. Row multiset equals
    * the plain join's.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, salt: Int,
      seed: Long = 42): DataFrame = {
    require(salt > 0)
    val b = big.withColumn("__salt", (rand(seed) * salt).cast("int"))
    val s = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
