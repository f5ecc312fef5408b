package graft
import graft.tree.{DecisionTree, TreeParams}
import org.apache.spark.sql.functions._

/** Dev utility: reference-comparable tree-training benchmark —
  * 140k rows, maxDepth=8, minSamplesSplit=50, minSamplesLeaf=25,
  * maxFeatures=sqrt, entropy (house_predict_model.ipynb cell 9 config;
  * reference time: 479.19 s on 111,944 train rows).
  */
object TreeBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .limit(140000)
      .select(
        col("l_quantity"), col("l_discount"), col("l_tax"),
        col("l_extendedprice"), col("l_partkey").cast("double").as("pk"),
        col("l_suppkey").cast("double").as("sk"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("label"))
      .cache()
    println(s"rows=${d.count()}")
    val params = TreeParams(maxDepth = 8, minSamplesSplit = 50,
      minSamplesLeaf = 25, maxFeatures = Some("sqrt"), criterion = "entropy")
    val feats = Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice",
      "pk", "sk")
    val t0 = System.nanoTime()
    val m = DecisionTree.fit(d, feats, "label", params)
    val fitS = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val n = m.transform(d, "p").filter(col("p") === col("label")).count()
    val predS = (System.nanoTime() - t1) / 1e9
    println(f"EXACT fit=$fitS%.1fs predict140k=$predS%.2fs depth=${m.depth} acc=${n * 1.0 / 140000}%.4f")
    val t2 = System.nanoTime()
    val mb = DecisionTree.fit(d, feats, "label", params.copy(maxBins = Some(32)))
    println(f"BINNED(32) fit=${(System.nanoTime() - t2) / 1e9}%.1fs depth=${mb.depth}")
    spark.stop()
  }
}
