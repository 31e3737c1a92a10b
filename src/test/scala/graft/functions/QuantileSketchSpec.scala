package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rankOf(sorted: Array[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  test("rank error stays inside the KLL bound on 100k values") {
    val n = 100000
    // deterministic non-uniform stream (squares mod a prime: spread,
    // repeats, no sortedness)
    val vals = (0 until n).map(i => ((i.toLong * i) % 99991L).toDouble)
    val sk = vals.toDF("v").coalesce(4)
      .agg(QuantileSketch.sketch(col("v"))).head().getSeq[Seq[Double]](0)
    val sorted = vals.sorted.toArray
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val est = QuantileSketch.quantile(sk, q)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err < 0.02, s"q=$q est=$est rank err $err")
    }
  }

  test("merging chunk summaries matches sketching the whole stream (within bound)") {
    val n = 40000
    val vals = (0 until n).map(i => ((i.toLong * 7919) % 10007L).toDouble)
    val chunks = vals.grouped(n / 4).toSeq
    val summaries = chunks.map(c =>
      c.toDF("v").coalesce(1).agg(QuantileSketch.sketch(col("v")))
        .head().getSeq[collection.Seq[Double]](0).map(_.toList).toList)
    val merged = summaries.map(s => Tuple1(s)).toDF("sk")
      .agg(QuantileSketch.mergeSketches(col("sk")))
      .head().getSeq[collection.Seq[Double]](0)
    val sorted = vals.sorted.toArray
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = QuantileSketch.quantile(merged, q)
      assert(math.abs(rankOf(sorted, est) - q) < 0.03, s"q=$q")
    }
    // total weight is preserved EXACTLY through compaction and merges
    val w = merged.zipWithIndex.map { case (l, i) => l.length.toLong << i }.sum
    assert(w == n, s"mass drifted: $w vs $n")
  }

  test("summaries persist to parquet and merge after reading back") {
    val dir = tmpDir("qsketch")
    val days = Seq(
      (1 to 5000).map(_.toDouble),
      (5001 to 10000).map(_.toDouble))
    days.zipWithIndex.foreach { case (vs, day) =>
      vs.toDF("v").coalesce(1)
        .agg(QuantileSketch.sketch(col("v")).as("sk"))
        .withColumn("day", lit(day))
        .write.mode("append").parquet(s"$dir/sk.parquet")
    }
    val merged = spark.read.parquet(s"$dir/sk.parquet")
      .agg(QuantileSketch.mergeSketches(col("sk")))
      .head().getSeq[Seq[Double]](0)
    val med = QuantileSketch.quantile(merged, 0.5)
    assert(math.abs(med - 5000.0) < 200, s"median over both days: $med")
  }

  test("NaN input is ignored; empty input yields NaN quantile") {
    val sk = Seq(1.0, Double.NaN, 3.0).toDF("v").coalesce(1)
      .agg(QuantileSketch.sketch(col("v"))).head().getSeq[Seq[Double]](0)
    assert(QuantileSketch.quantile(sk, 0.5) == 1.0) // {1,3} median lower item
    assert(QuantileSketch.quantile(Seq(Seq.empty), 0.5).isNaN)
  }

  test("a fixed partition layout reproduces the summary bit-identically") {
    val vals = (0 until 30000).map(i => ((i * 31) % 9973).toDouble)
    def run() = vals.toDF("v").coalesce(2)
      .agg(QuantileSketch.sketch(col("v"))).head().getSeq[Seq[Double]](0)
    assert(run() == run())
  }

  test("small inputs are exact") {
    val sk = (1 to 100).map(_.toDouble).toDF("v").coalesce(1)
      .agg(QuantileSketch.sketch(col("v"))).head().getSeq[Seq[Double]](0)
    assert(QuantileSketch.quantile(sk, 0.5) == 50.0)
    assert(QuantileSketch.quantile(sk, 1.0) == 100.0)
    assert(QuantileSketch.quantile(sk, 0.0) == 1.0)
  }
}
