package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** Mergeable quantile summaries (KLL-family compactor levels, Karnin/
  * Lang/Liberty 2016, uniform-capacity simplification) — the quantile
  * sibling of the SpaceSaving heavy-hitter summaries: level l holds
  * items of weight 2^l in a ≤K buffer; a full buffer sorts and
  * promotes alternate items one level up, halving its footprint. Rank
  * error is O(n/K · log(n/K)) with K = 200 — ~0.3 % at 10⁹ rows.
  *
  * Why not approx_percentile: the POINT is the persistable partial —
  * `sketch()` yields an `array<array<double>>` column you can store
  * per day/source/shard and later `mergeSketches()` across without
  * touching raw rows again (the mergeable-summaries cube pattern; at
  * 100 TB the raw data is gone or cold by the time the quantile
  * question arrives). Spark's native sketch lives only inside one
  * aggregation's lifetime.
  *
  * Determinism: compaction keeps even- or odd-indexed items by a
  * CONTENT-derived bit (the parity of the buffer sum's raw longbits),
  * so a fixed partition layout reproduces bit-identically; across
  * different partition layouts results agree within the rank-error
  * bound (inherent to every compaction sketch — same contract as the
  * SpaceSaving census, and why the registry check is rows-only with
  * an error-bound spec).
  */
object QuantileSketch {

  val K = 200

  final class Buf extends Serializable {
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)
    var count: Long = 0L
  }

  private def compactInto(b: Buf, l: Int): Unit = {
    val buf = b.levels(l)
    if (buf.length <= K) return
    val sorted = buf.sorted
    // only an EVEN count compacts (promoted items double their weight,
    // so pairing must be exact — promoting ceil(L/2) of an odd L would
    // INFLATE total mass by 1 per compaction, a drift the merge spec
    // caught); an odd buffer leaves its max behind at this level
    val even = sorted.length & ~1
    // content-derived keep-parity: deterministic for fixed input
    var sum = 0.0
    sorted.foreach(sum += _)
    val offset = (java.lang.Double.doubleToLongBits(sum) & 1L).toInt
    if (b.levels.length == l + 1) b.levels += ArrayBuffer.empty
    val up = b.levels(l + 1)
    var i = offset
    while (i < even) { up += sorted(i); i += 2 }
    b.levels(l) =
      if (sorted.length > even) ArrayBuffer(sorted(sorted.length - 1))
      else ArrayBuffer.empty
    compactInto(b, l + 1)
  }

  private def insert(b: Buf, v: Double): Buf = {
    if (!v.isNaN) {
      b.levels(0) += v
      b.count += 1
      if (b.levels(0).length > K) compactInto(b, 0)
    }
    b
  }

  private def mergeBufs(a: Buf, b: Buf): Buf = {
    while (a.levels.length < b.levels.length) a.levels += ArrayBuffer.empty
    var l = 0
    while (l < b.levels.length) {
      a.levels(l) ++= b.levels(l)
      l += 1
    }
    a.count += b.count
    l = 0
    while (l < a.levels.length) { compactInto(a, l); l += 1 }
    a
  }

  private def toSummary(b: Buf): Seq[Seq[Double]] =
    b.levels.map(_.sorted.toSeq).toSeq

  private def fromSummary(s: collection.Seq[collection.Seq[Double]]): Buf = {
    val b = new Buf
    b.levels.clear()
    s.foreach { lvl => b.levels += ArrayBuffer.from(lvl) }
    if (b.levels.isEmpty) b.levels += ArrayBuffer.empty
    b.count = s.zipWithIndex.map { case (lvl, l) => lvl.length.toLong << l }.sum
    b
  }

  private val bufEnc: Encoder[Buf] = Encoders.javaSerialization[Buf]
  private val outEnc: Encoder[Seq[Seq[Double]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Seq[Double]]]()

  /** Build a summary from raw values (NaN ignored, null skipped by Spark). */
  object Build extends Aggregator[Double, Buf, Seq[Seq[Double]]] {
    override def zero: Buf = new Buf
    override def reduce(b: Buf, v: Double): Buf = insert(b, v)
    override def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b)
    override def finish(r: Buf): Seq[Seq[Double]] = toSummary(r)
    override def bufferEncoder: Encoder[Buf] = bufEnc
    override def outputEncoder: Encoder[Seq[Seq[Double]]] = outEnc
  }

  /** Merge STORED summaries (the cross-partition / cross-day rollup). */
  object MergeAgg extends Aggregator[Seq[Seq[Double]], Buf, Seq[Seq[Double]]] {
    override def zero: Buf = new Buf
    override def reduce(b: Buf, v: Seq[Seq[Double]]): Buf =
      if (v == null) b else mergeBufs(b, fromSummary(v))
    override def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b)
    override def finish(r: Buf): Seq[Seq[Double]] = toSummary(r)
    override def bufferEncoder: Encoder[Buf] = bufEnc
    override def outputEncoder: Encoder[Seq[Seq[Double]]] = outEnc
  }

  def sketch(c: Column): Column = udaf(Build).apply(c)
  def mergeSketches(c: Column): Column = udaf(MergeAgg).apply(c)

  /** Quantile estimate from a summary: smallest item whose cumulative
    * weight reaches q·N over the weighted (item, 2^level) expansion.
    */
  def quantile(summary: collection.Seq[collection.Seq[Double]], q: Double): Double = {
    val items = summary.zipWithIndex.flatMap { case (lvl, l) =>
      lvl.map(v => (v, 1L << l)) }
    if (items.isEmpty) return Double.NaN
    val sorted = items.sortBy(_._1)
    val total = sorted.map(_._2).sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  /** Column form of [[quantile]] for stored summary columns. */
  def quantileCol(summaryCol: Column, q: Double): Column = {
    val f = org.apache.spark.sql.functions.udf {
      (s: Seq[Seq[Double]]) => if (s == null) Double.NaN else quantile(s, q)
    }
    f(summaryCol)
  }
}
