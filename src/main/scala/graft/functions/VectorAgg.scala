package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of an embedding column (`array<float>`) — the
  * typed-Aggregator extension surface (SURVEY.md §2.5 U5). Used for
  * centroid computation (IVF coarse quantizers, cluster summaries).
  *
  * Buffer is (element-wise double sums, count); merge is element-wise —
  * map-side partial aggregation applies, so a 100 TB groupBy shuffles
  * one (dim+1)-double buffer per group per partition, not raw vectors.
  */
object VectorAvg extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    // NULL vectors are ignored, matching SQL avg() semantics — a
    // null-text crawl row must not NPE a corpus-wide centroid job.
    if (v == null) return b
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Column form: vector_avg(embedding). */
  def vectorAvg(c: Column): Column = udaf(VectorAvg).apply(c)
}
