package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of an embedding column (`array<float>`) — the
  * typed-Aggregator extension surface (SURVEY.md §2.5 U5). Used for
  * centroid computation (IVF coarse quantizers, cluster summaries).
  *
  * Semantics are PER-INDEX: the mean at index i averages the vectors
  * that HAVE an index i — exactly what the SQL formulation
  * (`unnest` + `generate_subscripts` → group by index → avg) computes,
  * so uniform-dim input (the normal case) gets the plain element-wise
  * mean and a ragged mixed-dim input (embedding-model version drift —
  * the schema can't prevent it) aggregates deterministically instead
  * of indexing past a first-row-sized buffer. NULL vectors are
  * ignored, like SQL `avg`. The result length is the max dim seen.
  *
  * Buffer is (per-index double sums, per-index counts); merge is
  * element-wise over the longer of the two — map-side partial
  * aggregation applies, so a 100 TB groupBy shuffles two dim-sized
  * arrays per group per partition, not raw vectors.
  */
object VectorAvg extends Aggregator[Seq[Float], (Array[Double], Array[Long]), Seq[Double]] {

  override def zero: (Array[Double], Array[Long]) =
    (Array.emptyDoubleArray, Array.emptyLongArray)

  private def grown(sums: Array[Double], counts: Array[Long], n: Int)
      : (Array[Double], Array[Long]) =
    if (sums.length >= n) (sums, counts)
    else (java.util.Arrays.copyOf(sums, n), java.util.Arrays.copyOf(counts, n))

  override def reduce(b: (Array[Double], Array[Long]), v: Seq[Float])
      : (Array[Double], Array[Long]) = {
    if (v == null) return b
    val (sums, counts) = grown(b._1, b._2, v.length)
    var i = 0
    while (i < v.length) { sums(i) += v(i); counts(i) += 1; i += 1 }
    (sums, counts)
  }

  override def merge(a: (Array[Double], Array[Long]), b: (Array[Double], Array[Long]))
      : (Array[Double], Array[Long]) = {
    if (b._1.isEmpty) return a
    if (a._1.isEmpty) return b
    val (sums, counts) = grown(a._1, a._2, b._1.length)
    var i = 0
    while (i < b._1.length) { sums(i) += b._1(i); counts(i) += b._2(i); i += 1 }
    (sums, counts)
  }

  override def finish(r: (Array[Double], Array[Long])): Seq[Double] =
    if (r._1.isEmpty) Seq.empty
    else r._1.indices.map(i => r._1(i) / r._2(i))

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]],
      Encoders.javaSerialization[Array[Long]])
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Column form: vector_avg(embedding). */
  def vectorAvg(c: Column): Column = udaf(VectorAvg).apply(c)
}
