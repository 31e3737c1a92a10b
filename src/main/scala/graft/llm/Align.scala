package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.udaf

/** Embedding-space alignment between corpus versions (orthogonal
  * Procrustes): when the embedder is retrained, every stored vector
  * rotates/reflects in a way that poisons cosine comparisons against
  * the old index — but the optimal orthogonal map W minimizing
  * ‖XW − Y‖_F has the closed form W = UVᵀ from the SVD of XᵀY
  * (Schönemann 1966). Aligning the OLD index through W lets a 100 TB
  * ANN index survive an embedder refresh without re-embedding the
  * corpus — the incremental-index companion to [[Similarity]]'s
  * persisted IVF/PQ paths.
  *
  * Scale shape: the cross-covariance XᵀY is ONE map-side-combined
  * aggregation whose buffer is d² doubles (64-dim → 32 KB) — rows
  * never collect; the d×d SVD runs on the driver (the only place a
  * d×d matrix lives); the rotation applies as d codegen'd dot
  * products per row, embarrassingly parallel. Same driver/executor
  * split as the IVF quantizer: the model is small, the data never
  * moves.
  */
object Align {

  /** Σ x·yᵀ over paired vectors, flattened row-major to d² doubles.
    * Map-side partial aggregation applies: each partition ships one
    * d²-double buffer, never its rows.
    */
  object OuterProductSum
      extends Aggregator[(Seq[Float], Seq[Float]), Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.emptyDoubleArray
    override def reduce(b: Array[Double], v: (Seq[Float], Seq[Float])): Array[Double] = {
      val (x, y) = v
      val d = x.length
      val acc = if (b.isEmpty) new Array[Double](d * d) else b
      var i = 0
      while (i < d) {
        val xi = x(i).toDouble
        var j = 0
        while (j < d) { acc(i * d + j) += xi * y(j); j += 1 }
        i += 1
      }
      acc
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a }
    override def finish(r: Array[Double]): Seq[Double] = r.toSeq
    // native primitive-array encoder (UnsafeArrayData copy), not Java
    // serialization — the buffer crosses the wire once per partition
    // per merge and the ObjectOutputStream framing tripled that cost
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    def apply(x: Column, y: Column): Column = udaf(OuterProductSum).apply(x, y)
  }

  /** Cyclic-Jacobi eigendecomposition of a symmetric d×d matrix
    * (driver-side; d is the embedding dim, small by design).
    * Returns (eigenvalues, eigenvectors as columns).
    */
  private[llm] def symEig(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-14 && sweep < 64) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off += m(p)(q) * m(p)(q)
        if (math.abs(m(p)(q)) > 1e-18) {
          val theta = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
          // signum(0) is 0, which would null the rotation exactly when
          // the two diagonal entries are equal — the one case that
          // NEEDS the full 45° rotation; treat θ = 0 as positive
          val sign = if (theta >= 0.0) 1.0 else -1.0
          val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val mkp = m(k)(p); val mkq = m(k)(q)
            m(k)(p) = c * mkp - s * mkq
            m(k)(q) = s * mkp + c * mkq
          }
          for (k <- 0 until d) {
            val mpk = m(p)(k); val mqk = m(q)(k)
            m(p)(k) = c * mpk - s * mqk
            m(q)(k) = s * mpk + c * mqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }

  /** Orthogonal Procrustes solution W = UVᵀ for min‖XW − Y‖ given
    * M = XᵀY (driver-side d×d): eigendecompose MᵀM → V, Σ²; recover
    * U = MVΣ⁻¹ (rank-deficient directions fall back to the identity
    * map — they carry no cross-covariance evidence either way).
    */
  private[llm] def procrustesW(mFlat: Seq[Double], d: Int): Array[Array[Double]] = {
    val m = Array.tabulate(d, d)((i, j) => mFlat(i * d + j))
    val mtm = Array.tabulate(d, d)((i, j) => {
      var s = 0.0; var k = 0
      while (k < d) { s += m(k)(i) * m(k)(j); k += 1 }
      s
    })
    val (eig, vMat) = symEig(mtm)
    val order = eig.indices.sortBy(i => -eig(i))
    val sig = order.map(i => math.sqrt(math.max(eig(i), 0.0)))
    val eps = 1e-9 * (sig.headOption.getOrElse(1.0) max 1.0)
    // u_k = M v_k / σ_k (columns); degenerate directions → v_k itself
    val u = Array.ofDim[Double](d, d)
    val vOrd = Array.ofDim[Double](d, d)
    for ((src, k) <- order.zipWithIndex) {
      for (i <- 0 until d) vOrd(i)(k) = vMat(i)(src)
      if (sig(k) > eps) {
        for (i <- 0 until d) {
          var s = 0.0; var j = 0
          while (j < d) { s += m(i)(j) * vMat(j)(src); j += 1 }
          u(i)(k) = s / sig(k)
        }
      } else {
        for (i <- 0 until d) u(i)(k) = vOrd(i)(k)
      }
    }
    // W = U Vᵀ
    Array.tabulate(d, d)((i, j) => {
      var s = 0.0; var k = 0
      while (k < d) { s += u(i)(k) * vOrd(j)(k); k += 1 }
      s
    })
  }

  /** Apply a d×d map as d codegen'd dot products: out[j] = x · W[:,j]. */
  def rotate(vec: Column, w: Array[Array[Double]]): Column = {
    val d = w.length
    array((0 until d).map { j =>
      val colJ = array((0 until d).map(i => lit(w(i)(j))): _*)
      Similarity.dot(vec, colJ)
    }: _*)
  }

  /** Fit W on the paired (old, new) vectors and report per-label mean
    * squared residual with and without alignment. Output:
    * (label, n, resid_raw, resid_aligned) — resid_aligned ≈ 0 when
    * the embedder refresh was (near-)orthogonal, and the gap
    * quantifies how much of the drift alignment can absorb.
    */
  def procrustesReport(oldV: DataFrame, newV: DataFrame,
      idCol: String, vecCol: String, labelCol: String): DataFrame = {
    // corrupt rows (null vectors, ragged dims) must not reach the
    // Aggregator: its tight loop indexes y by x's length, so a short y
    // would throw on an executor instead of being data
    // the pair join is read twice (fit + residual report): cache it
    // instead of re-running the join/scan per action
    val paired = oldV.select(col(idCol), col(labelCol),
        col(vecCol).cast("array<float>").as("x"))
      .join(newV.select(col(idCol),
        col(vecCol).cast("array<float>").as("y")), idCol)
      .filter(col("x").isNotNull && col("y").isNotNull &&
        size(col("x")) === size(col("y")) && size(col("x")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // mixed dimensionalities across rows would misalign the flattened
    // buffer (or throw in merge); fit on the MAJORITY dim (ties break
    // to the larger dim), not whatever row head() happens to return —
    // and compute the per-dim cross-covariance in the SAME grouped
    // pass (one bounded row per distinct dim), so the dim probe and
    // the XᵀY fit cost one action instead of two.
    // Zero clean pairs (disjoint ids, all-null/ragged vectors) is a
    // data-quality outcome, not a crash: return the empty report.
    val fitRow = paired.groupBy(size(col("x")).as("_d"))
      .agg(count(lit(1)).as("count"),
        OuterProductSum(col("x"), col("y")).as("m"))
      .orderBy(col("count").desc, col("_d").desc)
      .head(1).headOption
    val dOpt = fitRow.map(_.getInt(0))
    if (dOpt.isEmpty) {
      val sp = oldV.sparkSession
      return sp.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(labelCol,
            oldV.schema(labelCol).dataType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("resid_raw",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("resid_aligned",
            org.apache.spark.sql.types.DoubleType))))
    }
    val d = dOpt.get
    val clean = paired.filter(size(col("x")) === d)
    val mFlat = fitRow.get.getSeq[Double](2)
    val w = procrustesW(mFlat, d)
    // codegen'd elementwise fold — bit-identical to the interpreted
    // aggregate(zip_with(...)) formulation (same accumulation order)
    def sqDist(a: Column, b: Column): Column =
      graft.functions.FloatSqDist.sqDist(a, b)
    // the report is a handful of label rows: materialize it eagerly so
    // the pair cache can be released (exception-safely) before return
    // — the no-leak contract
    clean
      .withColumn("xa", rotate(col("x").cast("array<double>"), w))
      .groupBy(labelCol)
      .agg(count(lit(1)).as("n"),
        round(avg(sqDist(col("x").cast("array<double>"),
          col("y").cast("array<double>"))), 6).as("resid_raw"),
        round(avg(sqDist(col("xa"), col("y").cast("array<double>"))), 6)
          .as("resid_aligned"))
      .localCheckpoint()
    } finally paired.unpersist()
  }
}
