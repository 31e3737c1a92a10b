package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Wave-9 operators: Procrustes alignment, markdown cleanup,
  * containment pairs.
  */
class AlignSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------- symEig / procrustesW

  test("symEig diagonalizes a known symmetric matrix") {
    val (eig, v) = Align.symEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(eig.sorted.zip(Array(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-10 })
    // columns are orthonormal
    val dot01 = v(0)(0) * v(0)(1) + v(1)(0) * v(1)(1)
    assert(math.abs(dot01) < 1e-10)
  }

  private def mulT(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    Array.tabulate(d, d)((i, j) => (0 until d).map(k => a(k)(i) * b(k)(j)).sum)
  }

  test("procrustesW recovers a planted rotation and is orthogonal") {
    val d = 6
    val rng = new scala.util.Random(7)
    // planted rotation: product of a few Givens rotations
    var r = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for ((p, q, th) <- Seq((0, 1, 0.4), (2, 3, 1.1), (4, 5, -0.7), (1, 4, 0.3))) {
      val g = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
      g(p)(p) = math.cos(th); g(q)(q) = math.cos(th)
      g(p)(q) = -math.sin(th); g(q)(p) = math.sin(th)
      val nr = Array.tabulate(d, d)((i, j) => (0 until d).map(k => r(i)(k) * g(k)(j)).sum)
      r = nr
    }
    val x = Array.fill(200)(Array.fill(d)(rng.nextGaussian()))
    val y = x.map(v => Array.tabulate(d)(j => (0 until d).map(i => v(i) * r(i)(j)).sum))
    // M = X^T Y
    val m = Array.ofDim[Double](d, d)
    for (row <- x.indices; i <- 0 until d; j <- 0 until d)
      m(i)(j) += x(row)(i) * y(row)(j)
    val w = Align.procrustesW(m.flatten.toSeq, d)
    // W^T W = I
    val wtw = mulT(w, w)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(wtw(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-8,
        s"WtW($i)($j) = ${wtw(i)(j)}")
    // W = R
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(w(i)(j) - r(i)(j)) < 1e-8, s"W($i)($j) vs R")
  }

  test("procrustesReport aligns a rotated corpus to ~zero residual, noise survives") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.Fixtures.table(spark, sf, "embeddings")
    val rotated = emb.select(col("vec_id"), col("label"),
      graft.queries.Llm.blockRotate(col("embedding")).as("embedding"))
    val rep = Align.procrustesReport(emb, rotated, "vec_id", "embedding", "label")
      .collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val raw = r.getAs[Double]("resid_raw")
      val aligned = r.getAs[Double]("resid_aligned")
      assert(raw > 0.01, s"rotation should move vectors (raw=$raw)")
      assert(aligned < 1e-4, s"alignment should absorb the rotation (aligned=$aligned)")
    }
    // with per-vector noise ON TOP of the rotation, alignment still
    // recovers most of the drift but cannot take residual to zero
    val noisy = rotated.select(col("vec_id"), col("label"),
      transform(col("embedding"), (x, i) =>
        x + (pmod(col("vec_id") * 31 + i.cast("long") * 17, lit(7)) - 3).cast("double") * 0.01
      ).as("embedding"))
    val rep2 = Align.procrustesReport(emb, noisy, "vec_id", "embedding", "label")
      .collect()
    rep2.foreach { r =>
      val raw = r.getAs[Double]("resid_raw")
      val aligned = r.getAs[Double]("resid_aligned")
      assert(aligned < raw / 2, s"aligned=$aligned raw=$raw")
      assert(aligned > 0.0001, "noise cannot be aligned away")
    }
  }

  test("procrustesReport tolerates corrupt rows (null / ragged vectors)") {
    val good = (0L until 50L).map(i =>
      (i, (i % 3).toInt, Array.tabulate(4)(j => (i + j).toFloat)))
    val oldV = (good :+ ((90L, 0, null.asInstanceOf[Array[Float]]))
      :+ ((91L, 1, Array(1f, 2f))))  // ragged dim
      .toDF("vec_id", "label", "embedding")
    val newV = oldV // identity refresh: residuals must be exactly 0
    val rep = Align.procrustesReport(oldV, newV, "vec_id", "embedding", "label")
      .collect()
    // 90 (null) dropped; 91 (dim 2 ≠ majority 4) dropped; no crash
    assert(rep.map(_.getAs[Long]("n")).sum == 50)
    rep.foreach(r => assert(r.getAs[Double]("resid_aligned") < 1e-9))
  }

  // -------------------------------------------------- markdownToText

  test("markdownToText strips markdown furniture and keeps prose") {
    val md =
      """# Title
        |
        |Intro **bold** and *em* text with `code span`.
        |
        |```
        |val dropped = true
        |```
        |
        |- first [link text](https://x.example/a)
        |1. second ![alt words](https://x.example/i.png)
        |> quoted line
        |---
        |tail""".stripMargin
    val out = Seq(Tuple1(md)).toDF("md")
      .select(Corpus.markdownToText(col("md")).as("t"))
      .as[String].head()
    assert(out == "Title Intro bold and em text with code span. " +
      "first link text second alt words quoted line tail")
  }

  // -------------------------------------------------- containmentPairs

  test("containmentPairs finds an excerpt symmetric jaccard misses") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 20).map(i => s"w$i").mkString(" ") // 1/3 prefix
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, long), (2L, excerpt), (3L, other)).toDF("id", "text")
    val pairs = TextDedup.containmentPairs(df, "id", "text", k = 8,
        minContainment = 0.8, probes = 3)
      .as[(Long, Long, Double)].collect().toSet
    // excerpt ⊂ long at containment 1.0, one direction only
    assert(pairs.contains((2L, 1L, 1.0)), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 2L))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // and symmetric jaccard on the same grams is hopeless for the pair
    val sh = graft.functions.TextShingles.shingles(col("text"), 8)
    val g = df.select(col("id"), sh.as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val jac = g(2L).intersect(g(1L)).size.toDouble / g(2L).union(g(1L)).size
    assert(jac < 0.3, s"jaccard=$jac")
  }

  test("containmentPairs catches exact duplicates in both directions") {
    val t = (1 to 30).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, t), (2L, t)).toDF("id", "text")
    val pairs = TextDedup.containmentPairs(df, "id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }
}
