package graft.functions

import graft.SparkSpec

class Base32IdSpec extends SparkSpec {

  test("base32 encoding is fixed-width and order-preserving (property)") {
    val rng = new scala.util.Random(42)
    val samples = (Seq(0L, 1L, 31L, 32L, Long.MaxValue) ++
      Seq.fill(2000)(math.abs(rng.nextLong()))).distinct
    samples.foreach(v => assert(Base32Fixed.encode(v).length == 13))
    val sortedByNum = samples.sorted.map(Base32Fixed.encode)
    assert(sortedByNum == sortedByNum.sorted)
    assert(samples.map(Base32Fixed.encode).distinct.length == samples.length)
  }

  test("expression evaluates through Spark incl. codegen") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).toDF("id")
      .withColumn("b32", Base32Fixed.base32(col("id")))
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq ==
      rows.map(r => Base32Fixed.encode(r.getLong(0))).toSeq)
    // lexicographic order == numeric order
    assert(rows.map(_.getString(1)).sorted.sameElements(rows.map(_.getString(1))))
  }

  test("monotonicId is unique and batch-ordered across partitions") {
    import org.apache.spark.sql.functions._
    val df1 = spark.range(0, 5000, 1, 8).toDF("id")
      .withColumn("mid", Base32Fixed.monotonicId(1L))
    val df2 = spark.range(0, 100, 1, 4).toDF("id")
      .withColumn("mid", Base32Fixed.monotonicId(2L))
    val m1 = df1.select("mid").collect().map(_.getString(0))
    val m2 = df2.select("mid").collect().map(_.getString(0))
    assert((m1 ++ m2).distinct.length == m1.length + m2.length)
    assert(m1.max < m2.min) // later batch sorts strictly after
  }
}
