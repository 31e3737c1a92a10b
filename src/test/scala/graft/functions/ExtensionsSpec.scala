package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("graft_base32 callable from SQL after registration") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("select graft_base32(cast(42 as bigint)) as b").head().getString(0)
    assert(r == Base32Fixed.encode(42L))
    assert(r.length == 13)
  }

  test("graft_sqdist equals the interpreted HOF fold bit-for-bit") {
    graft.GraftExtensions.register(spark)
    val emb = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(200)
    // pair each vector with a shifted copy of itself
    val pairs = emb.select(col("vec_id"),
      col("embedding").as("a"),
      transform(col("embedding"), x => x * 2.0f + 1.0f).as("b"))
    val mismatch = pairs.select(
        FloatSqDist.sqDist(col("a"), col("b")).as("cg"),
        aggregate(zip_with(col("a"), col("b"),
          (p, q) => (p.cast("double") - q.cast("double")) *
            (p.cast("double") - q.cast("double"))),
          lit(0.0), (acc, e) => acc + e).as("hof"))
      .filter(col("cg") =!= col("hof")).count()
    assert(mismatch == 0)
    // SQL registration path, identity distance is exactly 0
    pairs.createOrReplaceTempView("sqdist_ext")
    val z = spark.sql("select graft_sqdist(a, a) as d from sqdist_ext")
      .agg(max("d")).head().getDouble(0)
    assert(z == 0.0)
  }

  test("graft_dot / graft_sqdist propagate NULL on ragged or null-element input") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),        // ragged
      (3, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),  // null elem
      (4, null, Seq[java.lang.Double](3.0, 4.0)))                              // null array
      .toDF("id", "a", "b")
    df.createOrReplaceTempView("nullprop_ext")
    // the zip_with/aggregate formulation the docstrings claim equivalence with
    val hof = aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
      lit(0.0), (acc, e) => acc + e)
    val rows = spark.sql(
        "select id, graft_dot(a, b) as d, graft_sqdist(a, b) as s from nullprop_ext")
      .join(df.select(col("id"), hof.as("hof")), "id")
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(1) && rows(0).getDouble(1) == 11.0)
    rows.drop(1).foreach { r =>
      assert(r.isNullAt(1), s"graft_dot row ${r.getInt(0)} should be NULL")
      assert(r.isNullAt(2), s"graft_sqdist row ${r.getInt(0)} should be NULL")
      assert(r.isNullAt(3), s"HOF reference row ${r.getInt(0)} should be NULL")
    }
    // non-codegen (interpreted) path agrees: eval via a filter on the driver
    val lit2 = org.apache.spark.sql.catalyst.expressions.Literal
      .create(Seq(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
    val lit1 = org.apache.spark.sql.catalyst.expressions.Literal
      .create(Seq(1.0), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
    assert(FloatDot(lit2, lit1).eval(null) == null)
    assert(FloatSqDist(lit2, lit1).eval(null) == null)
    assert(FloatDot(lit2, lit2).eval(null) == 5.0)
  }

  test("vector_avg UDAF from SQL and Column API agree") {
    graft.GraftExtensions.register(spark)
    val emb = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "embeddings")
    emb.createOrReplaceTempView("emb_ext")
    val sqlRes = spark.sql(
      "select label, vector_avg(embedding) as c from emb_ext group by label")
      .select(col("label"), round(element_at(col("c"), 1), 6).as("c0"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val apiRes = emb.groupBy("label")
      .agg(VectorAvg.vectorAvg(col("embedding")).as("c"))
      .select(col("label"), round(element_at(col("c"), 1), 6).as("c0"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(sqlRes == apiRes)
    assert(sqlRes.size == 10)
  }

  test("graft_simhash UDAF from SQL equals the library simhash") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("simhash_ext")
    val sqlRes = spark.sql(
      """select id, graft_simhash(xxhash64(tok)) as h
        |from (select id, explode(split(text, '\\s+')) as tok
        |      from simhash_ext)
        |group by id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val apiRes = graft.llm.TextDedup.simhash(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlRes == apiRes)
  }

  test("GraftExtensions injects functions into a SparkSessionExtensions") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(e) // must not throw; wiring covered above
  }
}
