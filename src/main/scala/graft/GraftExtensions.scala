package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions, GraftShim}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.udaf
import graft.functions.{Base32Fixed, VectorAvg}

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL functions so `.sql` nodes can call them.
  *
  * New sessions:
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  * or config: spark.sql.extensions=graft.GraftExtensions
  * Running sessions: GraftExtensions.register(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.expressionFunctions.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[Base32Fixed].getName, name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
}

object GraftExtensions {
  private[graft] val expressionFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_base32" -> (exprs => Base32Fixed(exprs.head)),
    "graft_dot" -> (exprs => graft.functions.FloatDot(exprs(0), exprs(1))),
    "graft_sqdist" -> (exprs => graft.functions.FloatSqDist(exprs(0), exprs(1))),
    "graft_cosine" -> (exprs => graft.functions.FloatCosine(exprs(0), exprs(1))),
    "graft_shingles" -> (exprs => graft.functions.WordShingles(
      exprs.head, exprs.lift(1).map(foldToInt).getOrElse(3))),
    "graft_minhash" -> (exprs => graft.functions.MinHashSig(
      exprs(0), foldToInt(exprs(1)))),
    "graft_sign_lsh" -> (exprs => graft.functions.SignLshCodes(
      exprs(0), foldToInt(exprs(1)), foldToInt(exprs(2)),
      exprs.lift(3).map(e => foldToInt(e).toLong).getOrElse(42L))))

  private def foldToInt(e: Expression): Int = {
    // non-foldable args (e.g. graft_minhash(sh, some_col)) would throw an
    // opaque UnsupportedOperationException from AttributeReference.eval
    if (!e.foldable) throw new IllegalArgumentException(
      s"expected integer literal, got non-constant expression ${e.sql}")
    e.eval(null) match {
      case i: Int => i
      case l: Long => Math.toIntExact(l)
      case other => throw new IllegalArgumentException(
        s"expected integer literal, got $other")
    }
  }

  /** Register everything on an already-running session: the raw
    * expression functions plus UDAF-based vector functions. Idempotent
    * — re-registering an existing name would log a SimpleFunctionRegistry
    * "replaced a previously registered function" warning per function
    * per query (VERDICT r3 item 6).
    */
  def register(spark: SparkSession): Unit = {
    expressionFunctions.foreach { case (name, builder) =>
      if (!spark.catalog.functionExists(name))
        GraftShim.registerTempFunction(spark, name, builder)
    }
    if (!spark.catalog.functionExists("vector_avg"))
      spark.udf.register("vector_avg", udaf(VectorAvg))
    if (!spark.catalog.functionExists("graft_simhash"))
      spark.udf.register("graft_simhash", udaf(graft.functions.SimHashAgg))
  }
}
