package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time kernels for text shingling and MinHash, called from
  * generated code (one static call per row — the pattern Spark itself
  * uses for string kernels). The higher-order-function formulation of
  * shingling (`transform(sequence(...), i -> concat_ws(...))`) is
  * CodegenFallback and pays per-ELEMENT interpretation overhead
  * (lambda-variable binding + boxing); measured ~17 µs/shingle vs
  * <0.1 µs here, which dominated the near-dup pipeline at sf0.1.
  */
object TextShingleOps {

  private val SPACE = UTF8String.fromString(" ")

  /** Distinct k-word shingles of `text` split on single spaces —
    * identical semantics to the previous HOF formulation (and the
    * DuckDB oracle in queries/Llm.scala): `split(text, " ")`, grams
    * joined with one space, first-occurrence order, whole text when
    * the doc has fewer than k words.
    */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    // splitSQL(-1) is what the SQL split() expression calls — keeps
    // trailing empty strings, matching the previous HOF formulation.
    val words = text.splitSQL(SPACE, -1)
    if (words.length < k)
      return new GenericArrayData(Array[Any](text))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val gram = new Array[UTF8String](k)
    var i = 0
    while (i + k <= words.length) {
      var o = 0
      while (o < k) { gram(o) = words(i + o); o += 1 }
      seen.add(UTF8String.concatWs(SPACE, gram: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray())
  }

  /** All contiguous k-word grams of `text` split on single spaces,
    * duplicates KEPT in document order (the occurrence-counting
    * variant of [[shingles]] — a frequency census needs every
    * occurrence, not the distinct set); empty array when the doc has
    * fewer than k words.
    */
  def grams(text: UTF8String, k: Int): ArrayData = {
    val words = text.splitSQL(SPACE, -1)
    if (words.length < k)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - k + 1)
    val gram = new Array[UTF8String](k)
    var i = 0
    while (i + k <= words.length) {
      var o = 0
      while (o < k) { gram(o) = words(i + o); o += 1 }
      out(i) = UTF8String.concatWs(SPACE, gram: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Contiguous k-character grams of a token (duplicates kept, string
    * order; empty for tokens shorter than k chars). Positions are
    * Unicode code points (UTF8String.substring), not bytes, so
    * multi-byte text pairs correctly. The per-token kernel behind BPE
    * pair statistics — one static call per row, no HOF lambda.
    */
  def charGrams(word: UTF8String, k: Int): ArrayData = {
    val n = word.numChars()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i + k <= n) {
      out(i) = word.substring(i, i + k)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent element pairs of a symbol array as `left`␟`right` strings
    * (US-unit-separator joined; callers filter tokens containing ␟ at
    * ingest). The per-word kernel behind BPE training's pair census.
    */
  private val pairSep = UTF8String.fromString("\u001f")
  def adjacentPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.concat(arr.getUTF8String(i), pairSep,
        arr.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One left-to-right BPE merge pass: every adjacent (`a`, `b`) in the
    * symbol array becomes the single symbol `a+b` (non-overlapping,
    * leftmost-first — the Sennrich et al. 2016 apply order).
    */
  def mergePair(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val buf = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && arr.getUTF8String(i) == a && arr.getUTF8String(i + 1) == b) {
        buf.add(UTF8String.concat(a, b)); i += 2
      } else { buf.add(arr.getUTF8String(i)); i += 1 }
    }
    new GenericArrayData(buf.toArray)
  }

  private val NEWLINE = UTF8String.fromString("\n")

  /** First occurrence of each line of `text` (split on newline), in
    * document order — the within-document repetition-removal kernel
    * (Rae et al. 2021 §A.2 "repeated lines", document-local). One
    * O(lines) pass over a LinkedHashSet; the previous indexed-filter
    * HOF formulation re-scanned the prefix per line (O(lines²)) AND
    * paid CodegenFallback per-element lambda binding — ~7× DuckDB on
    * the l53 bench. Matches `split(text, "\n")` semantics exactly
    * (trailing empty lines kept via splitSQL(-1)).
    */
  def distinctLines(text: UTF8String): ArrayData = {
    val lines = text.splitSQL(NEWLINE, -1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < lines.length) { seen.add(lines(i)); i += 1 }
    if (seen.size == lines.length) new GenericArrayData(lines.asInstanceOf[Array[Any]])
    else new GenericArrayData(seen.toArray())
  }

  /** `numHashes` MinHash signature values of a string array in one
    * pass: sig[j] = min over elements of xxhash64(j, elem) (the same
    * values `min(xxhash64(lit(j), col))` aggregates to — int-typed j
    * folded at seed 42, then the string bytes). Evaluating all J
    * hashes per element here removes the explode + groupBy shuffle
    * the aggregation formulation needs.
    */
  def minhash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      // SQL callers may pass array<string> with nulls — skip them
      // (matches min() aggregation semantics, which ignores nulls)
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashUnsafeBytes(base, off, len, XXH64.hashInt(j, 42L))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(sig)
  }
}

/** Codegen'd distinct k-word shingle set of a text column
  * (SURVEY.md §2.6 L2 building block; reference near-dup semantics
  * are the devkit-external north star in BASELINE.json).
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs (string, k>=1), got ${child.dataType.sql}, k=$k")

  override def nullSafeEval(t: Any): Any =
    TextShingleOps.shingles(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextShingleOps.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Codegen'd contiguous k-word gram list (duplicates kept, document
  * order; empty for docs shorter than k words) — the occurrence-
  * counting sibling of [[WordShingles]].
  */
case class WordGrams(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_grams needs (string, k>=1), got ${child.dataType.sql}, k=$k")

  override def nullSafeEval(t: Any): Any =
    TextShingleOps.grams(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextShingleOps.grams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

/** Codegen'd contiguous k-character gram list over a string column —
  * the character-level sibling of [[WordGrams]] (BPE pair counting,
  * char-n-gram language ID features).
  */
case class CharGrams(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_grams needs (string, k>=1), got ${child.dataType.sql}, k=$k")

  override def nullSafeEval(t: Any): Any =
    TextShingleOps.charGrams(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextShingleOps.charGrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

/** Codegen'd adjacent-pair list over a symbol-array column (BPE pair
  * census): element i becomes `arr[i]`␟`arr[i+1]`.
  */
case class AdjacentPairs(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_adjacent_pairs needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(t: Any): Any =
    TextShingleOps.adjacentPairs(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextShingleOps.adjacentPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)
}

/** Codegen'd single BPE merge pass over a symbol-array column: every
  * adjacent (`a`, `b`) collapses to `a+b`, leftmost-first.
  */
case class MergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_merge_pair needs array<string>, got ${other.sql}")
  }

  @transient private lazy val aU = UTF8String.fromString(a)
  @transient private lazy val bU = UTF8String.fromString(b)

  override def nullSafeEval(t: Any): Any =
    TextShingleOps.mergePair(t.asInstanceOf[ArrayData], aU, bU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mergeA", aU)
    val bRef = ctx.addReferenceObj("mergeB", bU)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextShingleOps.mergePair($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MergePair =
    copy(child = newChild)
}

/** Codegen'd MinHash signature (array<long> of `numHashes` values)
  * over a string-array column — one pass, no shuffle.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash needs (array<string>, n>=1), got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    TextShingleOps.minhash(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextShingleOps.minhash($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Codegen'd first-occurrence line set of a text column (split on
  * newline, order preserved) — the within-document repetition-removal
  * kernel behind `Corpus.dropRepeatedLines`.
  */
case class DistinctLines(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_distinct_lines needs string, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    TextShingleOps.distinctLines(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextShingleOps.distinctLines($c)")

  override protected def withNewChildInternal(newChild: Expression): DistinctLines =
    copy(child = newChild)
}

object TextShingles {
  def shingles(text: Column, k: Int = 3): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(WordShingles(GraftShim.toExpression(spark, text), k))
  }
  def grams(text: Column, k: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(WordGrams(GraftShim.toExpression(spark, text), k))
  }
  def minhashSig(shingles: Column, numHashes: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(
      MinHashSig(GraftShim.toExpression(spark, shingles), numHashes))
  }
  def charGrams(word: Column, k: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(CharGrams(GraftShim.toExpression(spark, word), k))
  }
  def adjacentPairs(syms: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(AdjacentPairs(GraftShim.toExpression(spark, syms)))
  }
  def distinctLines(text: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(DistinctLines(GraftShim.toExpression(spark, text)))
  }
  def mergePair(syms: Column, a: String, b: String): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(MergePair(GraftShim.toExpression(spark, syms), a, b))
  }
}
