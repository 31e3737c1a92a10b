package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormSpec extends SparkSpec {

  private def nfcOf(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("t").select(UnicodeNorm.nfc(col("t"))).collect().map(_.getString(0)).toSeq
  }
  private def nfkcOf(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("t").select(UnicodeNorm.nfkc(col("t"))).collect().map(_.getString(0)).toSeq
  }

  test("NFC composes combining sequences and leaves ASCII untouched") {
    val decomposedCafe = "café"     // e + combining acute
    val decomposedRing = "Ångstrom" // A + combining ring
    assert(nfcOf(Seq(decomposedCafe)) == Seq("café"))
    assert(nfcOf(Seq(decomposedRing)) == Seq("Ångstrom"))
    assert(nfcOf(Seq("plain ascii text")) == Seq("plain ascii text"))
  }

  test("NFKC additionally folds compatibility forms") {
    // ligature fi, fullwidth A, superscript two
    assert(nfkcOf(Seq("ﬁsh")) == Seq("fish"))
    assert(nfkcOf(Seq("ＡBC")) == Seq("ABC"))
    assert(nfkcOf(Seq("x²")) == Seq("x2"))
    // NFC leaves compatibility forms alone
    assert(nfcOf(Seq("ﬁsh")) == Seq("ﬁsh"))
  }

  test("normalization is idempotent and null-safe") {
    import spark.implicits._
    val inputs = Seq("café", "ﬁsh Å", "mixed café Ａ",
      "", "plain")
    val once = nfkcOf(inputs)
    assert(nfkcOf(once) == once)
    val withNull = Seq[(java.lang.Long, String)]((1L, null), (2L, "ok"))
      .toDF("id", "t")
      .select(col("id"), UnicodeNorm.nfc(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(withNull(1L).isEmpty && withNull(2L).contains("ok"))
  }

  test("normalized fingerprints unify composed/decomposed twins for dedup") {
    import spark.implicits._
    val docs = Seq((1L, "café life"), (2L, "café life"),
      (3L, "other")).toDF("doc_id", "text")
    val fps = graft.llm.Corpus.normalizeReport(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(fps(1L) == fps(2L), "NFC twins must share a fingerprint")
    assert(fps(1L) != fps(3L))
    // and the changed flag marks only the decomposed doc
    val changed = graft.llm.Corpus.normalizeReport(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(changed == Map(1L -> false, 2L -> true, 3L -> false))
  }
}
