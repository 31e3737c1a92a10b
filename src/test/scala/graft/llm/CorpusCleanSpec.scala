package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-7 corpus-cleaning operators:
  * C4 page rules, global line dedup, duplicate-span detection, DSIR
  * importance weights, and the DEFLATE compression-ratio signal.
  */
class CorpusCleanSpec extends SparkSpec {
  import spark.implicits._

  test("htmlToText strips blocks/tags and decodes entities in order") {
    val html = "<html><head><style>p{x}</style><script src=\"a.js\">var a;</script>" +
      "</head><body><!-- note --><p>A &amp;amp; B &lt;i&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p></body></html>"
    val out = Seq(html).toDF("h")
      .select(Corpus.htmlToText(col("h")).as("t")).collect()(0).getString(0)
    // &amp; decodes LAST: '&amp;amp;' -> '&amp;' literal, not '&'
    assert(out == "A &amp; B <i> \"q\" 's' end")
  }

  test("canonicalUrl lowercases scheme+host, strips tracking/fragment/default port") {
    val cases = Seq(
      "HTTP://Ex.COM:80/P?utm_source=a&q=1&gclid=z#f" -> "http://ex.com/P?q=1",
      "HTTPS://A.Org:443/x?utm_campaign=c" -> "https://a.org/x",
      "http://a.com:8080/y#frag" -> "http://a.com:8080/y", // non-default port kept
      "https://B.net/KeepCase/Path" -> "https://b.net/KeepCase/Path",
      "http://c.io/?fbclid=only" -> "http://c.io/")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), Corpus.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"for $in") }
  }

  test("dropRepeatedLines keeps first occurrence per document, order intact") {
    val docs = Seq(
      (1L, "a\nb\na\nc\nb\na"),
      (2L, "only\nlines"),
      (3L, "")).toDF("doc_id", "text")
    val out = Corpus.dropRepeatedLines(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 6L, 3L, "a\nb\nc"),
      (2L, 2L, 2L, "only\nlines"),
      (3L, 1L, 1L, "")))
  }

  test("c4Clean applies the line rules and page gates exactly") {
    val docs = Seq(
      // 4 lines: 2 keepable, 1 no-punct, 1 too-short => page kept
      (1L, "one two three.\nfour five six!\nno punct line\na b."),
      // curly brace anywhere kills the page
      (2L, "one two three.\nfour five {six}."),
      // lorem ipsum kills the page
      (3L, "lorem ipsum dolor sit amet.\ngood solid line here."),
      // only 1 keepable line < minLines=2 => dropped
      (4L, "just one good line.\nshort\nnope"),
      // javascript line is dropped (case-insensitive), leaving 1 < 2
      (5L, "Uses JavaScript everywhere today.\nanother good line here.")
    ).toDF("doc_id", "text")
    val out = Corpus.c4Clean(docs, "doc_id", "text",
        minLineWords = 3, minLines = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, "one two three.\nfour five six!")))
  }

  test("dedupLines keeps each line at its first (doc, pos) occurrence only") {
    val docs = Seq(
      (1L, "x\ny\nz"),
      (2L, "y\nx\nw"),
      (3L, "x\ny")
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, "x\ny\nz"),   // first doc keeps everything
      (2L, 3L, 1L, "w"),         // y, x already seen at doc 1
      (3L, 2L, 0L, "")))         // nothing left — row survives, empty
  }

  test("duplicateSpans covers exactly the token positions under repeated k-grams") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),
      (3L, "z y x w")
    ).toDF("doc_id", "text")
    val out = Corpus.duplicateSpans(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // "a b c" occurs twice (docs 1 and 2) => positions 0..2 covered there
    assert(out.toSeq == Seq(
      (1L, 4L, 3L, 0.75),
      (2L, 4L, 3L, 0.75),
      (3L, 4L, 0L, 0.0)))
  }

  test("duplicateSpans counts within-document repeats too") {
    val docs = Seq((1L, "p q p q p q"), (2L, "r s t u v w")).toDF("doc_id", "text")
    // doc 1 grams: "p q p"(0), "q p q"(1), "p q p"(2), "q p q"(3) — all
    // duplicated within the doc itself => every position covered
    val out = Corpus.duplicateSpans(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 1.0), (2L, 0.0)))
  }

  test("importanceWeights matches the hand-computed smoothed log-ratio") {
    val raw = Seq((1L, "x x"), (2L, "y y")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") === 1L)
    val out = TextAnalysis.importanceWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // model: x (c_raw 2, c_tgt 2), y (2, 0); t_raw 4, t_tgt 2, V 2
    // x: ln(3/4) - ln(3/6) = ln(1.5); y: ln(1/4) - ln(3/6) = ln(0.5)
    val wx = BigDecimal(math.log(1.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wy = BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq((1L, 2L, wx), (2L, 2L, wy)))
  }

  test("importanceWeights ranks target-like documents above off-target ones") {
    val docs = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "documents")
    val target = docs.filter(col("source") === "src0")
    val scored = TextAnalysis.importanceWeights(docs, target, "doc_id", "text")
    val joined = scored.join(docs.select("doc_id", "source"), "doc_id")
    val means = joined.groupBy(col("source") === "src0")
      .agg(avg("dsir_weight")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false)) // target slice scores higher on average
  }

  test("compression ratio: empty is 1.0, repetition < prose, deterministic") {
    val rep = Array.fill(60)("the cat sat on the mat").mkString(" ")
    val prose = "Compression filtering separates boilerplate from prose " +
      "because deflate finds long repeats cheap while varied natural " +
      "language keeps most of its information content under coding."
    // high-entropy junk: printable chars driven by a fixed LCG
    val junk = {
      var s = 12345L
      (1 to 200).map { _ =>
        s = (s * 6364136223846793005L + 1442695040888963407L)
        (33 + math.floorMod(s, 94L)).toChar
      }.mkString
    }
    val df = Seq((0L, ""), (1L, rep), (2L, prose), (3L, junk)).toDF("doc_id", "text")
    val out = TextAnalysis.compressionSignals(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(0L) == 1.0)
    assert(out(1L) < out(2L))     // repetition compresses far better
    assert(out(2L) < out(3L))     // junk barely compresses
    assert(out(3L) > 0.9)
    val again = TextAnalysis.compressionSignals(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == again)
  }
}
