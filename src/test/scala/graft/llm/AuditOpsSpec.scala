package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 audit operators: preference-data consistency + length
  * bias (RLHF prep), Luhn-validated PII, tokenizer fertility.
  */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cycleAudit finds exactly the planted 3-cycle, canonically rotated") {
    // prompt 1: a>b>c transitive (no cycle); prompt 2: x>y>z>x cycle
    // ids: a=10,b=11,c=12; x=20,y=21,z=22
    val prefs = Seq(
      (1L, 10L, 11L), (1L, 11L, 12L), (1L, 10L, 12L),
      (2L, 20L, 21L), (2L, 21L, 22L), (2L, 22L, 20L),
      (2L, 20L, 21L) // duplicate judgment must not double-report
    ).toDF("p", "winner", "loser")
    val out = Preference.cycleAudit(prefs, "p", "winner", "loser").collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 20L, 21L, 22L)) // anchored at the smallest id, edge order kept
  }

  test("cycleAudit: flipping one edge of a transitive tournament plants cycles") {
    // 4 responses ranked 1>2>3>4; flip (1,4) -> 4>1 creates cycles
    // through every intermediate: (1,2,4) and (1,3,4)
    val edges = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield if ((a, b) == (1L, 4L)) (9L, b, a) else (9L, a, b)
    val out = Preference.cycleAudit(edges.toDF("p", "winner", "loser"),
      "p", "winner", "loser")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 2L, 4L), (1L, 3L, 4L)))
  }

  test("lengthBias counts longer-wins and ties, drops dangling references") {
    val prefs = Seq(
      (1L, 10L, 11L), // winner longer (30 > 20)
      (1L, 12L, 10L), // winner shorter (10 < 30)
      (1L, 13L, 12L), // tie (10 = 10)
      (1L, 10L, 99L)  // loser has no length row -> dropped
    ).toDF("p", "winner", "loser")
    val lens = Seq((10L, 30L), (11L, 20L), (12L, 10L), (13L, 10L))
      .toDF("id", "len")
    val r = Preference.lengthBias(prefs, lens, "p", "winner", "loser",
      "id", "len").collect().head
    assert(r.getAs[Long]("n_pairs") == 3)
    assert(r.getAs[Long]("n_longer_wins") == 1)
    assert(r.getAs[Long]("n_ties") == 1)
    assert(math.abs(r.getAs[Double]("longer_win_rate") - 0.5) < 1e-9)
  }

  test("luhnValid separates issuable card numbers from digit noise") {
    val cases = Seq(
      ("4539578763621486", true),  // valid Visa test number
      ("4539578763621487", false), // broken check digit
      ("378282246310005", true),   // valid 15-digit Amex
      ("4111111111111111", true),
      ("1234567890123456", false))
    val out = cases.map(_._1).toDF("s")
      .select(col("s"), Corpus.luhnValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (s, exp) => assert(out(s) == exp, s) }
  }

  test("piiAudit counts candidates vs Luhn-valid cards, emails, phones") {
    val df = Seq(
      (1L, "pay 4539578763621486 or 1234567890123456 mail a@b.co x"),
      (2L, "call +1-555-123-4567 twice +1-555-123-4567"),
      (3L, "clean text, no pii at all")).toDF("id", "t")
    val out = Corpus.piiAudit(df, "id", "t").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) == ((2, 1, 1, 0)))
    assert(out(2L) == ((0, 0, 0, 2)))
    assert(out(3L) == ((0, 0, 0, 0)))
  }

  test("tokenBudget: tempered weights, targets, and epoch counts by hand") {
    // two sources, 80 and 20 tokens; target 300, tau = 1 (natural mix
    // -> weight = share, epochs = 3.0 everywhere)
    val docs = Seq.tabulate(8)(i => (i.toLong, "w " * 9 + "w", "big")) ++
      Seq.tabulate(2)(i => (100L + i, "w " * 9 + "w", "small"))
    val out = Corpus.tokenBudget(docs.toDF("id", "t", "src"), "t", "src",
      targetTokens = 300L, tau = 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("big").getAs[Long]("tokens_available") == 80)
    assert(math.abs(out("big").getAs[Double]("weight") - 0.8) < 1e-9)
    assert(out("big").getAs[Long]("tokens_target") == 240)
    assert(math.abs(out("big").getAs[Double]("epochs") - 3.0) < 1e-9)
    assert(out("small").getAs[Long]("tokens_target") == 60)
    // tau < 1 shifts weight toward the small source
    val tempered = Corpus.tokenBudget(docs.toDF("id", "t", "src"), "t",
      "src", 300L, tau = 0.5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    assert(tempered("small") > 0.2 && tempered("big") < 0.8)
  }

  test("signalCorr: perfectly correlated signals report 1, constants 0") {
    // texts where chars and tokens rise together exactly: k words of
    // one char -> length 2k-1, tokens k (affine -> corr 1); zero
    // punctuation everywhere -> z constant -> corr 0 by convention
    val docs = (1L to 5L).map(k => (k, Seq.fill(k.toInt)("a").mkString(" "), "s"))
    val r = TextAnalysis.signalCorr(docs.toDF("id", "t", "src"), "t", "src")
      .collect().head
    assert(r.getAs[Long]("n_docs") == 5)
    assert(math.abs(r.getAs[Double]("corr_chars_tokens") - 1.0) < 1e-9)
    assert(r.getAs[Double]("corr_chars_punct") == 0.0)
    assert(r.getAs[Double]("corr_tokens_punct") == 0.0)
  }

  test("interleaveSources: positions are a permutation that round-robins sources") {
    // sources a(3 docs), b(1), c(2): block 1 = one doc of each (pos
    // 1-3), block 2 = a and c (b exhausted), block 3 = a alone
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"),
      (5L, "c"), (6L, "c")).toDF("id", "src")
    val out = Corpus.interleaveSources(docs, "id", "src").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._3).sorted.toSeq == (1L to 6L))
    val bySrcSeq = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(Seq(bySrcSeq(("a", 1L)), bySrcSeq(("b", 1L)), bySrcSeq(("c", 1L)))
      .sorted == Seq(1L, 2L, 3L)) // block 1 holds exactly positions 1-3
    assert(Seq(bySrcSeq(("a", 2L)), bySrcSeq(("c", 2L))).sorted ==
      Seq(4L, 5L))                // block 2: b is exhausted
    assert(bySrcSeq(("a", 3L)) == 6L)
    // source-ordered within a block
    assert(bySrcSeq(("a", 1L)) < bySrcSeq(("b", 1L)))
    assert(bySrcSeq(("b", 1L)) < bySrcSeq(("c", 1L)))
  }

  test("blocklistScan: whole-word case-insensitive category counts") {
    val docs = Seq(
      (1L, "Visit the CASINO for poker"),   // 2 gambling hits
      (2L, "pokerface is a different word"), // \b keeps this clean
      (3L, "cheap pills pills pills"),       // 3 pharma hits
      (4L, "nothing to see")).toDF("id", "t")
    val out = Corpus.blocklistScan(docs, "id", "t", Seq(
        "gambling" -> Seq("casino", "poker"),
        "pharma" -> Seq("pills")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((2L, 0L, true)))
    assert(out(2L) == ((0L, 0L, false)))
    assert(out(3L) == ((0L, 3L, true)))
    assert(out(4L) == ((0L, 0L, false)))
    // regex metachars in words must be escaped, not interpreted
    val meta = Corpus.blocklistScan(Seq((1L, "a.b literal")).toDF("id", "t"),
      "id", "t", Seq("x" -> Seq("a.b")))
      .collect().head
    assert(meta.getLong(1) == 1L)
    val nohit = Corpus.blocklistScan(Seq((1L, "axb not literal")).toDF("id", "t"),
      "id", "t", Seq("x" -> Seq("a.b")))
      .collect().head
    assert(nohit.getLong(1) == 0L)
  }

  test("curationPipeline: precedence duplicate > low_quality > contaminated > split") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten eleven"),
      (2L, "one two three four five six seven eight nine ten eleven"), // dup of 1
      (3L, "tiny"),                                                    // low quality
      (4L, "alpha beta gamma delta epsilon zeta eta theta SECRET BENCH EVAL QUESTION ANSWER ROW KEY HASH"),
      (5L, "totally fine document with plenty of words to pass the ten word gate easily")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "SECRET BENCH EVAL QUESTION ANSWER ROW KEY HASH extra words")
    ).toDF("doc_id", "text")
    val out = Corpus.curationPipeline(docs, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) != "duplicate" && out(2L) == "duplicate") // min id kept
    assert(out(3L) == "low_quality")
    assert(out(4L) == "contaminated") // shares the planted 8-gram
    assert(Set("train", "val", "test")(out(5L)))
    assert(Set("train", "val", "test")(out(1L)))
  }

  test("noveltyScore: shared grams subtract from novelty exactly") {
    // docs 1 and 2 share one 3-gram ("a b c"); doc 3 is fully novel
    val docs = Seq(
      (1L, "a b c d e"),   // grams: abc bcd cde -> abc shared
      (2L, "x y a b c"),   // grams: xya yab abc -> abc shared
      (3L, "p q r s t")).toDF("id", "t")
    val out = Corpus.noveltyScore(docs, "id", "t", k = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 2L)))
    assert(out(2L) == ((3L, 2L)))
    assert(out(3L) == ((3L, 3L)))
  }

  test("splitLeakage counts fingerprints shared across split pairs") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"),    // dup across train/val
      (3L, "same text"),                       // third copy in test
      (4L, "unique a"), (5L, "unique b")).toDF("id", "t")
    val splits = Seq((1L, "train"), (2L, "val"), (3L, "test"),
      (4L, "train"), (5L, "train")).toDF("id", "split")
    val out = Corpus.splitLeakage(docs, splits, "id", "t", "split")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // 'same text' fp present in all three splits -> 3 ordered-< pairs
    assert(out == Map(("test", "train") -> 1L, ("test", "val") -> 1L,
      ("train", "val") -> 1L))
  }

  test("sourceOverlap reports shared fps with per-side totals") {
    val docs = Seq(
      (1L, "sa", "dup one"), (2L, "sb", "dup one"),  // shared
      (3L, "sa", "only a"), (4L, "sb", "only b"),
      (5L, "sb", "also only b")).toDF("id", "src", "t")
    val r = Corpus.sourceOverlap(docs, "id", "t", "src").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "sa" && row.getString(1) == "sb")
    assert(row.getLong(2) == 1L)  // one shared fp
    assert(row.getLong(3) == 2L)  // sa has 2 distinct fps
    assert(row.getLong(4) == 3L)  // sb has 3
  }

  test("embeddingHygiene classifies null/ragged/nan/zero-norm exactly once") {
    val rows = Seq(
      (1L, "g", Seq(1.0f, 2.0f)),            // ok
      (2L, "g", null),                       // null
      (3L, "g", Seq(1.0f)),                  // ragged
      (4L, "g", Seq(Float.NaN, 1.0f)),       // nan
      (5L, "g", Seq(0.0f, 0.0f)),            // zero norm
      (6L, "g", Seq(Float.NaN)),             // ragged AND nan -> ragged only
      (7L, "g", Seq(0.0f)))                  // ragged AND zero -> ragged only
    val df = rows.toDF("id", "grp", "v")
    val r = Similarity.embeddingHygiene(df, "v", "grp", expectedDim = 2)
      .collect().head
    assert(r.getAs[Long]("n_vecs") == 7)
    assert(r.getAs[Long]("n_null") == 1)
    assert(r.getAs[Long]("n_ragged") == 3)
    assert(r.getAs[Long]("n_nan") == 1)
    assert(r.getAs[Long]("n_zero_norm") == 1)
    assert(r.getAs[Long]("n_ok") == 1)
  }

  test("clusterSizeHistogram includes the singleton row and doc totals") {
    // labeling: component 10 has 3 members, component 20 has 2;
    // corpus total 10 -> 5 singletons
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L)).toDF("id", "component")
    val out = TextDedup.clusterSizeHistogram(clusters, total = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ((5L, 5L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
    // a fully-clustered corpus emits no singleton row
    val none = TextDedup.clusterSizeHistogram(clusters, total = 5L)
      .collect().map(_.getLong(0)).toSet
    assert(none == Set(2L, 3L))
  }

  test("langConsistency: mislabeled rows land off-diagonal with shares") {
    val docs = Seq(
      (1L, "the of and to in is it for", "en"),  // en detected, en declared
      (2L, "the of and to in is it for", "fr"),  // en detected, fr declared
      (3L, "le la et les des une dans", "fr"),   // fr detected
      (4L, "zzz qqq xxx", "en")                  // und
    ).toDF("id", "t", "lang")
    val out = TextAnalysis.langConsistency(docs, "t", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(("en", "en")) == ((1L, 0.5, true)))
    assert(out(("en", "und")) == ((1L, 0.5, false)))
    assert(out(("fr", "en")) == ((1L, 0.5, false)))
    assert(out(("fr", "fr")) == ((1L, 0.5, true)))
  }

  test("readability: hand-computed Flesch on a known sentence") {
    // "The cat sat. It ran away." -> 6 words, 2 sentences,
    // vowel groups: e,a,a,I,a,a,ay = 7 syllables
    val df = Seq((1L, "The cat sat. It ran away."), (2L, "")).toDF("id", "t")
    val r = TextAnalysis.readability(df, "id", "t").collect()
    assert(r.length == 1) // empty doc excluded
    val row = r.head
    assert(row.getAs[Long]("n_words") == 6)
    assert(row.getAs[Long]("n_sentences") == 2)
    assert(row.getAs[Long]("n_syllables") == 7)
    val exp = 206.835 - 1.015 * 3.0 - 84.6 * (7.0 / 6.0)
    assert(math.abs(row.getAs[Double]("flesch") -
      math.rint(exp * 1e4) / 1e4) < 1e-9)
  }

  test("sourceGramOverlap: shared grams and jaccard exact on a tiny corpus") {
    // k=3: sa doc grams {abc, bcd}; sb doc grams {abc, xyz-ish}
    val docs = Seq(
      ("sa", "a b c d"),       // grams: "a b c", "b c d"
      ("sb", "a b c z"),       // grams: "a b c", "b c z"
      ("sc", "p q r s")).toDF("src", "t")
    val out = Corpus.sourceGramOverlap(docs, "t", "src", k = 3).collect()
    assert(out.length == 1) // only (sa, sb) share anything
    val r = out.head
    assert((r.getString(0), r.getString(1)) == (("sa", "sb")))
    assert(r.getLong(2) == 1L)          // shared: "a b c"
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L)
    assert(math.abs(r.getDouble(5) - 1.0 / 3) < 1e-6) // 1/(2+2-1)
  }

  test("tokenFertility: fragmenting scripts show high fertility") {
    val docs = Seq(
      (1L, "plain latin words here"),       // 4 words, 4 subwords
      (2L, "中文测试 内容很多"),    // 2 words, 8 single-char subwords
      (3L, "")                              // zero words -> excluded
    ).toDF("id", "t")
    val out = TextAnalysis.tokenFertility(docs, "id", "t").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("latin", "han"))
    assert(math.abs(out("latin").getAs[Double]("fertility") - 1.0) < 1e-9)
    assert(math.abs(out("han").getAs[Double]("fertility") - 4.0) < 1e-9)
    assert(out("han").getAs[Long]("n_docs") == 1)
  }
}
