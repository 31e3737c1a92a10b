package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer: train + encode. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "the unbelievable retraining of unbelievable believers",
    "believers keep believing the unbelievable story",
    "retraining believers is believable work",
    "the story of the believable retraining")
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("training emerges multi-char pieces for repeated substrings") {
    val model = TextAnalysis.unigramLmTrain(corpus, "text",
      vocabSize = 60, maxPieceLen = 6, minCount = 2, emIters = 3)
    val pieces = model.map(_._1).toSet
    assert(model.nonEmpty)
    // the 'believ'/'beli'-family substring is frequent enough that SOME
    // multi-char piece of it must survive pruning
    assert(pieces.exists(p => p.length > 1 && "believable".contains(p)),
      s"no believ-family piece in ${pieces.filter(_.length > 1)}")
    // every character of the corpus is in the vocab (coverage)
    val chars = corpus.as[(Long, String)].collect()
      .flatMap(_._2.replace(" ", "")).toSet
    chars.foreach(c => assert(pieces.contains(c.toString), s"missing char $c"))
    // probabilities normalize
    val z = model.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(z - 1.0) < 1e-9)
  }

  test("encoding round-trips: concatenated pieces rebuild each word") {
    val model = TextAnalysis.unigramLmTrain(corpus, "text",
      vocabSize = 60, minCount = 2, emIters = 2)
    val enc = TextAnalysis.unigramEncode(corpus, "doc_id", "text", model)
    val toks = enc.select("doc_id", "tokens").as[(Long, Seq[String])]
      .collect().toMap
    val texts = corpus.as[(Long, String)].collect().toMap
    texts.foreach { case (id, t) =>
      assert(toks(id).mkString("") == t.split("\\s+").mkString(""),
        s"doc $id round trip")
    }
    // fertility is sane: at most one piece per character
    enc.select("fertility").as[Double].collect()
      .foreach(f => assert(f >= 1.0 - 1e-9 && f < 12.0))
  }

  test("training is deterministic under repartitioning") {
    val a = TextAnalysis.unigramLmTrain(corpus, "text",
      vocabSize = 60, minCount = 2, emIters = 2)
    val b = TextAnalysis.unigramLmTrain(corpus.repartition(5), "text",
      vocabSize = 60, minCount = 2, emIters = 2)
    assert(a == b)
  }

  test("unknown characters segment per-char instead of failing") {
    val model = TextAnalysis.unigramLmTrain(corpus, "text",
      vocabSize = 60, minCount = 2, emIters = 1)
    val out = TextAnalysis.unigramEncode(
      Seq((9L, "zzq believers")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .select("tokens").as[Seq[String]].head()
    assert(out.mkString("") == "zzqbelievers")
    assert(out.take(3) == Seq("z", "z", "q")) // unk chars fall to singles
  }
}
