package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 retrieval, linear quality-classifier scoring, and training-
  * shard assignment (l75/l76/l77).
  */
class RetrievalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Fixtures.table(spark, sf, "documents")

  test("bm25 matches the hand-computed formula on a three-doc corpus") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "cat sat mat"),
      (2L, "cat cat dog runs fast here"),
      (3L, "dog runs")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(tiny, "doc_id", "text", Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toList
      .sortBy(_._1)

    // n=3 docs, avgdl = 11/3, dfreq(cat)=2
    val avgdl = 11.0 / 3.0
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def score(tf: Long, dl: Long): Double =
      math.rint(idf * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6) / 1e6
    assert(got.map(_._1) == List(1L, 2L))
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(1L)._2 == score(1, 3))
    assert(byId(2L)._2 == score(2, 6))
    // the tf=2 doc outscores the tf=1 doc and takes rank 1
    assert(byId(2L)._2 > byId(1L)._2)
    assert(byId(2L)._3 == 1L && byId(1L)._3 == 2L)
  }

  test("bm25 rank is dense per term, capped at k, ordered by score") {
    val out = TextAnalysis.bm25(docs, "doc_id", "text",
      Seq("vector", "hash"), k = 5).collect()
    val byTerm = out.groupBy(_.getString(0))
    assert(byTerm.keySet == Set("vector", "hash"))
    byTerm.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toList == (1L to sorted.length).toList)
      assert(sorted.length <= 5)
      // scores non-increasing down the ranking
      val scores = sorted.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("quality classifier keeps fluent stopword-bearing text, drops punctuation noise") {
    import spark.implicits._
    val frame = Seq(
      (1L, "the cat is on the mat and it is a good day in the sun"),
      (2L, "!!! ??? ,,, ;;; ((( )))"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityClassifier(frame, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(1L)._2, s"fluent text should pass, got ${out(1L)._1}")
    assert(!out(2L)._2, s"punctuation noise should fail, got ${out(2L)._1}")
    assert(!out(3L)._2, "empty text should fail")
    out.values.foreach { case (s, _) => assert(s >= 0.0 && s <= 1.0) }
  }

  test("bm25 served from a parquet round-tripped index equals the inline path") {
    val dir = tmpDir("bm25idx")
    val (postings, doclens, stats) =
      TextAnalysis.buildBm25Index(docs, "doc_id", "text")
    postings.write.parquet(s"$dir/postings.parquet")
    doclens.write.parquet(s"$dir/doclens.parquet")
    stats.write.parquet(s"$dir/stats.parquet")
    val terms = Seq("vector", "hash", "stream")
    val inline = TextAnalysis.bm25(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val served = TextAnalysis.bm25AgainstIndex(
        spark.read.parquet(s"$dir/postings.parquet"),
        spark.read.parquet(s"$dir/doclens.parquet"),
        spark.read.parquet(s"$dir/stats.parquet"),
        "doc_id", terms, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(served == inline)
    assert(inline.nonEmpty)
  }

  test("trained NB classifier separates planted classes and handles unseen tokens") {
    import spark.implicits._
    val labeled = Seq(
      (1L, "buy cheap pills now buy now", "spam"),
      (2L, "cheap pills cheap offer now", "spam"),
      (3L, "the meeting notes from tuesday", "ham"),
      (4L, "notes about the tuesday meeting agenda", "ham"),
      // held-back style doc with one UNSEEN token — classified by the
      // seen tokens, unseen one falls to the smoothed floor
      (5L, "cheap pills zzzunseen", "spam")).toDF("doc_id", "text", "label")
    val out = TextAnalysis.nbClassifier(labeled, "doc_id", "text", "label")
      .filter(col("pred")).select("doc_id", "label").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "spam", 2L -> "spam", 3L -> "ham",
      4L -> "ham", 5L -> "spam"))
    // exactly one pred per doc, scores finite
    val all = TextAnalysis.nbClassifier(labeled, "doc_id", "text", "label")
      .collect()
    assert(all.count(_.getBoolean(4)) == 5)
    assert(all.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }

  test("perplexity buckets: terciles balanced per lang, repetitive text lands in head") {
    import spark.implicits._
    // 9 docs in one lang: three made of the corpus's most common
    // tokens (high logp -> head), three mixed, three of hapax tokens
    val docs = (
      (1 to 3).map(i => (i.toLong, "aa bb aa bb aa bb", "xx")) ++
      (4 to 6).map(i => (i.toLong, s"aa bb mid$i mid$i", "xx")) ++
      (7 to 9).map(i => (i.toLong, s"rare${i}a rare${i}b rare${i}c rare${i}d", "xx"))
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert((1 to 3).forall(i => out(i.toLong) == "head"), s"$out")
    assert((7 to 9).forall(i => out(i.toLong) == "tail"), s"$out")
    assert(out.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map("head" -> 3, "middle" -> 3, "tail" -> 3))
  }

  test("shard assignment equals the naive global-window prefix sum") {
    val budget = 64L
    val got = Corpus.assignShards(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), budget, orderBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // driver-side oracle: one global ordering, exclusive prefix sum
    val naive = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"),
        pmod(col("doc_id") * lit(2654435761L), lit(1048576L)).as("hk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    var pre = 0L
    val expected = naive.map { case (id, n, _) =>
      val shard = math.floor(pre / budget.toDouble).toLong
      pre += n
      (id, n, shard)
    }.toSet
    assert(got.toSet == expected)
    assert(got.map(_._3).distinct.length > 1, "fixture should span shards")
  }

  test("PMI ranks an always-attached pair above frequent-but-independent words") {
    import spark.implicits._
    // 'san francisco' always adjacent; 'the'/'cat' frequent but mixed
    val docs = (1 to 30).map { i =>
      (i.toLong, s"the cat w$i san francisco the dog w${i + 100} cat the")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "doc_id", "text",
      k = 10, minCount = 5L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3), r.getLong(4)))
    val byPair = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(byPair.contains(("francisco", "san")))
    // the planted collocation outranks the independent frequent pair
    val sanPmi = byPair(("francisco", "san"))
    byPair.get(("cat", "the")).foreach(p => assert(sanPmi > p))
    assert(out.head._4 == 1L)
  }

  test("dataset card aggregates volume, language spread, and keep rate per source") {
    import spark.implicits._
    val frame = Seq(
      (1L, "the cat is on the mat and it is a fine day", "en", "web"),
      (2L, "the dog is in the house and it is warm", "en", "web"),
      (3L, "!!! ??? ,,, ;;;", "und", "web"),
      (4L, "short doc", "de", "books")).toDF("doc_id", "text", "lang", "source")
    val card = Corpus.datasetCard(frame, "source", "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val web = card("web")
    assert(web.getLong(1) == 3 && card("books").getLong(1) == 1)
    assert(web.getLong(2) == 12 + 10 + 4, "token volume")
    assert(web.getLong(4) == 2, "en + und")
    // two fluent docs keep, the punctuation doc drops
    assert(web.getDouble(8) == math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(card("books").getLong(4) == 1)
  }

  test("stratified top-k: exactly k per stratum, stable under repartitioning") {
    val base = docs.select(col("doc_id"), col("source"))
    val a = Corpus.stratifiedTopK(base, "source", "doc_id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val perSource = a.groupBy(_._2).view.mapValues(_.size).toMap
    val sizes = base.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(perSource.getOrElse(src, 0) == math.min(5L, n).toInt, s"source $src")
    }
    a.foreach { case (_, _, rank) => assert(rank >= 1 && rank <= 5) }
    val b = Corpus.stratifiedTopK(base.repartition(13), "source", "doc_id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("writeShards: one file per shard, deterministic order, lossless round trip") {
    val dir = tmpDir("shards") + "/out"
    val summary = Corpus.writeShards(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), tokensPerShard = 512L, dir = dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(summary.size > 1, "fixture should span shards")
    // layout: shard=N dirs, exactly one parquet file each
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == summary.size)
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: ${files.length} files")
    }
    // round trip: every doc exactly once, token totals match the
    // assignment, every full shard is within one doc of the budget
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    val assign = Corpus.assignShards(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), 512L)
      .groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(summary.view.mapValues(_._2).toMap == assign)
  }

  test("shard assignment is invariant to input partitioning") {
    val a = Corpus.assignShards(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), 64L, orderBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = Corpus.assignShards(docs.repartition(7), "doc_id",
      TextAnalysis.tokenCount(col("text")), 64L, orderBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("rrfFusion: a doc ranked well by both retrievers beats single-list wins") {
    import spark.implicits._
    // query 1: doc 10 is rank 2 in BOTH lists; docs 11/12 are rank 1
    // in exactly one list. RRF(k=60): 10 -> 2/62 > 1/61 -> fused #1.
    val a = Seq((1L, 11L, 1L), (1L, 10L, 2L), (1L, 13L, 3L)).toDF("q", "id", "rank")
    val b = Seq((1L, 12L, 1L), (1L, 10L, 2L), (1L, 14L, 3L)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFusion(Seq(a, b), "q", "id", "rank", k = 60, topK = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out.head == ((10L, 1L)))
    // ties (11 and 12 both 1/61) break to the smaller id
    assert(out(1) == ((11L, 2L)) && out(2) == ((12L, 3L)))
    // exact rational arithmetic: 2/62 rounded to 6 dp
    val s = Retrieval.rrfFusion(Seq(a, b), "q", "id", "rank", 60, 5)
      .filter(col("id") === 10L).head().getAs[Double]("rrf_score")
    assert(math.abs(s - math.rint(2.0 / 62 * 1e6) / 1e6) < 1e-12)
  }

  test("retrievalMetrics: first-hit rank, reciprocal rank, hit@k") {
    import spark.implicits._
    val ranking = Seq(
      (1L, 100L, 1L), (1L, 101L, 2L), (1L, 102L, 3L),   // rel at rank 2
      (2L, 200L, 1L), (2L, 201L, 2L)                    // no rel retrieved
    ).toDF("q", "id", "rank")
    val gold = Seq((1L, 101L), (1L, 102L), (2L, 999L)).toDF("q", "id")
    val out = Retrieval.retrievalMetrics(ranking, gold, "q", "id", "rank")
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_relevant_retrieved") == 2)
    assert(q1.getAs[Long]("first_hit_rank") == 2)
    assert(math.abs(q1.getAs[Double]("reciprocal_rank") - 0.5) < 1e-9)
    assert(!q1.getAs[Boolean]("hit_at_1") && q1.getAs[Boolean]("hit_at_5"))
    val q2 = out(2L)
    assert(q2.getAs[Long]("n_relevant_retrieved") == 0)
    assert(q2.isNullAt(q2.fieldIndex("first_hit_rank")))
    assert(q2.getAs[Double]("reciprocal_rank") == 0.0)
    assert(!q2.getAs[Boolean]("hit_at_10"))
  }

  test("ndcgAtK: perfect ordering scores 1, inverted ordering less") {
    import spark.implicits._
    val graded = Seq((1L, 10L, 3L), (1L, 11L, 1L)).toDF("q", "id", "grade")
    val perfect = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("q", "id", "rank")
    val inverted = Seq((1L, 11L, 1L), (1L, 10L, 2L)).toDF("q", "id", "rank")
    val p = Retrieval.ndcgAtK(perfect, graded, "q", "id", "rank", "grade")
      .head().getAs[Double]("ndcg")
    val i = Retrieval.ndcgAtK(inverted, graded, "q", "id", "rank", "grade")
      .head().getAs[Double]("ndcg")
    assert(math.abs(p - 1.0) < 1e-9)
    // inverted: dcg = 1/log2(2) + 7/log2(3); idcg = 7 + 1/log2(3)
    val exp = (1.0 + 7.0 / (math.log(3) / math.log(2))) /
      (7.0 + 1.0 / (math.log(3) / math.log(2)))
    assert(math.abs(i - math.rint(exp * 1e6) / 1e6) < 1e-9)
    // a query with no graded docs reports 0.0, not null
    val none = Retrieval.ndcgAtK(perfect,
      Seq((9L, 1L, 1L)).toDF("q", "id", "grade"), "q", "id", "rank", "grade")
      .head().getAs[Double]("ndcg")
    assert(none == 0.0)
  }

  test("zipfFit recovers the slope of an exactly power-law census") {
    import spark.implicits._
    // craft a corpus whose token frequencies are freq(r) = 2^(10-r):
    // ln freq = ln(2^10) - r ln 2 ... not linear in ln r; instead use
    // freq(r) = floor(1000 / r) ~ slope -1 over ranks 1..20
    val docs = (1 to 20).flatMap(r =>
      Seq.fill(1000 / r)(s"tok$r")).mkString(" ")
    val out = TextAnalysis.zipfFit(Seq(Tuple1(docs)).toDF("t"), "t", topR = 20)
      .head()
    assert(out.getAs[Long]("n_ranks") == 20)
    val slope = out.getAs[Double]("slope")
    assert(slope < -0.9 && slope > -1.1, s"slope $slope should be ~ -1")
    assert(out.getAs[Double]("r2") > 0.99)
  }

  test("vocabCoverageCurve: coverage is monotone and exact on a known census") {
    import spark.implicits._
    // freqs: a×6, b×3, c×1 -> top-1 covers 0.6, top-2 covers 0.9
    val text = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).mkString(" ")
    val out = TextAnalysis.vocabCoverageCurve(
        Seq(Tuple1(text)).toDF("t"), "t", sizes = Seq(1, 2, 10))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == 0.6 && out(2L) == 0.9 && out(10L) == 1.0)
  }

  test("lengthDrift: identical corpora give ks 0; a planted shift is detected") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, Seq.fill(10 + (i % 5).toInt)("w").mkString(" ")))
      .toDF("id", "t")
    val same = TextAnalysis.lengthDrift(docs, docs, "t").head()
    assert(same.getAs[Double]("ks") == 0.0)
    // truncate half the docs to 3 tokens -> mass moves below length 10
    val trunc = docs.select(col("id"),
      when(col("id") % 2 === 0, "w w w").otherwise(col("t")).as("t"))
    val drift = TextAnalysis.lengthDrift(docs, trunc, "t").head()
    assert(math.abs(drift.getAs[Double]("ks") - 0.5) < 1e-6)
    assert(drift.getAs[Long]("n_old") == 50 && drift.getAs[Long]("n_new") == 50)
  }
}
