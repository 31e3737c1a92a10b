package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Fixtures.table(spark, sf, "documents")
  private def emb = graft.Fixtures.table(spark, sf, "embeddings")

  test("minhash LSH finds the exact >=0.8 jaccard pair set (vs brute force)") {
    val lsh = TextDedup.minhashLshPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = TextDedup.withShingles(docs.select("doc_id", "text"), "text", "sg", 3)
      .select("doc_id", "sg")
    val a = sh.select(col("doc_id").as("id_a"), col("sg").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sg").as("sh_b"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(TextDedup.jaccard(col("sh_a"), col("sh_b")) >= 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute)
    assert(brute.nonEmpty) // fixture contains planted near-dups
  }

  test("near-dup clusters match union-find over brute-force pairs; collapse keeps min-id survivors") {
    val sh = TextDedup.withShingles(docs.select("doc_id", "text"), "text", "sg", 3)
      .select("doc_id", "sg")
    val a = sh.select(col("doc_id").as("id_a"), col("sg").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sg").as("sh_b"))
    val brutePairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(TextDedup.jaccard(col("sh_a"), col("sh_b")) >= 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(brutePairs.nonEmpty)
    // reference components: driver-side union-find on the brute pair set
    val expected = graft.TestOracles.unionFind(brutePairs)
    val got = TextDedup.nearDupClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // collapse: survivors = all docs minus non-min cluster members
    val losers = expected.collect { case (v, c) if v != c => v }.toSet
    val survivors = TextDedup.dropNearDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val allDocs = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == (allDocs -- losers))
  }

  test("simhash: near-dup pairs have small hamming distance, random pairs large") {
    val sims = TextDedup.simhash(docs, "doc_id", "text")
    val nearDups = TextDedup.minhashLshPairs(docs, "doc_id", "text")
    val sA = sims.select(col("id").as("id_a"), col("simhash").as("h_a"))
    val sB = sims.select(col("id").as("id_b"), col("simhash").as("h_b"))
    val dupDist = nearDups.join(sA, "id_a").join(sB, "id_b")
      .select(avg(TextDedup.hamming(col("h_a"), col("h_b")))).head().getDouble(0)
    val randDist = sA.crossJoin(sB).filter(col("id_a") + 250 === col("id_b"))
      .select(avg(TextDedup.hamming(col("h_a"), col("h_b")))).head().getDouble(0)
    assert(dupDist < 8.0, s"near-dup hamming $dupDist should be small")
    assert(randDist > 16.0, s"random-pair hamming $randDist should be large")
  }

  test("portable (md5-bit) simhash keeps the near-dup/random separation") {
    val sims = TextDedup.simhash(docs, "doc_id", "text", portable = true)
    val nearDups = TextDedup.minhashLshPairs(docs, "doc_id", "text")
    val sA = sims.select(col("id").as("id_a"), col("simhash").as("h_a"))
    val sB = sims.select(col("id").as("id_b"), col("simhash").as("h_b"))
    val dupDist = nearDups.join(sA, "id_a").join(sB, "id_b")
      .select(avg(TextDedup.hamming(col("h_a"), col("h_b")))).head().getDouble(0)
    val randDist = sA.crossJoin(sB).filter(col("id_a") + 250 === col("id_b"))
      .select(avg(TextDedup.hamming(col("h_a"), col("h_b")))).head().getDouble(0)
    assert(dupDist < 8.0, s"near-dup hamming $dupDist should be small")
    assert(randDist > 16.0, s"random-pair hamming $randDist should be large")
  }

  test("LSH ANN enriches true neighbors far beyond its candidate volume") {
    // The fixture embeddings are random unit vectors (top-5 neighbors sit
    // at cos≈0.3), the hardest regime for any bucketed ANN. The honest
    // property is enrichment: recall must beat random sampling of the
    // same candidate fraction by a wide margin. (For high-similarity
    // corpora — the near-dup use case — the same config reaches ~1.0
    // recall; see Similarity scaladoc.)
    val q = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val exact = Similarity.bruteForceTopK(q, c, "q_id", "c_id", "q_vec", "c_vec", 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(q, c, "q_id", "c_id", "q_vec", "c_vec", 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    val candidateFraction = 9.0 / 256.0 // 1 own + 8 one-bit-flip probes of 2^8 buckets
    assert(recall >= 2.5 * candidateFraction,
      s"ANN recall $recall should enrich >=2.5x over random ${candidateFraction}")
    // high-similarity regime: every >=0.8-jaccard near-dup-style pair of
    // IDENTICAL vectors would collide with probability 1 — sanity-check
    // that identical vectors always land in the same bucket.
    val planes = Similarity.hyperplanes(64, 8)
    val b = emb.limit(20).select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), planes).as("bucket"))
    val b2 = emb.limit(20).select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), planes).as("bucket"))
    assert(b.collect().map(_.toString).sorted.sameElements(b2.collect().map(_.toString).sorted))
  }

  test("nearDupPairs (LSH prefilter + verify) equals all-pairs on a near-dup corpus") {
    val corpus = graft.queries.Llm.plantedCorpus(emb)
    val got = Similarity.nearDupPairs(corpus, "vec_id", "embedding", minCos = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val brute = a.join(b, col("id_b") > col("id_a"))
      .filter(Similarity.cosine(col("v_a"), col("v_b")) >= 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    // every planted near-duplicate is recovered, nothing else qualifies
    assert(brute == (0L until 100L).map(i => (i, i + 100000L)).toSet)
  }

  test("jlProject preserves pairwise distances within JL distortion; deterministic") {
    import graft.functions.JlProjectFn
    val rows = emb.limit(20)
      .select(col("vec_id"), col("embedding"),
        JlProjectFn.jlProject(col("embedding"), k = 32).as("p"))
      .collect()
      .map(r => (r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getSeq[Double](2).toArray))
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for {
      i <- rows.indices; j <- rows.indices if i < j
      d0 = dist(rows(i)._1, rows(j)._1) if d0 > 0
    } yield dist(rows(i)._2, rows(j)._2) / d0
    assert(ratios.forall(r => r > 0.3 && r < 2.0),
      s"distance ratio escaped JL bounds: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean distortion $mean off unity")
    // fixed seed => bit-identical on re-evaluation
    val again = emb.limit(20)
      .select(JlProjectFn.jlProject(col("embedding"), k = 32)).collect()
      .map(_.getSeq[Double](0).toArray)
    assert(rows.map(_._2).zip(again).forall { case (a, b) => a.sameElements(b) })
  }

  test("jlProject keeps the Achlioptas sign distribution for negative seeds") {
    // project unit basis vectors so each output value IS a matrix entry
    // (±sqrt(3/k) or 0): a signed-% bug would collapse negative-seed
    // residues into [-5,0] and make nearly every nonzero entry -1
    for (seed <- Seq(-7L, -999999L, Long.MinValue / 1234567L)) {
      val d = 60; val k = 16
      val entries = for {
        i <- 0 until d
        v = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array.tabulate(d)(x => if (x == i) 1.0f else 0.0f))
        j <- 0 until k
      } yield graft.functions.JlProjectOps.project(v, k, seed).getDouble(j)
      val n = entries.size.toDouble
      val zeroFrac = entries.count(_ == 0.0) / n
      val posFrac = entries.count(_ > 0.0) / n
      val negFrac = entries.count(_ < 0.0) / n
      assert(zeroFrac > 0.55 && zeroFrac < 0.78, s"seed=$seed zero=$zeroFrac")
      assert(posFrac > 0.08 && posFrac < 0.25, s"seed=$seed pos=$posFrac")
      assert(negFrac > 0.08 && negFrac < 0.25, s"seed=$seed neg=$negFrac")
    }
  }

  test("semDedup: planted copies pruned, no original lost, deterministic") {
    val corpus = graft.queries.Llm.plantedCorpus(emb)
    def keptIds() = Similarity.semDedup(corpus, "vec_id", "embedding", minCos = 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val kept = keptIds()
    // survivors per component are min-id, so no original (id < 100000)
    // can ever lose to its planted copy
    assert((0L until 500L).forall(kept.contains), "an original was dropped")
    // the planted copies sit at cos~0.9997 from their originals; a copy
    // survives only if a cell boundary splits the pair — rare by
    // construction (the IVF recall bar used by the ANN specs)
    val survivingCopies = kept.count(_ >= 100000L)
    assert(survivingCopies <= 5,
      s"$survivingCopies/100 planted copies escaped semantic dedup")
    assert(keptIds() == kept, "semDedup output is not deterministic")
  }

  test("zero-norm vectors (NaN cosine) never pass similarity thresholds or dedup real rows") {
    // A zero-norm embedding (all-zeros vector — real in degenerate crawl
    // data) yields NaN cosine, and BOTH Spark and DuckDB order NaN above
    // every double — so an unguarded `cos >= minCos` silently declares
    // the zero vector a near-dup of everything sharing its LSH bucket /
    // IVF cell, and a dedup then drops real documents. Pin the guards at
    // the three threshold sites (nearDupPairs, semDedup, l12's filter).
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val corpus = graft.queries.Llm.plantedCorpus(emb).select("vec_id", "embedding")
    val zero = spark.range(1).select(lit(900000L).as("vec_id"),
      array_repeat(lit(0.0f), dim).as("embedding"))
    val withZero = corpus.unionByName(zero)
    val pairs = Similarity.nearDupPairs(withZero, "vec_id", "embedding", minCos = 0.99)
    assert(pairs.filter(col("id_a") === 900000L || col("id_b") === 900000L).count() == 0,
      "zero-norm vector leaked through the nearDupPairs threshold")
    val kept = Similarity.semDedup(withZero, "vec_id", "embedding", minCos = 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(900000L),
      "semDedup silently dropped the zero-norm vector as a 'near-dup'")
    assert((0L until 500L).forall(kept.contains), "an original was dropped")
    // the l12 brute-force shape: NaN rows must be filtered, not admitted
    val a = withZero.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = withZero.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val l12 = a.join(b, col("id_b") > col("id_a"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(!isnan(col("cos")) && col("cos") >= 0.4)
    assert(l12.filter(col("id_a") === 900000L || col("id_b") === 900000L).count() == 0)
  }

  test("appendToIvfIndex rejects the empty-corpus sentinel quantizer") {
    // A quantizer trained on an empty corpus is the dim-1 sentinel
    // [[0.0]]; freezing it and appending real vectors would compute a
    // ragged dot -> NULL cell and silently drop every posting. The
    // append path must fail fast instead.
    val none = emb.filter(lit(false))
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val (quantizer, _) = Similarity.buildIvfIndex(none, "c_id", "c_vec")
    val batch = emb.limit(5)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(batch, quantizer, "c_id", "c_vec")
    }
    assert(ex.getMessage.contains("sentinel"))
  }

  test("IVF ANN: planted near-dup queries retrieve their originals; output deterministic") {
    // corpus = raw float fixture; queries = the planted noisy copies
    // (true NN of planted vec_id i+100000 is original i at cos≈0.9997,
    // everything else <=0.55 — unambiguous)
    val corpus = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val queries = graft.queries.Llm.plantedCorpus(emb)
      .filter(col("vec_id") >= 100000L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = Similarity.ivfTopK(queries, corpus,
      "q_id", "c_id", "q_vec", "c_vec", k = 1)
    val hits = top.filter(col("rk") === 1 && col("c_id") === col("q_id") - 100000L)
      .count()
    assert(hits >= 95, s"IVF recalled $hits/100 planted true nearest neighbors")
    val again = Similarity.ivfTopK(queries, corpus,
      "q_id", "c_id", "q_vec", "c_vec", k = 1)
      .collect().map(_.toString).sorted
    assert(top.collect().map(_.toString).sorted.sameElements(again))
  }

  test("IVF-PQ ANN: planted near-dup queries retrieve their originals through the int8 scan") {
    val corpus = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val queries = graft.queries.Llm.plantedCorpus(emb)
      .filter(col("vec_id") >= 100000L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = Similarity.ivfPqTopK(queries, corpus,
      "q_id", "c_id", "q_vec", "c_vec", k = 1)
    val hits = top.filter(col("rk") === 1 && col("c_id") === col("q_id") - 100000L)
      .count()
    assert(hits >= 95, s"IVF-PQ recalled $hits/100 planted true nearest neighbors")
    // quantization must not cost recall vs plain IVF on this corpus:
    // the exact rerank repairs any near-tie the int8 scan flips
    val again = Similarity.ivfPqTopK(queries, corpus,
      "q_id", "c_id", "q_vec", "c_vec", k = 1)
      .collect().map(_.toString).sorted
    assert(top.collect().map(_.toString).sorted.sameElements(again))
  }

  test("persisted IVF index: parquet round-trip answers exactly like the inline path") {
    val corpus = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val inline = Similarity.ivfPqTopK(queries, corpus,
      "q_id", "c_id", "q_vec", "c_vec", k = 5)
      .collect().map(_.toString).sorted
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-spec-").toString
    val (quantizer, postings) = Similarity.buildIvfIndex(corpus, "c_id", "c_vec")
    quantizer.write.parquet(s"$dir/q.parquet")
    postings.write.parquet(s"$dir/p.parquet")
    val stored = Similarity.ivfPqTopKAgainstIndex(queries,
      spark.read.parquet(s"$dir/q.parquet"),
      spark.read.parquet(s"$dir/p.parquet"),
      corpus, "q_id", "c_id", "q_vec", "c_vec", k = 5)
      .collect().map(_.toString).sorted
    assert(stored.sameElements(inline))
    assert(stored.nonEmpty)
    // the stored postings are the compact form: id, cell, int8 code
    val sch = spark.read.parquet(s"$dir/p.parquet").schema
    assert(sch.fieldNames.toSet == Set("c_id", "cell", "code"))
  }

  test("ngram census counts occurrences and doc frequency with a total rank order") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b a b c"),   // "a b"×2, "b a"×1, "b c"×1
      (2L, "a b"),         // "a b"×1
      (3L, "solo"),        // no bigrams
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramTopK(corpus, "doc_id", "text", n = 2, k = 10)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("a b", 3L, 2L, 1L), ("b a", 1L, 1L, 2L), ("b c", 1L, 1L, 3L)))
    // k and minCount both cut
    assert(TextAnalysis.ngramTopK(corpus, "doc_id", "text", 2, 1).count() == 1)
    assert(TextAnalysis.ngramTopK(corpus, "doc_id", "text", 2, 10, minCount = 2)
      .count() == 1)
    // n=1 must not count an empty-string gram for the empty doc —
    // token semantics match unigramLogProb
    val unigrams = TextAnalysis.ngramTopK(corpus, "doc_id", "text", 1, 10)
      .select("gram").collect().map(_.getString(0))
    assert(!unigrams.contains(""))
    assert(unigrams.toSet == Set("a", "b", "c", "solo"))
  }

  test("gopher filter gates on every rule; signals exact on a known doc") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown foxes jumped over and beyond lazy dogs"), // passes
      (2L, "aaaa bbbb cccc dddd eeee ffff"),          // no stopwords
      (3L, "### ... ### ... the and of in is"),       // symbol-heavy + short words
      (4L, ""),
      // 2 '#' + 2 '...' in 20 words: each ratio exactly 0.1 — passes
      // the per-symbol gates (a pooled 0.2 gate would wrongly reject)
      (5L, "# # ... ... the and some more words about dogs cats " +
        "running fast jumping high over fences today okay")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(corpus, "doc_id", "text", minWords = 5L)
      .orderBy("doc_id").collect()
    assert(out(0).getBoolean(7), "normal English sentence must pass")
    assert(!out(1).getBoolean(7), "stopword-free text must fail")
    assert(!out(2).getBoolean(7), "symbol-heavy text must fail")
    assert(!out(3).getBoolean(7), "empty doc must fail")
    assert(out(4).getBoolean(7), "0.1 hash + 0.1 ellipsis must pass separate gates")
    assert(out(4).getDouble(3) == 0.1 && out(4).getDouble(4) == 0.1)
    val d1 = out(0)
    assert(d1.getLong(1) == 10L)                      // n_words
    assert(d1.getDouble(2) == 4.5)                    // 45 chars / 10 words
    assert(d1.getDouble(3) == 0.0 && d1.getDouble(4) == 0.0) // hash, ellipsis
    assert(d1.getDouble(5) == 1.0)                    // alpha-word ratio
    assert(d1.getLong(6) == 2L)                       // 'the', 'and'
  }

  test("unigram log-prob scores common text above rare text; model exact on a toy corpus") {
    import spark.implicits._
    val corpus = Seq((1L, "a a a"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2) // empty doc absent
    // n=5 tokens: p(a)=4/5, p(b)=1/5
    val logp = (x: Double) => math.log(x) / math.log(2.0)
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getDouble(2) == math.rint(logp(0.8) * 1e6) / 1e6)
    assert(out(1).getDouble(2) == math.rint((logp(0.8) + logp(0.2)) / 2 * 1e6) / 1e6)
    assert(out(0).getDouble(2) > out(1).getDouble(2)) // rare-token doc scores lower
  }

  test("incremental near-dup dedup drops exact and fuzzy copies, keeps fresh docs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different corpus text about something else entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),          // exact
      (11L, "oh the quick brown fox jumps over the lazy dog tonight"),       // fuzzy
      (12L, "a genuinely novel document that matches nothing in the corpus")
    ).toDF("doc_id", "text")
    val survivors = TextDedup.nearDupAgainstCorpus(batch, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(12L))
    // empty corpus: everything survives
    val none = TextDedup.nearDupAgainstCorpus(batch, corpus.limit(0), "doc_id", "text")
    assert(none.count() == 3)
  }

  test("duplicate-span removal cuts exactly the positions duplicateSpans counts") {
    import spark.implicits._
    val mismatches = Corpus.removeDuplicateSpans(docs, "doc_id", "text", k = 3)
      .join(Corpus.duplicateSpans(docs, "doc_id", "text", k = 3)
        .select("doc_id", "dup_tokens"), "doc_id")
      .filter(col("n_tokens") - col("n_kept") =!= col("dup_tokens"))
    assert(mismatches.count() == 0)
    // hand-checkable: "a b c" repeats at p=0 and p=4 → positions
    // {0,1,2, 4,5,6} covered, only "x" (p=3) survives
    val toy = Seq(
      (1L, "a b c x a b c"),
      (2L, "unique words only here")).toDF("doc_id", "text")
    val got = Corpus.removeDuplicateSpans(toy, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((7L, 1L, "x")))
    assert(got(2L) == ((4L, 4L, "unique words only here")))
  }

  test("cross-corpus match provenance names the matched corpus doc with its jaccard") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different corpus text about something else entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),    // exact → j=1.0
      (11L, "oh the quick brown fox jumps over the lazy dog tonight"), // fuzzy copy of 1
      (12L, "a genuinely novel document that matches nothing in the corpus")
    ).toDF("doc_id", "text")
    val got = TextDedup.crossCorpusMatches(batch, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      .sortBy(m => (m._1, m._2))
    assert(got.map(m => (m._1, m._2)) == List((10L, 1L), (11L, 1L)))
    assert(got.head._3 == 1.0)              // exact copy
    assert(got(1)._3 >= 0.8 && got(1)._3 < 1.0) // fuzzy copy
    // provenance agrees with the drop decision of nearDupAgainstCorpus
    val dropped = TextDedup.nearDupAgainstCorpus(batch, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == Set(10L, 11L) && !dropped.contains(10L))
  }

  test("contamination report counts shared grams per eval set; clean docs absent") {
    import spark.implicits._
    val eight = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"prefix words then $eight trailing"), // hits benchA doc 10
      (2L, "totally clean document with no benchmark overlap present here"),
      (3L, s"$eight and also alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val benchA = Seq((10L, s"$eight")).toDF("doc_id", "text")
    val benchB = Seq(
      (20L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val got = Corpus.contaminationReport(corpus,
      Seq("A" -> benchA, "B" -> benchB), "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set((1L, "A"), (3L, "A"), (3L, "B")))
    assert(got((1L, "A"))._1 == 1L && got((1L, "A"))._2 == 1L) // exactly the planted 8-gram
    assert(got((3L, "B"))._1 == 1L)
  }

  test("vocab coverage: OOV is exactly the tokens outside the top-k vocabulary") {
    import spark.implicits._
    val toy = Seq(
      (1L, "a a a b b c"), // a,b in top-2; c OOV
      (2L, "a b rare")     // rare OOV
    ).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(toy, "doc_id", "text", topK = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((6L, 1L)))
    assert(got(2L) == ((3L, 1L)))
    // k >= vocabulary size: nothing is OOV
    val full = TextAnalysis.vocabCoverage(toy, "doc_id", "text", topK = 100)
      .agg(sum("n_oov")).head().getLong(0)
    assert(full == 0L)
  }

  test("temperature mix keeps rare sources whole and flattens the share gap") {
    import spark.implicits._
    val skewed = docs.select(col("doc_id"),
      when(col("doc_id") % 10 < 6, "web")
        .when(col("doc_id") % 10 < 9, "books")
        .otherwise("code").as("source"))
    val before = skewed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Corpus.temperatureMix(skewed, "source", "doc_id", tau = 0.5)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the rarest source sets the budget: kept in full (within hash rounding)
    assert(after("code") >= (before("code") * 0.95).toLong)
    // dominant source down-sampled; share gap strictly narrows
    assert(after("web") < before("web"))
    val gapBefore = before("web").toDouble / before("code") // 6x
    val gapAfter = after("web").toDouble / after("code")
    assert(gapAfter < gapBefore)
    // deterministic: same input, same sample
    val again = Corpus.temperatureMix(skewed, "source", "doc_id", tau = 0.5)
    assert(Corpus.temperatureMix(skewed, "source", "doc_id", tau = 0.5)
      .except(again).isEmpty)
  }

  test("split assignment is deterministic, respects weights, covers every row once") {
    val assigned = Corpus.assignSplits(docs.select("doc_id"), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(counts.values.sum == n) // exactly one split per row
    assert(counts("train") > counts.getOrElse("val", 0L))
    assert(counts("train") > counts.getOrElse("test", 0L))
    // pure function of the id: re-evaluation and weight scaling don't move rows
    val again = Corpus.assignSplits(docs.select("doc_id"), "doc_id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0)) // same after normalizing
    assert(assigned.except(again).isEmpty && again.except(assigned).isEmpty)
  }

  test("multimodal feature extraction is deterministic with stable shape") {
    val withPayload = Multimodal.attachPayload(docs, "text")
    val f1 = Multimodal.extractFeatures(withPayload, "payload", dim = 16)
      .select("doc_id", "features").collect()
    assert(f1.forall(_.getSeq[Float](1).length == 16))
    val f2 = Multimodal.extractFeatures(withPayload, "payload", dim = 16)
      .select("doc_id", "features").collect()
    assert(f1.map(_.toString).sorted.sameElements(f2.map(_.toString).sorted))
  }

  test("image payloads are real PNGs: header decode and pixel features match the plant") {
    import spark.implicits._
    val base = Seq(0L, 1L, 17L, 200L).toDF("doc_id")
    val meta = Multimodal.imageMeta(
      Multimodal.attachImagePayload(base, "doc_id"), "payload")
      .select("doc_id", "img_width", "img_height", "img_format").collect()
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 16).toInt + 1)
      assert(r.getInt(2) == ((id * 7) % 16).toInt + 1)
      assert(r.getString(3) == "png")
    }
    // the bytes really are a PNG container (magic), not the meta struct echoed back
    val bytes = Multimodal.attachImagePayload(base, "doc_id")
      .select("payload").head().getAs[Array[Byte]](0)
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    // the fast header parse agrees with a full ImageIO decode on every
    // container it claims (PNG/GIF/BMP/JPEG), and rejects non-images
    for (fmt <- Seq("png", "gif", "bmp", "jpeg")) {
      val img = new java.awt.image.BufferedImage(13, 7,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val os = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, os), s"encoder for $fmt")
      val hm = Multimodal.headerMeta(os.toByteArray)
      assert(hm == ((13, 7, fmt)), s"headerMeta on $fmt gave $hm")
    }
    assert(Multimodal.headerMeta("not an image at all".getBytes) == null)
    // image mime → features come from REAL decoded pixels: w/h lead, mean
    // channels within 0-255, and recomputing from the planted pixel
    // formula matches exactly
    val feats = Multimodal.extractFeatures(
      Multimodal.attachImagePayload(base, "doc_id").withColumn("mime", col("payload_meta.mime")),
      "payload", dim = 8, mimeCol = Some("mime"))
      .select("doc_id", "features").collect()
    feats.foreach { r =>
      val id = r.getLong(0)
      val f = r.getSeq[Float](1)
      val (w, h) = ((id % 16).toInt + 1, ((id * 7) % 16).toInt + 1)
      assert(f(0) == w.toFloat && f(1) == h.toFloat)
      val expectedMeanR = (for (y <- 0 until h; x <- 0 until w)
        yield ((id + x * 31 + y * 17) % 256).toInt).sum.toFloat / (w * h)
      assert(math.abs(f(2) - expectedMeanR) < 1e-4f)
      assert(f.slice(2, 5).forall(v => v >= 0f && v <= 255f))
    }
  }

  test("frame sampling explodes n chunks per payload") {
    val framed = Multimodal.sampleFrames(
      Multimodal.attachPayload(docs.limit(10), "text"), "payload", n = 4)
    assert(framed.count() == 40)
    assert(framed.groupBy("doc_id").count()
      .select(min("count")).head().getLong(0) == 4)
  }

  test("sequence packing: every doc once, bins within budget, packing is tight") {
    val packed = Corpus.packSequences(docs, "doc_id", "text", budget = 256).cache()
    val n = docs.count()
    assert(packed.count() == n)                         // every doc assigned
    assert(packed.select("doc_id").distinct().count() == n) // exactly once
    val bins = packed.filter(!col("oversize"))
      .groupBy("bin").agg(sum("n_tokens").as("t"), count(lit(1)).as("docs"))
    assert(bins.filter(col("t") > 256).count() == 0)    // budget respected
    // greedy next-fit packs multiple docs per bin when they fit
    assert(bins.filter(col("docs") > 1).count() > 0)
    // oversize docs (if any) sit alone
    val over = packed.filter(col("oversize")).select("bin")
    assert(over.join(packed, "bin").groupBy("bin").count()
      .filter(col("count") > 1).count() == 0)
    // deterministic: same input → same assignment
    val again = Corpus.packSequences(docs, "doc_id", "text", budget = 256)
    assert(packed.collect().map(_.toString).sorted
      .sameElements(again.collect().map(_.toString).sorted))
    packed.unpersist()
  }

  test("packSequencesDeterministic: layout-invariant, same packing invariants") {
    // the l22 promotion's load-bearing fact: bin ids are a pure
    // function of the ROWS (shard = id % shards), not of Spark's
    // partition layout — so any input repartitioning yields the
    // byte-identical assignment
    val a = Corpus.packSequencesDeterministic(
      docs, "doc_id", "text", budget = 256, shards = 4)
    val b = Corpus.packSequencesDeterministic(
      docs.repartition(13), "doc_id", "text", budget = 256, shards = 4)
    val rowsA = a.collect().map(_.toString).sorted
    assert(rowsA.sameElements(b.collect().map(_.toString).sorted))
    // same packing contract as packSequences: everyone assigned once,
    // budget respected for non-oversize bins, oversize docs sit alone
    val n = docs.count()
    assert(a.count() == n && a.select("doc_id").distinct().count() == n)
    val bins = a.filter(!col("oversize"))
      .groupBy("bin").agg(sum("n_tokens").as("t"))
    assert(bins.filter(col("t") > 256).count() == 0)
    val over = a.filter(col("oversize")).select("bin")
    assert(over.join(a, "bin").groupBy("bin").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("boilerplate removal strips exactly the high-df tokens, preserving order") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the dog ran"), (3L, "the bird the worm"),
      (4L, "a fish swam the sea")).toDF("doc_id", "text")
    // 'the' is in 4/4 docs -> boilerplate at 0.6; everything else below
    val out = Corpus.removeBoilerplate(corpus, "doc_id", "text", dfFrac = 0.6)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq ==
      Seq("cat sat", "dog ran", "bird worm", "a fish swam sea"))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 2L, 1L)) // n_dropped
  }

  test("repetition signals compute exact fractions; single-token doc is safe") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a a a b"),        // top_token 3/4, distinct 2/4, top_bigram "a a" 2/3
      (2L, "x y x y"),        // top_token 2/4, distinct 2/4, top_bigram "x y" 2/3
      (3L, "solo"),           // 1 token: bigram frac 0
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3) // empty doc absent
    assert(out(0).getDouble(2) == 0.75 && out(0).getDouble(3) == 0.5)
    assert(out(0).getDouble(4) == math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(out(1).getDouble(2) == 0.5)
    assert(out(2).getLong(1) == 1L && out(2).getDouble(4) == 0.0)
  }

  test("tfidf ranks rare terms above ubiquitous ones, k respected, ties on term") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat"), (2L, "the dog"), (3L, "the the bird")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(corpus, "doc_id", "text", k = 2)
    val d1 = out.filter(col("doc_id") === 1).orderBy("rank").collect()
    // 'cat' df=1 → ln(3) beats 'the' df=3 → ln(1)=0
    assert(d1.map(_.getString(1)).toSeq == Seq("cat", "the"))
    assert(d1.head.getDouble(2) == math.rint(math.log(3.0) * 1e6) / 1e6)
    assert(out.groupBy("doc_id").count().filter(col("count") > 2).count() == 0)
  }

  test("url extraction: every occurrence, domain parse, blocklist flag") {
    import spark.implicits._
    val df = Seq(
      (1L, "go to https://a.example.com/x and http://spam.bad.net/y then https://a.example.com/x"),
      (2L, "no links here")).toDF("doc_id", "text")
    val out = Corpus.urlReport(df, "doc_id", "text", Seq("spam.bad.net")).collect()
    assert(out.length == 3) // duplicates preserved, doc 2 contributes none
    assert(out.count(r => r.getString(2) == "a.example.com" && !r.getBoolean(3)) == 2)
    assert(out.count(r => r.getString(2) == "spam.bad.net" && r.getBoolean(3)) == 1)
  }

  test("incremental dedup drops batch docs whose fingerprint exists in corpus") {
    import spark.implicits._
    val corpus = Seq((1L, "Hello  World"), (2L, "unrelated")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "hello world"),   // normalizes to a corpus fingerprint → dropped
      (11L, "brand new doc")).toDF("doc_id", "text")
    val out = Corpus.dedupAgainstCorpus(batch, corpus, "text")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(11L))
  }

  test("bloom-prefiltered dedup equals the exact path and actually prunes") {
    import spark.implicits._
    val corpus = (0L until 200L).map(i => (i, s"corpus doc number $i"))
      .toDF("doc_id", "text")
    val batch = ((1000L until 1100L).map(i => (i, s"novel doc $i")) ++
      Seq((2000L, "corpus doc number 7"), (2001L, "Corpus  Doc  Number 13")))
      .toDF("doc_id", "text")
    val exact = Corpus.dedupAgainstCorpus(batch, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = Corpus.bloomDedupAgainstCorpus(batch, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloom == exact, "bloom path must be bit-identical to exact dedup")
    assert(!bloom.contains(2000L) && !bloom.contains(2001L)) // dupes (incl. normalized) dropped
    assert((1000L until 1100L).forall(bloom.contains))
    // the filter really prunes: at fpp=0.01 the 100 novel docs put
    // ~1 expected row into the verification join, not 100
    val fp = TextAnalysis.fingerprint(col("text"))
    val filter = corpus.select(fp.as("fp")).stat.bloomFilter("fp", 200, 0.01)
    val survivors = batch.withColumn("f", fp).collect()
      .count(r => filter.mightContainString(r.getString(r.fieldIndex("f"))))
    assert(survivors <= 12, s"prefilter let $survivors/102 rows through")
  }

  test("quantization round-trips within scale/254 per element; zero vector safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantize(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(out(0).getDouble(1) == 1.0)               // scale = max |x|
    assert(out(0).getLong(2) == (64 - 127 + 32))     // round(127*x/scale) per elem
    // max per-element error is scale/254 → mse well under that squared
    assert(out(0).getDouble(3) <= 1.0 / 254 / 254 + 1e-9)
    assert(out(1).getDouble(1) == 0.0 && out(1).getLong(2) == 0L
      && out(1).getDouble(3) == 0.0)
  }

  test("embedding clusters pair each planted copy with its source; collapse drops exactly the copies") {
    val corpus = graft.queries.Llm.plantedCorpus(emb)
    val clusters = Similarity.embedNearDupClusters(corpus, "vec_id", "embedding", 0.99)
    val m = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 200) // 100 planted pairs, no false pairs among noise
    (0L until 100L).foreach { i =>
      assert(m(i) == i && m(i + 100000L) == i) // min-id source is the survivor
    }
    val survivors = Similarity.dropEmbedNearDuplicates(corpus, "vec_id", "embedding", 0.99)
      .select("vec_id").collect().map(_.getLong(0))
    assert(survivors.length == emb.count())    // every original survives
    assert(!survivors.exists(_ >= 100000L))    // every planted copy dropped
  }

  test("chunking covers every token with the declared overlap; short docs pass whole") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x y")).toDF("doc_id", "text")
    val out = Corpus.chunkDocuments(df, "doc_id", "text", 8, 2)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getString(3)).toSeq ==
      Seq("a b c d e f g h", "g h i j")) // stride 6, last clamps
    assert(d1.map(_.getLong(2)).toSeq == Seq(8L, 4L))
    assert(out.filter(_.getLong(0) == 2L).map(_.getString(3)).toSeq == Seq("x y"))
    // every token of every doc appears in some chunk of that doc
    val rebuilt = d1.flatMap(_.getString(3).split(" ")).toSet
    assert(rebuilt == "a b c d e f g h i j".split(" ").toSet)
  }

  test("source mix keeps exact fractions at the extremes and is deterministic") {
    val mixed = Corpus.sourceMix(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultFrac = 0.1)
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total0 = docs.filter(col("source") === "src0").count()
    assert(bySrc("src0") == total0)          // frac 1.0 keeps everything
    assert(!bySrc.contains("src1"))          // frac 0.0 keeps nothing
    val again = Corpus.sourceMix(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultFrac = 0.1)
    assert(mixed.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(again.select("doc_id").collect().map(_.getLong(0)).sorted))
  }

  test("pii redaction replaces emails and phones, leaves the rest") {
    import spark.implicits._
    val df = Seq("mail bob.smith+x@sub.example.org and +1-555-123-4567 end",
      "nothing here").toDF("text")
    val red = Corpus.redactPii(df, "text").select("redacted")
      .collect().map(_.getString(0))
    assert(red.contains("mail <EMAIL> and <PHONE> end"))
    assert(red.contains("nothing here"))
  }

  test("IVF append: frozen-quantizer encode equals the build formula; appended neighbors are found") {
    val corpusA = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val (quantizer, postingsA) = Similarity.buildIvfIndex(corpusA, "c_id", "c_vec")
    // batch B: near-copies of the first 10 vectors (ids +100000)
    val batchB = graft.queries.Llm.plantedCorpus(emb)
      .filter(col("vec_id") >= 100000L && col("vec_id") < 100010L)
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<float>").as("c_vec"))
    val appended = Similarity.appendToIvfIndex(batchB, quantizer, "c_id", "c_vec")
    // append postings use the same formula as build: every appended
    // cell is a valid quantizer cell, codes are int8
    val cells = quantizer.select("cell").collect().map(_.getInt(0)).toSet
    appended.collect().foreach { r =>
      assert(cells(r.getInt(1)), s"cell ${r.getInt(1)} not in quantizer")
      assert(r.getSeq[Byte](2).nonEmpty)
    }
    // searching the grown index finds each planted near-copy at rank 1
    val grown = postingsA.unionByName(appended)
    val allVecs = corpusA.unionByName(
      batchB.select(col("c_id"), col("c_vec")))
    val hits = Similarity.ivfPqTopKAgainstIndex(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        quantizer, grown, allVecs,
        "q_id", "c_id", "q_vec", "c_vec", k = 3)
      .filter(col("rk") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { q =>
      assert(hits(q) == q + 100000L,
        s"query $q: rank-1 is ${hits(q)}, want the appended near-copy")
    }
  }

  test("PQ: 8-byte codes, planted near-copies recalled at rank 1") {
    val planted = graft.queries.Llm.plantedCorpus(emb)
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<float>").as("c_vec"))
    // codes really are m bytes
    val cb = Similarity.trainPqCodebooks(planted, "c_id", "c_vec",
      m = 8, ksub = 16, lloydIters = 2)
    assert(cb.length == 8 && cb.forall(_.length == 16))
    val code = planted.select(
      graft.functions.Pq.encode(col("c_vec"), cb)).head().getSeq[Byte](0)
    assert(code.length == 8)
    // recall: each of the first 20 queries must surface its planted
    // +100000 near-copy at rank 1 (ADC shortlist + exact rerank)
    val hits = Similarity.pqTopK(
        emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        planted, "q_id", "c_id", "q_vec", "c_vec", k = 3)
      .filter(col("rk") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recalled = (0L until 20L).count(q => hits.get(q).contains(q + 100000L))
    assert(recalled >= 18, s"planted recall $recalled/20")
    // ragged corpus: a vector shorter than the trained dimensionality
    // encodes to null, and a corrupt stored code scores NaN — neither
    // crashes the scan
    import spark.implicits._
    val short = Seq((1L, Array(1.0f, 2.0f))).toDF("c_id", "c_vec")
    assert(short.select(graft.functions.Pq.encode(col("c_vec"), cb))
      .head().isNullAt(0))
    val table = planted.limit(1).select(
      graft.functions.Pq.adcTable(col("c_vec"), cb).as("t"))
    val badCode = table.withColumn("c",
      array(lit(127.toByte), lit(0.toByte), lit(0.toByte), lit(0.toByte),
        lit(0.toByte), lit(0.toByte), lit(0.toByte), lit(0.toByte)))
    val s0 = badCode.select(
      graft.functions.Pq.score(col("t"), col("c"), cb)).head().getDouble(0)
    assert(s0.isNaN, "out-of-book code must score NaN")
  }

  test("embedding drift: identical versions score 1.0, planted rotation lowers it") {
    import spark.implicits._
    val base = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("embedding"))
    val same = Similarity.embeddingDrift(base, base,
        "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    same.foreach { case (_, nOld, nNew, cosD) =>
      assert(nOld == nNew)
      assert(cosD == 1.0, s"self-drift must be exactly 1 after rounding, got $cosD")
    }
    // a strong planted bump on one label must drift that label more
    val rotated = base.select(col("vec_id"), col("label"),
      transform(col("embedding"), (x, i) =>
        x + when(col("label") === 0 && i < 8, lit(5.0)).otherwise(lit(0.0)))
        .as("embedding"))
    val drift = Similarity.embeddingDrift(base, rotated,
        "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(drift(0) < 0.99, s"bumped label should drift: ${drift(0)}")
    drift.filter(_._1 != 0).values.foreach(c => assert(c == 1.0))
  }

  test("quality/token/langid expressions handle edge cases") {
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "   "), (3L, "the of and a is"), (4L, "der und ist das nicht"))
      .toDF("doc_id", "text")
    val out = edge.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toList
    assert(out == List((1L, 0, "und"), (2L, 0, "und"), (3L, 5, "en"), (4L, 5, "de")))
  }
}
