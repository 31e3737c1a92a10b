package graft.queries

import org.apache.spark.sql.functions._
import graft.Fixtures
import graft.llm.{Corpus, Multimodal, Preference, Retrieval, Similarity,
  TextAnalysis, TextDedup}

/** SURVEY.md §2.6: LLM-training-data pipeline operators, each exposed
  * as a driver-checkable query over the documents/embeddings fixtures.
  */
object Llm {

  // DuckDB fragments shared by several oracles (dialect notes:
  // 1-based array indexing, regexp_replace needs the 'g' flag,
  // string_split vs split).
  private val duckWords = """string_split_regex(trim(text), '\s+')"""
  private val duckShingles =
    """case when len(words) < 3 then [text]
      |     else list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
      |                         for i in range(1, len(words) - 1)]) end""".stripMargin
  // 8-word grams with WordShingles semantics (first-occurrence distinct,
  // whole text when shorter than 8 words) — expects `words`/`text` bound.
  // concat_ws instead of || chains: a stripMargin line starting with ||
  // loses its first pipe to the margin.
  private val duckGrams8 =
    """case when len(words) < 8 then [text]
      |     else list_distinct([concat_ws(' ', words[i], words[i+1], words[i+2], words[i+3],
      |                         words[i+4], words[i+5], words[i+6], words[i+7])
      |                         for i in range(1, len(words) - 6)]) end""".stripMargin
  private val duckDot =
    "list_sum(list_transform(list_zip(%s, %s), s -> cast(s[1] as double) * cast(s[2] as double)))"

  // Planted preference judgments shared by l117/l118 (as a CTE body —
  // callers prepend `with `): per prompt group (doc_id % 25) a
  // transitive tournament ordered by a portable quality mix, with the
  // edge between the two lowest response ids FLIPPED in every 5th
  // group (ties break to the lower doc_id — `a` in the pair join).
  // prompt count scales with the corpus (fixed ~20-row groups, more
  // prompts as docs grow) — real preference data grows PROMPTS, not
  // per-prompt judgment lists, so the audits stay linear at 100×
  private val duckPrefs =
    """sc as (select doc_id, p, q,
      |          row_number() over (partition by p order by doc_id) as rk
      |        from (select doc_id,
      |                doc_id % greatest(25,
      |                  (select count(*) from documents) // 20) as p,
      |                (doc_id * 2654435761 + 7) % 1048576 as q
      |              from documents)),
      |pr as (select a.p,
      |         case when a.p % 5 = 0 and a.rk = 1 and b.rk = 2
      |           then case when a.q >= b.q then b.doc_id else a.doc_id end
      |           else case when a.q >= b.q then a.doc_id else b.doc_id end
      |         end as winner,
      |         case when a.p % 5 = 0 and a.rk = 1 and b.rk = 2
      |           then case when a.q >= b.q then a.doc_id else b.doc_id end
      |           else case when a.q >= b.q then b.doc_id else a.doc_id end
      |         end as loser
      |       from sc a join sc b on a.p = b.p and a.doc_id < b.doc_id)""".stripMargin

  /** Spark mirror of [[duckPrefs]]: the planted per-prompt pairwise
    * judgments for the l117/l118 preference audits.
    */
  def plantedPrefs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // one bounded scalar action: the prompt count mirrors duckPrefs'
    // greatest(25, count(*)//20) so group size stays ~20 at any SF
    val nPrompts = math.max(25L, docs.count() / 20L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p")).orderBy(col("doc_id"))
    val sc = docs.select(col("doc_id"),
        (col("doc_id") % nPrompts).as("p"),
        ((pmod(col("doc_id"), lit(1048576L)) * lit(2654435761L) + 7) % 1048576).as("q"))
      .withColumn("rk", row_number().over(w))
    val a = sc.select(col("p"), col("doc_id").as("ida"),
      col("q").as("qa"), col("rk").as("rka"))
    val b = sc.select(col("p"), col("doc_id").as("idb"),
      col("q").as("qb"), col("rk").as("rkb"))
    val flip = col("p") % 5 === 0 && col("rka") === 1 && col("rkb") === 2
    val aWins = col("qa") >= col("qb")
    a.join(b, Seq("p")).filter(col("ida") < col("idb"))
      .select(col("p"),
        when(flip, when(aWins, col("idb")).otherwise(col("ida")))
          .otherwise(when(aWins, col("ida")).otherwise(col("idb")))
          .as("winner"),
        when(flip, when(aWins, col("ida")).otherwise(col("idb")))
          .otherwise(when(aWins, col("idb")).otherwise(col("ida")))
          .as("loser"))
  }
  private def duckNorm(c: String) =
    s"sqrt(list_sum(list_transform($c, x -> cast(x as double) * cast(x as double))))"

  /** Fixture embeddings (cast to double) plus a deterministic planted
    * near-duplicate of each of the first 100 vectors — element i scaled
    * by 1 + 0.01·(((vec_id·31 + i·17) % 7) − 3), exact integer-derived
    * IEEE factors so Spark and DuckDB build bit-identical corpora.
    * Shared by the l12b oracle query and the LlmSpec equality test.
    */
  def plantedCorpus(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val asDouble = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // The scale factor must bind the SOURCE id: rename it to src_id in a
    // sub-frame first, because a single select aliasing `vec_id + 100000`
    // AS vec_id would make Spark's lateral-column-alias resolution bind
    // the factor's vec_id to the alias while DuckDB binds the source.
    val planted = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("src_id"), col("embedding"))
      .select(
        (col("src_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") *
            (lit(1) + lit(0.01) * ((col("src_id") * 31 + (i + 1) * 17) % 7 - 3))
        ).as("embedding"))
    asDouble.unionByName(planted)
  }

  /** documents with text replaced by the three CompressPlants constant
    * texts (doc_id % 3) — the planted-constant corpus behind the
    * l38/q32b/l83/l84 pinned-literal oracles.
    */
  private def plantedCompressDocs(
      s: org.apache.spark.sql.SparkSession, d: String) =
    Fixtures.table(s, d, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit(CompressPlants.repetitive))
        .when(col("doc_id") % 3 === 1, lit(CompressPlants.prose))
        .otherwise(lit(CompressPlants.noise)).as("text"))

  val all: Seq[QuerySpec] = Seq(

    // L1 — exact dedup on the normalized-text fingerprint
    QuerySpec.df("l01_dedup_exact",
      """select md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fp,
        |       min(doc_id) as doc_id, count(*) as n_copies
        |from documents group by 1""".stripMargin) {
      (s, d) =>
        TextDedup.exact(
          Fixtures.table(s, d, "documents")
            .withColumn("fp", TextAnalysis.fingerprint(col("text"))),
          idCol = "doc_id", on = "fp")
    },

    // L2 — MinHash+LSH near-dup pairs, verified with exact Jaccard;
    // oracle brute-forces all-pairs 3-shingle Jaccard (feasible at
    // fixture scale; the Spark side never materializes the cross join).
    QuerySpec.df("l02_minhash_lsh",
      s"""with sh as (
         |  select doc_id, $duckShingles as sg
         |  from (select doc_id, text, string_split(text, ' ') as words from documents)
         |)
         |select a.doc_id as id_a, b.doc_id as id_b,
         |  round(len(list_intersect(a.sg, b.sg)) * 1.0 /
         |        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))), 4) as jaccard
         |from sh a join sh b on b.doc_id > a.doc_id
         |where len(list_intersect(a.sg, b.sg)) * 1.0 /
         |      (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.8""".stripMargin) {
      (s, d) =>
        TextDedup.minhashLshPairs(
          Fixtures.table(s, d, "documents"), "doc_id", "text",
          numHashes = 16, bands = 8, shingleK = 3, threshold = 0.8)
    },

    // L2b — SimHash fingerprints + winnowing min-shingle hash
    // (xxhash64-based: no DuckDB equivalent → rows-only)
    // L2b — SimHash + min-shingle fingerprints, hash-checked since
    // round 10: the portable hash family (md5 bits) lets DuckDB
    // rebuild BOTH codes bit-for-bit — the 64 simhash bits come from
    // the token md5's hex digits, min_shingle from the shingle md5's
    // first 60 bits. (The xxhash64 default stays for production use —
    // ~3× less per-token work — and keeps its LlmSpec property check.)
    QuerySpec.df("l03_simhash",
      s"""with w as (select doc_id, text, string_split(text, ' ') as words
        |            from documents),
        |sh as (select doc_id, $duckShingles as sg from w),
        |mins as (select doc_id,
        |           list_min(list_transform(sg,
        |             s -> ('0x' || substr(md5(s), 1, 15))::bigint)) as min_shingle
        |         from sh),
        |toks as (select doc_id,
        |           unnest(string_split_regex(trim(text), '\\s+')) as tok
        |         from documents),
        |h as (select doc_id,
        |        (hi - case when hi >= 2147483648 then 4294967296
        |                   else 0 end) * 4294967296 + lo as w
        |      from (select doc_id,
        |              ('0x' || substr(md5(tok), 1, 8))::bigint as hi,
        |              ('0x' || substr(md5(tok), 9, 8))::bigint as lo
        |            from toks where length(tok) > 0)),
        |bits as (select doc_id, b,
        |           case when ((w >> b) & 1) = 1 then 1 else -1 end as sgn
        |         from h, range(0, 64) t(b)),
        |s as (select doc_id, b, sum(sgn) as s from bits group by 1, 2),
        |sh64 as (select doc_id,
        |           cast(sum(case when s > 0 then
        |             case when b = 63 then -9223372036854775807 - 1
        |                  else (1::bigint << b) end
        |             else 0 end) as bigint) as simhash
        |         from s group by 1)
        |select sh64.doc_id, sh64.simhash, mins.min_shingle
        |from sh64 join mins using (doc_id)""".stripMargin) { (s, d) =>
      val docs = Fixtures.table(s, d, "documents")
      val sims = TextDedup.simhash(docs, "doc_id", "text", portable = true)
      val mins = TextDedup.withShingles(docs.select("doc_id", "text"), "text", "sg")
        .select(col("doc_id"),
          TextAnalysis.minShingleHashPortable(col("sg")).as("min_shingle"))
      sims.join(mins, sims("id") === mins("doc_id"))
        .select(col("doc_id"), col("simhash"), col("min_shingle"))
    },

    // L2c — n-gram Jaccard similarity on a deterministic candidate set
    QuerySpec.df("l04_ngram_jaccard",
      s"""with sh as (
         |  select doc_id, $duckShingles as sg
         |  from (select doc_id, text, string_split(text, ' ') as words from documents)
         |)
         |select a.doc_id as id_a, b.doc_id as id_b,
         |  round(len(list_intersect(a.sg, b.sg)) * 1.0 /
         |        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))), 4) as jaccard
         |from sh a join sh b on b.doc_id = a.doc_id + 1""".stripMargin) {
      (s, d) =>
        val sh = TextDedup.withShingles(
          Fixtures.table(s, d, "documents").select("doc_id", "text"),
          "text", "sg", 3).select("doc_id", "sg")
        val a = sh.select(col("doc_id").as("id_a"), col("sg").as("sh_a"))
        val b = sh.select(col("doc_id").as("id_b"), col("sg").as("sh_b"))
        a.join(b, col("id_b") === col("id_a") + 1)
          .select(col("id_a"), col("id_b"),
            round(TextDedup.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
    },

    // L3 — exact top-5 cosine neighbors for 20 query vectors
    QuerySpec.df("l05_cosine_knn",
      s"""select q_id, c_id, round(cos, 4) as cos, rk from (
         |  select q_id, c_id, cos,
         |    row_number() over (partition by q_id
         |                       order by round(cos, 6) desc, c_id) as rk
         |  from (
         |    select q.vec_id as q_id, c.vec_id as c_id,
         |      ${duckDot.format("q.embedding", "c.embedding")} /
         |      (${duckNorm("q.embedding")} * ${duckNorm("c.embedding")}) as cos
         |    from embeddings q join embeddings c on q.vec_id <> c.vec_id
         |    where q.vec_id < 20
         |  )
         |) where rk <= 5""".stripMargin) {
      (s, d) =>
        val emb = Fixtures.table(s, d, "embeddings")
        Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 20)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
          emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
          "q_id", "c_id", "q_vec", "c_vec", k = 5)
    },

    // L3b — LSH-bucketed approximate variant (the 100 TB scale path).
    // PROMOTED (r14, the q12 pattern): the ANN result itself can't
    // hash-match an oracle, but it IS a deterministic, partition-
    // layout-independent function of the fixture (seeded hyperplanes,
    // arithmetic bucket keys, (cos, id) tie-broken top-k) — so the
    // verdict rides the contract sign-LSH actually makes: NEAR
    // neighbors collide. Each of the 100 planted near-duplicates
    // (cos ≈ 0.999, [[plantedCorpus]]) queries the base corpus; the
    // oracle asserts (a) per query, the planted source is the ANN's
    // rank-1 hit WHEN its bucket collides (nothing in a bucket
    // outranks cos ≈ 0.999 — a hard contract), and (b) the
    // corpus-level hit fraction clears 0.85 (1-bit multiprobe's
    // expected hit rate is ~95%, so a bucketing/probe/plane
    // regression craters the boolean while the fixture's
    // deterministic few misses don't). The raw fixture's neighbors
    // sit at cos ≈ 0.37, where sign-LSH at any honest config finds
    // ~nothing — floor-verdicting THAT would pin noise; recall-vs-
    // exact on weak neighbors stays a spec-suite measurement.
    QuerySpec.df("l05b_cosine_ann",
      """select vec_id + 100000 as q_id, vec_id as src_id,
        |  true as rank1_when_found, true as corpus_recall_ok
        |from embeddings where vec_id < 100""".stripMargin) {
      (s, d) =>
        val corpus = plantedCorpus(Fixtures.table(s, d, "embeddings"))
        val q = corpus.filter(col("vec_id") >= 100000L)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val c = corpus.filter(col("vec_id") < 100000L)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val ann = Similarity.lshTopK(
          q, c, "q_id", "c_id", "q_vec", "c_vec", k = 5, nBits = 8)
        val hits = q.select(col("q_id"))
          .join(ann, Seq("q_id"), "left")
          .groupBy("q_id")
          .agg(max(when(col("c_id") === col("q_id") - 100000L, col("rk")))
            .as("_src_rk"))
        val withFrac = hits.crossJoin(broadcast(
          hits.agg((sum(when(col("_src_rk").isNotNull, 1).otherwise(0)) /
            count(lit(1))).as("_frac"))))
        withFrac.select(
          col("q_id"),
          (col("q_id") - 100000L).as("src_id"),
          coalesce(col("_src_rk") === 1, lit(true)).as("rank1_when_found"),
          (col("_frac") >= 0.85).as("corpus_recall_ok"))
    },

    // L4 — language-id heuristic (stopword-hit argmax)
    QuerySpec.df("l06_langid",
      {
        val langs = Seq("en", "de", "fr", "es", "zh")
        def hits(l: String) =
          s"len(list_intersect(list_distinct($duckWords), " +
            s"[${TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(",")}]))"
        val best = langs.map(hits).reduce((a, b) => s"greatest($a, $b)")
        val cases = langs.map(l =>
          s"when ${hits(l)} = best and best >= 1 then '$l'").mkString(" ")
        s"""select doc_id, lang,
           |  case $cases else 'und' end as pred
           |from (select doc_id, lang, text, $best as best from documents)""".stripMargin
      }) {
      (s, d) =>
        Fixtures.table(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            TextAnalysis.langId(col("text")).as("pred"))
    },

    // L4b — quality scoring
    QuerySpec.df("l07_quality",
      """select doc_id,
        |  case when length(trim(text)) = 0 then 0
        |       else len(string_split_regex(trim(text), '\s+')) end as n_words,
        |  round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0 /
        |    greatest(case when length(trim(text)) = 0 then 0
        |             else len(string_split_regex(trim(text), '\s+')) end, 1), 4) as avg_word_len,
        |  round(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) * 1.0 /
        |    greatest(length(text), 1), 4) as punct_ratio,
        |  round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 /
        |    greatest(length(text), 1), 4) as alpha_ratio
        |from documents""".stripMargin) {
      (s, d) =>
        Fixtures.table(s, d, "documents").select(
          col("doc_id"),
          TextAnalysis.nWords(col("text")).as("n_words"),
          round(TextAnalysis.avgWordLen(col("text")), 4).as("avg_word_len"),
          round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
          round(TextAnalysis.alphaRatio(col("text")), 4).as("alpha_ratio"))
    },

    // L4c — token counting (whitespace + BPE-ish regex)
    QuerySpec.df("l08_tokens",
      """select doc_id,
        |  case when length(trim(text)) = 0 then 0
        |       else len(string_split_regex(trim(text), '\s+')) end as n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) as n_subwords
        |from documents""".stripMargin) {
      (s, d) =>
        Fixtures.table(s, d, "documents").select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).as("n_subwords"))
    },

    // L4d — document fingerprinting
    QuerySpec.df("l09_fingerprint",
      """select doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fp
        |from documents""".stripMargin) {
      (s, d) =>
        Fixtures.table(s, d, "documents")
          .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    },

    // L4e — per-document token entropy (vocabulary-diversity quality
    // signal; repetitive text scores low). Both sides fold
    // (c/n)·log2(c/n) per (doc, token); summation-order float drift is
    // ~1e-15 and round(,6) absorbs it (the libm rule in QuerySpec).
    QuerySpec.df("l16_entropy",
      """with w as (
        |  select doc_id, unnest(string_split_regex(trim(text), '\s+')) as w
        |  from documents
        |),
        |c as (select doc_id, w, count(*) as c from w where length(w) > 0 group by 1, 2),
        |t as (select doc_id, c, sum(c) over (partition by doc_id) as n from c)
        |select doc_id,
        |  round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)) + 0.0, 6) as entropy
        |from t group by doc_id""".stripMargin) {
      (s, d) =>
        TextAnalysis.tokenEntropy(
          Fixtures.table(s, d, "documents"), "doc_id", "text")
    },

    // L5 — multimodal binary-column plumbing (payload + metadata)
    QuerySpec.df("l10_multimodal",
      """select doc_id,
        |  octet_length(encode(text)) as n_bytes,
        |  md5(text) as digest,
        |  'application/octet-stream' as mime
        |from documents""".stripMargin) {
      (s, d) =>
        Multimodal.attachPayload(Fixtures.table(s, d, "documents"), "text")
          .select(col("doc_id"),
            col("payload_meta.n_bytes").as("n_bytes"),
            md5(col("payload")).as("digest"),
            col("payload_meta.mime").as("mime"))
    },

    // L3c — per-label centroids via the VectorAvg typed Aggregator
    // (IVF coarse-quantizer building block); oracle uses DuckDB's
    // aligned unnest + generate_subscripts
    QuerySpec.df("l11_centroids",
      """select label, idx, round(avg(v), 6) as c from (
        |  select label, unnest(embedding) as v,
        |         generate_subscripts(embedding, 1) as idx
        |  from embeddings
        |) t group by label, idx""".stripMargin) {
      (s, d) =>
        graft.GraftExtensions.register(s)
        Fixtures.table(s, d, "embeddings")
          .groupBy("label")
          .agg(graft.functions.VectorAvg.vectorAvg(col("embedding")).as("centroid"))
          .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "v")))
          .select(col("label"), (col("pos") + 1).as("idx"),
            round(col("v"), 6).as("c"))
    },

    // L2d — embedding-cosine near-dup pairs above a similarity floor.
    // Brute force on BOTH sides (the honest exact formulation; the LSH
    // prefilter variant is l05b) — Spark broadcast-nested-loop vs
    // DuckDB pair join, identical double folds.
    QuerySpec.df("l12_embed_neardup",
      s"""select id_a, id_b, round(cos, 4) as cos from (
         |  select a.vec_id as id_a, b.vec_id as id_b,
         |    ${duckDot.format("a.embedding", "b.embedding")} /
         |    (${duckNorm("a.embedding")} * ${duckNorm("b.embedding")}) as cos
         |  from embeddings a join embeddings b on b.vec_id > a.vec_id
         |) t where not isnan(cos) and cos >= 0.4""".stripMargin) {
      (s, d) =>
        val emb = Fixtures.table(s, d, "embeddings")
        // the corpus parquet is one file/one row group → ONE scan task,
        // and the nested-loop STREAM side inherits it: the whole n²/2
        // kernel evaluation ran on one core. Round-robin the stream
        // side across the session's cores first (r14 opt: 2.0 → 0.4 s
        // at sf0.1; scale-adaptive — defaultParallelism, not a const)
        val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
          .repartition(s.sparkContext.defaultParallelism)
        val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
        a.join(b, col("id_b") > col("id_a"))
          .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
          // NaN (zero-norm) sorts above every double in BOTH engines, so
          // an unguarded threshold silently admits zero vectors as
          // near-dups of everything; guard mirrored in the oracle SQL.
          // nanvl, not !isnan && >=: the pushed-down predicate would
          // otherwise carry TWO copies of the cosine kernel (one per
          // conjunct) — measured 2.0 -> 3.6 s on this query at sf0.1
          .filter(nanvl(col("cos"), lit(-1.0)) >= 0.4)
          .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
    },

    // L2e — near-dup cluster collapse: LSH pairs → connected components
    // (iterative min-label propagation + pointer jumping). Oracle:
    // brute-force pair set + recursive-CTE transitive closure, min
    // reachable id per vertex — feasible at fixture scale.
    QuerySpec.df("l13_neardup_clusters",
      s"""with recursive sh as (
         |  select doc_id, $duckShingles as sg
         |  from (select doc_id, text, string_split(text, ' ') as words from documents)
         |),
         |pairs as (
         |  select a.doc_id as id_a, b.doc_id as id_b
         |  from sh a join sh b on b.doc_id > a.doc_id
         |  where len(list_intersect(a.sg, b.sg)) * 1.0 /
         |        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.8
         |),
         |edges as (select id_a as src, id_b as dst from pairs
         |          union select id_b as src, id_a as dst from pairs),
         |reach(v, r) as (
         |  select src, src from edges
         |  union
         |  select e.src, reach.r from edges e join reach on reach.v = e.dst
         |)
         |select v as doc_id, min(r) as cluster from reach group by v""".stripMargin) {
      (s, d) =>
        ndClusters(s, d)
          .select(col("id").as("doc_id"), col("component").as("cluster"))
    },

    // L2f — the end-to-end collapse: survivors = min id per cluster
    // plus every unpaired doc.
    QuerySpec.df("l14_drop_neardup",
      s"""with recursive sh as (
         |  select doc_id, $duckShingles as sg
         |  from (select doc_id, text, string_split(text, ' ') as words from documents)
         |),
         |pairs as (
         |  select a.doc_id as id_a, b.doc_id as id_b
         |  from sh a join sh b on b.doc_id > a.doc_id
         |  where len(list_intersect(a.sg, b.sg)) * 1.0 /
         |        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.8
         |),
         |edges as (select id_a as src, id_b as dst from pairs
         |          union select id_b as src, id_a as dst from pairs),
         |reach(v, r) as (
         |  select src, src from edges
         |  union
         |  select e.src, reach.r from edges e join reach on reach.v = e.dst
         |),
         |losers as (
         |  select v from (select v, min(r) as cluster from reach group by v)
         |  where v <> cluster
         |)
         |select doc_id, lang from documents
         |where doc_id not in (select v from losers)""".stripMargin) {
      (s, d) =>
        graft.operators.ConnectedComponents.collapseFromClusters(
          Fixtures.table(s, d, "documents"), ndClusters(s, d), "doc_id")
          .select("doc_id", "lang")
    },

    // L3d — IVF ANN (coarse-quantizer cells + nProbe probing), the
    // partition-based scale path beside l05b's sign-LSH; approximate
    // by design → rows-only, recall property in LlmSpec.
    QuerySpec.unchecked("l15_ivf_ann") { (s, d) =>
      val emb = Fixtures.table(s, d, "embeddings")
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
        "q_id", "c_id", "q_vec", "c_vec", k = 5)
    },

    // L2d' — the SCALE path for embedding near-dup: LSH prefilter +
    // exact-cosine verify (Similarity.nearDupPairs), oracled against
    // exact all-pairs. The raw fixture is isotropic noise (max pair
    // cos ≈ 0.51 — no near-dup regime exists in it), so the corpus
    // plants a deterministic near-duplicate of each of the first 100
    // vectors: element i scaled by 1 + 0.01·(((vec_id·31 + i·17) % 7) − 3)
    // — integer-derived factors, bit-identical in both engines — giving
    // planted pairs at cos ≈ 0.9997, far above the 0.99 floor and far
    // above everything else (≤ 0.55).
    QuerySpec.df("l12b_embed_neardup_lsh",
      s"""with corpus as (
         |  select vec_id, list_transform(embedding, x -> cast(x as double)) as v
         |  from embeddings
         |  union all
         |  select src_id + 100000 as vec_id,
         |    [embedding[i] * (1 + 0.01 * (((src_id * 31 + i * 17) % 7) - 3))
         |     for i in range(1, len(embedding) + 1)] as v
         |  from (select vec_id as src_id, embedding from embeddings where vec_id < 100)
         |)
         |select id_a, id_b, round(cos, 4) as cos from (
         |  select a.vec_id as id_a, b.vec_id as id_b,
         |    ${duckDot.format("a.v", "b.v")} /
         |    (${duckNorm("a.v")} * ${duckNorm("b.v")}) as cos
         |  from corpus a join corpus b on b.vec_id > a.vec_id
         |) t where cos >= 0.99""".stripMargin) {
      (s, d) => embPairs(s, d)
    },

    // L6m — per-source corpus summary stats (dataset-card numbers):
    // doc counts, token totals, exact p50/p90 token counts
    QuerySpec.df("l32_corpus_stats",
      s"""select source, count(*) as n_docs,
         |  cast(sum(nt) as bigint) as total_tokens,
         |  round(avg(nt), 4) as avg_tokens,
         |  cast(quantile_cont(nt, 0.5) as double) as p50_tokens,
         |  cast(quantile_cont(nt, 0.9) as double) as p90_tokens,
         |  round(avg(nc), 4) as avg_chars
         |from (select source, len($duckWords) as nt, length(text) as nc
         |      from documents)
         |group by source""".stripMargin) {
      (s, d) =>
        TextAnalysis.corpusStats(
          Fixtures.table(s, d, "documents"), "source", "text")
    },

    // L2d'' — embedding near-dup CLUSTERS over the planted corpus
    // (sign-LSH pairs → connected components); oracle: exact all-pairs
    // + recursive-CTE transitive closure, as l13 does for text
    QuerySpec.df("l30_embed_clusters",
      s"""with recursive corpus as (
         |  select vec_id, list_transform(embedding, x -> cast(x as double)) as v
         |  from embeddings
         |  union all
         |  select src_id + 100000 as vec_id,
         |    [embedding[i] * (1 + 0.01 * (((src_id * 31 + i * 17) % 7) - 3))
         |     for i in range(1, len(embedding) + 1)] as v
         |  from (select vec_id as src_id, embedding from embeddings where vec_id < 100)
         |),
         |pairs as (
         |  select a.vec_id as id_a, b.vec_id as id_b
         |  from corpus a join corpus b on b.vec_id > a.vec_id
         |  where ${duckDot.format("a.v", "b.v")} /
         |        (${duckNorm("a.v")} * ${duckNorm("b.v")}) >= 0.99
         |),
         |edges as (select id_a as src, id_b as dst from pairs
         |          union select id_b as src, id_a as dst from pairs),
         |reach(v, r) as (
         |  select src, src from edges
         |  union
         |  select e.src, reach.r from edges e join reach on reach.v = e.dst
         |)
         |select v as vec_id, min(r) as cluster from reach group by v""".stripMargin) {
      (s, d) =>
        embClusters(s, d)
          .select(col("id").as("vec_id"), col("component").as("cluster"))
    },

    // L2d''' — the embedding collapse: min-id survivor per cluster plus
    // every unpaired vector
    QuerySpec.df("l31_embed_collapse",
      s"""with recursive corpus as (
         |  select vec_id, list_transform(embedding, x -> cast(x as double)) as v
         |  from embeddings
         |  union all
         |  select src_id + 100000 as vec_id,
         |    [embedding[i] * (1 + 0.01 * (((src_id * 31 + i * 17) % 7) - 3))
         |     for i in range(1, len(embedding) + 1)] as v
         |  from (select vec_id as src_id, embedding from embeddings where vec_id < 100)
         |),
         |pairs as (
         |  select a.vec_id as id_a, b.vec_id as id_b
         |  from corpus a join corpus b on b.vec_id > a.vec_id
         |  where ${duckDot.format("a.v", "b.v")} /
         |        (${duckNorm("a.v")} * ${duckNorm("b.v")}) >= 0.99
         |),
         |edges as (select id_a as src, id_b as dst from pairs
         |          union select id_b as src, id_a as dst from pairs),
         |reach(v, r) as (
         |  select src, src from edges
         |  union
         |  select e.src, reach.r from edges e join reach on reach.v = e.dst
         |),
         |losers as (
         |  select v from (select v, min(r) as cluster from reach group by v)
         |  where v <> cluster
         |)
         |select vec_id from corpus
         |where vec_id not in (select v from losers)""".stripMargin) {
      (s, d) =>
        graft.operators.ConnectedComponents.collapseFromClusters(
          plantedCorpus(Fixtures.table(s, d, "embeddings")),
          embClusters(s, d), "vec_id")
          .select("vec_id")
    },

    // L5b — per-partition feature-extraction plumbing (decode STUBBED;
    // deterministic fake features → rows-only)
    QuerySpec.unchecked("l10b_multimodal_features") { (s, d) =>
      val withPayload = Multimodal.attachPayload(
        Fixtures.table(s, d, "documents"), "text")
      Multimodal.extractFeatures(withPayload, "payload", dim = 16)
        .select(col("doc_id"), size(col("features")).as("n_features"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
    },

    // L6a — corpus boilerplate removal: tokens in >=60% of documents
    // are stripped; text reassembled in original token order
    QuerySpec.df("l18_boilerplate",
      """with tok as (
        |  select doc_id, w, i
        |  from (select doc_id, unnest(string_split(text, ' ')) as w,
        |               generate_subscripts(string_split(text, ' '), 1) as i
        |        from documents)
        |),
        |boiler as (
        |  select w from tok group by w
        |  having count(distinct doc_id) >= ceil(0.6 * (select count(*) from documents))
        |),
        |kept as (select * from tok where w not in (select w from boiler)),
        |tot as (select doc_id, len(string_split(text, ' ')) as n_total from documents)
        |select k.doc_id, count(*) as n_kept,
        |       cast(any_value(t.n_total) - count(*) as bigint) as n_dropped,
        |       string_agg(k.w, ' ' order by k.i) as kept_text
        |from kept k join tot t using (doc_id)
        |group by k.doc_id""".stripMargin) {
      (s, d) =>
        Corpus.removeBoilerplate(
          Fixtures.table(s, d, "documents"), "doc_id", "text", dfFrac = 0.6)
    },

    // L6b — benchmark decontamination: corpus docs sharing an 8-gram
    // with the benchmark set (doc_id % 50 == 0); contamination planted
    // by appending doc 0's text to every doc_id % 7 == 3 document so
    // the overlap join provably fires
    QuerySpec.df("l19_decontaminate",
      s"""with d0 as (select text from documents where doc_id = 0),
         |corpus as (
         |  select doc_id,
         |    case when doc_id % 7 = 3 then text || ' ' || (select text from d0)
         |         else text end as text
         |  from documents where doc_id % 50 <> 0),
         |bench as (select doc_id, text from documents where doc_id % 50 = 0),
         |cg as (select doc_id, $duckGrams8 as grams
         |       from (select doc_id, text, string_split(text, ' ') as words from corpus)),
         |bg as (select doc_id, $duckGrams8 as grams
         |       from (select doc_id, text, string_split(text, ' ') as words from bench))
         |select c.doc_id, b.doc_id as bench_id,
         |       cast(len(list_intersect(c.grams, b.grams)) as bigint) as n_shared
         |from cg c join bg b on len(list_intersect(c.grams, b.grams)) > 0""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val d0 = Fixtures.headTextOrEmpty(
          docs.filter(col("doc_id") === 0).select("text"))
        val corpus = docs.filter(col("doc_id") % 50 =!= 0)
          .withColumn("text", when(col("doc_id") % 7 === 3,
            concat(col("text"), lit(" " + d0))).otherwise(col("text")))
        val bench = docs.filter(col("doc_id") % 50 === 0)
        Corpus.decontaminate(corpus, bench, "doc_id", "text", k = 8)
    },

    // L6c — PII redaction: plant an email + phone per doc, redact with
    // engine-portable regexes, hash-compare the redacted text
    QuerySpec.df("l20_pii_redact",
      s"""select doc_id,
         |  regexp_replace(regexp_replace(
         |    text || ' contact user' || cast(doc_id as varchar)
         |         || '@example.com or +1-555-123-4567 now',
         |    '${Corpus.EmailRe}', '<EMAIL>', 'g'),
         |    '${Corpus.PhoneRe}', '<PHONE>', 'g') as redacted
         |from documents""".stripMargin) {
      (s, d) =>
        val planted = Fixtures.table(s, d, "documents")
          .select(col("doc_id"), concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1-555-123-4567 now")).as("text"))
        Corpus.redactPii(planted, "text").select("doc_id", "redacted")
    },

    // L6d — deterministic stratified sample: 20 docs per language by
    // multiplicative-hash rank (reproducible across engines/retries)
    QuerySpec.df("l21_stratified_sample",
      """select doc_id, lang from (
        |  select doc_id, lang, row_number() over (
        |    partition by lang
        |    order by (doc_id * 2654435761) % 1048576, doc_id) as rn
        |  from documents) t where rn <= 20""".stripMargin) {
      (s, d) =>
        Corpus.stratifiedSample(
          Fixtures.table(s, d, "documents").select("doc_id", "lang"),
          "lang", "doc_id", k = 20)
    },

    // L6e — sequence packing into 256-token bins. PROMOTED (r14, the
    // q12 pattern's deterministic-formulation cousin): the sharded
    // packer (shard = doc_id % 8, greedy next-fit in id order within
    // each shard, bin = shard<<32 | binInShard) is a pure function of
    // the input rows — no partition ids anywhere — so DuckDB replays
    // the identical greedy scan as a recursive CTE and the FULL
    // assignment hash-matches cell for cell. The partition-id packer
    // (packSequences) keeps its LlmSpec property test.
    QuerySpec.df("l22_pack_sequences",
      """with recursive base as (
        |  select doc_id, doc_id % 8 as shard,
        |    cast(len(string_split(text, ' ')) as int) as t,
        |    cast(row_number() over (
        |      partition by doc_id % 8 order by doc_id) as int) as rn
        |  from documents),
        |pack as (
        |  select shard, rn, doc_id, t, cast(0 as bigint) as bin, t as used
        |  from base where rn = 1
        |  union all
        |  select b.shard, b.rn, b.doc_id, b.t,
        |    case when p.used + b.t > 256 then p.bin + 1 else p.bin end,
        |    case when p.used + b.t > 256 then b.t else p.used + b.t end
        |  from pack p join base b on b.shard = p.shard and b.rn = p.rn + 1)
        |select doc_id, t as n_tokens,
        |  shard * 4294967296 + bin as bin, t > 256 as oversize
        |from pack""".stripMargin) { (s, d) =>
      Corpus.packSequencesDeterministic(
        Fixtures.table(s, d, "documents"), "doc_id", "text",
        budget = 256, shards = 8)
    },

    // L6f — Gopher-style repetition signals: top-token / distinct-token
    // / top-bigram fractions per document
    QuerySpec.df("l23_repetition",
      """with base as (select doc_id, string_split(text, ' ') as ws from documents),
        |tc as (select doc_id, w, count(*) as c
        |       from (select doc_id, unnest(ws) as w from base) group by 1, 2),
        |ts as (select doc_id, sum(c) as n_tokens, max(c) as top_c,
        |              count(*) as n_distinct from tc group by 1),
        |bc as (select doc_id, b, count(*) as c
        |       from (select doc_id,
        |               unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) as b
        |             from base where len(ws) >= 2) group by 1, 2),
        |bs as (select doc_id, max(c) as top_b, sum(c) as n_b from bc group by 1)
        |select t.doc_id, cast(t.n_tokens as bigint) as n_tokens,
        |       round(t.top_c / t.n_tokens, 6) as top_token_frac,
        |       round(t.n_distinct / t.n_tokens, 6) as distinct_frac,
        |       round(coalesce(b.top_b / b.n_b, 0.0), 6) as top_bigram_frac
        |from ts t left join bs b using (doc_id)""".stripMargin) {
      (s, d) =>
        TextAnalysis.repetitionSignals(
          Fixtures.table(s, d, "documents"), "doc_id", "text")
    },

    // L6g — top-3 TF-IDF terms per document (tf × ln(N/df), term-asc
    // tie-break; scores rounded before ranking so both engines order
    // identically)
    QuerySpec.df("l26_tfidf",
      """with tok as (select doc_id, unnest(string_split(text, ' ')) as w from documents),
        |tf as (select doc_id, w, count(*) as tf from tok group by 1, 2),
        |df as (select w, count(*) as dfreq from tf group by 1),
        |sc as (select doc_id, w as term,
        |         round(tf * ln((select count(*) from documents) / dfreq), 6) as score
        |       from tf join df using (w))
        |select doc_id, term, score, rank from (
        |  select *, row_number() over (
        |    partition by doc_id order by score desc, term) as rank from sc)
        |where rank <= 3""".stripMargin) {
      (s, d) =>
        TextAnalysis.tfidfTopTerms(
          Fixtures.table(s, d, "documents"), "doc_id", "text", k = 3)
    },

    // L6h — URL extraction + domain blocklist: two URLs planted per doc
    // (one per-doc domain, one blocked for doc_id % 5 == 0)
    QuerySpec.df("l24_url_filter",
      s"""with planted as (
         |  select doc_id,
         |    text || ' see https://site' || cast(doc_id % 7 as varchar)
         |         || '.example.com/p/' || cast(doc_id as varchar)
         |         || case when doc_id % 5 = 0 then ' and http://spam.bad.net/x' else '' end
         |      as text
         |  from documents)
         |select doc_id, url,
         |       regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) as domain,
         |       regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1)
         |         in ('spam.bad.net', 'malware.example.net') as blocked
         |from (select doc_id, unnest(regexp_extract_all(text, '${Corpus.UrlRe}')) as url
         |      from planted)""".stripMargin) {
      (s, d) =>
        val planted = Fixtures.table(s, d, "documents")
          .select(col("doc_id"), concat(col("text"),
            lit(" see https://site"), (col("doc_id") % 7).cast("string"),
            lit(".example.com/p/"), col("doc_id").cast("string"),
            when(col("doc_id") % 5 === 0, lit(" and http://spam.bad.net/x"))
              .otherwise(lit(""))).as("text"))
        Corpus.urlReport(planted, "doc_id", "text",
          Seq("spam.bad.net", "malware.example.net"))
    },

    // L6i — incremental dedup: new batch (doc_id % 3 != 0) against the
    // existing corpus (doc_id % 3 == 0); overlap planted by giving
    // every doc_id % 11 == 5 batch doc the text of corpus doc 3
    QuerySpec.df("l25_incremental_dedup",
      """with corpus as (select text from documents where doc_id % 3 = 0),
        |batch as (
        |  select doc_id,
        |    case when doc_id % 11 = 5
        |         then (select text from documents where doc_id = 3)
        |         else text end as text
        |  from documents where doc_id % 3 <> 0)
        |select b.doc_id,
        |       md5(regexp_replace(lower(trim(b.text)), '\s+', ' ', 'g')) as fp
        |from batch b
        |where md5(regexp_replace(lower(trim(b.text)), '\s+', ' ', 'g')) not in
        |      (select md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |       from corpus)""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val t3 = Fixtures.headTextOrEmpty(
          docs.filter(col("doc_id") === 3).select("text"))
        val corpus = docs.filter(col("doc_id") % 3 === 0)
        val batch = docs.filter(col("doc_id") % 3 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 11 === 5, lit(t3)).otherwise(col("text")))
        Corpus.dedupAgainstCorpus(batch, corpus, "text")
          .select("doc_id", "fp")
    },

    // L6k — overlapping token-window chunking (8-token chunks, 2-token
    // overlap → stride 6); last chunk clamps at the document end
    QuerySpec.df("l28_chunk",
      """with base as (select doc_id, string_split(text, ' ') as ws from documents),
        |c as (select doc_id, ws,
        |        case when len(ws) <= 8 then 1
        |             else cast(ceil((len(ws) - 2) / 6.0) as bigint) end as nc
        |      from base)
        |select doc_id, i as chunk_idx,
        |       cast(len(list_slice(ws, i*6 + 1, i*6 + 8)) as bigint) as chunk_tokens,
        |       array_to_string(list_slice(ws, i*6 + 1, i*6 + 8), ' ') as chunk_text
        |from (select doc_id, ws, unnest(range(0, nc)) as i from c)""".stripMargin) {
      (s, d) =>
        Corpus.chunkDocuments(Fixtures.table(s, d, "documents"),
          "doc_id", "text", chunkTokens = 8, overlapTokens = 2)
    },

    // L6l — deterministic source-mix resampling: keep 100% of src0,
    // 50% of src1, 10% of everything else by multiplicative id-hash
    QuerySpec.df("l29_source_mix",
      """select doc_id, source from documents
        |where (doc_id * 2654435761) % 1048576 <
        |  case source when 'src0' then 1.0 when 'src1' then 0.5 else 0.1 end
        |    * 1048576""".stripMargin) {
      (s, d) =>
        Corpus.sourceMix(Fixtures.table(s, d, "documents"), "source", "doc_id",
          Map("src0" -> 1.0, "src1" -> 0.5), defaultFrac = 0.1)
          .select("doc_id", "source")
    },

    // L6p — temperature-rebalanced source mix (the mC4/multilingual
    // sampling rule): target share of source i ∝ n_i^τ at τ=0.5, the
    // keep budget is the largest total every source can serve, and
    // membership is the deterministic id hash. Fractions round to 6 dp
    // in both engines so the hash-threshold decision is portable.
    QuerySpec.df("l69_temperature_mix",
      """with docs as (
        |  select doc_id,
        |    case when doc_id % 10 < 6 then 'web'
        |         when doc_id % 10 < 9 then 'books'
        |         else 'code' end as source
        |  from documents),
        |c as (select source, cast(count(*) as double) as n
        |      from docs group by source),
        |w as (select source, n, pow(n, 0.5) as wgt from c),
        |t as (select sum(wgt) as tot from w),
        |p as (select source, n, wgt / tot as p from w cross join t),
        |b as (select min(n / p) as bud from p),
        |f as (select source,
        |        round(least(1.0, bud * p / n), 6) as frac
        |      from p cross join b)
        |select d.doc_id, d.source from docs d
        |join f using (source)
        |where (d.doc_id * 2654435761) % 1048576 < frac * 1048576""".stripMargin) {
      (s, d) =>
        // the fixture's sources are uniform (a no-op for rebalancing);
        // derive a 60/30/10 skew from the id — identical in both engines
        val skewed = Fixtures.table(s, d, "documents").select(col("doc_id"),
          when(col("doc_id") % 10 < 6, "web")
            .when(col("doc_id") % 10 < 9, "books")
            .otherwise("code").as("source"))
        Corpus.temperatureMix(skewed, "source", "doc_id", tau = 0.5)
          .select("doc_id", "source")
    },

    // L6q — multi-benchmark contamination report: the dataset-card
    // audit behind l19's single-set drop decision. Two disjoint eval
    // sets derive from the fixture; corpus docs plant 8-gram overlap
    // with set A (doc_id%7==3 append doc 0's text) or set B
    // (doc_id%11==5 append doc 25's text) — first-match precedence
    // identical in both engines.
    QuerySpec.df("l70_contamination_report",
      s"""with d0 as (select text from documents where doc_id = 0),
         |d25 as (select text from documents where doc_id = 25),
         |corpus as (
         |  select doc_id,
         |    case when doc_id % 7 = 3 then text || ' ' || (select text from d0)
         |         when doc_id % 11 = 5 then text || ' ' || (select text from d25)
         |         else text end as text
         |  from documents where doc_id % 25 <> 0),
         |bench as (
         |  select 'benchA' as eval_set, doc_id, text from documents
         |  where doc_id % 50 = 0
         |  union all
         |  select 'benchB' as eval_set, doc_id, text from documents
         |  where doc_id % 50 = 25),
         |cg as (select doc_id, $duckGrams8 as grams
         |       from (select doc_id, text, string_split(text, ' ') as words
         |             from corpus)),
         |bg as (select eval_set, doc_id, $duckGrams8 as grams
         |       from (select eval_set, doc_id, text,
         |                    string_split(text, ' ') as words from bench)),
         |j as (select c.doc_id, b.eval_set, b.doc_id as bid,
         |             len(list_intersect(c.grams, b.grams)) as ns
         |      from cg c join bg b
         |        on len(list_intersect(c.grams, b.grams)) > 0)
         |select doc_id, eval_set, cast(sum(ns) as bigint) as n_shared,
         |       cast(count(*) as bigint) as n_bench_docs
         |from j group by doc_id, eval_set""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val d0 = Fixtures.headTextOrEmpty(
          docs.filter(col("doc_id") === 0).select("text"))
        val d25 = Fixtures.headTextOrEmpty(
          docs.filter(col("doc_id") === 25).select("text"))
        val corpus = docs.filter(col("doc_id") % 25 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 3, concat(col("text"), lit(" " + d0)))
              .when(col("doc_id") % 11 === 5, concat(col("text"), lit(" " + d25)))
              .otherwise(col("text")))
        Corpus.contaminationReport(corpus,
          Seq("benchA" -> docs.filter(col("doc_id") % 50 === 0),
            "benchB" -> docs.filter(col("doc_id") % 50 === 25)),
          "doc_id", "text", k = 8)
    },

    // L4u — vocabulary coverage / OOV rate against the corpus's own
    // top-200 token vocabulary (tokenizer-health metric); vocabulary
    // ties at the cutoff rank (count desc, token asc) in both engines.
    QuerySpec.df("l71_vocab_coverage",
      """with toks as (
        |  select doc_id, w from (
        |    select doc_id,
        |           unnest(string_split_regex(trim(text), '\s+')) as w
        |    from documents where length(trim(text)) > 0)
        |  where length(w) > 0),
        |counts as (select w, count(*) as c from toks group by w),
        |v as (select w from (
        |  select w, row_number() over (order by c desc, w asc) as rn
        |  from counts) where rn <= 200)
        |select t.doc_id, cast(count(*) as bigint) as n_tokens,
        |  cast(sum(case when v.w is null then 1 else 0 end) as bigint)
        |    as n_oov,
        |  round(sum(case when v.w is null then 1 else 0 end) * 1.0
        |    / count(*), 6) as oov_frac
        |from toks t left join v on v.w = t.w
        |group by t.doc_id""".stripMargin) {
      (s, d) =>
        TextAnalysis.vocabCoverage(
          Fixtures.table(s, d, "documents"), "doc_id", "text", topK = 200)
    },

    // L6j — int8 embedding quantization: scale, quantized checksum, and
    // reconstruction MSE per vector
    QuerySpec.df("l27_quantize",
      """with e as (select vec_id,
        |             list_transform(embedding, x -> cast(x as double)) as v
        |           from embeddings),
        |s as (select vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) as scale from e),
        |q as (select vec_id, v, scale,
        |        case when scale = 0 then list_transform(v, x -> 0)
        |             else list_transform(v, x -> cast(round(x * 127.0 / scale) as integer))
        |        end as qs
        |      from s)
        |select vec_id, round(scale, 6) as scale,
        |       cast(list_sum(qs) as bigint) as q_sum,
        |       round(list_sum(list_transform(list_zip(v, qs),
        |           p -> (p[1] - cast(p[2] as double) * scale / 127.0)
        |              * (p[1] - cast(p[2] as double) * scale / 127.0)))
        |         / len(v), 6) as mse
        |from q""".stripMargin) {
      (s, d) =>
        Similarity.quantize(Fixtures.table(s, d, "embeddings"), "vec_id", "embedding")
    },

    // L6n — corpus-level bigram census: top-20 bigrams by occurrence
    // count with document frequency (the boilerplate/template survey a
    // pipeline runs before choosing filters)
    QuerySpec.df("l33_ngram_topk",
      """with base as (
        |  select doc_id, string_split_regex(trim(text), '\s+') as ws
        |  from documents where length(trim(text)) > 0
        |),
        |g as (
        |  select doc_id, unnest([ws[i] || ' ' || ws[i+1]
        |                         for i in range(1, len(ws))]) as gram
        |  from base where len(ws) >= 2
        |),
        |pd as (select doc_id, gram, count(*) as c from g group by 1, 2),
        |t as (select gram, cast(sum(c) as bigint) as n_occurrences,
        |             count(*) as n_docs from pd group by 1)
        |select gram, n_occurrences, n_docs, rank from (
        |  select *, row_number() over (
        |    order by n_occurrences desc, gram) as rank from t)
        |where rank <= 20""".stripMargin) {
      (s, d) =>
        TextAnalysis.ngramTopK(
          Fixtures.table(s, d, "documents"), "doc_id", "text", n = 2, k = 20)
    },

    // L4f — Gopher-rule quality gates (word count, mean word length,
    // hash and ellipsis ratios gated separately per Rae et al. §A1.1,
    // alpha-word fraction, hits on the paper's stopword list) + the
    // composite keep verdict; minWords relaxed to 5 so the fixture
    // corpus splits non-trivially
    QuerySpec.df("l34_gopher_filter",
      {
        val stops = TextAnalysis.gopherStopwords.map(w => s"'$w'").mkString(",")
        s"""select doc_id, n_words, mean_word_len, hash_ratio, ellipsis_ratio,
           |       alpha_word_ratio, stop_hits,
           |       (n_words between 5 and 100000
           |        and mean_word_len between 3 and 10
           |        and hash_ratio <= 0.1
           |        and ellipsis_ratio <= 0.1
           |        and alpha_word_ratio >= 0.8
           |        and stop_hits >= 2) as keep
           |from (
           |  select doc_id,
           |    cast(nw as bigint) as n_words,
           |    round(length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 /
           |      greatest(nw, 1), 4) as mean_word_len,
           |    round(len(regexp_extract_all(text, '#')) * 1.0 /
           |      greatest(nw, 1), 4) as hash_ratio,
           |    round(len(regexp_extract_all(text, '\\.\\.\\.')) * 1.0 /
           |      greatest(nw, 1), 4) as ellipsis_ratio,
           |    round(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0 /
           |      greatest(nw, 1), 4) as alpha_word_ratio,
           |    cast(len(list_intersect(list_distinct(ws), [$stops])) as bigint)
           |      as stop_hits
           |  from (select doc_id, text,
           |          string_split_regex(trim(text), '\\s+') as ws,
           |          case when length(trim(text)) = 0 then 0
           |               else len(string_split_regex(trim(text), '\\s+')) end as nw
           |        from documents))""".stripMargin
      }) {
      (s, d) =>
        TextAnalysis.gopherFilter(
          Fixtures.table(s, d, "documents"), "doc_id", "text", minWords = 5L)
    },

    // L3e — IVF + int8 quantized scan + exact rerank (the memory-bounded
    // ANN scale path: the probe scan reads a 4×-smaller index, only
    // shortlist survivors fetch full-precision vectors); approximate by
    // design → rows-only, planted-recall property in LlmSpec
    QuerySpec.unchecked("l35_ivfpq_ann") { (s, d) =>
      val emb = Fixtures.table(s, d, "embeddings")
      Similarity.ivfPqTopK(
        emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
        "q_id", "c_id", "q_vec", "c_vec", k = 5)
    },

    // L3h — the PERSISTED IVF-ADC index (l61's embedding sibling):
    // quantizer + int8 postings built once, written to parquet, read
    // back, and queried against — the index round-trip is the point.
    // Rows-only (ANN); the equals-inline-path property is spec'd in
    // LlmSpec.
    QuerySpec.unchecked("l72_ivf_index") { (s, d) =>
      val emb = Fixtures.table(s, d, "embeddings")
      val corpus = emb.select(col("vec_id").as("c_id"),
        col("embedding").as("c_vec"))
      val base = ivfIndexDirs.computeIfAbsent(d, _ => {
        val out = java.nio.file.Files
          .createTempDirectory("graft-ivfidx-").toString
        val (quantizer, postings) =
          Similarity.buildIvfIndex(corpus, "c_id", "c_vec")
        quantizer.write.mode("overwrite").parquet(s"$out/quantizer.parquet")
        postings.repartition(s.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(s"$out/postings.parquet")
        out
      })
      Similarity.ivfPqTopKAgainstIndex(
        emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        s.read.parquet(s"$base/quantizer.parquet"),
        s.read.parquet(s"$base/postings.parquet"),
        corpus, "q_id", "c_id", "q_vec", "c_vec", k = 5)
    },

    // L4g — mean unigram log-probability under the corpus's own unigram
    // model (the cheap LM-perplexity proxy for fluency/outlier scoring)
    QuerySpec.df("l36_unigram_logprob",
      """with tok as (
        |  select doc_id, w from (
        |    select doc_id, unnest(string_split_regex(trim(text), '\s+')) as w
        |    from documents) where length(w) > 0
        |),
        |tc as (select w, count(*) as c from tok group by 1),
        |n as (select count(*) as n from tok)
        |select doc_id, count(*) as n_tokens,
        |  round(avg(log2(c * 1.0 / n)), 6) as mean_logp
        |from tok join tc using (w) cross join n
        |group by doc_id""".stripMargin) {
      (s, d) =>
        TextAnalysis.unigramLogProb(
          Fixtures.table(s, d, "documents"), "doc_id", "text")
    },

    // L6o — incremental NEAR-dup dedup: batch (doc_id % 3 != 0) against
    // the existing corpus (doc_id % 3 == 0), fuzzy counterpart of l25;
    // near-dups planted by prefixing doc 0's text with one word for
    // every doc_id % 10 == 1 batch doc (jaccard m/(m+1) >> 0.8), so the
    // LSH prefilter + verify provably fires. Oracle brute-forces the
    // batch x corpus jaccard.
    QuerySpec.df("l37_incremental_neardup",
      s"""with d0 as (select text from documents where doc_id = 0),
         |corpus as (select doc_id, text from documents where doc_id % 3 = 0),
         |batch as (
         |  select doc_id,
         |    case when doc_id % 10 = 1 then 'dup ' || (select text from d0)
         |         else text end as text
         |  from documents where doc_id % 3 <> 0),
         |sh_c as (select doc_id, $duckShingles as sg
         |         from (select doc_id, text, string_split(text, ' ') as words from corpus)),
         |sh_b as (select doc_id, $duckShingles as sg
         |         from (select doc_id, text, string_split(text, ' ') as words from batch)),
         |hits as (
         |  select distinct b.doc_id
         |  from sh_b b join sh_c c
         |  on len(list_intersect(b.sg, c.sg)) * 1.0 /
         |     (len(b.sg) + len(c.sg) - len(list_intersect(b.sg, c.sg))) >= 0.8)
         |select doc_id from batch
         |where doc_id not in (select doc_id from hits)""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val d0 = Fixtures.headTextOrEmpty(
          docs.filter(col("doc_id") === 0).select("text"))
        val corpus = docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text")
        val batch = docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 10 === 1, concat(lit("dup "), lit(d0)))
              .otherwise(col("text")).as("text"))
        TextDedup.nearDupAgainstCorpus(batch, corpus, "doc_id", "text",
          numHashes = 16, bands = 8)
          .select("doc_id")
    },

    // L5c — REAL image decode (javax.imageio): each doc gets an actual
    // PNG payload with planted dims (w = id%16+1, h = id*7%16+1); Spark
    // reads the pre-materialized payload parquet and header-decodes it;
    // the oracle recomputes the planted dims arithmetically. Proves the
    // decode path reads real containers, not the payload-meta struct.
    // Payload *synthesis* (PNG encoding) happens once per sfDir outside
    // the query — the bench times the operator the entry names, not
    // fixture generation (VERDICT r5).
    QuerySpec.df("l17_image_meta",
      """select doc_id,
        |  cast(doc_id % 16 + 1 as int) as img_width,
        |  cast((doc_id * 7) % 16 + 1 as int) as img_height,
        |  'png' as img_format
        |from documents""".stripMargin) {
      (s, d) =>
        Multimodal.imageMeta(imagePayloads(s, d), "payload")
          .select("doc_id", "img_width", "img_height", "img_format")
    },

    // L4i — DEFLATE compression-ratio quality signal. PROMOTED (r14,
    // the planted-constant pattern): DuckDB has no DEFLATE, so the
    // entry runs the REAL kernel over planted texts whose ratios are
    // deterministic constants (fixed strings × fixed Deflater level ×
    // the same JVM zlib on every driver run): class 0 = templated
    // repetition (compresses hard, keep=false), class 1 = prose
    // (mid-range, keep=true), class 2 = LCG noise (barely compresses,
    // keep=false). The oracle pins all three (n_chars, 6dp ratio,
    // keep) arithmetically — a kernel regression shifts a constant
    // and fails the hash. Real-corpus behavior stays property-spec'd
    // (TextCompressSpec: empty=1.0, repetitive < prose < random).
    QuerySpec.df("l38_compress_ratio",
      s"""select doc_id,
         |  cast(case when doc_id % 3 = 0 then ${CompressPlants.repetitive.length}
         |       when doc_id % 3 = 1 then ${CompressPlants.prose.length}
         |       else ${CompressPlants.noise.length} end as bigint) as n_chars,
         |  cast(case when doc_id % 3 = 0 then ${CompressPlants.repetitiveRatio}
         |       when doc_id % 3 = 1 then ${CompressPlants.proseRatio}
         |       else ${CompressPlants.noiseRatio} end as double) as deflate_ratio,
         |  doc_id % 3 = 1 as keep
         |from documents""".stripMargin) { (s, d) =>
      val planted = Fixtures.table(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(CompressPlants.repetitive))
          .when(col("doc_id") % 3 === 1, lit(CompressPlants.prose))
          .otherwise(lit(CompressPlants.noise)).as("text"))
      TextAnalysis.compressionSignals(planted, "doc_id", "text")
    },

    // L4j — C4 page cleaning over deterministic synthetic pages (the
    // fixture text is single-line, so both engines first regroup words
    // into 5-word lines decorated with rule triggers: terminal '.' on
    // 2/3 of lines, ' javascript' every 17th line-slot, ' {' every
    // 41st, a 'lorem ipsum' header on doc_id % 101 == 0 pages).
    QuerySpec.df("l39_c4_filters",
      s"""with ${duckPages(5, decorate = true)},
         |f as (
         |  select doc_id,
         |    cast(len(string_split(text, chr(10))) as bigint) as n_lines,
         |    list_filter(string_split(text, chr(10)), l ->
         |      regexp_matches(l, '[.!?"]$$')
         |      and len(string_split_regex(trim(l), '\\s+')) >= 5
         |      and not contains(lower(l), 'javascript')) as kept,
         |    text
         |  from pages
         |)
         |select doc_id, n_lines, cast(len(kept) as bigint) as n_kept,
         |  array_to_string(kept, chr(10)) as cleaned_text
         |from f
         |where not contains(text, '{') and not contains(lower(text), 'lorem ipsum')
         |  and len(kept) >= 3""".stripMargin) {
      (s, d) =>
        Corpus.c4Clean(syntheticPageFixture(s, d, 5, decorate = true),
          "doc_id", "text")
    },

    // L4k — global line-level dedup (first occurrence by (doc, pos)
    // wins) over 2-word synthetic lines — short lines so the small
    // fixture vocabulary actually produces cross-document duplicates.
    QuerySpec.df("l40_line_dedup",
      s"""with ${duckPages(2, decorate = false)},
         |ls as (select doc_id, string_split(text, chr(10)) as ll from pages),
         |pos as (select doc_id, ll, unnest(range(0, len(ll))) as pos from ls),
         |lines as (select doc_id, pos, ll[pos+1] as line from pos),
         |kept as (
         |  select doc_id, pos, line from lines
         |  qualify row_number() over (partition by line order by doc_id, pos) = 1),
         |rebuilt as (
         |  select doc_id, cast(count(*) as bigint) as n_kept,
         |    array_to_string(list(line order by pos), chr(10)) as dedup_text
         |  from kept group by doc_id),
         |tot as (select doc_id, cast(len(ll) as bigint) as n_lines from ls)
         |select t.doc_id, t.n_lines,
         |  coalesce(r.n_kept, 0) as n_kept,
         |  coalesce(r.dedup_text, '') as dedup_text
         |from tot t left join rebuilt r using (doc_id)""".stripMargin) {
      (s, d) =>
        Corpus.dedupLines(syntheticPageFixture(s, d, 2, decorate = false),
          "doc_id", "text")
    },

    // L4l — exact duplicate-span fraction (Lee et al. 2021) at k=3
    // tokens — small k so the fixture vocabulary yields real repeats.
    QuerySpec.df("l41_dup_spans",
      """with base as (
        |  select doc_id, string_split_regex(trim(text), '\s+') as ws
        |  from documents where length(trim(text)) > 0
        |),
        |g0 as (select doc_id, ws, unnest(range(0, len(ws) - 2)) as p
        |       from base where len(ws) >= 3),
        |g as (select doc_id, p, array_to_string(ws[p+1 : p+3], ' ') as gram
        |      from g0),
        |dup as (select gram from g group by gram having count(*) > 1),
        |cov as (
        |  select doc_id, cast(count(distinct tok_pos) as bigint) as dup_tokens
        |  from (select doc_id, unnest(range(p, p+3)) as tok_pos
        |        from g join dup using (gram))
        |  group by doc_id),
        |tot as (select doc_id, cast(len(ws) as bigint) as n_tokens from base)
        |select t.doc_id, t.n_tokens,
        |  coalesce(c.dup_tokens, 0) as dup_tokens,
        |  round(coalesce(c.dup_tokens, 0) / t.n_tokens, 6) as dup_frac
        |from tot t left join cov c using (doc_id)""".stripMargin) {
      (s, d) =>
        Corpus.duplicateSpans(
          Fixtures.table(s, d, "documents"), "doc_id", "text", k = 3)
    },

    // L4l' — the REWRITE half of l41 (Lee et al. ExactSubstr): cut
    // every token position covered by a duplicated 3-gram window,
    // reassemble the survivors in order. l41 measures; this cleans.
    QuerySpec.df("l68_dup_span_removal",
      """with base as (
        |  select doc_id, string_split_regex(trim(text), '\s+') as ws
        |  from documents where length(trim(text)) > 0
        |),
        |g0 as (select doc_id, ws, unnest(range(0, len(ws) - 2)) as p
        |       from base where len(ws) >= 3),
        |g as (select doc_id, p, array_to_string(ws[p+1 : p+3], ' ') as gram
        |      from g0),
        |dup as (select gram from g group by gram having count(*) > 1),
        |cov as (
        |  select distinct doc_id, tok_pos
        |  from (select doc_id, unnest(range(p, p+3)) as tok_pos
        |        from g join dup using (gram))),
        |toks as (select doc_id, unnest(ws) as w,
        |                generate_subscripts(ws, 1) - 1 as pos from base),
        |reb as (
        |  select t.doc_id, cast(count(*) as bigint) as n_kept,
        |         array_to_string(list(t.w order by t.pos), ' ') as clean_text
        |  from toks t
        |  left join cov c on c.doc_id = t.doc_id and c.tok_pos = t.pos
        |  where c.doc_id is null
        |  group by t.doc_id)
        |select b.doc_id, cast(len(b.ws) as bigint) as n_tokens,
        |  coalesce(r.n_kept, 0) as n_kept,
        |  coalesce(r.clean_text, '') as clean_text
        |from base b left join reb r using (doc_id)""".stripMargin) {
      (s, d) =>
        Corpus.removeDuplicateSpans(
          Fixtures.table(s, d, "documents"), "doc_id", "text", k = 3)
    },

    // L4m — DSIR unigram importance weights; target distribution =
    // the src0 slice of the corpus (stand-in for an external
    // high-quality target set).
    QuerySpec.df("l42_dsir_weights",
      """with toks as (
        |  select doc_id, unnest(string_split_regex(trim(text), '\s+')) as w
        |  from documents where length(trim(text)) > 0
        |),
        |tt as (select doc_id, w from toks where length(w) > 0),
        |raw as (select w, count(*) as c_raw from tt group by w),
        |tg as (
        |  select unnest(string_split_regex(trim(text), '\s+')) as w
        |  from documents where source = 'src0' and length(trim(text)) > 0
        |),
        |tgt as (select w, count(*) as c_tgt from tg where length(w) > 0
        |        group by w),
        |model as (select r.w, r.c_raw, coalesce(t.c_tgt, 0) as c_tgt
        |          from raw r left join tgt t using (w)),
        |totals as (select cast(sum(c_raw) as double) as t_raw,
        |                  cast(sum(c_tgt) as double) as t_tgt,
        |                  cast(count(*) as double) as v from model)
        |select doc_id, cast(count(*) as bigint) as n_tokens,
        |  round(avg(ln((c_tgt + 1) / (t_tgt + v)) - ln((c_raw + 1) / (t_raw + v))), 6)
        |    as dsir_weight
        |from tt join model using (w) cross join totals
        |group by doc_id""".stripMargin) {
      (s, d) => {
        val docs = Fixtures.table(s, d, "documents")
        TextAnalysis.importanceWeights(docs,
          docs.filter(col("source") === "src0"), "doc_id", "text")
      }
    },

    // L4n — BPE merge-selection census: corpus-wide adjacent
    // character-pair frequencies inside tokens, top-40 with
    // deterministic rank (count desc, pair asc).
    QuerySpec.df("l43_bpe_pairs",
      """with toks as (
        |  select unnest(string_split_regex(trim(text), '\s+')) as w
        |  from documents where length(trim(text)) > 0
        |),
        |tw as (select w from toks where length(w) >= 2),
        |p as (select unnest([w[i:i+1] for i in range(1, length(w))]) as pair
        |      from tw),
        |t as (select pair, cast(count(*) as bigint) as n_occurrences
        |      from p group by pair)
        |select pair, n_occurrences, rank from (
        |  select *, cast(row_number() over (
        |    order by n_occurrences desc, pair) as bigint) as rank from t)
        |where rank <= 40""".stripMargin) {
      (s, d) =>
        TextAnalysis.bpePairStats(
          Fixtures.table(s, d, "documents"), "doc_id", "text", k = 40)
    },

    // L5d — REAL audio container decode: each doc gets an actual PCM
    // WAV with planted header fields (sr = 8000·(id%3+1), ch = id%2+1,
    // n_samples = 800·(id%5+1)); Spark walks the RIFF chunks of the
    // pre-materialized payloads; the oracle recomputes the plants
    // arithmetically (the l17 pattern).
    QuerySpec.df("l44_audio_meta",
      """select doc_id,
        |  cast(8000 * (doc_id % 3 + 1) as int) as sample_rate,
        |  cast(doc_id % 2 + 1 as int) as audio_channels,
        |  cast(16 as int) as bit_depth,
        |  cast(800 * (doc_id % 5 + 1) as bigint) as n_samples,
        |  'wav' as audio_format
        |from documents""".stripMargin) {
      (s, d) =>
        Multimodal.audioMeta(
          mediaPayloads(s, d, "audio", Multimodal.attachAudioPayload(_, "doc_id")),
          "payload")
          .select("doc_id", "sample_rate", "audio_channels", "bit_depth",
            "n_samples", "audio_format")
    },

    // L5e — REAL video container parse: each doc gets a minimal ISO-
    // BMFF MP4 (ftyp + moov>mvhd) with planted movie timing
    // (timescale = 600·(id%4+1), duration = timescale·(id%10+1));
    // Spark walks the box tree; the oracle recomputes arithmetically.
    QuerySpec.df("l45_video_meta",
      """select doc_id,
        |  cast(600 * (doc_id % 4 + 1) as int) as timescale,
        |  cast(600 * (doc_id % 4 + 1) * (doc_id % 10 + 1) as bigint)
        |    as duration_units,
        |  cast(doc_id % 10 + 1 as double) as duration_s,
        |  'mp4' as video_format
        |from documents""".stripMargin) {
      (s, d) =>
        Multimodal.videoMeta(
          mediaPayloads(s, d, "video", Multimodal.attachVideoPayload(_, "doc_id")),
          "payload")
          .select("doc_id", "timescale", "duration_units", "duration_s",
            "video_format")
    },

    // L5f — FULL PCM decode, hash-checked: Spark folds every 16-bit
    // sample of each WAV into signal stats; the oracle regenerates the
    // planted sample formula ((id + i·2654435761) % 65536 - 32768 over
    // i < 800·(id%5+1)·(id%2+1)) with range() and computes the same
    // integer sums — so a single flipped sample anywhere in the decode
    // path flips the hash. All divisions are exact-int / exact-int,
    // IEEE-deterministic in both engines.
    QuerySpec.df("l46_audio_stats",
      """with n as (
        |  select doc_id,
        |    cast(800 * (doc_id % 5 + 1) * (doc_id % 2 + 1) as bigint) as nvals
        |  from documents
        |),
        |s as (
        |  select doc_id, ((doc_id + i * 2654435761) % 65536) - 32768 as amp
        |  from (select doc_id, unnest(range(0, nvals)) as i from n)
        |)
        |select doc_id,
        |  cast(count(*) as bigint) as n_vals,
        |  cast(sum(amp) as double) / count(*) as mean_amp,
        |  sqrt(cast(sum(amp * amp) as double) / count(*)) as rms_amp,
        |  cast(sum(case when abs(amp) >= 32000 then 1 else 0 end) as double)
        |    / count(*) as clip_frac,
        |  cast(sum(case when abs(amp) < 512 then 1 else 0 end) as double)
        |    / count(*) as silence_frac
        |from s group by doc_id""".stripMargin) {
      (s, d) =>
        Multimodal.audioStats(
          mediaPayloads(s, d, "audio", Multimodal.attachAudioPayload(_, "doc_id")),
          "payload")
          .select("doc_id", "n_vals", "mean_amp", "rms_amp",
            "clip_frac", "silence_frac")
    },

    // L5g — perceptual image dedup, decode-verified AND hash-checked:
    // payloads are noise PNGs keyed by doc_id % imgGroups (byte-
    // identical within a group, uncorrelated across groups; fixed
    // ~14-doc groups past the 37-group sf0.01 floor — see imgGroups),
    // Spark decodes real pixels → 64-bit dHash → banded Hamming pair
    // join (<= 2 bits); the oracle is the planted group structure
    // (identical bytes MUST pair at distance 0; cross-group noise
    // collides at ~2^-59).
    QuerySpec.df("l47_image_dedup",
      s"""select a.doc_id as id_a, b.doc_id as id_b, cast(0 as int) as hamming
        |from documents a join documents b
        |  on a.doc_id % $imgGroupsSql = b.doc_id % $imgGroupsSql
        | and a.doc_id < b.doc_id""".stripMargin) {
      (s, d) =>
        // decode once: the shared code table (id, 64-bit hash) is tiny
        // and localCheckpoint'd — the self-join reads the cache per
        // side, and l62 reuses the same decode AND the same pair list
        imgPairs(s, d)
    },

    // L5h — perceptual image near-dup CLUSTERS: dHash pairs → connected
    // components, the image sibling of l13/l30. The planted grouped
    // fixture makes the expected components exactly the group residue
    // (doc ids are 0-based contiguous, so the min id in residue class
    // g IS g) — decode-verified AND hash-checked.
    QuerySpec.df("l62_image_clusters",
      s"""select doc_id, doc_id % $imgGroupsSql as component
        |from documents""".stripMargin) {
      (s, d) =>
        graft.operators.ConnectedComponents.run(imgPairs(s, d), "id_a", "id_b")
          .select(col("id").as("doc_id"), col("component"))
    },

    // L5i — per-frame VIDEO decode, decode-verified AND hash-checked:
    // payloads are real motion-JPEG AVIs (RIFF/LIST/00dc walk + stock
    // ImageIO JPEG decode — the one codec the sandbox has), frames are
    // planted solid-luma planes; Spark decodes real pixels, the oracle
    // replays the planted formulas. Closes the "video frame decode
    // stubbed" gap from rounds 5-7.
    QuerySpec.df("l64_video_frames",
      """select doc_id, cast(frame_idx as int) as frame_idx,
        |  cast(24 + (doc_id % 3) * 8 as int) as frame_w,
        |  cast(24 as int) as frame_h,
        |  cast((doc_id + frame_idx) % 4 as int) as gray_bucket
        |from (select doc_id, unnest(range(0, 3 + doc_id % 5)) as frame_idx
        |      from documents)""".stripMargin) {
      (s, d) =>
        Multimodal.videoFrames(
          mediaPayloads(s, d, "mjpeg",
            Multimodal.attachMjpegPayload(_, "doc_id")),
          "payload")
          .select("doc_id", "frame_idx", "frame_w", "frame_h", "gray_bucket")
    },

    // L5j — Goertzel band-energy tone detection over REAL decoded PCM
    // (single-bin DFT — tone/DTMF/hum QC): payloads are planted sine
    // tones at 400·(doc_id%8+1) Hz. PROMOTED (r14, the l5c planted-
    // arithmetic pattern): the per-band POWERS aren't bit-portable
    // (trig), but the entry's selected columns are the detection
    // OUTCOME — dominant band index and frequency — which the planted
    // fixture pins exactly (a pure tone's Goertzel power at its own
    // bin dominates by orders of magnitude; MediaSpec proves the 100%
    // margin). The oracle recomputes both arithmetically from doc_id;
    // any decode/recurrence/argmax regression flips a cell.
    QuerySpec.df("l73_tone_detect",
      """select doc_id, cast(doc_id % 8 as int) as dominant_band,
        |  cast(400.0 * (doc_id % 8 + 1) as double) as dominant_freq
        |from documents""".stripMargin) { (s, d) =>
      Multimodal.audioBandEnergy(
        mediaPayloads(s, d, "tone",
          Multimodal.attachTonePayload(_, "doc_id")),
        "payload", bandsHz = (1 to 8).map(_ * 400.0).toArray)
        .select("doc_id", "dominant_band", "dominant_freq")
    },

    // L2g — SemDeDup (cluster-then-prune semantic dedup): k-means cells
    // confine the quadratic cosine pass; within-cell components at
    // cos >= 0.99 keep their min-id survivor. Rows-only by design
    // (cell-boundary pairs are invisible per the paper's semantics, and
    // the quantizer isn't SQL-reproducible); planted recall is spec'd
    // in LlmSpec.
    QuerySpec.unchecked("l48_semdedup") { (s, d) =>
      Similarity.semDedup(
        plantedCorpus(Fixtures.table(s, d, "embeddings")),
        "vec_id", "embedding", minCos = 0.99)
        .select("vec_id")
    },

    // L4o — BPE tokenizer training: learn a merge table from the
    // corpus's word-frequency vocabulary (the only corpus-sized pass;
    // every iteration runs over the bounded vocab). Rows-only: no
    // iterative BPE in SQL; the Sennrich example is spec'd by hand in
    // MediaSpec.
    QuerySpec.unchecked("l49_bpe_train") { (s, d) =>
      import s.implicits._
      TextAnalysis.bpeTrain(Fixtures.table(s, d, "documents"), "text",
          nMerges = 20)
        .zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rank", "left", "right")
    },

    // L6j — HTML → text ingest normalization: both engines wrap the
    // fixture text into a deterministic page (title/style/script/
    // comment/entities), then strip independently — script+style+
    // comment blocks out, tags out, entities decoded (&amp; last),
    // whitespace collapsed.
    QuerySpec.df("l51_html_to_text",
      """with pg as (
        |  select doc_id,
        |    '<html><head><title>T</title><style>p{color:red}</style></head>'
        |    || '<body><h1>Doc ' || cast(doc_id as varchar) || '</h1><p>'
        |    || text || '</p><script>var x = 1;</script>'
        |    || '<p>A &lt;tag&gt; &amp; more&nbsp;here</p><!-- hidden --></body></html>'
        |      as html
        |  from documents),
        |t1 as (select doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |  '(?s)<!--.*?-->', ' ', 'g'),
        |  '<[^>]+>', ' ', 'g') as t from pg),
        |t2 as (select doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |  '&lt;', '<', 'g'),
        |  '&gt;', '>', 'g'),
        |  '&quot;', '"', 'g'),
        |  '&#39;', chr(39), 'g'),
        |  '&nbsp;', ' ', 'g'),
        |  '&amp;', '&', 'g') as t from t1),
        |c as (select doc_id,
        |  trim(regexp_replace(t, '\s+', ' ', 'g')) as clean_text from t2)
        |select doc_id, clean_text,
        |  cast(length(clean_text) as bigint) as n_chars
        |from c""".stripMargin) {
      (s, d) =>
        val pg = Fixtures.table(s, d, "documents").select(col("doc_id"),
          concat(
            lit("<html><head><title>T</title><style>p{color:red}</style></head>"),
            lit("<body><h1>Doc "), col("doc_id").cast("string"), lit("</h1><p>"),
            col("text"), lit("</p><script>var x = 1;</script>"),
            lit("<p>A &lt;tag&gt; &amp; more&nbsp;here</p><!-- hidden --></body></html>"))
            .as("html"))
        pg.select(col("doc_id"),
            Corpus.htmlToText(col("html")).as("clean_text"))
          .withColumn("n_chars", length(col("clean_text")).cast("long"))
    },

    // L6k — canonical URL normalization: mixed-case scheme/host,
    // default port, tracking params, and fragment planted per doc;
    // both engines canonicalize independently (RE2-compatible steps).
    QuerySpec.df("l52_url_canonical",
      """with u as (
        |  select doc_id,
        |    'HTTP://Site' || cast(doc_id % 7 as varchar)
        |    || '.Example.COM:80/Path/' || cast(doc_id as varchar)
        |    || '?utm_source=feed&q=' || cast(doc_id % 13 as varchar)
        |    || '&fbclid=x#sec' as url
        |  from documents),
        |s1 as (select doc_id, url,
        |  lower(regexp_extract(url, '^((?i)https?://[^/?#]+)', 1))
        |    || regexp_replace(url, '^(?i)https?://[^/?#]+', '') as c from u),
        |s2 as (select doc_id, url, regexp_replace(c, '#.*$', '') as c from s1),
        |s3 as (select doc_id, url, regexp_replace(c,
        |  '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&]*', '\1', 'g') as c from s2),
        |s4 as (select doc_id, url,
        |  regexp_replace(regexp_replace(regexp_replace(c,
        |    '\?&+', '?'), '&&+', '&', 'g'), '[?&]+$', '') as c from s3),
        |s5 as (select doc_id, url, regexp_replace(regexp_replace(c,
        |  '^(http://[^/:?#]+):80([/?#]|$)', '\1\2'),
        |  '^(https://[^/:?#]+):443([/?#]|$)', '\1\2') as c from s4)
        |select doc_id, url, c as canonical_url from s5""".stripMargin) {
      (s, d) =>
        val u = Fixtures.table(s, d, "documents").select(col("doc_id"),
          concat(lit("HTTP://Site"), (col("doc_id") % 7).cast("string"),
            lit(".Example.COM:80/Path/"), col("doc_id").cast("string"),
            lit("?utm_source=feed&q="), (col("doc_id") % 13).cast("string"),
            lit("&fbclid=x#sec")).as("url"))
        u.select(col("doc_id"), col("url"),
          Corpus.canonicalUrl(col("url")).as("canonical_url"))
    },

    // L4q — WITHIN-document repeated-line removal (document-local
    // repetition rewrite; l40 is the cross-corpus sibling). 2-word
    // synthetic lines so the small vocabulary repeats inside a page.
    QuerySpec.df("l53_drop_repeated_lines",
      s"""with ${duckPages(2, decorate = false)},
         |ls as (select doc_id, string_split(text, chr(10)) as ll from pages),
         |k as (select doc_id, len(ll) as n_lines,
         |  [ll[i+1] for i in range(0, len(ll))
         |   if not list_contains(ll[1:i], ll[i+1])] as kept
         |  from ls)
         |select doc_id, cast(n_lines as bigint) as n_lines,
         |  cast(len(kept) as bigint) as n_kept,
         |  array_to_string(kept, chr(10)) as clean_text
         |from k""".stripMargin) {
      (s, d) =>
        Corpus.dropRepeatedLines(
          syntheticPageFixture(s, d, 2, decorate = false), "doc_id", "text")
    },

    // L6l — Bloom-prefiltered incremental dedup: same planted fixture
    // and oracle as l25 (bloom filters have no false negatives, so the
    // prefiltered path is bit-identical to the exact one — that
    // equivalence IS what the hash check proves); the bloom index cuts
    // the verification join to dupes + fpp×batch rows.
    QuerySpec.df("l55_bloom_dedup",
      """with corpus as (select text from documents where doc_id % 3 = 0),
        |batch as (
        |  select doc_id,
        |    case when doc_id % 11 = 5
        |         then (select text from documents where doc_id = 3)
        |         else text end as text
        |  from documents where doc_id % 3 <> 0)
        |select b.doc_id,
        |       md5(regexp_replace(lower(trim(b.text)), '\s+', ' ', 'g')) as fp
        |from batch b
        |where md5(regexp_replace(lower(trim(b.text)), '\s+', ' ', 'g')) not in
        |      (select md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |       from corpus)""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val t3 = Fixtures.headTextOrEmpty(
          docs.filter(col("doc_id") === 3).select("text"))
        val corpus = docs.filter(col("doc_id") % 3 === 0)
        val batch = docs.filter(col("doc_id") % 3 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 11 === 5, lit(t3)).otherwise(col("text")))
        Corpus.bloomDedupAgainstCorpus(batch, corpus, "text")
          .select("doc_id", "fp")
    },

    // L3g — sparse JL random projection, hash-checked: the ±1/0
    // projection matrix regenerates from the same integer congruence in
    // both engines; inputs quantize to integer thousandths so the
    // signed sums are exact and the two final IEEE ops are
    // bit-identical. One output row per (vector, output dim).
    QuerySpec.df("l54_jl_project",
      """with e as (select vec_id, embedding from embeddings),
        |x as (select vec_id, unnest(range(0, 16)) as j, embedding from e),
        |s as (
        |  select vec_id, j,
        |    list_sum([
        |      case ((((((42::bigint*1234567 + i::bigint*69069 + j::bigint*9876543)
        |               % 2147483647) * 48271) % 2147483647) * 48271) % 2147483647) % 6
        |        when 0 then cast(round(cast(embedding[i+1] as double) * 1000) as bigint)
        |        when 1 then -cast(round(cast(embedding[i+1] as double) * 1000) as bigint)
        |        else 0 end
        |      for i in range(0, len(embedding))]) as sq
        |  from x)
        |select vec_id, cast(j as int) as j,
        |  (cast(sq as double) / 1000.0) * sqrt(3.0/16) as proj_val
        |from s""".stripMargin) {
      (s, d) =>
        Fixtures.table(s, d, "embeddings")
          .select(col("vec_id"),
            posexplode(graft.functions.JlProjectFn.jlProject(
              col("embedding"), k = 16)).as(Seq("j", "proj_val")))
    },

    // L4v — per-source vocabulary richness (types, hapax, TTR).
    QuerySpec.df("l63_vocab_stats",
      """with toks as (
        |  select source, unnest(string_split_regex(trim(text), '\s+')) as w
        |  from documents where length(trim(text)) > 0),
        |tc as (select source, w, cast(count(*) as bigint) as c
        |       from toks where length(w) > 0 group by source, w)
        |select source,
        |  cast(sum(c) as bigint) as n_tokens,
        |  cast(count(*) as bigint) as n_types,
        |  cast(sum(case when c = 1 then 1 else 0 end) as bigint) as n_hapax,
        |  round(cast(count(*) as double) / sum(c), 6) as type_token_ratio,
        |  round(cast(sum(case when c = 1 then 1 else 0 end) as double)
        |    / count(*), 6) as hapax_frac
        |from tc group by source""".stripMargin) {
      (s, d) =>
        TextAnalysis.vocabStats(
          Fixtures.table(s, d, "documents"), "source", "text")
    },

    // L4u — vocabulary drift between two corpus versions: old = even
    // ids, new = odd ids with a planted spam token on % 7 == 1 docs;
    // top-20 movers of the symmetrized-KL contribution.
    QuerySpec.df("l60_vocab_drift",
      """with oldv as (select text from documents where doc_id % 2 = 0),
        |newv as (select case when doc_id % 7 = 1
        |    then text || ' spamtoken spamtoken spamtoken' else text end as text
        |  from documents where doc_id % 2 = 1),
        |tok_o as (select unnest(string_split_regex(trim(text), '\s+')) as w
        |          from oldv where length(trim(text)) > 0),
        |co as (select w, cast(count(*) as bigint) as c_old from tok_o
        |       where length(w) > 0 group by w),
        |tok_n as (select unnest(string_split_regex(trim(text), '\s+')) as w
        |          from newv where length(trim(text)) > 0),
        |cn as (select w, cast(count(*) as bigint) as c_new from tok_n
        |       where length(w) > 0 group by w),
        |j as (select coalesce(co.w, cn.w) as w,
        |        coalesce(c_old, 0) as c_old, coalesce(c_new, 0) as c_new
        |      from co full outer join cn on co.w = cn.w),
        |t as (select cast(sum(c_old) as double) as t_old,
        |        cast(sum(c_new) as double) as t_new,
        |        cast(count(*) as double) as vsize from j),
        |s as (select w, c_old, c_new,
        |        cast(c_old + 1 as double) / (t_old + vsize) as po,
        |        cast(c_new + 1 as double) / (t_new + vsize) as pn
        |      from j cross join t),
        |d as (select w, c_old, c_new, po, pn,
        |        round((pn - po) * log2(pn / po), 10) as drift from s),
        |top as (select * from d order by drift desc, w limit 20)
        |select w, c_old, c_new, round(po, 8) as p_old, round(pn, 8) as p_new,
        |  drift, cast(row_number() over (order by drift desc, w) as bigint) as rank
        |from top""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val oldV = docs.filter(col("doc_id") % 2 === 0).select("text")
        val newV = docs.filter(col("doc_id") % 2 === 1)
          .withColumn("text", when(col("doc_id") % 7 === 1,
            concat(col("text"), lit(" spamtoken spamtoken spamtoken")))
            .otherwise(col("text")))
          .select("text")
        TextAnalysis.vocabDrift(oldV, newV, "text", k = 20)
    },

    // L6n — incremental near-dup dedup against a PERSISTED index: the
    // corpus's (id, shingles, MinHash sig) frame round-trips through
    // parquet (materialized once per sfDir, outside timed runs) and
    // every ingest derives band keys arithmetically from the stored
    // signatures — no corpus re-shingling. Same fixture and oracle as
    // l37, which is what proves index-ingest ≡ inline-build ingest.
    QuerySpec.df("l61_neardup_index",
      s"""with d0 as (select text from documents where doc_id = 0),
         |corpus as (select doc_id, text from documents where doc_id % 3 = 0),
         |batch as (
         |  select doc_id,
         |    case when doc_id % 10 = 1 then 'dup ' || (select text from d0)
         |         else text end as text
         |  from documents where doc_id % 3 <> 0),
         |sh_c as (select doc_id, $duckShingles as sg
         |         from (select doc_id, text, string_split(text, ' ') as words from corpus)),
         |sh_b as (select doc_id, $duckShingles as sg
         |         from (select doc_id, text, string_split(text, ' ') as words from batch)),
         |hits as (
         |  select distinct b.doc_id
         |  from sh_b b join sh_c c
         |  on len(list_intersect(b.sg, c.sg)) * 1.0 /
         |     (len(b.sg) + len(c.sg) - len(list_intersect(b.sg, c.sg))) >= 0.8)
         |select doc_id from batch
         |where doc_id not in (select doc_id from hits)""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val d0 = Fixtures.headTextOrEmpty(
          docs.filter(col("doc_id") === 0).select("text"))
        val batch = docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 10 === 1, concat(lit("dup "), lit(d0)))
              .otherwise(col("text")).as("text"))
        val indexPath = nearDupIndexDirs.computeIfAbsent(d, _ => {
          val out = java.nio.file.Files.createTempDirectory("graft-ndidx-")
            .resolve("index.parquet").toString
          TextDedup.buildNearDupIndex(
            docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text")
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", "text", numHashes = 16)
            .write.mode("overwrite").parquet(out)
          out
        })
        TextDedup.nearDupAgainstIndex(batch, s.read.parquet(indexPath),
          "doc_id", "text", numHashes = 16, bands = 8)
          .select("doc_id")
    },

    // L6m — corpus version diff: old = doc_id % 3 == 0 slice; new =
    // the same slice minus % 9 == 0 (removed), with % 9 == 3 docs
    // rewritten (changed), plus fresh ids (added).
    QuerySpec.df("l59_corpus_diff",
      """with oldv as (
        |  select doc_id, text from documents where doc_id % 3 = 0),
        |newv as (
        |  select doc_id,
        |    case when doc_id % 9 = 3 then text || ' EDITED' else text end as text
        |  from documents where doc_id % 3 = 0 and doc_id % 9 <> 0
        |  union all
        |  select doc_id + 1000000 as doc_id, text
        |  from documents where doc_id % 3 = 1 and doc_id < 30),
        |o as (select doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as f from oldv),
        |n as (select doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as f from newv)
        |select coalesce(o.doc_id, n.doc_id) as doc_id,
        |  case when o.f is null then 'added'
        |       when n.f is null then 'removed'
        |       when o.f <> n.f then 'changed'
        |       else 'unchanged' end as status
        |from o full outer join n on o.doc_id = n.doc_id""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val oldV = docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text")
        val newV = docs
          .filter(col("doc_id") % 3 === 0 && col("doc_id") % 9 =!= 0)
          .withColumn("text", when(col("doc_id") % 9 === 3,
            concat(col("text"), lit(" EDITED"))).otherwise(col("text")))
          .select("doc_id", "text")
          .unionAll(docs.filter(col("doc_id") % 3 === 1 && col("doc_id") < 30)
            .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        Corpus.corpusDiff(oldV, newV, "doc_id", "text")
    },

    // L4t — Unicode script histogram + dominant script; the fixture
    // plants Cyrillic/Han/Arabic tails on a rotating quarter of docs so
    // every script class exercises (Java \p{IsX} ≡ RE2 \p{X}).
    QuerySpec.df("l58_script_mix",
      """with t as (
        |  select doc_id, text || case cast(doc_id % 4 as int)
        |    when 1 then ' Привет мир дела'
        |    when 2 then ' 中文测试内容很多'
        |    when 3 then ' مرحبا بالعالم'
        |    else '' end as text
        |  from documents),
        |c as (select doc_id,
        |  length(regexp_replace(text, '\s', '', 'g')) as n_chars,
        |  length(regexp_replace(text, '[^\p{Latin}]', '', 'g')) as latin,
        |  length(regexp_replace(text, '[^\p{Cyrillic}]', '', 'g')) as cyr,
        |  length(regexp_replace(text, '[^\p{Han}]', '', 'g')) as han,
        |  length(regexp_replace(text, '[^\p{Arabic}]', '', 'g')) as arab,
        |  length(regexp_replace(text, '[^0-9]', '', 'g')) as dig
        |  from t),
        |f as (select doc_id, n_chars,
        |  round(cast(latin as double) / greatest(n_chars, 1), 6) as latin_frac,
        |  round(cast(cyr as double) / greatest(n_chars, 1), 6) as cyrillic_frac,
        |  round(cast(han as double) / greatest(n_chars, 1), 6) as han_frac,
        |  round(cast(arab as double) / greatest(n_chars, 1), 6) as arabic_frac,
        |  round(cast(dig as double) / greatest(n_chars, 1), 6) as digit_frac,
        |  round(cast(n_chars - latin - cyr - han - arab - dig as double)
        |    / greatest(n_chars, 1), 6) as other_frac
        |  from c)
        |select doc_id, cast(n_chars as bigint) as n_chars,
        |  latin_frac, cyrillic_frac, han_frac, arabic_frac, digit_frac,
        |  other_frac,
        |  case greatest(latin_frac, cyrillic_frac, han_frac, arabic_frac,
        |                digit_frac)
        |    when 0.0 then 'other'
        |    when latin_frac then 'latin'
        |    when cyrillic_frac then 'cyrillic'
        |    when han_frac then 'han'
        |    when arabic_frac then 'arabic'
        |    else 'digit' end as dominant_script
        |from f""".stripMargin) {
      (s, d) =>
        val t = Fixtures.table(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 4 === 1, lit(" Привет мир дела"))
              .when(col("doc_id") % 4 === 2, lit(" 中文测试内容很多"))
              .when(col("doc_id") % 4 === 3, lit(" مرحبا بالعالم"))
              .otherwise(lit(""))).as("text"))
        TextAnalysis.scriptMix(t, "doc_id", "text")
    },

    // L4s — conditional bigram-LM fluency score (add-1 smoothing):
    // P(w2|w1) from the corpus's own transitions; both engines build
    // the same bigram/prefix models and score per doc.
    QuerySpec.df("l57_bigram_logprob",
      """with base as (
        |  select doc_id, string_split_regex(trim(text), '\s+') as ws
        |  from documents where length(trim(text)) > 0),
        |toks as (select unnest(ws) as w from base),
        |v as (select cast(count(distinct w) as double) as vsize
        |      from toks where length(w) > 0),
        |g0 as (select doc_id, ws, unnest(range(0, len(ws) - 1)) as p
        |       from base where len(ws) >= 2),
        |g as (select doc_id, ws[p+1] as w1,
        |        array_to_string(ws[p+1 : p+2], ' ') as bg from g0),
        |cb as (select bg, cast(count(*) as bigint) as cbg from g group by bg),
        |cw as (select w1, cast(count(*) as bigint) as cw1 from g group by w1)
        |select doc_id, cast(count(*) as bigint) as n_bigrams,
        |  round(avg(log2(cast(cbg + 1 as double)
        |    / (cast(cw1 as double) + vsize))), 6) as mean_logp
        |from g join cb using (bg) join cw using (w1) cross join v
        |group by doc_id""".stripMargin) {
      (s, d) =>
        TextAnalysis.bigramLogProb(
          Fixtures.table(s, d, "documents"), "doc_id", "text")
    },

    // L4r — bounded-memory approximate n-gram census (SpaceSaving
    // summaries merged relationally): the 100 TB path when the distinct
    // gram set outgrows the exact census's aggregate. PROMOTED (r14,
    // the q12 pattern): estimates depend on partition layout by
    // construction, but the sketch's mergeable-summaries CONTRACT is
    // layout-independent — present grams satisfy est_lo ≤ exact ≤
    // est_hi, absent grams have exact ≤ Σ partition minima — so the
    // entry emits the exact top-40 census (hash-checked: gram, count,
    // rank) plus the in-query `sketch_ok` verdict the oracle asserts
    // true. The planted-skew spec still pins the head-exactness
    // guarantee.
    QuerySpec.df("l56_ngram_topk_approx",
      """with base as (
        |  select regexp_replace(trim(text), '\s+', ' ', 'g') as nt
        |  from documents where length(trim(text)) > 0),
        |ws as (select string_split(nt, ' ') as w from base),
        |g as (select unnest([w[i] || ' ' || w[i+1]
        |                     for i in range(1, len(w))]) as gram
        |      from ws where len(w) >= 2),
        |c as (select gram, cast(count(*) as bigint) as exact_cnt
        |      from g group by gram)
        |select gram, exact_cnt,
        |  cast(row_number() over (order by exact_cnt desc, gram) as bigint)
        |    as rank,
        |  true as sketch_ok
        |from c order by exact_cnt desc, gram limit 40""".stripMargin) {
      (s, d) =>
        TextAnalysis.ngramTopKAudit(
          Fixtures.table(s, d, "documents"), "doc_id", "text",
          n = 2, k = 40, m = 4096)
    },

    // L4p — BPE encode with the learned table: per-doc subword tokens
    // + counts (train on the corpus, apply to the corpus — the
    // sample-then-apply shape of real tokenizer pipelines).
    QuerySpec.unchecked("l50_bpe_encode") { (s, d) =>
      val docs = Fixtures.table(s, d, "documents")
      val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 20)
      TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
        .select(col("doc_id"), col("n_tokens"))
    },

    // L6o — deterministic train/val/test split assignment (80/10/10 by
    // the multiplicative id hash): membership is a pure function of
    // the doc id, so a document keeps its split across corpus versions
    // — the anti-leakage property RNG-based randomSplit loses on every
    // re-run. Scan-shaped, zero shuffle.
    QuerySpec.df("l65_split_assign",
      """select doc_id, source,
        |  case when ((doc_id * 2654435761) % 1048576) * 1.0 / 1048576 < 0.8
        |         then 'train'
        |       when ((doc_id * 2654435761) % 1048576) * 1.0 / 1048576 < 0.9
        |         then 'val'
        |       else 'test' end as split
        |from documents""".stripMargin) {
      (s, d) =>
        Corpus.assignSplits(
          Fixtures.table(s, d, "documents").select("doc_id", "source"),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    },

    // L2h — quality-aware near-dup collapse: keep the LONGEST member
    // of each cluster (Lee et al. 2021's survivor rule — truncated
    // re-crawls near-duplicate their full originals), ties to the min
    // id; l14 is the min-id-survivor sibling. Shares the verified LSH
    // edge list with l13/l14.
    QuerySpec.df("l66_keep_longest",
      s"""with recursive sh as (
         |  select doc_id, $duckShingles as sg
         |  from (select doc_id, text, string_split(text, ' ') as words from documents)
         |),
         |pairs as (
         |  select a.doc_id as id_a, b.doc_id as id_b
         |  from sh a join sh b on b.doc_id > a.doc_id
         |  where len(list_intersect(a.sg, b.sg)) * 1.0 /
         |        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.8
         |),
         |edges as (select id_a as src, id_b as dst from pairs
         |          union select id_b as src, id_a as dst from pairs),
         |reach(v, r) as (
         |  select src, src from edges
         |  union
         |  select e.src, reach.r from edges e join reach on reach.v = e.dst
         |),
         |memb as (select v, min(r) as cluster from reach group by v),
         |scored as (
         |  select m.v, m.cluster, length(d.text) as ln
         |  from memb m join documents d on d.doc_id = m.v),
         |win as (select v from (
         |  select v, row_number() over (
         |    partition by cluster order by ln desc, v asc) as rn from scored)
         |  where rn = 1),
         |losers as (select v from scored where v not in (select v from win))
         |select doc_id, cast(length(text) as bigint) as n_chars
         |from documents where doc_id not in (select v from losers)""".stripMargin) {
      (s, d) =>
        graft.operators.ConnectedComponents.collapseBestFromClusters(
          Fixtures.table(s, d, "documents"), ndClusters(s, d),
          "doc_id", length(col("text")))
          .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    },

    // L2j — per-source dedup audit (the dataset-card numbers after a
    // near-dup pass): docs in, docs/chars dropped by the min-id
    // collapse, clusters owned by each source, dedup rate. Shares the
    // memoized component labeling with l13/l14/l66.
    QuerySpec.df("l74_dedup_report",
      s"""with recursive sh as (
         |  select doc_id, $duckShingles as sg
         |  from (select doc_id, text, string_split(text, ' ') as words from documents)
         |),
         |pairs as (
         |  select a.doc_id as id_a, b.doc_id as id_b
         |  from sh a join sh b on b.doc_id > a.doc_id
         |  where len(list_intersect(a.sg, b.sg)) * 1.0 /
         |        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.8
         |),
         |edges as (select id_a as src, id_b as dst from pairs
         |          union select id_b as src, id_a as dst from pairs),
         |reach(v, r) as (
         |  select src, src from edges
         |  union
         |  select e.src, reach.r from edges e join reach on reach.v = e.dst
         |),
         |memb as (select v, min(r) as cluster from reach group by v),
         |base as (select doc_id, source, length(text) as nc from documents),
         |agg_in as (select source, count(*) as docs_in,
         |             cast(sum(nc) as bigint) as chars_in
         |           from base group by source),
         |agg_drop as (select source, count(*) as docs_dropped,
         |               cast(sum(nc) as bigint) as chars_dropped
         |             from base join memb on memb.v = base.doc_id
         |             where memb.v <> memb.cluster group by source),
         |agg_cl as (select source, count(*) as n_clusters
         |           from base join memb on memb.v = base.doc_id
         |           where memb.v = memb.cluster group by source)
         |select i.source, docs_in, chars_in,
         |  coalesce(docs_dropped, 0) as docs_dropped,
         |  coalesce(chars_dropped, 0) as chars_dropped,
         |  coalesce(n_clusters, 0) as n_clusters,
         |  round(coalesce(docs_dropped, 0) * 1.0 / docs_in, 6) as dedup_rate
         |from agg_in i
         |left join agg_drop d using (source)
         |left join agg_cl c using (source)""".stripMargin) {
      (s, d) =>
        graft.operators.ConnectedComponents.collapseReport(
          Fixtures.table(s, d, "documents"), ndClusters(s, d),
          "doc_id", "source", "text")
    },

    // L2i — cross-corpus near-dup match PROVENANCE: for each batch doc
    // every corpus doc it near-duplicates, with the exact shingle
    // Jaccard — the attribution behind l37's drop decision ("which
    // existing page is this a re-crawl of?"). The fixture plants a
    // near-copy (nearest corpus doc's text + one extra token) on batch
    // docs with doc_id % 7 == 1; natural cross near-dups participate
    // identically in both engines.
    QuerySpec.df("l67_match_provenance",
      s"""with corpus as (
         |  select doc_id, text from documents where doc_id % 3 = 0),
         |batch as (
         |  select b.doc_id,
         |    case when b.doc_id % 7 = 1 and d3.text is not null
         |         then d3.text || ' xtra' else b.text end as text
         |  from documents b
         |  left join documents d3 on d3.doc_id = b.doc_id - (b.doc_id % 3)
         |  where b.doc_id % 3 <> 0),
         |shb as (select doc_id, $duckShingles as sg
         |        from (select doc_id, text, string_split(text, ' ') as words
         |              from batch)),
         |shc as (select doc_id, $duckShingles as sg
         |        from (select doc_id, text, string_split(text, ' ') as words
         |              from corpus))
         |select b.doc_id as batch_id, c.doc_id as corpus_id,
         |  round(len(list_intersect(b.sg, c.sg)) * 1.0 /
         |        (len(b.sg) + len(c.sg) - len(list_intersect(b.sg, c.sg))), 4)
         |    as jaccard
         |from shb b join shc c on
         |  len(list_intersect(b.sg, c.sg)) * 1.0 /
         |  (len(b.sg) + len(c.sg) - len(list_intersect(b.sg, c.sg))) >= 0.8""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val corpus = docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text")
        val nearest = docs.select(col("doc_id").as("_mp_id"),
          col("text").as("_mp_text"))
        val batch = docs.filter(col("doc_id") % 3 =!= 0)
          .join(nearest,
            col("_mp_id") === col("doc_id") - (col("doc_id") % 3), "left")
          .select(col("doc_id"),
            when(col("doc_id") % 7 === 1 && col("_mp_text").isNotNull,
              concat(col("_mp_text"), lit(" xtra")))
              .otherwise(col("text")).as("text"))
        TextDedup.crossCorpusMatches(batch, corpus, "doc_id", "text",
          numHashes = 16, bands = 8)
    },

    // L4w — BM25 keyword retrieval: top-10 documents per query term
    // (Robertson/Spärck Jones probabilistic idf, k1=1.2 b=0.75) — the
    // lexical half of a RAG retrieval stack and the keyword-audit tool
    // for corpus curation. The Spark side filters to the query terms
    // BEFORE the tf shuffle, so only |terms| postings move; the oracle
    // computes the identical fixed-order formula.
    QuerySpec.df("l75_bm25_search",
      """with toks as (
        |  select doc_id, w from (
        |    select doc_id,
        |           unnest(string_split_regex(trim(text), '\s+')) as w
        |    from documents)
        |  where length(w) > 0),
        |dl as (select doc_id, count(*) as dl from toks group by doc_id),
        |stats as (select avg(dl) as avgdl, count(*) as n from dl),
        |tf as (select doc_id, w as term, count(*) as tf from toks
        |       where w in ('vector', 'hash', 'stream') group by doc_id, w),
        |dfreq as (select term, count(*) as dfreq from tf group by term),
        |scored as (
        |  select t.term, t.doc_id,
        |    round(ln((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        |      * (t.tf * (1.2 + 1.0))
        |      / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * d.dl / s.avgdl)), 6)
        |      as score
        |  from tf t join dl d using (doc_id)
        |  join dfreq using (term) cross join stats s)
        |select term, doc_id, score, cast(rank as bigint) as rank from (
        |  select *, row_number() over (
        |    partition by term order by score desc, doc_id) as rank
        |  from scored) where rank <= 10""".stripMargin) {
      (s, d) =>
        TextAnalysis.bm25(Fixtures.table(s, d, "documents"),
          "doc_id", "text", terms = Seq("vector", "hash", "stream"), k = 10)
    },

    // L4x — linear quality-classifier scoring (the fastText-style
    // model shape behind CCNet/LLaMA corpus filters): fixed-order
    // sigmoid dot product over the standard quality signals, decided
    // at 0.5. Whole classifier is codegen'd column expressions over
    // the scan — zero shuffles.
    QuerySpec.df("l76_quality_classifier",
      """with sig as (
        |  select doc_id,
        |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
        |      / greatest(length(text), 1) as alpha,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        w -> w in ('the','a','of','and','to','in','is','it'))) * 1.0
        |      / greatest(case when length(trim(text)) = 0 then 0
        |                 else len(string_split_regex(trim(text), '\s+')) end,
        |                 1) as stop,
        |    length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) * 1.0
        |      / greatest(length(text), 1) as punct,
        |    case when length(trim(text)) = 0 then 0
        |         else len(string_split_regex(trim(text), '\s+')) end as n
        |  from documents)
        |select doc_id, score, score >= 0.5 as keep from (
        |  select doc_id,
        |    round(1.0 / (1.0 + exp(-(-2.5 + 3.0 * alpha + 5.0 * stop
        |      - 8.0 * punct + 0.35 * ln(n + 1.0)))), 6) as score
        |  from sig)""".stripMargin) {
      (s, d) =>
        TextAnalysis.qualityClassifier(
          Fixtures.table(s, d, "documents"), "doc_id", "text")
    },

    // L6r — training-shard assignment: deterministic global-shuffle
    // order (multiplicative id hash), ~4096 tokens per shard, shard =
    // floor(exclusive prefix / budget). The oracle states the naive
    // single-window global cumsum; the Spark side computes the same
    // numbers with a two-pass distributed prefix sum (per-bucket
    // offsets broadcast, within-bucket windows in parallel).
    QuerySpec.df("l77_shard_assign",
      """with w as (
        |  select doc_id,
        |    cast(case when length(trim(text)) = 0 then 0
        |         else len(string_split_regex(trim(text), '\s+')) end
        |      as bigint) as n_tokens,
        |    (doc_id * 2654435761) % 1048576 as hk
        |  from documents),
        |p as (select doc_id, n_tokens,
        |        coalesce(sum(n_tokens) over (order by hk, doc_id
        |          rows between unbounded preceding and 1 preceding), 0)
        |          as pre
        |      from w)
        |select doc_id, n_tokens,
        |       cast(floor(pre / 4096.0) as bigint) as shard
        |from p""".stripMargin) {
      (s, d) =>
        Corpus.assignShards(Fixtures.table(s, d, "documents"),
          "doc_id", TextAnalysis.tokenCount(col("text")),
          tokensPerShard = 4096L)
    },

    // L6s — Unicode NFC canonicalization report: the fixture corpus is
    // ASCII, so denormalized text is PLANTED (combining acute after
    // 'cafe' on doc_id%3==0, combining ring after ' A' on doc_id%5==0)
    // — NFC composes both; the md5 fingerprints then agree between
    // engines only if the normalization semantics match code point for
    // code point.
    QuerySpec.df("l78_nfc_normalize",
      """with c as (
        |  select doc_id,
        |    text ||
        |    case when doc_id % 3 = 0 then ' cafe' || chr(769) else '' end ||
        |    case when doc_id % 5 = 0
        |         then ' A' || chr(778) || 'ngstrom' else '' end as text
        |  from documents)
        |select doc_id,
        |  cast(length(text) as bigint) as n_chars_raw,
        |  cast(length(nfc_normalize(text)) as bigint) as n_chars_nfc,
        |  (nfc_normalize(text) <> text) as changed,
        |  md5(nfc_normalize(text)) as fp
        |from c""".stripMargin) {
      (s, d) =>
        val planted = Fixtures.table(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0, " café").otherwise(""),
            when(col("doc_id") % 5 === 0, " Ångstrom").otherwise(""))
            .as("text"))
        Corpus.normalizeReport(planted, "doc_id", "text")
    },

    // L5i — energy-threshold voice-activity segmentation over real
    // decoded PCM (speech-like fixture: id%3+1 sine bursts separated
    // by silence). No SQL oracle — DuckDB can't decode WAV — so
    // rows-only here; MediaSpec verifies 100% planted-burst recall
    // with exact frame-aligned boundaries.
    QuerySpec.unchecked("l79_vad_segments") { (s, d) =>
      Multimodal.vadSegments(
        mediaPayloads(s, d, "speech",
          Multimodal.attachSpeechPayload(_, "doc_id")),
        "payload")
        // segments is array<struct<start_ms,end_ms>>; the driver's
        // canonicalizer sorts column values and an ndarray cell is
        // unhashable there (the r9 harness crash) — ship it as its
        // JSON string form, which carries the same information and
        // sorts fine
        .select(col("doc_id"), col("n_frames"), col("n_active"),
          col("active_frac"), col("n_segments"),
          to_json(col("segments")).as("segments"))
    },

    // L4w' — BM25 served from the PERSISTED inverted index: postings/
    // doclens/stats round-trip through parquet (materialized once per
    // sfDir, outside timed runs) and queries never re-tokenize the
    // corpus. Same oracle as l75 — index-serving ≡ inline is exactly
    // the claim.
    QuerySpec.df("l80_bm25_index",
      """with toks as (
        |  select doc_id, w from (
        |    select doc_id,
        |           unnest(string_split_regex(trim(text), '\s+')) as w
        |    from documents)
        |  where length(w) > 0),
        |dl as (select doc_id, count(*) as dl from toks group by doc_id),
        |stats as (select avg(dl) as avgdl, count(*) as n from dl),
        |tf as (select doc_id, w as term, count(*) as tf from toks
        |       where w in ('vector', 'hash', 'stream') group by doc_id, w),
        |dfreq as (select term, count(*) as dfreq from tf group by term),
        |scored as (
        |  select t.term, t.doc_id,
        |    round(ln((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        |      * (t.tf * (1.2 + 1.0))
        |      / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * d.dl / s.avgdl)), 6)
        |      as score
        |  from tf t join dl d using (doc_id)
        |  join dfreq using (term) cross join stats s)
        |select term, doc_id, score, cast(rank as bigint) as rank from (
        |  select *, row_number() over (
        |    partition by term order by score desc, doc_id) as rank
        |  from scored) where rank <= 10""".stripMargin) {
      (s, d) =>
        val dir = bm25IndexDirs.computeIfAbsent(d, _ => {
          val out = java.nio.file.Files
            .createTempDirectory("graft-bm25idx-").toString
          val (postings, doclens, stats) = TextAnalysis.buildBm25Index(
            Fixtures.table(s, d, "documents"), "doc_id", "text")
          postings.write.mode("overwrite").parquet(s"$out/postings.parquet")
          doclens.write.mode("overwrite").parquet(s"$out/doclens.parquet")
          stats.write.mode("overwrite").parquet(s"$out/stats.parquet")
          out
        })
        TextAnalysis.bm25AgainstIndex(
          s.read.parquet(s"$dir/postings.parquet"),
          s.read.parquet(s"$dir/doclens.parquet"),
          s.read.parquet(s"$dir/stats.parquet"),
          "doc_id", terms = Seq("vector", "hash", "stream"), k = 10)
    },

    // L4y — TRAINED multinomial Naive Bayes classifier, add-1
    // smoothing: training is two counting aggregations, so the whole
    // train+score pipeline is oracle-checkable — the trainable sibling
    // of l76's fixed-weight model. Labels derive deterministically
    // from the source column; one row per (doc, class) with the joint
    // log-likelihood and the argmax flag.
    QuerySpec.df("l81_nb_classifier",
      """with tok as (
        |  select doc_id, w from (
        |    select doc_id,
        |           unnest(string_split_regex(trim(text), '\s+')) as w
        |    from documents) where length(w) > 0),
        |lab as (select doc_id,
        |          case when source in ('src0', 'src1') then 'pos'
        |               else 'neg' end as label
        |        from documents),
        |ltok as (select t.doc_id, t.w, l.label
        |         from tok t join lab l using (doc_id)),
        |ct  as (select label, w, count(*) as c from ltok group by 1, 2),
        |tot as (select label, count(*) as n_lab from ltok group by 1),
        |v   as (select count(distinct w) as v from tok),
        |nd  as (select count(*) as n_docs from lab),
        |cls as (select label, ln(count(*) * 1.0 / n_docs) as prior
        |        from lab cross join nd group by label, n_docs),
        |dft as (select label, ln(1.0 / (n_lab + v)) as lp0
        |        from tot cross join v),
        |cls2 as (select c.label, c.prior, d.lp0
        |         from cls c join dft d using (label)),
        |model as (select label, w, ln((c + 1.0) / (n_lab + v)) as lp
        |          from ct join tot using (label) cross join v),
        |sc as (
        |  select t.doc_id, c2.label,
        |         cast(count(*) as bigint) as n_tokens,
        |         round(c2.prior + sum(coalesce(m.lp, c2.lp0)), 6) as score
        |  from tok t
        |  cross join cls2 c2
        |  left join model m on m.label = c2.label and m.w = t.w
        |  group by t.doc_id, c2.label, c2.prior, c2.lp0)
        |select doc_id, label, n_tokens, score,
        |  (row_number() over (
        |     partition by doc_id order by score desc, label) = 1) as pred
        |from sc""".stripMargin) {
      (s, d) =>
        val labeled = Fixtures.table(s, d, "documents")
          .withColumn("label",
            when(col("source").isin("src0", "src1"), "pos").otherwise("neg"))
        TextAnalysis.nbClassifier(labeled, "doc_id", "text", "label")
    },

    // L4z — CCNet perplexity bucketing: per-language unigram LM score,
    // head/middle/tail terciles within each language (ntile over a
    // total order, engine-portable).
    QuerySpec.df("l82_perplexity_buckets",
      """with tok as (
        |  select doc_id, lang, w from (
        |    select doc_id, lang,
        |           unnest(string_split_regex(trim(text), '\s+')) as w
        |    from documents) where length(w) > 0),
        |m as (select lang, w, count(*) as c from tok group by 1, 2),
        |n as (select lang, count(*) as n from tok group by 1),
        |sc as (select t.doc_id, t.lang,
        |         cast(count(*) as bigint) as n_tokens,
        |         round(avg(log2(c * 1.0 / n)), 6) as mean_logp
        |       from tok t join m using (lang, w) join n using (lang)
        |       group by t.doc_id, t.lang)
        |select doc_id, lang, n_tokens, mean_logp,
        |  case ntile(3) over (
        |         partition by lang order by mean_logp desc, doc_id)
        |    when 1 then 'head' when 2 then 'middle'
        |    else 'tail' end as bucket
        |from sc""".stripMargin) {
      (s, d) =>
        TextAnalysis.perplexityBuckets(
          Fixtures.table(s, d, "documents"), "doc_id", "text", "lang")
    },

    // L6t — content-defined chunking (gear-hash CDC): the chunk table.
    // PROMOTED (r14, the l38 planted-constant pattern): the rolling-
    // hash boundary scan has no SQL form, but the chunk table of a
    // FIXED text is a constant — the entry chunks the three
    // CompressPlants texts (doc_id % 3 classes) and the oracle joins
    // each doc against its class's pinned (idx, offset, len, fp)
    // literals. A gear-table, mask, min/max-length, or FNV regression
    // moves a cell. CdcSpec keeps reassembly, determinism, and the
    // shift-resynchronization property on real corpus text.
    QuerySpec.df("l83_cdc_chunks",
      s"""select d.doc_id, cast(l.chunk_idx as bigint) as chunk_idx,
         |  cast(l."offset" as int) as "offset", cast(l.len as int) as len,
         |  cast(l.fp as bigint) as fp
         |from documents d
         |join (values ${CompressPlants.cdcChunksValuesSql})
         |  l(cls, chunk_idx, "offset", len, fp) on l.cls = d.doc_id % 3""".stripMargin) {
      (s, d) =>
        Corpus.cdcChunkTable(plantedCompressDocs(s, d), "doc_id", "text")
    },

    // L6u — corpus CDC dedup report: the 1-row storage-dedup summary
    // (total/distinct chunks, total/unique bytes, dedup ratio) a
    // content-addressed snapshot store would realize. PROMOTED (r14):
    // over the planted classes every summary cell is arithmetic in the
    // pinned chunk literals — and the repetitive class dedups for
    // real (4 distinct fps over 17 chunks), so the ratio is a
    // meaningful constant, not 0. CdcSpec keeps the planted-
    // duplication case.
    QuerySpec.df("l84_cdc_dedup",
      s"""with per as (
         |  select case when doc_id % 3 = 0 then ${CompressPlants.cdcClassChunks(0)}
         |              when doc_id % 3 = 1 then ${CompressPlants.cdcClassChunks(1)}
         |              else ${CompressPlants.cdcClassChunks(2)} end as nch,
         |         case when doc_id % 3 = 0 then ${CompressPlants.cdcClassBytes(0)}
         |              when doc_id % 3 = 1 then ${CompressPlants.cdcClassBytes(1)}
         |              else ${CompressPlants.cdcClassBytes(2)} end as nby
         |  from documents)
         |select cast(sum(nch) as bigint) as total_chunks,
         |  cast(${CompressPlants.cdcDistinctChunks} as bigint) as distinct_chunks,
         |  cast(sum(nby) as bigint) as total_bytes,
         |  cast(${CompressPlants.cdcUniqueBytes} as bigint) as unique_bytes,
         |  round(1.0 - ${CompressPlants.cdcUniqueBytes} * 1.0 / sum(nby), 6)
         |    as dedup_ratio
         |from per""".stripMargin) { (s, d) =>
      Corpus.cdcDedupReport(plantedCompressDocs(s, d), "doc_id", "text")
    },

    // L6v — WARC crawl-shard ingest: parse the real container format
    // web crawls arrive in (hardened record walk), keep response
    // records, and hand bodies to the HTML→text chain — the true first
    // step ahead of l51. PROMOTED (r14, the l5c planted-arithmetic
    // pattern): the binary container parse has no SQL form, but the
    // synthesized shard is a pure function of doc_id (one request +
    // (id%3)+1 response records, id-derived URIs, fixed HTML bodies —
    // Warc.attachWarcPayload), so the oracle recomputes every output
    // cell arithmetically: rec_idx = k+1 (the request is record 0),
    // content_length = 37 + digits(id), text = the tag-stripped body.
    // A parser regression (offset drift, CRLF mishandling, type-filter
    // slip) breaks a cell and fails the hash. WarcSpec keeps the
    // corrupt-shard liveness and record-walk cases.
    QuerySpec.df("l85_warc_records",
      """select doc_id, cast(k + 1 as bigint) as rec_idx,
        |  'http://w' || doc_id || '.example/p' || k as target_uri,
        |  cast(37 + length(cast(doc_id as varchar)) as bigint)
        |    as content_length,
        |  'doc ' || doc_id || ' page ' || k as text
        |from (select doc_id, unnest(range(0, doc_id % 3 + 1)) as k
        |      from documents)""".stripMargin) { (s, d) =>
      graft.llm.Warc.warcRecords(
        mediaPayloads(s, d, "warc",
          graft.llm.Warc.attachWarcPayload(_, "doc_id")),
        "payload")
        .filter(col("warc_type") === "response")
        .select(col("doc_id"), col("rec_idx"), col("target_uri"),
          col("content_length"),
          Corpus.htmlToText(col("body")).as("text"))
    },

    // L6w — deterministic exact-k-per-stratum sample (first 5 of each
    // source in id-hash order): the eval-set constructor where a FIXED
    // count per group matters; membership is a pure function of the
    // ids present.
    QuerySpec.df("l86_stratified_topk",
      """select doc_id, source, sample_rank from (
        |  select doc_id, source,
        |    cast(row_number() over (partition by source
        |      order by (doc_id * 2654435761) % 1048576, doc_id) as bigint)
        |      as sample_rank
        |  from documents) where sample_rank <= 5""".stripMargin) {
      (s, d) =>
        Corpus.stratifiedTopK(
          Fixtures.table(s, d, "documents").select("doc_id", "source"),
          "source", "doc_id", k = 5)
    },

    // L2k — winnowing fingerprints (Schleimer et al. 2003, the MOSS
    // algorithm): distinct window-of-4 minima over md5'd 3-gram
    // hashes. Any shared run of >= 6 words between two documents
    // yields a common fingerprint, so an equi-join on fp finds every
    // sufficiently long overlap — the guarantee-backed sibling of
    // MinHash sampling. md5 exists in both engines, so the whole
    // fingerprint selection is oracle-checked.
    QuerySpec.df("l87_winnowing",
      """with g as (
        |  select doc_id,
        |    case when len(ws) < 3 then []
        |         else [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |               for i in range(1, len(ws) - 1)] end as grams
        |  from (select doc_id, text, string_split(text, ' ') as ws
        |        from documents)),
        |h as (select doc_id, list_transform(grams, x -> md5(x)) as hs
        |      from g),
        |f as (select doc_id,
        |        case when len(hs) = 0 then []
        |             when len(hs) < 4 then [list_min(hs)]
        |             else list_distinct([list_min(hs[i:i+3])
        |                    for i in range(1, len(hs) - 2)]) end as fps
        |      from h)
        |select doc_id, unnest(fps) as fp from f""".stripMargin) {
      (s, d) =>
        Fixtures.table(s, d, "documents")
          .select(col("doc_id"),
            graft.functions.TextShingles.grams(col("text"), 3).as("g"))
          .select(col("doc_id"),
            explode(graft.functions.Winnow.fingerprints(col("g"), 4)).as("fp"))
    },

    // L5j — PCM resample to one canonical rate (the mono/16k-style
    // normalization audio pipelines apply before features): linear
    // interpolation over the real decoded samples, re-encoded as WAV
    // so the whole audio operator family runs downstream unchanged.
    // PROMOTED (r14): the resampled BYTES aren't SQL-expressible, but
    // every selected column is — the planted tone WAV is
    // (8 kHz, 2000 frames) for every doc, so n_out = ⌊2000·16000/8000⌋
    // = 4000 and the re-encoded container is 44 + 2·n_out bytes. A
    // header-parse, ratio, or WAV-framing regression breaks a cell;
    // MediaSpec keeps proving the tone itself survives the rate change
    // via Goertzel detection.
    QuerySpec.df("l88_audio_resample",
      """select doc_id, cast(8000 as int) as src_rate,
        |  cast(2000 as bigint) as n_in, cast(4000 as bigint) as n_out,
        |  cast(8044 as int) as n_bytes
        |from documents""".stripMargin) { (s, d) =>
      Multimodal.resampleAudio(
        mediaPayloads(s, d, "tone",
          Multimodal.attachTonePayload(_, "doc_id")),
        "payload", targetRate = 16000)
        .select(col("doc_id"), col("src_rate"), col("n_in"), col("n_out"),
          octet_length(col("resampled")).as("n_bytes"))
    },

    // L5k — DCT perceptual hash (pHash), decode-verified AND
    // hash-checked: the planted 37-group PNG fixture must collapse to
    // exactly ONE distinct pHash code per group — real pixel decode,
    // real 32×32 DCT, median threshold. Complements l47's dHash
    // (median thresholding survives global brightness shifts that
    // break gradient codes; MediaSpec proves that contrast).
    QuerySpec.df("l89_image_phash",
      s"""select cast(doc_id % $imgGroupsSql as bigint) as grp,
        |  cast(count(*) as bigint) as n_docs,
        |  cast(1 as bigint) as n_distinct_codes
        |from documents group by 1""".stripMargin) {
      (s, d) =>
        Multimodal.imagePHash(
          mediaPayloads(s, d, "imggroup",
            Multimodal.attachGroupedImagePayload(_, "doc_id",
              groups = imgGroups(s, d))),
          "payload")
          .groupBy((col("doc_id") % imgGroups(s, d)).as("grp"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("phash")).as("n_distinct_codes"))
    },

    // L6x — per-source dataset-card composition report: the numbers a
    // dataset card publishes next to l74's dedup table — volume,
    // language spread, mean quality signals, classifier keep rate.
    QuerySpec.df("l90_dataset_card",
      """with sig as (
        |  select source, lang, length(text) as nc,
        |    case when length(trim(text)) = 0 then 0
        |         else len(string_split_regex(trim(text), '\s+')) end as n,
        |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
        |      / greatest(length(text), 1) as alpha,
        |    length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) * 1.0
        |      / greatest(length(text), 1) as punct,
        |    length(regexp_replace(text, '\s+', '', 'g')) * 1.0
        |      / greatest(case when length(trim(text)) = 0 then 0
        |                 else len(string_split_regex(trim(text), '\s+')) end,
        |                 1) as wlen,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        w -> w in ('the','a','of','and','to','in','is','it'))) * 1.0
        |      / greatest(case when length(trim(text)) = 0 then 0
        |                 else len(string_split_regex(trim(text), '\s+')) end,
        |                 1) as stop
        |  from documents)
        |select source,
        |  cast(count(*) as bigint) as n_docs,
        |  cast(sum(n) as bigint) as n_tokens,
        |  cast(sum(nc) as bigint) as n_chars,
        |  cast(count(distinct lang) as bigint) as n_langs,
        |  round(avg(alpha), 6) as mean_alpha_ratio,
        |  round(avg(punct), 6) as mean_punct_ratio,
        |  round(avg(wlen), 6) as mean_word_len,
        |  round(sum(case when round(1.0 / (1.0 + exp(-(-2.5 + 3.0 * alpha
        |      + 5.0 * stop - 8.0 * punct + 0.35 * ln(n + 1.0)))), 6) >= 0.5
        |      then 1 else 0 end) * 1.0 / count(*), 6) as keep_frac
        |from sig group by source""".stripMargin) {
      (s, d) =>
        Corpus.datasetCard(Fixtures.table(s, d, "documents"),
          "source", "lang", "text")
    },

    // L2l — COMPLETE banded edit-distance join (record linkage /
    // typo-tolerant title matching): the q-gram value bound (k edits
    // change ≤ k·q gram values) makes the banded equi-join provably
    // complete, so the Spark side must reproduce the brute-force
    // all-pairs oracle EXACTLY — exactness is the operator's claim.
    // Fixture: 5-word titles; batch plants a dropped 3rd character on
    // every doc_id % 3 == 0 title.
    QuerySpec.df("l91_fuzzy_join",
      """with titles as (
        |  select doc_id,
        |    array_to_string((string_split(text, ' '))[1:5], ' ') as title
        |  from documents),
        |batch as (
        |  select doc_id + 100000 as doc_id,
        |    substr(title, 1, 2) || substr(title, 4) as title
        |  from titles where doc_id % 3 = 0)
        |select t.doc_id as id_l, b.doc_id as id_r,
        |  cast(levenshtein(t.title, b.title) as int) as dist
        |from titles t cross join batch b
        |where levenshtein(t.title, b.title) <= 2""".stripMargin) {
      (s, d) =>
        val titles = Fixtures.table(s, d, "documents")
          .select(col("doc_id"),
            array_join(slice(split(col("text"), " "), 1, 5), " ").as("title"))
        val batch = titles.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(substring(col("title"), 1, 2),
              expr("substring(title, 4)")).as("title"))
        TextDedup.editDistancePairs(titles, batch,
          "doc_id", "title", "doc_id", "title", maxDist = 2)
    },

    // L3g — hard-negative mining (contrastive retriever training prep):
    // per query, the top-5 most-similar vectors with a DIFFERENT
    // label. Exact-scoring oracle, l05's conventions.
    QuerySpec.df("l92_hard_negatives",
      s"""select q_id, c_id, round(cos, 4) as cos, rk from (
         |  select q_id, c_id, cos,
         |    row_number() over (partition by q_id
         |                       order by round(cos, 6) desc, c_id) as rk
         |  from (
         |    select q.vec_id as q_id, c.vec_id as c_id,
         |      ${duckDot.format("q.embedding", "c.embedding")} /
         |      (${duckNorm("q.embedding")} * ${duckNorm("c.embedding")}) as cos
         |    from embeddings q join embeddings c
         |      on q.vec_id <> c.vec_id and q.label <> c.label
         |    where q.vec_id < 20
         |  )
         |) where rk <= 5""".stripMargin) {
      (s, d) =>
        val emb = Fixtures.table(s, d, "embeddings")
        Similarity.hardNegatives(
          emb.filter(col("vec_id") < 20)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
              col("label").as("q_label")),
          emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
            col("label").as("c_label")),
          "q_id", "c_id", "q_vec", "c_vec", "q_label", "c_label", k = 5)
    },

    // L3h — incremental IVF index ingest (the FAISS `add` path): the
    // timed query encodes a NEW batch against the frozen persisted
    // quantizer and searches the grown index — no retrain, no
    // re-encode of the existing postings. Rows-only; LlmSpec proves
    // append ≡ one-pass encode and planted-neighbor recall through
    // the appended index.
    QuerySpec.unchecked("l93_ivf_append") { (s, d) =>
      val emb = Fixtures.table(s, d, "embeddings")
      val corpusA = emb.filter(col("vec_id") % 5 =!= 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val batchB = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val base = ivfAppendDirs.computeIfAbsent(d, _ => {
        val out = java.nio.file.Files
          .createTempDirectory("graft-ivfapp-").toString
        val (quantizer, postings) =
          Similarity.buildIvfIndex(corpusA, "c_id", "c_vec")
        quantizer.write.mode("overwrite").parquet(s"$out/quantizer.parquet")
        postings.repartition(s.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(s"$out/postings.parquet")
        out
      })
      val quantizer = s.read.parquet(s"$base/quantizer.parquet")
      val grown = s.read.parquet(s"$base/postings.parquet")
        .unionByName(Similarity.appendToIvfIndex(
          batchB, quantizer, "c_id", "c_vec"))
      Similarity.ivfPqTopKAgainstIndex(
        emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        quantizer, grown,
        corpusA.unionByName(batchB),
        "q_id", "c_id", "q_vec", "c_vec", k = 5)
    },

    // L3i — true product quantization (Jégou et al. 2011): m=8
    // subspace codebooks, 8-byte codes (32× compression), per-query
    // ADC dot table, exact rerank of the shortlist — the
    // memory-bandwidth ANN workhorse, isolated from the IVF cell
    // filter it composes with. Approximate by design → rows-only;
    // LlmSpec measures planted-near-dup recall.
    QuerySpec.unchecked("l94_pq_ann") { (s, d) =>
      val emb = Fixtures.table(s, d, "embeddings")
      Similarity.pqTopK(
        emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
        "q_id", "c_id", "q_vec", "c_vec", k = 5)
    },

    // L6y — the training-shard WRITER (l77's layout materialized):
    // shard=N parquet dirs, deterministic within-shard order, and the
    // returned summary is read back FROM THE WRITTEN FILES — so the
    // oracle (the naive global-window assignment, grouped by shard)
    // hash-checks the full write→read round trip, not just a plan.
    QuerySpec.df("l95_write_shards",
      """with w as (
        |  select doc_id,
        |    cast(case when length(trim(text)) = 0 then 0
        |         else len(string_split_regex(trim(text), '\s+')) end
        |      as bigint) as n_tokens,
        |    (doc_id * 2654435761) % 1048576 as hk
        |  from documents),
        |p as (select doc_id, n_tokens,
        |        coalesce(sum(n_tokens) over (order by hk, doc_id
        |          rows between unbounded preceding and 1 preceding), 0)
        |          as pre
        |      from w),
        |a as (select doc_id, n_tokens,
        |        cast(floor(pre / 4096.0) as bigint) as shard from p)
        |select shard, cast(count(*) as bigint) as n_docs,
        |       cast(sum(n_tokens) as bigint) as shard_tokens
        |from a group by shard""".stripMargin) {
      (s, d) =>
        val out = shardDirs.computeIfAbsent(d, _ =>
          java.nio.file.Files.createTempDirectory("graft-shards-").toString)
        Corpus.writeShards(Fixtures.table(s, d, "documents"),
          "doc_id", TextAnalysis.tokenCount(col("text")),
          tokensPerShard = 4096L, dir = s"$out/shards")
    },

    // L4aa — PMI collocations (Church & Hanks 1990): top-20 unordered
    // ±2-window pairs by pointwise mutual information (min pair count
    // 5) — the attachment miner a raw frequency census can't provide.
    QuerySpec.df("l96_pmi_collocations",
      """with base as (
        |  select regexp_replace(trim(text), '\s+', ' ', 'g') as t
        |  from documents where length(trim(text)) > 0),
        |wst as (select string_split(t, ' ') as ws from base),
        |toks as (select unnest(ws) as w from wst),
        |uni as (select w, count(*) as c_w from toks group by w),
        |tt as (select sum(c_w) as t from uni),
        |pr as (
        |  select unnest([[ws[i], ws[i+1]] for i in range(1, len(ws))])
        |    as pr
        |  from wst where len(ws) >= 2
        |  union all
        |  select unnest([[ws[i], ws[i+2]] for i in range(1, len(ws) - 1)])
        |    as pr
        |  from wst where len(ws) >= 3),
        |pairs as (select least(pr[1], pr[2]) as a,
        |                 greatest(pr[1], pr[2]) as b from pr),
        |pc as (select a, b, count(*) as c_ab from pairs group by a, b),
        |tp as (select sum(c_ab) as p from pc),
        |sc as (select a, b, c_ab,
        |         round(ln((c_ab * 1.0 / p) /
        |           ((ua.c_w * 1.0 / t) * (ub.c_w * 1.0 / t))), 6) as pmi
        |       from pc
        |       join uni ua on ua.w = pc.a
        |       join uni ub on ub.w = pc.b
        |       cross join tt cross join tp
        |       where c_ab >= 5)
        |select a, b, c_ab, pmi, rank from (
        |  select *, row_number() over (order by pmi desc, a, b) as rank
        |  from sc) where rank <= 20""".stripMargin) {
      (s, d) =>
        TextAnalysis.pmiCollocations(
          Fixtures.table(s, d, "documents"), "doc_id", "text",
          k = 20, minCount = 5L)
    },

    // L3j — per-label embedding drift between corpus versions (the
    // embedding-space sibling of l60's vocab drift): cosine between
    // each label's old and new mean vector. The new version plants a
    // label-scaled bump on every 5th dimension, so the expected drift
    // is label-dependent and both engines derive it from the same
    // integer formula.
    QuerySpec.df("l97_embedding_drift",
      """with o as (
        |  select label, pr.d as d, pr.x as x from (
        |    select label,
        |      unnest([{'d': i, 'x': cast(embedding[i] as double)}
        |              for i in range(1, len(embedding) + 1)]) as pr
        |    from embeddings)),
        |nv as (
        |  select label, pr.d as d, pr.x as x from (
        |    select label,
        |      unnest([{'d': i,
        |               'x': cast(embedding[i] as double) * 1.01
        |                 + 0.02 * ((label % 3) + 1)
        |                 * (case when (i - 1) % 5 = 0 then 1
        |                    else 0 end)}
        |              for i in range(1, len(embedding) + 1)]) as pr
        |    from embeddings)),
        |om as (select label, d, avg(x) as mo, count(*) as no
        |       from o group by 1, 2),
        |nm as (select label, d, avg(x) as mn, count(*) as nn
        |       from nv group by 1, 2)
        |select label, max(no) as n_old, max(nn) as n_new,
        |  round(sum(mo * mn) /
        |    (sqrt(sum(mo * mo)) * sqrt(sum(mn * mn))), 6) as drift_cos
        |from om join nm using (label, d)
        |group by label""".stripMargin) {
      (s, d) =>
        val emb = Fixtures.table(s, d, "embeddings")
        val newV = emb.select(col("vec_id"), col("label"),
          transform(col("embedding").cast("array<double>"), (x, i) =>
            x * lit(1.01) + lit(0.02) * ((col("label") % 3) + 1) *
              when(i % 5 === 0, 1).otherwise(0)).as("embedding"))
        Similarity.embeddingDrift(emb, newV, "vec_id", "embedding", "label")
    },

    // L9a — PageRank link centrality (the crawl-prioritization /
    // source-quality prior; operators/PageRank.scala). Planted link
    // graph over doc_ids: a ring (connectivity), a quadratic map
    // (irregular in-degree), and 25 hub targets (skew) — node 20 ends
    // up with ~5% of all mass, so the ranking is meaningfully skewed.
    // The oracle unrolls the same 4 power iterations as CTEs; both
    // engines round each iteration to 12 dp (cross-engine sum-order
    // stability) and the output to 6 dp.
    QuerySpec.df("l98_pagerank",
      """with nn as (select count(*) as n from documents),
        |edges as (select distinct src, dst from (
        |    select doc_id as src, (doc_id + 1) % (select n from nn) as dst from documents
        |    union all
        |    select doc_id, (doc_id * doc_id + 1) % (select n from nn) from documents
        |    union all
        |    select doc_id, (doc_id % 25) * 20 from documents)),
        |deg as (select src, count(*) as outdeg from edges group by 1),
        |r0 as (select doc_id as id,
        |         round(cast(1.0 as double) / (select n from nn), 12) as pr
        |       from documents),
        |it1 as (select r.id, round(cast(0.15 as double) / (select n from nn)
        |          + cast(0.85 as double) * coalesce(s.mass, 0), 12) as pr
        |        from r0 r left join (
        |          select e.dst, cast(sum(cast(r2.pr / d.outdeg as decimal(28,18))) as double) as mass
        |          from edges e join r0 r2 on e.src = r2.id
        |          join deg d on e.src = d.src group by 1) s on r.id = s.dst),
        |it2 as (select r.id, round(cast(0.15 as double) / (select n from nn)
        |          + cast(0.85 as double) * coalesce(s.mass, 0), 12) as pr
        |        from it1 r left join (
        |          select e.dst, cast(sum(cast(r2.pr / d.outdeg as decimal(28,18))) as double) as mass
        |          from edges e join it1 r2 on e.src = r2.id
        |          join deg d on e.src = d.src group by 1) s on r.id = s.dst),
        |it3 as (select r.id, round(cast(0.15 as double) / (select n from nn)
        |          + cast(0.85 as double) * coalesce(s.mass, 0), 12) as pr
        |        from it2 r left join (
        |          select e.dst, cast(sum(cast(r2.pr / d.outdeg as decimal(28,18))) as double) as mass
        |          from edges e join it2 r2 on e.src = r2.id
        |          join deg d on e.src = d.src group by 1) s on r.id = s.dst),
        |it4 as (select r.id, round(cast(0.15 as double) / (select n from nn)
        |          + cast(0.85 as double) * coalesce(s.mass, 0), 12) as pr
        |        from it3 r left join (
        |          select e.dst, cast(sum(cast(r2.pr / d.outdeg as decimal(28,18))) as double) as mass
        |          from edges e join it3 r2 on e.src = r2.id
        |          join deg d on e.src = d.src group by 1) s on r.id = s.dst)
        |select id, round(pr, 6) as pr from it4""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val n = docs.count() // fixture planting needs the modulus; bounded scalar
        val edges = docs.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % n).as("dst"))
          .unionAll(docs.select(col("doc_id").as("src"),
            ((col("doc_id") * col("doc_id") + 1) % n).as("dst")))
          .unionAll(docs.select(col("doc_id").as("src"),
            ((col("doc_id") % 25) * 20).as("dst")))
        graft.operators.PageRank.run(edges, "src", "dst",
            iterations = 4, damping = 0.85)
          .select(col("id"), round(col("pr"), 6).as("pr"))
    },

    // L9b — conversation (SFT/chat) structural stats: the planted
    // transcripts wrap each document's words into the standard
    // [{"role","content"}] JSON shape (4 turns: 3/3/2/rest words —
    // min doc length is 10 words, so every turn is non-empty); the
    // operator parses with from_json and aggregates with array HOFs,
    // the oracle with DuckDB's json_extract — two independent JSON
    // parsers agreeing on every count.
    QuerySpec.df("l99_chat_stats",
      """with ws as (select doc_id, string_split_regex(trim(text), '\s+') as ws
        |            from documents),
        |conv as (select doc_id,
        |  '[{"role":"user","content":"' || array_to_string(ws[1:3], ' ') ||
        |  '"},{"role":"assistant","content":"' || array_to_string(ws[4:6], ' ') ||
        |  '"},{"role":"user","content":"' || array_to_string(ws[7:8], ' ') ||
        |  '"},{"role":"assistant","content":"' || array_to_string(ws[9:len(ws)], ' ')
        |  || '"}]' as conv
        |  from ws),
        |t as (select doc_id,
        |        cast(json_array_length(conv) as bigint) as nt,
        |        [json_extract_string(conv, '$[' || i || '].role')
        |         for i in range(0, cast(json_array_length(conv) as bigint))] as roles,
        |        [json_extract_string(conv, '$[' || i || '].content')
        |         for i in range(0, cast(json_array_length(conv) as bigint))] as contents
        |      from conv),
        |agg as (select doc_id, nt,
        |  cast(len(list_filter(roles, r -> r = 'user')) as bigint) as n_user,
        |  cast(len(list_filter(roles, r -> r = 'assistant')) as bigint) as n_assistant,
        |  cast(list_sum(list_transform(list_zip(roles, contents),
        |    p -> case when p[1] = 'user' then length(p[2]) else 0 end)) as bigint)
        |    as user_chars,
        |  cast(list_sum(list_transform(list_zip(roles, contents),
        |    p -> case when p[1] = 'assistant' then length(p[2]) else 0 end)) as bigint)
        |    as assistant_chars,
        |  len(list_filter(range(0, nt), i ->
        |    roles[i + 1] = case when i % 2 = 0 then 'user' else 'assistant' end)) = nt
        |    as alternation_ok,
        |  roles[nt] = 'assistant' as ends_assistant
        |  from t)
        |select doc_id, nt as n_turns, n_user, n_assistant, user_chars,
        |  assistant_chars,
        |  round(cast(user_chars as double) /
        |    greatest(user_chars + assistant_chars, 1), 6) as user_share,
        |  alternation_ok, ends_assistant, true as valid_json
        |from agg""".stripMargin) {
      (s, d) =>
        val ws = split(trim(col("text")), "\\s+")
        val planted = Fixtures.table(s, d, "documents").select(
          col("doc_id"),
          concat(
            lit("""[{"role":"user","content":""""),
            array_join(slice(ws, 1, 3), " "),
            lit(""""},{"role":"assistant","content":""""),
            array_join(slice(ws, 4, 3), " "),
            lit(""""},{"role":"user","content":""""),
            array_join(slice(ws, 7, 2), " "),
            lit(""""},{"role":"assistant","content":""""),
            array_join(slice(ws, lit(9), greatest(size(ws) - 8, lit(1))), " "),
            lit(""""}]""")).as("conv"))
        graft.llm.Chat.conversationStats(planted, "doc_id", "conv")
    },

    // L9c — cluster-balanced (diversity) sampling: exact per-cell
    // quota over learned k-means cells (the D4-style topic-balanced
    // curation sample). The quantizer is deterministic but not
    // SQL-expressible → rows-only here; ChatSpec proves the
    // per-cell exact-k quota, full coverage, and partitioning
    // invariance.
    QuerySpec.unchecked("l100_cluster_sample") { (s, d) =>
      Similarity.clusterBalancedSample(
        Fixtures.table(s, d, "embeddings"), "vec_id", "embedding",
        nCells = 16, perCell = 5)
    },

    // L9d — margin-based bitext mining (Artetxe & Schwenk): source
    // side = labels 0-4 (vec_id < 40 keeps the oracle's pair frame
    // small), target side = labels 5-9; best target per source by
    // ratio margin over top-4 neighbor averages, hubs suppressed.
    QuerySpec.df("l101_bitext_margin",
      s"""with s as (select vec_id as s_id, embedding as sv from embeddings
         |           where label < 5 and vec_id < 40),
         |t as (select vec_id as t_id, embedding as tv from embeddings
         |      where label >= 5),
         |pairs as (select s_id, t_id,
         |    round(${duckDot.format("sv", "tv")} /
         |      (${duckNorm("sv")} * ${duckNorm("tv")}), 6) as cos
         |  from s cross join t),
         |aks as (select s_id, round(avg(cos), 6) as ak_s from (
         |    select s_id, cos, row_number() over (
         |      partition by s_id order by cos desc, t_id) as nn from pairs)
         |  where nn <= 4 group by 1),
         |akt as (select t_id, round(avg(cos), 6) as ak_t from (
         |    select t_id, cos, row_number() over (
         |      partition by t_id order by cos desc, s_id) as nn from pairs)
         |  where nn <= 4 group by 1),
         |m as (select p.s_id, p.t_id, p.cos,
         |        round(p.cos / ((ak_s + ak_t) / 2), 6) as margin
         |      from pairs p join aks using (s_id) join akt using (t_id))
         |select s_id, t_id, cos, margin from (
         |  select *, row_number() over (
         |    partition by s_id order by margin desc, t_id) as rk from m)
         |where rk = 1 and margin >= 1.0""".stripMargin) {
      (s, d) =>
        val emb = Fixtures.table(s, d, "embeddings")
        Similarity.marginMining(
          emb.filter(col("label") < 5 && col("vec_id") < 40)
            .select(col("vec_id").as("s_id"), col("embedding").as("sv")),
          emb.filter(col("label") >= 5)
            .select(col("vec_id").as("t_id"), col("embedding").as("tv")),
          "s_id", "t_id", "sv", "tv", k = 4, minMargin = 1.0)
    },

    // L9e — weighted sampling without replacement (Efraimidis &
    // Spirakis priorities), 3 per source weighted by n_chars: the
    // quality-weighted subsample step. Rank key ln(u)/w with u from
    // the engine-portable q34 integer mix — deterministic, partition-
    // invariant, and identical in both engines.
    QuerySpec.df("l102_weighted_sample",
      """with pri as (
        |  select source, doc_id,
        |    round(ln(((doc_id * 2654435761 + 42) % 1048576 + 1)
        |             / cast(1048577.0 as double)) / n_chars, 9) as p
        |  from documents where n_chars > 0)
        |select source, doc_id, pick from (
        |  select source, doc_id, row_number() over (
        |    partition by source order by p desc, doc_id) as pick from pri)
        |where pick <= 3""".stripMargin) {
      (s, d) =>
        Corpus.weightedSample(
          Fixtures.table(s, d, "documents"), "source", "doc_id",
          col("n_chars"), k = 3)
          .select("source", "doc_id", "pick")
    },

    // L9f — TrustRank (personalized PageRank from a vetted seed set;
    // Gyöngyi et al. 2004): same planted link graph as l98, teleport
    // concentrated on the doc_id % 50 = 0 seeds — the crawl spam
    // demotion signal. Oracle unrolls the same 4 seeded iterations.
    QuerySpec.df("l103_trustrank",
      """with nn as (select count(*) as n from documents),
        |edges as (select distinct src, dst from (
        |    select doc_id as src, (doc_id + 1) % (select n from nn) as dst from documents
        |    union all
        |    select doc_id, (doc_id * doc_id + 1) % (select n from nn) from documents
        |    union all
        |    select doc_id, (doc_id % 25) * 20 from documents)),
        |deg as (select src, count(*) as outdeg from edges group by 1),
        |seeds as (select doc_id as id from documents where doc_id % 50 = 0),
        |ns as (select count(*) as s from seeds),
        |base as (select d.doc_id as id,
        |           case when s.id is not null
        |                then round(cast(1.0 as double) / (select s from ns), 12)
        |                else cast(0 as double) end as t
        |         from documents d left join seeds s on d.doc_id = s.id),
        |r0 as (select id, t as pr from base),
        |it1 as (select b.id, b.t, round(cast(0.15 as double) * b.t
        |          + cast(0.85 as double) * coalesce(s.mass, 0), 12) as pr
        |        from base b left join (
        |          select e.dst, cast(sum(cast(r.pr / d.outdeg as decimal(28,18))) as double) as mass
        |          from edges e join r0 r on e.src = r.id
        |          join deg d on e.src = d.src group by 1) s on b.id = s.dst),
        |it2 as (select b.id, b.t, round(cast(0.15 as double) * b.t
        |          + cast(0.85 as double) * coalesce(s.mass, 0), 12) as pr
        |        from base b left join (
        |          select e.dst, cast(sum(cast(r.pr / d.outdeg as decimal(28,18))) as double) as mass
        |          from edges e join it1 r on e.src = r.id
        |          join deg d on e.src = d.src group by 1) s on b.id = s.dst),
        |it3 as (select b.id, b.t, round(cast(0.15 as double) * b.t
        |          + cast(0.85 as double) * coalesce(s.mass, 0), 12) as pr
        |        from base b left join (
        |          select e.dst, cast(sum(cast(r.pr / d.outdeg as decimal(28,18))) as double) as mass
        |          from edges e join it2 r on e.src = r.id
        |          join deg d on e.src = d.src group by 1) s on b.id = s.dst),
        |it4 as (select b.id, b.t, round(cast(0.15 as double) * b.t
        |          + cast(0.85 as double) * coalesce(s.mass, 0), 12) as pr
        |        from base b left join (
        |          select e.dst, cast(sum(cast(r.pr / d.outdeg as decimal(28,18))) as double) as mass
        |          from edges e join it3 r on e.src = r.id
        |          join deg d on e.src = d.src group by 1) s on b.id = s.dst)
        |select id, round(pr, 6) as trust from it4""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % n).as("dst"))
          .unionAll(docs.select(col("doc_id").as("src"),
            ((col("doc_id") * col("doc_id") + 1) % n).as("dst")))
          .unionAll(docs.select(col("doc_id").as("src"),
            ((col("doc_id") % 25) * 20).as("dst")))
        val seeds = docs.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("id"))
        graft.operators.PageRank.personalized(edges, seeds,
            "src", "dst", "id", iterations = 4, damping = 0.85)
          .select(col("id"), round(col("trust"), 6).as("trust"))
    },

    // L9g — late-interaction multi-vector retrieval (ColBERT MaxSim):
    // each 64-dim fixture vector becomes 8 token vectors of 8 dims;
    // score = per-query-token best-match sum, evaluated inside one
    // codegen'd expression per (doc, query) row. Top-3 per query.
    QuerySpec.df("l104_maxsim",
      """with toks as (
        |  select vec_id, i as ti, embedding[(i-1)*8+1 : (i-1)*8+8] as tv
        |  from embeddings cross join range(1, 9) t(i)),
        |q as (select vec_id as q_id, ti as qi, tv as qv from toks where vec_id < 5),
        |c as (select vec_id as d_id, ti as di, tv as dv from toks),
        |cells as (
        |  select q_id, qi, d_id, max(round(
        |    list_sum(list_transform(list_zip(qv, dv),
        |      s -> cast(s[1] as double) * cast(s[2] as double))) /
        |    (sqrt(list_sum(list_transform(qv, x -> cast(x as double) * cast(x as double)))) *
        |     sqrt(list_sum(list_transform(dv, x -> cast(x as double) * cast(x as double))))),
        |    6)) as m
        |  from q join c on q_id <> d_id
        |  group by 1, 2, 3),
        |scores as (select q_id, d_id,
        |           cast(round(sum(cast(m as decimal(18,6))), 4) as double) as score
        |           from cells group by 1, 2)
        |select q_id, d_id, score, rk from (
        |  select *, row_number() over (
        |    partition by q_id order by score desc, d_id) as rk
        |  from scores) where rk <= 3""".stripMargin) {
      (s, d) =>
        val emb = Fixtures.table(s, d, "embeddings")
        def toks = transform(sequence(lit(0), lit(7)), i =>
          slice(col("embedding"), i * 8 + 1, lit(8)))
        Similarity.maxSimTopK(
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), toks.as("q_toks")),
          emb.select(col("vec_id").as("d_id"), toks.as("d_toks")),
          "q_id", "d_id", "q_toks", "d_toks", k = 3)
    },

    // L9h — asymmetric containment pairs (quote/excerpt detection):
    // every doc_id % 10 == 7 becomes the first 3·len/5 words of its
    // predecessor, so containment 1.0 pairs exist that symmetric
    // Jaccard scores ~0.6 and misses at any near-dup threshold. The
    // Spark side probes a gram inverted index with each doc's 3
    // min-hashed grams (certain hit at c = 1); the oracle is the
    // all-pairs exact formulation.
    QuerySpec.df("l105_containment",
      s"""with prev as (select doc_id + 1 as doc_id,
         |         string_split(text, ' ') as pws from documents),
         |planted as (
         |  select b.doc_id,
         |    case when b.doc_id % 10 = 7 and pws is not null
         |         then array_to_string(pws[1 : (len(pws) * 3) // 5], ' ')
         |         else b.text end as text
         |  from documents b left join prev using (doc_id)),
         |sh as (select doc_id, $duckGrams8 as sg
         |       from (select doc_id, text, string_split(text, ' ') as words
         |             from planted))
         |select a.doc_id as a_id, b.doc_id as b_id,
         |  round(cast(len(list_intersect(a.sg, b.sg)) as double) / len(a.sg), 6)
         |    as containment
         |from sh a join sh b on a.doc_id <> b.doc_id
         |where cast(len(list_intersect(a.sg, b.sg)) as double) / len(a.sg) >= 0.8
         |""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val prev = docs.select((col("doc_id") + 1).as("doc_id"),
          split(col("text"), " ").as("pws"))
        val planted = docs.join(prev, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("doc_id") % 10 === 7 && col("pws").isNotNull,
              array_join(slice(col("pws"), lit(1),
                (size(col("pws")) * 3) / 5), " "))
              .otherwise(col("text")).as("text"))
        TextDedup.containmentPairs(planted, "doc_id", "text",
          k = 8, minContainment = 0.8, probes = 3)
    },

    // L9i — Markdown → text (the htmlToText sibling): fixture docs
    // wrapped in deterministic markdown furniture (header, fenced
    // code, bold body, bulleted link, quoted inline code, thematic
    // break); both engines strip with the same RE2-compatible chain.
    QuerySpec.df("l106_markdown_to_text",
      """with planted as (select doc_id,
        |  '# doc ' || doc_id || chr(10) ||
        |  '```' || chr(10) || 'code ' || doc_id || chr(10) || '```' || chr(10) ||
        |  '**' || text || '**' || chr(10) ||
        |  '- item with [a link](https://ex.com/p/' || doc_id || ')' || chr(10) ||
        |  '> quoted `inline' || doc_id || '` end' || chr(10) ||
        |  '---' as md
        |  from documents),
        |s1 as (select doc_id, regexp_replace(md, '(?s)```.*?```', ' ', 'g') as t from planted),
        |s2 as (select doc_id, regexp_replace(t, '!\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') as t from s1),
        |s3 as (select doc_id, regexp_replace(t, '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') as t from s2),
        |s4 as (select doc_id, regexp_replace(t, '`([^`]*)`', '\1', 'g') as t from s3),
        |s5 as (select doc_id, regexp_replace(t, '(?m)^#{1,6}[ \t]+', '', 'g') as t from s4),
        |s6 as (select doc_id, regexp_replace(t, '\*\*([^*]*)\*\*', '\1', 'g') as t from s5),
        |s7 as (select doc_id, regexp_replace(t, '\*([^*]*)\*', '\1', 'g') as t from s6),
        |s8 as (select doc_id, regexp_replace(t, '(?m)^>[ \t]?', '', 'g') as t from s7),
        |s9 as (select doc_id, regexp_replace(t, '(?m)^[ \t]*([-*+]|[0-9]+\.)[ \t]+', '', 'g') as t from s8),
        |s10 as (select doc_id, regexp_replace(t, '(?m)^[ \t]*([-*_][ \t]*){3,}$', '', 'g') as t from s9)
        |select doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) as text
        |from s10""".stripMargin) {
      (s, d) =>
        val planted = Fixtures.table(s, d, "documents").select(
          col("doc_id"),
          concat(
            lit("# doc "), col("doc_id"), lit("\n"),
            lit("```\ncode "), col("doc_id"), lit("\n```\n"),
            lit("**"), col("text"), lit("**\n"),
            lit("- item with [a link](https://ex.com/p/"), col("doc_id"), lit(")\n"),
            lit("> quoted `inline"), col("doc_id"), lit("` end\n"),
            lit("---")).as("md"))
        planted.select(col("doc_id"),
          Corpus.markdownToText(col("md")).as("text"))
    },

    // L9j — orthogonal Procrustes embedding alignment (Schönemann):
    // the new corpus version is the old one through a planted
    // block-diagonal rotation; the fitted W = UVᵀ must absorb it
    // (resid_aligned ≈ 0) while the raw residual stays large. SVD has
    // no SQL form → rows-only; AlignSpec proves rotation recovery,
    // orthogonality, and the noisy-case residual drop.
    QuerySpec.unchecked("l107_procrustes_align") { (s, d) =>
      val emb = Fixtures.table(s, d, "embeddings")
      val rotated = emb.select(col("vec_id"), col("label"),
        Llm.blockRotate(col("embedding")).as("embedding"))
      graft.llm.Align.procrustesReport(emb, rotated,
        "vec_id", "embedding", "label")
    },

    // L9k — unigram-LM (SentencePiece) tokenizer training: Viterbi-EM
    // on the distinct-word census; no SQL form (iterative DP + EM) →
    // rows-only; TokenizerSpec proves coverage, round-trip identity,
    // planted-substring emergence, and determinism.
    QuerySpec.unchecked("l108_unigram_train") { (s, d) =>
      import s.implicits._
      TextAnalysis.unigramLmTrain(
        Fixtures.table(s, d, "documents"), "text",
        vocabSize = 800, emIters = 2)
        .zipWithIndex.map { case ((p, lp), i) =>
          (p, BigDecimal(lp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            i + 1) }
        .toDF("piece", "logp", "rank")
    },

    // L9l — unigram segmentation of the corpus under the model trained
    // on it (fertility = pieces per word, the tokenizer-quality stat).
    QuerySpec.unchecked("l109_unigram_encode") { (s, d) =>
      val docs = Fixtures.table(s, d, "documents")
      val model = unigramModels.computeIfAbsent(d, _ =>
        TextAnalysis.unigramLmTrain(docs, "text", vocabSize = 800, emIters = 2))
      TextAnalysis.unigramEncode(docs, "doc_id", "text", model)
        .select(col("doc_id"), col("n_tokens"), col("fertility"))
    },

    // L9m — mergeable quantile summaries (KLL compactors): per-group
    // sketches PLUS the cross-group rollup built by merging the
    // stored summaries, never re-reading rows — the mergeable-
    // summaries cube pattern (SpaceSaving's quantile sibling).
    // PROMOTED (r14, the q14c pattern): compaction estimates are
    // partition-layout dependent, but the sketch's rank contract is
    // not — QuantileSketchSpec pins rank error < 0.02 single /
    // < 0.03 merged, so each estimate must lie between the EXACT
    // percentiles at p ± 0.05 (upper bounds clamp to the max). The
    // hash-checked anchor is the exact cents-integral median per
    // group (interpolation exact in both engines, as q14_stats);
    // the bound verdicts are booleans the oracle asserts true.
    QuerySpec.df("l110_quantile_sketch",
      """with c as (select l_returnflag,
        |             cast(round(l_extendedprice * 100) as bigint) as cents
        |           from lineitem),
        |g as (
        |  select l_returnflag as grp,
        |    round(quantile_cont(cents, 0.5) / 100, 2) as p50_exact
        |  from c group by 1
        |  union all
        |  select 'ALL', round(quantile_cont(cents, 0.5) / 100, 2) from c)
        |select grp, cast(p50_exact as double) as p50_exact,
        |  true as p50_ok, true as p95_ok, true as p99_ok
        |from g""".stripMargin) { (s, d) =>
      import graft.functions.QuantileSketch
      val li = Fixtures.table(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          round(col("l_extendedprice") * 100).cast("bigint").as("_cents"))
      // The sketch pass groups once (per-flag sketch + max); the ALL
      // row merges the per-group SKETCHES (the mergeable contract
      // under test) and takes max-of-maxes — no second corpus scan for
      // the global max. The exact bounds moved off the counts-map
      // `percentile` (a ~600k-entry OpenHashMap per group, the
      // measured bulk of the query and an OOM at scale) onto the
      // sort-based operators.Percentiles pass; tagging each row with
      // its flag AND 'ALL' lets ONE sorted window pass produce the
      // per-group and global bounds together (r14 opt: 3.26 s before).
      val per = li.groupBy(col("l_returnflag").as("grp"))
        .agg(QuantileSketch.sketch(col("l_extendedprice")).as("sk"),
          max(col("l_extendedprice")).as("mx"))
      val all = per.agg(QuantileSketch.mergeSketches(col("sk")).as("sk"),
          max(col("mx")).as("mx"))
        .withColumn("grp", lit("ALL"))
      // each row is tagged with its flag AND 'ALL' by a generator over
      // a 2-element array — one lineitem scan feeding the sort pass
      // instead of the unionAll's two (r14 opt 2nd batch; exactByGroup
      // references its input twice, so the union shape cost 4 scans)
      val tagged = li.select(
        explode(array(col("l_returnflag"), lit("ALL"))).as("grp"),
        col("_cents"))
      val pcts = graft.operators.Percentiles.exactByGroup(
        tagged, "grp", "_cents", Seq(0.45, 0.5, 0.55, 0.90, 0.94))
      per.unionByName(all.select("grp", "sk", "mx"))
        .join(pcts, "grp").select(col("grp"),
        QuantileSketch.quantileCol(col("sk"), 0.5).as("_s50"),
        QuantileSketch.quantileCol(col("sk"), 0.95).as("_s95"),
        QuantileSketch.quantileCol(col("sk"), 0.99).as("_s99"),
        col("ps"), col("mx")).select(col("grp"),
        round(element_at(col("ps"), 2) / 100, 2).as("p50_exact"),
        (col("_s50") >= element_at(col("ps"), 1) / 100 &&
          col("_s50") <= element_at(col("ps"), 3) / 100).as("p50_ok"),
        (col("_s95") >= element_at(col("ps"), 4) / 100 &&
          col("_s95") <= col("mx")).as("p95_ok"),
        (col("_s99") >= element_at(col("ps"), 5) / 100 &&
          col("_s99") <= col("mx")).as("p99_ok"))
    },

    // L9n — HITS hubs & authorities (Kleinberg) over the l98 planted
    // graph: the complementary centrality pair (hub quality vs being
    // pointed at by hubs). Sum-normalized per half-iteration so the
    // unrolled oracle's arithmetic is reproducible; 2 iterations keep
    // the oracle CTE chain readable (convergence is not the semantics
    // under test — the mutual recursion is).
    QuerySpec.df("l111_hits",
      """with nn as (select count(*) as n from documents),
        |edges as (select distinct src, dst from (
        |    select doc_id as src, (doc_id + 1) % (select n from nn) as dst from documents
        |    union all
        |    select doc_id, (doc_id * doc_id + 1) % (select n from nn) from documents
        |    union all
        |    select doc_id, (doc_id % 25) * 20 from documents)),
        |nodes as (select src as id from edges union select dst from edges),
        |h0 as (select id, cast(1.0 as double) as h from nodes),
        |a1 as (select n.id, coalesce(s.a, 0) as a from nodes n left join (
        |         select e.dst as id, cast(sum(cast(h.h as decimal(28,18))) as double) as a from edges e
        |         join h0 h on e.src = h.id group by 1) s on n.id = s.id),
        |a1n as (select id, round(a / (select cast(sum(cast(a as decimal(28,18))) as double) from a1), 12) as a from a1),
        |h1 as (select n.id, coalesce(s.h, 0) as h from nodes n left join (
        |         select e.src as id, cast(sum(cast(a.a as decimal(28,18))) as double) as h from edges e
        |         join a1n a on e.dst = a.id group by 1) s on n.id = s.id),
        |h1n as (select id, round(h / (select cast(sum(cast(h as decimal(28,18))) as double) from h1), 12) as h from h1),
        |a2 as (select n.id, coalesce(s.a, 0) as a from nodes n left join (
        |         select e.dst as id, cast(sum(cast(h.h as decimal(28,18))) as double) as a from edges e
        |         join h1n h on e.src = h.id group by 1) s on n.id = s.id),
        |a2n as (select id, round(a / (select cast(sum(cast(a as decimal(28,18))) as double) from a2), 12) as a from a2),
        |h2 as (select n.id, coalesce(s.h, 0) as h from nodes n left join (
        |         select e.src as id, cast(sum(cast(a.a as decimal(28,18))) as double) as h from edges e
        |         join a2n a on e.dst = a.id group by 1) s on n.id = s.id),
        |h2n as (select id, round(h / (select cast(sum(cast(h as decimal(28,18))) as double) from h2), 12) as h from h2)
        |select n.id, round(h2n.h, 6) as hub, round(a2n.a, 6) as authority
        |from nodes n join h2n on n.id = h2n.id join a2n on n.id = a2n.id
        |""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % n).as("dst"))
          .unionAll(docs.select(col("doc_id").as("src"),
            ((col("doc_id") * col("doc_id") + 1) % n).as("dst")))
          .unionAll(docs.select(col("doc_id").as("src"),
            ((col("doc_id") % 25) * 20).as("dst")))
        graft.operators.PageRank.hits(edges, "src", "dst", iterations = 2)
          .select(col("id"), round(col("hub"), 6).as("hub"),
            round(col("authority"), 6).as("authority"))
    },

    // L9o — robots.txt evaluation for the crawl frontier: 7 planted
    // hosts (even hosts carry a graftbot-specific group that OVERRIDES
    // the '*' group — Google's group-selection rule), URLs fanned over
    // /private, /private/ok, /p, /p/open, and /. Longest-prefix rule
    // wins, Allow beats Disallow on ties, no rule → allowed.
    QuerySpec.df("l112_robots_filter",
      """with robots as (
        |  select 'site' || m || '.example.com' as host,
        |    'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10) ||
        |    'Allow: /private/ok' ||
        |    case when m % 2 = 0
        |         then chr(10) || 'User-agent: graftbot' || chr(10) ||
        |              'Disallow: /p' || chr(10) || 'Allow: /p/open'
        |         else '' end as txt
        |  from range(0, 7) t(m)),
        |urls as (select doc_id,
        |  'https://site' || (doc_id % 7) || '.example.com' ||
        |  case doc_id % 5 when 0 then '/private/x' when 1 then '/private/ok/y'
        |       when 2 then '/p/z' when 3 then '/p/open/w' else '' end as url
        |  from documents),
        |lines as (
        |  select host, i as pos, ls[i] as line
        |  from (select host, string_split(txt, chr(10)) as ls from robots),
        |       range(1, 10) t(i) where i <= len(ls)),
        |sec as (select host, pos, line,
        |  last_value(case when regexp_matches(line, '^(?i)user-agent:')
        |    then lower(trim(regexp_replace(line, '^(?i)user-agent:', ''))) end
        |    ignore nulls) over (partition by host order by pos
        |      rows between unbounded preceding and current row) as section
        |  from lines),
        |rules as (select host, section,
        |    lower(regexp_extract(line, '^(?i)(allow|disallow):', 1)) as rtype,
        |    trim(regexp_replace(line, '^(?i)(allow|disallow):', '')) as prefix
        |  from sec where regexp_matches(line, '^(?i)(allow|disallow):')
        |    and section in ('graftbot', '*')
        |    and length(trim(regexp_replace(line, '^(?i)(allow|disallow):', ''))) > 0),
        |ah as (select distinct host from rules where section = 'graftbot'),
        |chosen as (select r.host, rtype, prefix from rules r
        |  left join ah on r.host = ah.host
        |  where (ah.host is not null and section = 'graftbot')
        |     or (ah.host is null and section = '*')),
        |u as (select doc_id, url,
        |    regexp_extract(url, '^https?://([^/?#]+)', 1) as host,
        |    coalesce(nullif(regexp_replace(url, '^https?://[^/?#]+', ''), ''), '/')
        |      as path from urls),
        |m as (select u.doc_id, u.url, c.rtype, c.prefix,
        |    row_number() over (partition by u.doc_id
        |      order by length(c.prefix) desc, c.rtype asc) as rk
        |  from u left join chosen c
        |    on u.host = c.host and starts_with(u.path, c.prefix))
        |select doc_id, url, coalesce(rtype = 'disallow', false) as blocked,
        |       coalesce(prefix, '') as matched_rule
        |from m where rk = 1""".stripMargin) {
      (s, d) =>
        val robots = s.range(0, 7).select(
          concat(lit("site"), col("id"), lit(".example.com")).as("host"),
          concat(lit("User-agent: *\nDisallow: /private\nAllow: /private/ok"),
            when(col("id") % 2 === 0,
              lit("\nUser-agent: graftbot\nDisallow: /p\nAllow: /p/open"))
              .otherwise(lit(""))).as("txt"))
        val urls = Fixtures.table(s, d, "documents").select(col("doc_id"),
          concat(lit("https://site"), col("doc_id") % 7, lit(".example.com"),
            when(col("doc_id") % 5 === 0, "/private/x")
              .when(col("doc_id") % 5 === 1, "/private/ok/y")
              .when(col("doc_id") % 5 === 2, "/p/z")
              .when(col("doc_id") % 5 === 3, "/p/open/w")
              .otherwise("")).as("url"))
        Corpus.robotsFilter(robots, "host", "txt", urls, "doc_id", "url",
          agent = "graftbot")
    },

    // L9p — JSON schema profile of a dynamic-key column (Spark 4
    // VARIANT keeps number-vs-string apart, which a map<string,string>
    // cast erases): per key, presence and type-class counts; corrupt
    // JSON rows (every 97th) contribute no keys but stay in the
    // denominator. The oracle re-derives every count through DuckDB's
    // json_keys/json_type.
    QuerySpec.df("l113_json_profile",
      """with planted as (select event_id,
        |  case when event_id % 97 = 0 then 'oops{'
        |       when event_id % 3 = 0
        |         then '{"a": ' || user_id || ', "b": "' || event_type || '"}'
        |       when event_id % 3 = 1
        |         then '{"a": "' || event_type || '", "c": true, "e": ' || user_id || '.5}'
        |       else '{"b": "' || event_type || '", "d": null}' end as j
        |  from events),
        |tot as (select count(*) as n from planted),
        |valid as (select j from planted where json_valid(j)),
        |kv as (select unnest(json_keys(j)) as key, j from valid),
        |typed as (select key,
        |  case coalesce(json_type(j, '$.' || key), 'NULL')
        |    when 'VARCHAR' then 'string' when 'BOOLEAN' then 'boolean'
        |    when 'NULL' then 'null' when 'OBJECT' then 'other'
        |    when 'ARRAY' then 'other' else 'number' end as cls
        |  from kv)
        |select key, cast(count(*) as bigint) as n_present,
        |  cast(sum(case when cls = 'number' then 1 else 0 end) as bigint) as n_number,
        |  cast(sum(case when cls = 'string' then 1 else 0 end) as bigint) as n_string,
        |  cast(sum(case when cls = 'boolean' then 1 else 0 end) as bigint) as n_boolean,
        |  cast(sum(case when cls = 'null' then 1 else 0 end) as bigint) as n_null,
        |  cast(sum(case when cls = 'other' then 1 else 0 end) as bigint) as n_other,
        |  round(cast(count(*) as double) / (select n from tot), 6) as present_pct
        |from typed group by key""".stripMargin) {
      (s, d) =>
        val planted = Fixtures.table(s, d, "events").select(
          when(col("event_id") % 97 === 0, lit("oops{"))
            .when(col("event_id") % 3 === 0,
              concat(lit("{\"a\": "), col("user_id"),
                lit(", \"b\": \""), col("event_type"), lit("\"}")))
            .when(col("event_id") % 3 === 1,
              concat(lit("{\"a\": \""), col("event_type"),
                lit("\", \"c\": true, \"e\": "), col("user_id"), lit(".5}")))
            .otherwise(concat(lit("{\"b\": \""), col("event_type"),
              lit("\", \"d\": null}"))).as("j"))
        Corpus.jsonProfile(planted, "j")
    },

    // L9q — kNN label-noise audit (confident-learning flag): examples
    // whose 5 nearest cosine neighbors overwhelmingly disagree with
    // their label. vec_id < 60 bounds the oracle's pair frame; the
    // fixture's quasi-random labels make most rows flag — the
    // DETERMINISM of score and flag is what the oracle checks.
    QuerySpec.df("l114_label_noise",
      s"""with q as (select vec_id as q_id, embedding as qv, label as ql
         |           from embeddings where vec_id < 60),
         |c as (select vec_id as c_id, embedding as cv, label as cl
         |      from embeddings),
         |pairs as (select q_id, ql, c_id, cl,
         |    round(${duckDot.format("qv", "cv")} /
         |      (${duckNorm("qv")} * ${duckNorm("cv")}), 6) as cos
         |  from q cross join c where q_id <> c_id),
         |top as (select q_id, ql, cl from (
         |    select q_id, ql, cl, row_number() over (
         |      partition by q_id order by cos desc, c_id) as rk from pairs)
         |  where rk <= 5)
         |select q_id as vec_id, ql as label,
         |  cast(sum(case when cl <> ql then 1 else 0 end) as bigint) as n_diff,
         |  round(sum(case when cl <> ql then 1 else 0 end) / cast(5 as double), 6)
         |    as noise_score,
         |  sum(case when cl <> ql then 1 else 0 end) / cast(5 as double) >= 0.8
         |    as flagged
         |from top group by q_id, ql""".stripMargin) {
      (s, d) =>
        val emb = Fixtures.table(s, d, "embeddings")
        Similarity.labelNoiseAudit(emb,
          "vec_id", "embedding", "label", k = 5, minDisagree = 0.8)
          .filter(col("vec_id") < 60)
    },

    // L9r — semantic decontamination: the benchmark is every 17th
    // vector; the corpus additionally holds near-copies of the first
    // 100 vectors (the l12b planted corpus), so benchmark members with
    // a planted twin are found semantically even though no token
    // overlaps. Exact-scoring oracle.
    QuerySpec.df("l115_semantic_decontamination",
      s"""with base as (select vec_id,
         |    cast(embedding as double[]) as embedding from embeddings),
         |planted as (
         |  select vec_id + 100000 as vec_id,
         |    [embedding[i] * (1 + 0.01 * ((vec_id * 31 + i * 17) % 7 - 3))
         |     for i in range(1, len(embedding) + 1)] as embedding
         |  from base where vec_id < 100),
         |corpus as (
         |  select * from (select * from base union all select * from planted)
         |  where vec_id % 17 <> 3),
         |bench as (select vec_id as b_id, embedding as bv
         |          from base where vec_id % 17 = 3),
         |pairs as (select c.vec_id, b.b_id,
         |    round(${duckDot.format("c.embedding", "b.bv")} /
         |      (${duckNorm("c.embedding")} * ${duckNorm("b.bv")}), 6) as cos
         |  from corpus c cross join bench b)
         |select vec_id, b_id as matched_bench_id, cos from (
         |  select vec_id, b_id, cos, row_number() over (
         |    partition by vec_id order by cos desc, b_id) as rk from pairs)
         |where rk = 1 and cos >= 0.99""".stripMargin) {
      (s, d) =>
        val all = plantedCorpus(Fixtures.table(s, d, "embeddings"))
        Similarity.semanticContamination(
          all.filter(col("vec_id") % 17 =!= 3)
            .select(col("vec_id"), col("embedding")),
          all.filter(col("vec_id") % 17 === 3 && col("vec_id") < 100000)
            .select(col("vec_id").as("b_id"), col("embedding").as("bv")),
          "vec_id", "b_id", "embedding", "bv", minCos = 0.99)
    },

    // L9s — mojibake detection + repair: every 6th doc carries the
    // UTF-8-read-as-Latin-1 corruption ("resumÃ©"); detection is the
    // continuation-byte signature, repair reverses the mis-decode
    // (re-encode Latin-1, decode UTF-8) ONLY on flagged rows. The
    // oracle needs no encoding machinery: it knows the planted ground
    // truth, so it asserts the repaired text equals the clean form —
    // chr(195)||chr(169) is the corrupt pair, chr(233) the true é.
    QuerySpec.df("l116_mojibake",
      """with planted as (select doc_id,
        |  text || ' resum' ||
        |  case when doc_id % 6 = 0 then chr(195) || chr(169)
        |       else chr(233) end || ' review' as text
        |  from documents)
        |select doc_id, doc_id % 6 = 0 as mojibake_detected,
        |  text || ' resum' || chr(233) || ' review' as repaired
        |from documents""".stripMargin) {
      (s, d) =>
        val planted = Fixtures.table(s, d, "documents").select(
          col("doc_id"),
          concat(col("text"), lit(" resum"),
            when(col("doc_id") % 6 === 0, lit("\u00C3\u00A9"))
              .otherwise(lit("\u00E9")),
            lit(" review")).as("text"))
        planted.select(col("doc_id"),
          Corpus.mojibakeDetected(col("text")).as("mojibake_detected"),
          Corpus.repairMojibake(col("text")).as("repaired"))
    },

    // L10a — preference-data consistency audit (RLHF/DPO prep):
    // directed 3-cycles in per-prompt pairwise judgments — judgments
    // no scalar reward can produce, i.e. annotation noise. The
    // planted corpus derives a transitive per-prompt tournament from
    // a portable quality mix, then FLIPS one edge (the two lowest
    // response ids) in every 5th prompt group; every reported
    // triangle therefore threads through a flipped edge, and both
    // engines enumerate the identical canonical set.
    QuerySpec.df("l117_preference_cycles",
      s"""with $duckPrefs
        |select x.p as prompt_id, x.winner as n1, y.winner as n2,
        |       z.winner as n3
        |from pr x
        |join pr y on x.p = y.p and x.loser = y.winner
        |join pr z on y.p = z.p and y.loser = z.winner
        |           and z.loser = x.winner
        |where x.winner < y.winner and x.winner < z.winner""".stripMargin) {
      (s, d) =>
        Preference.cycleAudit(
          plantedPrefs(Fixtures.table(s, d, "documents")),
          "p", "winner", "loser")
          .select(col("p").as("prompt_id"), col("n1"), col("n2"), col("n3"))
    },

    // L10b — preference length-bias audit: rate at which the longer
    // response wins per prompt group (the best-documented annotation
    // artifact — a high rate teaches the reward model verbosity).
    // Same planted judgments as l117; lengths from the documents
    // table's n_chars.
    QuerySpec.df("l118_preference_length_bias",
      s"""with $duckPrefs
        |select p as prompt_id,
        |  count(*) as n_pairs,
        |  cast(sum(case when wd.n_chars > ld.n_chars then 1 else 0 end)
        |    as bigint) as n_longer_wins,
        |  cast(sum(case when wd.n_chars = ld.n_chars then 1 else 0 end)
        |    as bigint) as n_ties,
        |  round(cast(sum(case when wd.n_chars > ld.n_chars then 1 else 0 end)
        |      as double) /
        |    greatest(count(*) - sum(case when wd.n_chars = ld.n_chars
        |      then 1 else 0 end), 1), 6) as longer_win_rate
        |from pr
        |join documents wd on pr.winner = wd.doc_id
        |join documents ld on pr.loser = ld.doc_id
        |group by p""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        Preference.lengthBias(plantedPrefs(docs),
          docs.select("doc_id", "n_chars"),
          "p", "winner", "loser", "doc_id", "n_chars")
          .withColumnRenamed("p", "prompt_id")
    },

    // L10c — extended PII audit with payment-card Luhn VALIDATION
    // (the counting sibling of l20's redaction): bare 13-19-digit
    // runs are usually ids, so the checksum separates card-shaped
    // noise from issuable numbers. Planted: a Luhn-valid Visa on
    // doc_id%4=0, the same number with a broken check digit on
    // doc_id%4=1 (candidate but NOT valid), a valid 15-digit Amex on
    // doc_id%7=0, an email on doc_id%11=0, a phone on doc_id%13=0 —
    // both engines run the same checksum fold over the same extracts.
    QuerySpec.df("l119_pii_audit",
      """with t as (select doc_id, text ||
        |    case when doc_id % 4 = 0 then ' card 4539578763621486'
        |         when doc_id % 4 = 1 then ' ref 4539578763621487'
        |         else '' end ||
        |    case when doc_id % 7 = 0 then ' amex 378282246310005'
        |         else '' end ||
        |    case when doc_id % 11 = 0 then ' mail bob@example.com'
        |         else '' end ||
        |    case when doc_id % 13 = 0 then ' call +1-555-123-4567'
        |         else '' end as text
        |  from documents),
        |c as (select doc_id, text,
        |        regexp_extract_all(text, '[0-9]{13,19}') as cards
        |      from t)
        |select doc_id,
        |  len(cards) as n_card_candidates,
        |  cast(coalesce(list_sum(list_transform(cards, s ->
        |    case when list_sum(list_transform(range(1, length(s) + 1), i ->
        |        case when i % 2 = 1
        |             then ascii(substr(reverse(s), i, 1)) - 48
        |             else case when (ascii(substr(reverse(s), i, 1)) - 48) * 2 > 9
        |                       then (ascii(substr(reverse(s), i, 1)) - 48) * 2 - 9
        |                       else (ascii(substr(reverse(s), i, 1)) - 48) * 2
        |                  end end)) % 10 = 0
        |         then 1 else 0 end)), 0) as bigint) as n_cards_valid,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as n_emails,
        |  len(regexp_extract_all(text,
        |    '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}')) as n_phones
        |from c""".stripMargin) {
      (s, d) =>
        val planted = Fixtures.table(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 4 === 0, lit(" card 4539578763621486"))
              .when(col("doc_id") % 4 === 1, lit(" ref 4539578763621487"))
              .otherwise(lit("")),
            when(col("doc_id") % 7 === 0, lit(" amex 378282246310005"))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0, lit(" mail bob@example.com"))
              .otherwise(lit("")),
            when(col("doc_id") % 13 === 0, lit(" call +1-555-123-4567"))
              .otherwise(lit(""))).as("text"))
        Corpus.piiAudit(planted, "doc_id", "text")
    },

    // L10d — tokenizer fertility by script (tokenizer-health report
    // for a dataset card): subwords per word and chars per subword
    // aggregated over each document's dominant script, on the l58
    // planted multiscript corpus. High fertility on a script = the
    // subword scheme fragments it (the standard multilingual
    // tokenizer complaint, quantified).
    QuerySpec.df("l120_token_fertility",
      """with t as (
        |  select doc_id, case cast(doc_id % 4 as int)
        |    when 1 then trim(repeat('Привет мир дела ', 4))
        |    when 2 then trim(repeat('中文测试内容很多 ', 4))
        |    when 3 then trim(repeat('مرحبا بالعالم ', 4))
        |    else text end as text
        |  from documents),
        |c as (select doc_id,
        |  length(regexp_replace(text, '\s', '', 'g')) as n_chars,
        |  length(regexp_replace(text, '[^\p{Latin}]', '', 'g')) as latin,
        |  length(regexp_replace(text, '[^\p{Cyrillic}]', '', 'g')) as cyr,
        |  length(regexp_replace(text, '[^\p{Han}]', '', 'g')) as han,
        |  length(regexp_replace(text, '[^\p{Arabic}]', '', 'g')) as arab,
        |  length(regexp_replace(text, '[^0-9]', '', 'g')) as dig
        |  from t),
        |f as (select doc_id, n_chars,
        |  round(cast(latin as double) / greatest(n_chars, 1), 6) as latin_frac,
        |  round(cast(cyr as double) / greatest(n_chars, 1), 6) as cyrillic_frac,
        |  round(cast(han as double) / greatest(n_chars, 1), 6) as han_frac,
        |  round(cast(arab as double) / greatest(n_chars, 1), 6) as arabic_frac,
        |  round(cast(dig as double) / greatest(n_chars, 1), 6) as digit_frac
        |  from c),
        |dom as (select doc_id, n_chars,
        |  case greatest(latin_frac, cyrillic_frac, han_frac, arabic_frac,
        |                digit_frac)
        |    when 0.0 then 'other'
        |    when latin_frac then 'latin'
        |    when cyrillic_frac then 'cyrillic'
        |    when han_frac then 'han'
        |    when arabic_frac then 'arabic'
        |    else 'digit' end as dominant_script
        |  from f),
        |tok as (select doc_id,
        |  case when length(trim(text)) = 0 then 0
        |       else len(string_split_regex(trim(text), '\s+')) end as n_words,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) as n_subwords
        |  from t)
        |select dominant_script,
        |  count(*) as n_docs,
        |  round(avg(cast(n_subwords as double) / n_words), 6) as fertility,
        |  round(avg(cast(n_chars as double) / greatest(n_subwords, 1)), 6)
        |    as chars_per_subword
        |from dom join tok using (doc_id)
        |where n_words > 0
        |group by dominant_script""".stripMargin) {
      (s, d) =>
        val t = Fixtures.table(s, d, "documents").select(col("doc_id"),
          when(col("doc_id") % 4 === 1, lit(("Привет мир дела " * 4).trim))
            .when(col("doc_id") % 4 === 2, lit(("中文测试内容很多 " * 4).trim))
            .when(col("doc_id") % 4 === 3, lit(("مرحبا بالعالم " * 4).trim))
            .otherwise(col("text")).as("text"))
        TextAnalysis.tokenFertility(t, "doc_id", "text")
    },

    // L10e — token-budget mixture planner (the LLaMA-style "how many
    // epochs of each source" data-card table): tempered shares over
    // per-source token counts, target tokens per source, epoch count
    // (>1 flags sources the schedule would repeat). Target = 3× the
    // corpus (the common multi-epoch regime), τ=0.7.
    QuerySpec.df("l121_token_budget",
      """with tok as (select source,
        |    sum(case when length(trim(text)) = 0 then 0
        |        else len(string_split_regex(trim(text), '\s+')) end)
        |      as tokens_available
        |  from documents group by source),
        |tot as (select cast(sum(tokens_available) as double) as t,
        |               sum(pow(cast(tokens_available as double), 0.7)) as wt,
        |               cast(sum(tokens_available) * 3 as bigint) as target
        |        from tok)
        |select source,
        |  cast(tokens_available as bigint) as tokens_available,
        |  round(tokens_available / t, 6) as share,
        |  round(pow(cast(tokens_available as double), 0.7) / wt, 6) as weight,
        |  cast(round(pow(cast(tokens_available as double), 0.7) / wt
        |    * target) as bigint) as tokens_target,
        |  round(pow(cast(tokens_available as double), 0.7) / wt * target
        |    / tokens_available, 4) as epochs
        |from tok, tot""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val target = 3L * Fixtures.headLongOrZero(docs.select(
          sum(graft.llm.TextAnalysis.tokenCount(col("text")).cast("long"))))
        Corpus.tokenBudget(docs, "text", "source", target, tau = 0.7)
    },

    // L10f — per-source quality-signal correlation (calibration
    // check before combining signals into a composite): Pearson from
    // the six RAW INTEGER sums, so both engines compute bit-identical
    // doubles (integer sums are exact; IEEE sqrt/divide correctly
    // rounded) — no streaming co-moment order dependence.
    QuerySpec.df("l122_signal_corr",
      """with sig as (select source,
        |    cast(length(text) as bigint) as x,
        |    cast(case when length(trim(text)) = 0 then 0
        |         else len(string_split_regex(trim(text), '\s+')) end
        |      as bigint) as y,
        |    cast(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |      as bigint) as z
        |  from documents),
        |sums as (select source, count(*) as n,
        |    cast(sum(x) as bigint) as s_x, cast(sum(y) as bigint) as s_y,
        |    cast(sum(z) as bigint) as s_z,
        |    cast(sum(x * y) as bigint) as s_xy,
        |    cast(sum(x * z) as bigint) as s_xz,
        |    cast(sum(y * z) as bigint) as s_yz,
        |    cast(sum(x * x) as bigint) as s_xx,
        |    cast(sum(y * y) as bigint) as s_yy,
        |    cast(sum(z * z) as bigint) as s_zz
        |  from sig group by source)
        |select source, n as n_docs,
        |  case when (n * s_xx - s_x * s_x) * (n * s_yy - s_y * s_y) = 0
        |    then 0.0 else round((n * s_xy - s_x * s_y) /
        |      (sqrt(cast(n * s_xx - s_x * s_x as double)) *
        |       sqrt(cast(n * s_yy - s_y * s_y as double))), 6) end
        |    as corr_chars_tokens,
        |  case when (n * s_xx - s_x * s_x) * (n * s_zz - s_z * s_z) = 0
        |    then 0.0 else round((n * s_xz - s_x * s_z) /
        |      (sqrt(cast(n * s_xx - s_x * s_x as double)) *
        |       sqrt(cast(n * s_zz - s_z * s_z as double))), 6) end
        |    as corr_chars_punct,
        |  case when (n * s_yy - s_y * s_y) * (n * s_zz - s_z * s_z) = 0
        |    then 0.0 else round((n * s_yz - s_y * s_z) /
        |      (sqrt(cast(n * s_yy - s_y * s_y as double)) *
        |       sqrt(cast(n * s_zz - s_z * s_z as double))), 6) end
        |    as corr_tokens_punct
        |from sums""".stripMargin) {
      (s, d) =>
        TextAnalysis.signalCorr(Fixtures.table(s, d, "documents"),
          "text", "source")
    },

    // L10g — deterministic round-robin source interleave (the
    // epoch-order layout of a pretraining run): per-source seeded
    // order + CLOSED-FORM global position (no one-task global sort —
    // the position arithmetic crosses each row with the broadcast
    // source-count table).
    QuerySpec.df("l123_interleave",
      """with seqd as (select doc_id, source,
        |    cast(row_number() over (partition by source
        |      order by (doc_id * 2654435761 + 42) % 1048576, doc_id)
        |      as bigint) as seq
        |  from documents),
        |cnt as (select source as s2, count(*) as c from documents
        |        group by source)
        |select doc_id, source, seq,
        |  cast(sum(least(seq - 1, c)) +
        |    sum(case when c >= seq and s2 < source then 1 else 0 end) + 1
        |    as bigint) as position
        |from seqd, cnt
        |group by doc_id, source, seq""".stripMargin) {
      (s, d) =>
        Corpus.interleaveSources(Fixtures.table(s, d, "documents"),
          "doc_id", "source")
    },

    // L10h — content blocklist gate (the C4 banned-words page filter
    // with per-category counts): planted category words on rotating
    // doc subsets; whole-word case-insensitive matching, identical
    // RE2-compatible alternations in both engines.
    QuerySpec.df("l124_blocklist",
      """with t as (select doc_id, text ||
        |    case when doc_id % 6 = 0 then ' visit our CASINO and poker hall'
        |         when doc_id % 6 = 1 then ' pokerface is one word' else '' end ||
        |    case when doc_id % 8 = 2 then ' cheap pills here pills' else '' end
        |    as text
        |  from documents)
        |select doc_id,
        |  len(regexp_extract_all(text, '(?i)\b(?:casino|poker|jackpot)\b'))
        |    as n_gambling,
        |  len(regexp_extract_all(text, '(?i)\b(?:viagra|pills)\b'))
        |    as n_pharma,
        |  (len(regexp_extract_all(text, '(?i)\b(?:casino|poker|jackpot)\b')) > 0
        |   or len(regexp_extract_all(text, '(?i)\b(?:viagra|pills)\b')) > 0)
        |    as blocked
        |from t""".stripMargin) {
      (s, d) =>
        val planted = Fixtures.table(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 6 === 0,
              lit(" visit our CASINO and poker hall"))
              .when(col("doc_id") % 6 === 1, lit(" pokerface is one word"))
              .otherwise(lit("")),
            when(col("doc_id") % 8 === 2, lit(" cheap pills here pills"))
              .otherwise(lit(""))).as("text"))
        Corpus.blocklistScan(planted, "doc_id", "text", Seq(
          "gambling" -> Seq("casino", "poker", "jackpot"),
          "pharma" -> Seq("viagra", "pills")))
    },

    // L10i — the COMPOSED curation pass as one declarative plan:
    // exact dedup ≻ quality gates ≻ 8-gram decontamination ≻
    // deterministic split, one disposition per document. Plants (in
    // case order, each deterministic in both engines): short docs
    // (low_quality), copies of the previous doc (duplicate — note the
    // tiny-doc plant itself forms one big fp cluster whose non-min
    // members are duplicates by precedence), benchmark 8-gram overlap
    // (contaminated, the l19 device); benchmark = doc_id % 50 = 0.
    QuerySpec.df("l125_curation_pipeline",
      s"""with corpus as (
        |  select d.doc_id,
        |    case when d.doc_id % 13 = 5 then 'tiny doc text'
        |         when d.doc_id % 10 = 7 then coalesce(p.text, d.text)
        |         when d.doc_id % 7 = 3
        |           then d.text || ' ' ||
        |                (select text from documents where doc_id = 0)
        |         else d.text end as text
        |  from documents d
        |  left join documents p on p.doc_id = d.doc_id - 1
        |  where d.doc_id % 50 <> 0),
        |bench as (select doc_id, text from documents where doc_id % 50 = 0),
        |fp as (select doc_id, text,
        |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) as f
        |       from corpus),
        |keep as (select f, min(doc_id) as keeper from fp group by f),
        |cg as (select doc_id, $duckGrams8 as grams
        |       from (select doc_id, text, string_split(text, ' ') as words
        |             from corpus)),
        |bg as (select $duckGrams8 as grams
        |       from (select text, string_split(text, ' ') as words
        |             from bench)),
        |cont as (select distinct c.doc_id
        |         from cg c join bg b
        |           on len(list_intersect(c.grams, b.grams)) > 0),
        |sig as (select doc_id, f,
        |          cast(case when length(trim(text)) = 0 then 0
        |            else len(string_split_regex(trim(text), '\\s+')) end
        |            as double) as n_words,
        |          length(regexp_replace(text, '\\s', '', 'g')) as n_chars
        |        from fp)
        |select s.doc_id,
        |  case when s.doc_id <> k.keeper then 'duplicate'
        |       when s.n_words < 10 or s.n_words > 100000
        |            or s.n_chars / greatest(s.n_words, 1.0) < 2.0
        |            or s.n_chars / greatest(s.n_words, 1.0) > 12.0
        |         then 'low_quality'
        |       when c.doc_id is not null then 'contaminated'
        |       when (s.doc_id * 2654435761 + 13) % 100 < 80 then 'train'
        |       when (s.doc_id * 2654435761 + 13) % 100 < 90 then 'val'
        |       else 'test' end as disposition
        |from sig s
        |join keep k on s.f = k.f
        |left join cont c on s.doc_id = c.doc_id""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val prev = docs.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("_prev"))
        val d0 = Fixtures.headTextOrEmpty(docs
          .filter(col("doc_id") === 0).select("text"))
        val corpus = docs.join(prev, Seq("doc_id"), "left")
          .filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 13 === 5, lit("tiny doc text"))
              .when(col("doc_id") % 10 === 7,
                coalesce(col("_prev"), col("text")))
              .when(col("doc_id") % 7 === 3,
                concat(col("text"), lit(" " + d0)))
              .otherwise(col("text")).as("text"))
        val bench = docs.filter(col("doc_id") % 50 === 0)
        Corpus.curationPipeline(corpus, bench, "doc_id", "text")
    },

    // L10j — per-document content novelty (fraction of 8-grams seen
    // nowhere else): every 5th doc gets a shared 9-word phrase so the
    // census has df>1 grams to subtract.
    QuerySpec.df("l126_novelty",
      s"""with t as (select doc_id, text ||
        |    case when doc_id % 5 = 0
        |      then ' the shared boilerplate footer phrase appears on many pages'
        |      else '' end as text
        |  from documents),
        |g as (select doc_id, unnest(list_distinct(grams)) as gram
        |      from (select doc_id, $duckGrams8 as grams
        |            from (select doc_id, text, string_split(text, ' ') as words
        |                  from t))),
        |census as (select gram, count(distinct doc_id) as df
        |           from g group by gram)
        |select doc_id,
        |  count(*) as n_grams,
        |  cast(sum(case when df = 1 then 1 else 0 end) as bigint) as n_novel,
        |  round(cast(sum(case when df = 1 then 1 else 0 end) as double)
        |    / count(*), 6) as novelty
        |from g join census using (gram)
        |group by doc_id""".stripMargin) {
      (s, d) =>
        val planted = Fixtures.table(s, d, "documents").select(col("doc_id"),
          concat(col("text"), when(col("doc_id") % 5 === 0,
            lit(" the shared boilerplate footer phrase appears on many pages"))
            .otherwise(lit(""))).as("text"))
        Corpus.noveltyScore(planted, "doc_id", "text", k = 8)
    },

    // L10k — split-leakage audit: exact-fingerprint overlap between
    // the deterministic train/val/test splits. The prev-doc copy
    // plant creates duplicate pairs whose members hash into different
    // splits — exactly the leakage the audit must surface.
    QuerySpec.df("l127_split_leakage",
      """with corpus as (
        |  select d.doc_id,
        |    case when d.doc_id % 10 = 7 then coalesce(p.text, d.text)
        |         else d.text end as text
        |  from documents d
        |  left join documents p on p.doc_id = d.doc_id - 1),
        |sp as (select doc_id,
        |         case when (doc_id * 2654435761 + 7) % 100 < 80 then 'train'
        |              when (doc_id * 2654435761 + 7) % 100 < 90 then 'val'
        |              else 'test' end as split
        |       from corpus),
        |fps as (select distinct
        |          md5(regexp_replace(lower(trim(c.text)), '\\s+', ' ', 'g'))
        |            as fp,
        |          s.split
        |        from corpus c join sp s using (doc_id))
        |select a.split as split_a, b.split as split_b,
        |       count(*) as n_shared_fps
        |from fps a join fps b on a.fp = b.fp and a.split < b.split
        |group by 1, 2""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val prev = docs.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("_prev"))
        val corpus = docs.join(prev, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("doc_id") % 10 === 7, coalesce(col("_prev"), col("text")))
              .otherwise(col("text")).as("text"))
        val bucket = pmod(col("doc_id") * lit(2654435761L) + lit(7L),
          lit(100L))
        val splits = corpus.select(col("doc_id"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"))
        Corpus.splitLeakage(corpus, splits, "doc_id", "text", "split")
    },

    // L10l — cross-source duplicate overlap (the provenance matrix of
    // a data card): shared exact fingerprints per source pair, with
    // each side's distinct-fp totals. Same prev-doc copy plant —
    // adjacent doc ids sit in different sources, so the copies create
    // cross-source overlap.
    QuerySpec.df("l128_source_overlap",
      """with corpus as (
        |  select d.doc_id, d.source,
        |    case when d.doc_id % 10 = 7 then coalesce(p.text, d.text)
        |         else d.text end as text
        |  from documents d
        |  left join documents p on p.doc_id = d.doc_id - 1),
        |fps as (select distinct
        |          md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        |            as fp,
        |          source as src
        |        from corpus),
        |tot as (select src, count(*) as n from fps group by src)
        |select a.src as source_a, b.src as source_b,
        |       count(*) as n_shared_fps,
        |       any_value(ta.n) as n_fps_a, any_value(tb.n) as n_fps_b
        |from fps a
        |join fps b on a.fp = b.fp and a.src < b.src
        |join tot ta on ta.src = a.src
        |join tot tb on tb.src = b.src
        |group by 1, 2""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val prev = docs.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("_prev"))
        val corpus = docs.join(prev, Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 10 === 7, coalesce(col("_prev"), col("text")))
              .otherwise(col("text")).as("text"))
        Corpus.sourceOverlap(corpus, "doc_id", "text", "source")
    },

    // L10m — embedding-column hygiene audit (ingestion QA before any
    // index build): planted corruption classes — NULL vectors, a NaN
    // element, all-zero vectors (cosine-undefined), ragged dims —
    // counted per label; every other vector lands in n_ok.
    QuerySpec.df("l129_embedding_hygiene",
      """with planted as (select vec_id, label,
        |    case when vec_id % 97 = 0 then NULL
        |         when vec_id % 89 = 0
        |           then list_prepend('NaN'::float, embedding[2:])
        |         when vec_id % 83 = 0
        |           then list_transform(embedding, x -> 0.0::float)
        |         when vec_id % 79 = 0 then embedding[1:32]
        |         else embedding end as e
        |  from embeddings)
        |select label, count(*) as n_vecs,
        |  cast(sum(case when e is null then 1 else 0 end) as bigint)
        |    as n_null,
        |  cast(sum(case when e is not null and len(e) <> 64
        |    then 1 else 0 end) as bigint) as n_ragged,
        |  cast(sum(case when e is not null and len(e) = 64
        |    and len(list_filter(e, x -> isnan(x))) > 0
        |    then 1 else 0 end) as bigint) as n_nan,
        |  cast(sum(case when e is not null and len(e) = 64
        |    and len(list_filter(e, x -> isnan(x))) = 0
        |    and list_sum(list_transform(e,
        |          x -> cast(x as double) * cast(x as double))) = 0
        |    then 1 else 0 end) as bigint) as n_zero_norm,
        |  cast(sum(case when e is not null and len(e) = 64
        |    and len(list_filter(e, x -> isnan(x))) = 0
        |    and list_sum(list_transform(e,
        |          x -> cast(x as double) * cast(x as double))) <> 0
        |    then 1 else 0 end) as bigint) as n_ok
        |from planted group by label""".stripMargin) {
      (s, d) =>
        val emb = Fixtures.table(s, d, "embeddings")
        val e = col("embedding")
        val planted = emb.select(col("vec_id"), col("label"),
          when(col("vec_id") % 97 === 0, lit(null))
            .when(col("vec_id") % 89 === 0,
              concat(array(lit(Float.NaN)), slice(e, 2, 63)))
            .when(col("vec_id") % 83 === 0,
              transform(e, _ => lit(0.0f)))
            .when(col("vec_id") % 79 === 0, slice(e, 1, 32))
            .otherwise(e).as("e"))
        Similarity.embeddingHygiene(planted, "e", "label", expectedDim = 64)
    },

    // L10n — duplicate-cluster size distribution (the dedup section
    // of a data card): histogram over the l13 CC labeling plus the
    // singleton row clustering never touches. A heavy tail = template
    // spam; mass at size 2 = ordinary mirroring.
    QuerySpec.df("l130_cluster_histogram",
      s"""with recursive sh as (
        |  select doc_id, $duckShingles as sg
        |  from (select doc_id, text, string_split(text, ' ') as words
        |        from documents)
        |),
        |pairs as (
        |  select a.doc_id as id_a, b.doc_id as id_b
        |  from sh a join sh b on b.doc_id > a.doc_id
        |  where len(list_intersect(a.sg, b.sg)) * 1.0 /
        |        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg)))
        |          >= 0.8
        |),
        |edges as (select id_a as src, id_b as dst from pairs
        |          union select id_b as src, id_a as dst from pairs),
        |reach(v, r) as (
        |  select src, src from edges
        |  union
        |  select e.src, reach.r from edges e join reach on reach.v = e.dst
        |),
        |cl as (select v, min(r) as comp from reach group by v),
        |sizes as (select comp, count(*) as size from cl group by comp),
        |hist as (select size, count(*) as n_clusters,
        |                size * count(*) as n_docs
        |         from sizes group by size),
        |single as (select 1 as size,
        |    (select count(*) from documents) - (select count(*) from cl)
        |      as n_clusters,
        |    (select count(*) from documents) - (select count(*) from cl)
        |      as n_docs)
        |select cast(size as bigint) as size,
        |       cast(n_clusters as bigint) as n_clusters,
        |       cast(n_docs as bigint) as n_docs
        |from (select * from hist union all
        |      select * from single where n_clusters > 0)""".stripMargin) {
      (s, d) =>
        val total = Fixtures.table(s, d, "documents").count()
        TextDedup.clusterSizeHistogram(
          ndClusters(s, d).select(col("id"), col("component")), total)
    },

    // L11a — Reciprocal Rank Fusion of the engine's lexical and dense
    // retrievers (Cormack et al. 2009, the zero-tuning hybrid-search
    // combiner): BM25 top-20 for three keyword queries fused with
    // cosine top-20 for three vector queries (the fixture pairs
    // doc_id ↔ vec_id). RRF scores are exact rational sums — both
    // engines agree bit-for-bit.
    QuerySpec.df("l131_rrf_fusion",
      s"""with toks as (
        |  select doc_id, w from (
        |    select doc_id,
        |           unnest(string_split_regex(trim(text), '\\s+')) as w
        |    from documents)
        |  where length(w) > 0),
        |dl as (select doc_id, count(*) as dl from toks group by doc_id),
        |stats as (select avg(dl) as avgdl, count(*) as n from dl),
        |tf as (select doc_id, w as term, count(*) as tf from toks
        |       where w in ('vector', 'hash', 'stream') group by doc_id, w),
        |dfreq as (select term, count(*) as dfreq from tf group by term),
        |scored as (
        |  select t.term, t.doc_id,
        |    round(ln((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        |      * (t.tf * (1.2 + 1.0))
        |      / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * d.dl / s.avgdl)), 6)
        |      as score
        |  from tf t join dl d using (doc_id)
        |  join dfreq using (term) cross join stats s),
        |lex as (select case term when 'vector' then 0
        |                         when 'hash' then 1 else 2 end as qid,
        |               doc_id, rank from (
        |  select *, row_number() over (
        |    partition by term order by score desc, doc_id) as rank
        |  from scored) where rank <= 20),
        |dense as (select q_id as qid, c_id as doc_id, rk as rank from (
        |  select q_id, c_id,
        |    row_number() over (partition by q_id
        |                       order by round(cos, 6) desc, c_id) as rk
        |  from (
        |    select q.vec_id as q_id, c.vec_id as c_id,
        |      ${duckDot.format("q.embedding", "c.embedding")} /
        |      (${duckNorm("q.embedding")} * ${duckNorm("c.embedding")}) as cos
        |    from embeddings q join embeddings c on q.vec_id <> c.vec_id
        |    where q.vec_id < 3
        |  )) where rk <= 20),
        |contrib as (
        |  select qid, doc_id, 1.0 / (60 + rank) as c from lex
        |  union all
        |  select qid, doc_id, 1.0 / (60 + rank) as c from dense),
        |fused as (select qid, doc_id, round(sum(c), 6) as rrf_score
        |          from contrib group by 1, 2)
        |select qid, doc_id, rrf_score, cast(rank as bigint) as rank from (
        |  select *, row_number() over (
        |    partition by qid order by rrf_score desc, doc_id) as rank
        |  from fused) where rank <= 10""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val docs = Fixtures.table(s, d, "documents")
        val emb = Fixtures.table(s, d, "embeddings")
        val termMap = Seq((0L, "vector"), (1L, "hash"), (2L, "stream"))
          .toDF("qid", "term")
        val lex = TextAnalysis.bm25(docs, "doc_id", "text",
            terms = Seq("vector", "hash", "stream"), k = 20)
          .join(broadcast(termMap), "term")
          .select(col("qid"), col("doc_id"), col("rank"))
        val dense = Similarity.bruteForceTopK(
            emb.filter(col("vec_id") < 3)
              .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
            emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
            "q_id", "c_id", "q_vec", "c_vec", k = 20)
          .select(col("q_id").as("qid"), col("c_id").as("doc_id"),
            col("rk").as("rank"))
        Retrieval.rrfFusion(Seq(lex, dense), "qid", "doc_id", "rank",
          k = 60, topK = 10)
    },

    // L11b — retrieval scoreboard (MRR ingredients, hit@k) for the
    // BM25 ranking against a frequency-graded gold set (docs with
    // tf ≥ 2 of the query term — relevance defined independently of
    // the ranking function's score shape).
    QuerySpec.df("l132_retrieval_metrics",
      s"""with toks as (
        |  select doc_id, w from (
        |    select doc_id,
        |           unnest(string_split_regex(trim(text), '\\s+')) as w
        |    from documents)
        |  where length(w) > 0),
        |dl as (select doc_id, count(*) as dl from toks group by doc_id),
        |stats as (select avg(dl) as avgdl, count(*) as n from dl),
        |tf as (select doc_id, w as term, count(*) as tf from toks
        |       where w in ('vector', 'hash', 'stream') group by doc_id, w),
        |dfreq as (select term, count(*) as dfreq from tf group by term),
        |scored as (
        |  select t.term, t.doc_id,
        |    round(ln((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        |      * (t.tf * (1.2 + 1.0))
        |      / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * d.dl / s.avgdl)), 6)
        |      as score
        |  from tf t join dl d using (doc_id)
        |  join dfreq using (term) cross join stats s),
        |ranking as (select term, doc_id, rank from (
        |  select *, row_number() over (
        |    partition by term order by score desc, doc_id) as rank
        |  from scored) where rank <= 10),
        |gold as (select term, doc_id from tf where tf >= 2),
        |hits as (select r.term, r.doc_id, r.rank,
        |           g.doc_id is not null as rel
        |         from ranking r left join gold g
        |           on r.term = g.term and r.doc_id = g.doc_id)
        |select term,
        |  cast(sum(case when rel then 1 else 0 end) as bigint)
        |    as n_relevant_retrieved,
        |  cast(coalesce(min(case when rel then rank end), 0) as bigint)
        |    as first_hit_rank,
        |  round(coalesce(1.0 / min(case when rel then rank end), 0.0), 6)
        |    as reciprocal_rank,
        |  coalesce(min(case when rel then rank end) <= 1, false) as hit_at_1,
        |  coalesce(min(case when rel then rank end) <= 5, false) as hit_at_5,
        |  coalesce(min(case when rel then rank end) <= 10, false) as hit_at_10
        |from hits group by term""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val ranking = TextAnalysis.bm25(docs, "doc_id", "text",
          terms = Seq("vector", "hash", "stream"), k = 10)
        val gold = docs.select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("term"))
          .filter(col("term").isin("vector", "hash", "stream"))
          .groupBy("term", "doc_id").agg(count(lit(1)).as("_tf"))
          .filter(col("_tf") >= 2)
        Retrieval.retrievalMetrics(ranking, gold, "term", "doc_id", "rank")
          .select(col("term"), col("n_relevant_retrieved"),
            coalesce(col("first_hit_rank"), lit(0L)).as("first_hit_rank"),
            col("reciprocal_rank"), col("hit_at_1"), col("hit_at_5"),
            col("hit_at_10"))
    },

    // L11b' — nDCG@10 with graded relevance (grade = min(tf, 3)) for
    // the BM25 ranking: the ordering-sensitive companion to l132's
    // binary hits. Both engines compute the same 2^g−1 / log2(r+1)
    // folds; round(6) absorbs the libm log2 ulp.
    QuerySpec.df("l135_ndcg",
      s"""with toks as (
        |  select doc_id, w from (
        |    select doc_id,
        |           unnest(string_split_regex(trim(text), '\\s+')) as w
        |    from documents)
        |  where length(w) > 0),
        |dl as (select doc_id, count(*) as dl from toks group by doc_id),
        |stats as (select avg(dl) as avgdl, count(*) as n from dl),
        |tf as (select doc_id, w as term, count(*) as tf from toks
        |       where w in ('vector', 'hash', 'stream') group by doc_id, w),
        |dfreq as (select term, count(*) as dfreq from tf group by term),
        |scored as (
        |  select t.term, t.doc_id,
        |    round(ln((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        |      * (t.tf * (1.2 + 1.0))
        |      / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * d.dl / s.avgdl)), 6)
        |      as score
        |  from tf t join dl d using (doc_id)
        |  join dfreq using (term) cross join stats s),
        |ranking as (select term, doc_id, rank from (
        |  select *, row_number() over (
        |    partition by term order by score desc, doc_id) as rank
        |  from scored) where rank <= 10),
        |graded as (select term, doc_id, least(tf, 3) as g from tf),
        |dcg as (select r.term,
        |          sum((pow(2.0, coalesce(g.g, 0)) - 1.0)
        |            / log2(r.rank + 1.0)) as dcg
        |        from ranking r left join graded g
        |          on r.term = g.term and r.doc_id = g.doc_id
        |        group by r.term),
        |ideal as (select term,
        |            sum((pow(2.0, g) - 1.0) / log2(ir + 1.0)) as idcg
        |          from (select term, g, row_number() over (
        |                  partition by term order by g desc, doc_id) as ir
        |                from graded where g > 0)
        |          where ir <= 10 group by term)
        |select d.term, round(d.dcg, 6) as dcg,
        |  round(coalesce(i.idcg, 0.0), 6) as idcg,
        |  round(coalesce(d.dcg / i.idcg, 0.0), 6) as ndcg
        |from dcg d left join ideal i using (term)""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val ranking = TextAnalysis.bm25(docs, "doc_id", "text",
          terms = Seq("vector", "hash", "stream"), k = 10)
        val graded = docs.select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("term"))
          .filter(col("term").isin("vector", "hash", "stream"))
          .groupBy("term", "doc_id").agg(count(lit(1)).as("_tf"))
          .select(col("term"), col("doc_id"),
            least(col("_tf"), lit(3L)).as("grade"))
        Retrieval.ndcgAtK(ranking, graded, "term", "doc_id", "rank",
          "grade", k = 10)
    },

    // L11j — source-pair CONTENT overlap (gram Jaccard): the
    // rephrase-resistant complement of l128's exact-dup matrix. The
    // prev-doc copy plant shares full documents' grams across
    // adjacent sources; rows appear only for pairs with overlap.
    QuerySpec.df("l141_source_gram_overlap",
      s"""with corpus as (
        |  select d.doc_id, d.source,
        |    case when d.doc_id % 10 = 7 then coalesce(p.text, d.text)
        |         else d.text end as text
        |  from documents d
        |  left join documents p on p.doc_id = d.doc_id - 1),
        |g as (select distinct source as src, gram from (
        |  select source, unnest($duckGrams8) as gram
        |  from (select source, text, string_split(text, ' ') as words
        |        from corpus))),
        |tot as (select src, count(*) as n from g group by src)
        |select a.src as source_a, b.src as source_b,
        |  count(*) as n_shared_grams,
        |  cast(any_value(ta.n) as bigint) as n_grams_a,
        |  cast(any_value(tb.n) as bigint) as n_grams_b,
        |  round(cast(count(*) as double) /
        |    (any_value(ta.n) + any_value(tb.n) - count(*)), 6) as jaccard
        |from g a
        |join g b on a.gram = b.gram and a.src < b.src
        |join tot ta on ta.src = a.src
        |join tot tb on tb.src = b.src
        |group by 1, 2""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val prev = docs.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("_prev"))
        val corpus = docs.join(prev, Seq("doc_id"), "left")
          .select(col("source"),
            when(col("doc_id") % 10 === 7, coalesce(col("_prev"), col("text")))
              .otherwise(col("text")).as("text"))
        Corpus.sourceGramOverlap(corpus, "text", "source", k = 8)
    },

    // L11h — declared-vs-detected language consistency (metadata QA
    // over the fixture's lang column): confusion cells with shares;
    // detection is l06's stopword argmax, so the oracle reuses that
    // exact construction.
    QuerySpec.df("l139_lang_consistency",
      {
        val langs = Seq("en", "de", "fr", "es", "zh")
        def hits(l: String) =
          s"len(list_intersect(list_distinct($duckWords), " +
            s"[${TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(",")}]))"
        val best = langs.map(hits).reduce((a, b) => s"greatest($a, $b)")
        val cases = langs.map(l =>
          s"when ${hits(l)} = best and best >= 1 then '$l'").mkString(" ")
        s"""with det as (
           |  select lang as declared,
           |    case $cases else 'und' end as detected
           |  from (select lang, text, $best as best from documents)),
           |cells as (select declared, detected, count(*) as n
           |          from det group by 1, 2),
           |tot as (select declared, sum(n) as t from cells group by declared)
           |select c.declared, c.detected, c.n,
           |  round(cast(c.n as double) / t.t, 6) as share,
           |  c.declared = c.detected as consistent
           |from cells c join tot t using (declared)""".stripMargin
      }) {
      (s, d) =>
        TextAnalysis.langConsistency(Fixtures.table(s, d, "documents"),
          "text", "lang")
    },

    // L11i — Flesch reading ease (regex sentence/syllable
    // approximation — identical under RE2): the curriculum/audience
    // difficulty signal.
    QuerySpec.df("l140_readability",
      """with sig as (select doc_id,
        |    cast(case when length(trim(text)) = 0 then 0
        |      else len(string_split_regex(trim(text), '\s+')) end
        |      as double) as w,
        |    cast(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      as double) as s,
        |    cast(greatest(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')), 1)
        |      as double) as y
        |  from documents)
        |select doc_id,
        |  cast(w as bigint) as n_words,
        |  cast(s as bigint) as n_sentences,
        |  cast(y as bigint) as n_syllables,
        |  round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4) as flesch
        |from sig where w > 0""".stripMargin) {
      (s, d) =>
        TextAnalysis.readability(Fixtures.table(s, d, "documents"),
          "doc_id", "text")
    },

    // L11e — vocabulary-coverage curve (tokenizer sizing): occurrence
    // coverage of the top-{10,20,50} vocabularies. The fixture's tiny
    // synthetic vocabulary makes the knee visible at 10.
    QuerySpec.df("l136_vocab_curve",
      """with census as (
        |  select w as tok, count(*) as freq from (
        |    select unnest(string_split_regex(trim(text), '\s+')) as w
        |    from documents)
        |  where length(w) > 0 group by w),
        |tot as (select sum(freq) as total, count(*) as n_types from census),
        |ranked as (select tok, freq,
        |    row_number() over (order by freq desc, tok) as rank
        |  from census qualify rank <= 50),
        |sizes as (select unnest([10, 20, 50]) as vocab_size)
        |select cast(s.vocab_size as bigint) as vocab_size,
        |  cast(any_value(t.n_types) as bigint) as n_types,
        |  round(cast(sum(r.freq) as double) / any_value(t.total), 6)
        |    as coverage
        |from ranked r join sizes s on r.rank <= s.vocab_size
        |cross join tot t
        |group by s.vocab_size""".stripMargin) {
      (s, d) =>
        TextAnalysis.vocabCoverageCurve(Fixtures.table(s, d, "documents"),
          "text", sizes = Seq(10, 20, 50))
    },

    // L11f — SFT turn-pair exact dedup: the (user, assistant)
    // adjacent pair is the training unit; every 6th conversation
    // REUSES doc 0's first pair, so those count as dups past the
    // first occurrence. The oracle rebuilds pair fingerprints
    // directly from the word slices (no JSON) — an independent path
    // agreeing with Spark's parse + lead-window formulation.
    QuerySpec.df("l137_turn_dedup",
      """with ws as (select doc_id,
        |    string_split_regex(trim(text), '\s+') as ws from documents),
        |d0 as (select array_to_string(ws[1:3], ' ') as u0,
        |              array_to_string(ws[4:6], ' ') as a0
        |       from ws where doc_id = 0),
        |pairs0 as (
        |  select doc_id, 1 as pos,
        |    case when doc_id % 6 = 0 then (select u0 from d0)
        |         else array_to_string(ws[1:3], ' ') end as u,
        |    case when doc_id % 6 = 0 then (select a0 from d0)
        |         else array_to_string(ws[4:6], ' ') end as a
        |  from ws
        |  union all
        |  select doc_id, 3 as pos,
        |    array_to_string(ws[7:8], ' '),
        |    array_to_string(ws[9:len(ws)], ' ')
        |  from ws),
        |fps as (select doc_id, pos,
        |    md5(regexp_replace(lower(trim(u)), '\s+', ' ', 'g') ||
        |        regexp_replace(lower(trim(a)), '\s+', ' ', 'g')) as fp
        |  from pairs0),
        |dup as (select doc_id, pos,
        |    row_number() over (partition by fp order by doc_id, pos) > 1 as d
        |  from fps)
        |select doc_id, count(*) as n_pairs,
        |  cast(sum(case when d then 1 else 0 end) as bigint) as n_dup_pairs
        |from dup group by doc_id""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val w0 = Fixtures.headTextOrEmpty(docs
          .filter(col("doc_id") === 0).select("text")).trim.split("\\s+")
        val (u0, a0) = (w0.slice(0, 3).mkString(" "),
          w0.slice(3, 6).mkString(" "))
        val ws = split(trim(col("text")), "\\s+")
        val planted = docs.select(col("doc_id"),
          concat(
            lit("""[{"role":"user","content":""""),
            when(col("doc_id") % 6 === 0, lit(u0))
              .otherwise(array_join(slice(ws, 1, 3), " ")),
            lit(""""},{"role":"assistant","content":""""),
            when(col("doc_id") % 6 === 0, lit(a0))
              .otherwise(array_join(slice(ws, 4, 3), " ")),
            lit(""""},{"role":"user","content":""""),
            array_join(slice(ws, 7, 2), " "),
            lit(""""},{"role":"assistant","content":""""),
            array_join(slice(ws, lit(9), greatest(size(ws) - 8, lit(1))), " "),
            lit(""""}]""")).as("conv"))
        graft.llm.Chat.turnPairDedup(planted, "doc_id", "conv")
    },

    // L11g — response template-phrase scan over ASSISTANT turns (the
    // SFT response-hygiene gate): every 9th conversation's second
    // assistant turn carries the canned phrase; both engines count
    // case-insensitive literal containment.
    QuerySpec.df("l138_response_templates",
      """with ws as (select doc_id,
        |    string_split_regex(trim(text), '\s+') as ws from documents),
        |t as (select doc_id,
        |    array_to_string(ws[4:6], ' ') as a1,
        |    array_to_string(ws[9:len(ws)], ' ') ||
        |      case when doc_id % 9 = 4
        |        then ' As an AI language model, I cannot help.'
        |        else '' end as a2
        |  from ws)
        |select doc_id, cast(2 as bigint) as n_assistant_turns,
        |  cast((case when contains(lower(a1), 'as an ai language model')
        |          or contains(lower(a1), 'i cannot') then 1 else 0 end) +
        |       (case when contains(lower(a2), 'as an ai language model')
        |          or contains(lower(a2), 'i cannot') then 1 else 0 end)
        |    as bigint) as n_template_turns,
        |  (contains(lower(a1), 'as an ai language model')
        |    or contains(lower(a1), 'i cannot')
        |    or contains(lower(a2), 'as an ai language model')
        |    or contains(lower(a2), 'i cannot')) as flagged
        |from t""".stripMargin) {
      (s, d) =>
        val ws = split(trim(col("text")), "\\s+")
        val planted = Fixtures.table(s, d, "documents").select(col("doc_id"),
          concat(
            lit("""[{"role":"user","content":""""),
            array_join(slice(ws, 1, 3), " "),
            lit(""""},{"role":"assistant","content":""""),
            array_join(slice(ws, 4, 3), " "),
            lit(""""},{"role":"user","content":""""),
            array_join(slice(ws, 7, 2), " "),
            lit(""""},{"role":"assistant","content":""""),
            array_join(slice(ws, lit(9), greatest(size(ws) - 8, lit(1))), " "),
            when(col("doc_id") % 9 === 4,
              lit(" As an AI language model, I cannot help."))
              .otherwise(lit("")),
            lit(""""}]""")).as("conv"))
        graft.llm.Chat.responseTemplateScan(planted, "doc_id", "conv",
          Seq("as an AI language model", "I cannot"))
    },

    // L11c — Zipf-law fit over the token census (dataset-card
    // linguistic sanity: slope ≈ −1 for natural text).
    QuerySpec.df("l133_zipf_fit",
      """with census as (
        |  select w as tok, count(*) as freq from (
        |    select unnest(string_split_regex(trim(text), '\s+')) as w
        |    from documents)
        |  where length(w) > 0 group by w),
        |ranked as (select tok, freq,
        |    row_number() over (order by freq desc, tok) as rank
        |  from census qualify rank <= 100),
        |pts as (select ln(cast(rank as double)) as x,
        |               ln(cast(freq as double)) as y from ranked),
        |sums as (select count(*) as n, sum(x) as sx, sum(y) as sy,
        |           sum(x * y) as sxy, sum(x * x) as sxx, sum(y * y) as syy
        |         from pts)
        |select n as n_ranks,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) as slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
        |    as intercept,
        |  round(pow(n * sxy - sx * sy, 2) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) as r2
        |from sums""".stripMargin) {
      (s, d) =>
        TextAnalysis.zipfFit(Fixtures.table(s, d, "documents"), "text",
          topR = 100)
    },

    // L11d — length-distribution drift (KS distance) between corpus
    // versions: v2 truncates every 4th doc to 5 words and drops every
    // 31st — the truncation-bug class vocab drift (l60) cannot see.
    QuerySpec.df("l134_length_drift",
      """with oldv as (select doc_id, text from documents),
        |newv as (select doc_id,
        |    case when doc_id % 4 = 0 then array_to_string(
        |      (string_split_regex(trim(text), '\s+'))[1:5], ' ')
        |    else text end as text
        |  from documents where doc_id % 31 <> 0),
        |co as (select len, count(*) as c_old from (
        |    select case when length(trim(text)) = 0 then 0
        |      else len(string_split_regex(trim(text), '\s+')) end as len
        |    from oldv) group by len),
        |cn as (select len, count(*) as c_new from (
        |    select case when length(trim(text)) = 0 then 0
        |      else len(string_split_regex(trim(text), '\s+')) end as len
        |    from newv) group by len),
        |j as (select coalesce(co.len, cn.len) as len,
        |        coalesce(c_old, 0) as c_old, coalesce(c_new, 0) as c_new
        |      from co full outer join cn on co.len = cn.len),
        |tot as (select sum(c_old) as n_old, sum(c_new) as n_new from j),
        |cum as (select len, c_old, c_new,
        |          sum(c_old) over (order by len) as cum_old,
        |          sum(c_new) over (order by len) as cum_new
        |        from j)
        |select round(max(abs(cast(cum_old as double) / n_old -
        |        cast(cum_new as double) / n_new)), 6) as ks,
        |  cast(any_value(n_old) as bigint) as n_old,
        |  cast(any_value(n_new) as bigint) as n_new,
        |  count(*) as n_lengths
        |from cum cross join tot""".stripMargin) {
      (s, d) =>
        val docs = Fixtures.table(s, d, "documents")
        val newV = docs.filter(col("doc_id") % 31 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 4 === 0,
              array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " "))
              .otherwise(col("text")).as("text"))
        TextAnalysis.lengthDrift(docs, newV, "text")
    },
  )

  private val unigramModels =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Double)]]()

  /** Deterministic block-diagonal rotation over dim pairs (2k, 2k+1),
    * angle 0.3·(k+1): the planted "embedder refresh" l107 aligns away.
    */
  def blockRotate(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // undersized vectors (ragged corpus) rotate to NULL — ANSI
    // element_at past the end would throw per row; a null vector is
    // instead dropped by procrustesReport's corrupt-pair filter
    when(size(vec) < 64, lit(null)).otherwise(
    transform(sequence(lit(0), lit(63)), i => {
      val k = (i / 2).cast("int")
      val theta = k.cast("double") * lit(0.3) + lit(0.3)
      val c = cos(theta); val sn = sin(theta)
      val even = element_at(vec, (k * 2 + 1).cast("int")).cast("double")
      val odd = element_at(vec, (k * 2 + 2).cast("int")).cast("double")
      when(i % 2 === 0, c * even - sn * odd).otherwise(sn * even + c * odd)
    }))

  /** Near-dup index fixture (l61): the persisted corpus index,
    * materialized once per sfDir — index BUILD cost is the one-time
    * step a real pipeline amortizes across ingests, so timed runs
    * measure the ingest only.
    */
  private val nearDupIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val ivfIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val bm25IndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val ivfAppendDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val shardDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Media-payload fixture, materialized to a temp parquet once per
    * (kind, sfDir) — payload synthesis (PNG/WAV/MP4 encoding) is
    * fixture generation, not the operator the queries name, so it must
    * not run inside a timed query (VERDICT r5).
    */
  /** Small derived frames shared by sibling registry entries — the
    * near-dup EDGE LISTS and decoded image-code tables that two or
    * three entries each rebuild from scratch otherwise (VERDICT r7:
    * l47/l62 decoded the same 5,000 PNGs twice; l13/l14 re-ran the
    * whole shingle→MinHash→band→verify pipeline). `localCheckpoint`
    * materializes the frame once (eager) and cuts lineage, so siblings
    * read a cached table of at most a few thousand rows. In a real
    * deployment this is the persisted-index pattern (buildNearDupIndex)
    * — compute the derived artifact once, reuse it across consumers.
    */
  private val sharedFrames =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private def sharedFrame(s: org.apache.spark.sql.SparkSession, key: String)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sharedFrames.computeIfAbsent(s"${System.identityHashCode(s)}|$key",
      _ => build.localCheckpoint())

  /** The verified MinHash/LSH near-dup edge list over `documents` —
    * shared by l13 (clusters) and l14 (collapse). */
  private def ndPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    sharedFrame(s, s"ndpairs|$d")(
      TextDedup.minhashLshPairs(Fixtures.table(s, d, "documents"),
        "doc_id", "text", numHashes = 16, bands = 8, shingleK = 3, threshold = 0.8))

  /** Component labels over a shared edge list, computed once — the
    * clusters report (l13/l30), the min-id collapse (l14/l31), and the
    * keep-longest collapse (l66) are all consumers of the SAME
    * labeling; re-running the CC iteration per entry re-pays its
    * per-round fixed cost for an identical answer. The CC run's own
    * persist is swapped for the memo's localCheckpoint.
    */
  private def sharedClusters(s: org.apache.spark.sql.SparkSession,
      key: String, pairs: org.apache.spark.sql.DataFrame) =
    sharedFrames.computeIfAbsent(s"${System.identityHashCode(s)}|$key", _ => {
      val cc = graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b")
      val cp = cc.localCheckpoint()
      cc.unpersist()
      cp
    })

  // NOTE: the inner memo (the edge list) is evaluated BEFORE entering
  // sharedClusters' computeIfAbsent — nesting computeIfAbsent calls on
  // the same ConcurrentHashMap is forbidden (JDK 'Recursive update' /
  // live-lock when the two keys share a bin)
  private def ndClusters(s: org.apache.spark.sql.SparkSession, d: String) = {
    val pairs = ndPairs(s, d)
    sharedClusters(s, s"ndclusters|$d", pairs)
  }

  private def embClusters(s: org.apache.spark.sql.SparkSession, d: String) = {
    val pairs = embPairs(s, d)
    sharedClusters(s, s"embclusters|$d", pairs)
  }

  /** The verified sign-LSH embedding near-dup edge list over the
    * planted corpus — shared by l12b (pairs), l30 (clusters), l31
    * (collapse). */
  private def embPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    sharedFrame(s, s"embpairs|$d")(
      Similarity.nearDupPairs(
        plantedCorpus(Fixtures.table(s, d, "embeddings")),
        "vec_id", "embedding", minCos = 0.99))

  /** Planted image-group count: fixed ~14-doc groups past the
    * 37-group floor, so the grouped-PNG fixture grows the NUMBER of
    * duplicate groups with the corpus while each group stays
    * small — real image dup clusters are bounded (a re-crawled logo,
    * not half the corpus). The old constant 37 made the within-group
    * pair population QUADRATIC in the corpus (the l117-fixture
    * artifact class): at the 100× probe, 13.5k-image groups → ~3.4G
    * planted pairs and an OOM'd localCheckpoint. At sf0.01 (500 docs)
    * greatest(37, 500/14) = 37, so the gate-scale oracle hashes are
    * unchanged; the oracle SQL carries the same formula.
    */
  private val imgGroupCounts =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private def imgGroups(s: org.apache.spark.sql.SparkSession, d: String): Int =
    imgGroupCounts.computeIfAbsent(d, _ =>
      math.max(37L, Fixtures.table(s, d, "documents").count() / 14L).toInt)
  // def, not val: the registry vals earlier in the file interpolate
  // this into their oracle SQL during object init
  private def imgGroupsSql: String =
    "greatest(37, (select count(*) from documents) // 14)"

  /** The verified banded-Hamming near-dup pair list over the decoded
    * dHash codes — shared by l47 (the pairs ARE its output) and l62
    * (clusters over them). */
  private def imgPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    // evaluate the codes memo BEFORE sharedFrame's computeIfAbsent —
    // nested computeIfAbsent on one ConcurrentHashMap is forbidden
    val codes = imageCodes(s, d)
    sharedFrame(s, s"imgpairs|$d")(
      TextDedup.hammingPairs(codes, "doc_id", "dhash", maxHamming = 2))
  }

  /** Decoded 64-bit dHash code table of the grouped-PNG fixture —
    * decode once, shared by l47 (pairs) and l62 (clusters). */
  private def imageCodes(s: org.apache.spark.sql.SparkSession, d: String) =
    sharedFrame(s, s"imgcodes|$d")(
      Multimodal.imageDHash(
        mediaPayloads(s, d, "imggroup",
          Multimodal.attachGroupedImagePayload(_, "doc_id",
            groups = imgGroups(s, d))),
        "payload")
        .select("doc_id", "dhash"))

  private val mediaDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def mediaPayloads(s: org.apache.spark.sql.SparkSession, d: String,
      kind: String,
      attach: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val path = mediaDirs.computeIfAbsent(s"$kind|$d", _ => {
      val out = java.nio.file.Files.createTempDirectory(s"graft-${kind}fix-")
        .resolve("payloads.parquet").toString
      // spread the payloads over the session's parallelism: binary
      // blobs compress into a single small parquet file otherwise, and
      // one input split would serialize the decode onto one core
      attach(Fixtures.table(s, d, "documents").select("doc_id")
          .repartition(s.sparkContext.defaultParallelism))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Deterministic multi-line "page" fixture: the documents table is
    * single-line word soup, so the line-level operators (l39/l40)
    * derive pages from it in-query — words regrouped into lines of
    * `wordsPerLine`, optionally decorated with C4-rule triggers —
    * identically on both engines (the [[plantedCorpus]] pattern).
    */
  private def syntheticPages(docs: org.apache.spark.sql.DataFrame,
      wordsPerLine: Int, decorate: Boolean): org.apache.spark.sql.DataFrame = {
    val L = wordsPerLine
    val ws = split(trim(col("text")), "\\s+")
    val nLines = ceil(size(ws) / lit(L.toDouble)).cast("int")
    def lineAt(j: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val base = array_join(slice(ws, j * L + 1, lit(L)), " ")
      if (!decorate) base
      else {
        val withJs = when((col("doc_id") + j) % 17 === 0,
          concat(base, lit(" javascript"))).otherwise(base)
        val withBrace = when((col("doc_id") + j) % 41 === 0,
          concat(withJs, lit(" {"))).otherwise(withJs)
        when((col("doc_id") + j) % 3 =!= 0,
          concat(withBrace, lit("."))).otherwise(withBrace)
      }
    }
    val page0 =
      array_join(transform(sequence(lit(0), nLines - 1), lineAt(_)), "\n")
    val page =
      if (decorate)
        when(col("doc_id") % 101 === 0,
          concat(lit("lorem ipsum dolor\n"), page0)).otherwise(page0)
      else page0
    docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), page.as("text"))
  }

  /** [[syntheticPages]] materialized to a temp parquet once per
    * (sfDir, shape): the page builder is a CodegenFallback HOF chain
    * that CollapseProject would inline into every textCol reference of
    * the downstream operator — fixture synthesis, not the operator
    * l39/l40 name — so the timed queries must read it as a plain scan
    * (the l17 image-payload principle, VERDICT r5).
    */
  private val pageDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def syntheticPageFixture(s: org.apache.spark.sql.SparkSession,
      d: String, wordsPerLine: Int,
      decorate: Boolean): org.apache.spark.sql.DataFrame = {
    val path = pageDirs.computeIfAbsent(s"$d|$wordsPerLine|$decorate", _ => {
      val out = java.nio.file.Files.createTempDirectory("graft-pagefix-")
        .resolve("pages.parquet").toString
      syntheticPages(Fixtures.table(s, d, "documents"), wordsPerLine, decorate)
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** DuckDB side of [[syntheticPages]] — emits `base` + `pages` CTE
    * bodies (callers continue the WITH chain from `pages`).
    */
  private def duckPages(wordsPerLine: Int, decorate: Boolean): String = {
    val L = wordsPerLine
    // concat(...) with comma args instead of || chains: a stripMargin
    // line starting with || loses its first pipe to the margin.
    val deco =
      if (decorate)
        s""",
           |      case when (doc_id + j) % 17 = 0 then ' javascript' else '' end,
           |      case when (doc_id + j) % 41 = 0 then ' {' else '' end,
           |      case when (doc_id + j) % 3 != 0 then '.' else '' end""".stripMargin
      else ""
    val lorem =
      if (decorate)
        "case when doc_id % 101 = 0 then concat('lorem ipsum dolor', chr(10)) else '' end, "
      else ""
    s"""base as (
       |  select doc_id, string_split_regex(trim(text), '\\s+') as ws
       |  from documents where length(trim(text)) > 0
       |),
       |pages as (
       |  select doc_id, concat($lorem array_to_string([
       |      concat(array_to_string(ws[j*$L+1 : j*$L+$L], ' ')$deco)
       |      for j in range(0, cast(ceil(len(ws)/${L}.0) as bigint))], chr(10))) as text
       |  from base
       |)""".stripMargin
  }

  /** Image-payload fixture, materialized to a temp parquet once per
    * sfDir: `attachImagePayload` is PNG *encoding* — fixture synthesis,
    * not the operator l17 names — so it must not run inside the timed
    * query (r5's 2.06 s median was ~95% payload generation). Every
    * timed run reads the parquet and pays only the header decode.
    */
  private val payloadDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def imagePayloads(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val path = payloadDirs.computeIfAbsent(d, _ => {
      val out = java.nio.file.Files.createTempDirectory("graft-imgfix-")
        .resolve("payloads.parquet").toString
      Multimodal.attachImagePayload(
        Fixtures.table(s, d, "documents").select("doc_id")
          .repartition(s.sparkContext.defaultParallelism), "doc_id")
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }
}
