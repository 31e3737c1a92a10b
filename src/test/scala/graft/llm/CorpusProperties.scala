package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Property suites for the corpus operators: chunk coverage/overlap,
  * packing partition/budget invariants, source-mix determinism —
  * randomized over document shapes the fixtures don't exercise
  * (empty-ish, single-token, chunk-boundary-aligned lengths).
  */
object CorpusProperties extends Properties("graft.llm.corpus") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  // documents of 1..40 single-char tokens (token text irrelevant to the
  // operators under test; lengths are what matter)
  private val docsGen: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1, 40)).map(_.zipWithIndex.map {
      case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" "))
    })

  private val chunkParams: Gen[(Int, Int)] = for {
    c <- Gen.chooseNum(2, 12)
    o <- Gen.chooseNum(0, c - 1)
  } yield (c, o)

  property("chunking: count matches formula, sizes bounded, every token covered") =
    forAll(docsGen, chunkParams) { case (docs, (c, o)) =>
      val df = docs.toDF("doc_id", "text")
      val out = Corpus.chunkDocuments(df, "doc_id", "text", c, o)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      docs.forall { case (id, text) =>
        val n = text.split(" ").length
        val stride = c - o
        val expect = if (n <= c) 1L else math.ceil((n - o).toDouble / stride).toLong
        val chunks = out(id).sortBy(_._2)
        chunks.length == expect &&
          chunks.forall(_._3 <= c) &&                     // no chunk over size
          chunks.init.forall(_._3 == c) &&                // only the last is short
          // coverage: last chunk reaches the final token
          (expect - 1) * stride + chunks.last._3 == n
      }
    }

  property("packing: every doc once, bins within budget, non-oversize bins nonempty") =
    forAll(docsGen, Gen.chooseNum(5, 50)) { (docs, budget) =>
      val df = docs.toDF("doc_id", "text")
      val packed = Corpus.packSequences(df, "doc_id", "text", budget)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      val everyOnce = packed.length == docs.length &&
        packed.map(_._1).distinct.length == docs.length
      val binsOk = packed.filterNot(_._4).groupBy(_._3).values
        .forall(_.map(_._2).sum <= budget)
      // an oversize doc must sit alone in its bin
      val oversizeAlone = packed.filter(_._4).map(_._3).forall(b =>
        packed.count(_._3 == b) == 1)
      everyOnce && binsOk && oversizeAlone
    }

  // ---- round-7 kernel properties ----

  private val tokenGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(('a' to 'e') ++ Seq('é', '中'))).map(_.mkString))

  property("charGrams(k=1) splits to code points; k grams tile the token") =
    forAll(Gen.nonEmptyListOf(tokenGen), Gen.chooseNum(1, 4)) { (toks, k) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "w")
      val got = df.select(col("id"),
          graft.functions.TextShingles.charGrams(col("w"), k).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      toks.zipWithIndex.forall { case (t, i) =>
        val cps = t.codePoints().toArray.map(c => new String(Character.toChars(c)))
        val want = if (cps.length < k) Seq.empty
          else cps.sliding(k).map(_.mkString).toSeq
        got(i.toLong) == want
      }
    }

  property("mergePair then adjacentPairs never re-emits the merged pair") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))) { syms =>
      val df = Seq(Tuple1(syms)).toDF("syms")
      val merged = df.select(
          graft.functions.TextShingles.mergePair(col("syms"), "a", "b").as("m"))
        .select(graft.functions.TextShingles.adjacentPairs(col("m")).as("p"))
        .collect()(0).getSeq[String](0)
      // leftmost-first, non-overlapping: no surviving adjacent (a, b)
      !merged.contains("ab")
    }

  property("hammingPairs equals brute force on random 64-bit codes") =
    forAll(Gen.listOfN(12, Gen.long), Gen.chooseNum(0, 3)) { (codes, r) =>
      val rows = codes.distinct.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      val df = rows.toDF("id", "code")
      val got = TextDedup.hammingPairs(df, "id", "code", r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      val brute = (for {
        (ia, ca) <- rows; (ib, cb) <- rows if ia < ib
        d = java.lang.Long.bitCount(ca ^ cb) if d <= r
      } yield (ia, ib, d)).toSet
      got == brute
    }

  property("jlProject: deterministic, k-dim, zero vector maps to zero") =
    forAll(Gen.chooseNum(2, 24), Gen.chooseNum(1L, 999L)) { (k, seed) =>
      val df = Seq(
        (1L, Array.fill(16)(0f)),
        (2L, Array.tabulate(16)(i => (i - 8) * 0.25f))).toDF("id", "v")
      val out = df.select(col("id"),
          graft.functions.JlProjectFn.jlProject(col("v"), k, seed).as("p"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val again: Seq[Double] = df.select(
          graft.functions.JlProjectFn.jlProject(col("v"), k, seed))
        .collect()(1).getSeq[Double](0)
      out(1L).forall(_ == 0.0) && out(2L).length == k && out(2L) == again
    }

  property("canonicalUrl is idempotent") =
    forAll(for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
      host <- Gen.oneOf("Ex.COM", "a.b.org", "X9.net")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/P/q", "/")
      query <- Gen.oneOf("", "?utm_source=a", "?q=1&utm_medium=m", "?fbclid=z&q=2")
      frag <- Gen.oneOf("", "#sec")
    } yield s"$scheme://$host$port$path$query$frag") { url =>
      val df = Seq(url).toDF("u")
      val once = df.select(Corpus.canonicalUrl(col("u"))).collect()(0).getString(0)
      val twice = Seq(once).toDF("u")
        .select(Corpus.canonicalUrl(col("u"))).collect()(0).getString(0)
      once == twice
    }

  property("bloom dedup equals exact dedup on random batch/corpus overlaps") =
    forAll(Gen.chooseNum(0, 30), Gen.chooseNum(1, 30)) { (nDup, nNew) =>
      val corpus = (0L until 40L).map(i => (i, s"corpus text $i")).toDF("doc_id", "text")
      val batch = ((0L until nDup.toLong).map(i => (500 + i, s"corpus text $i")) ++
        (0L until nNew.toLong).map(i => (900 + i, s"fresh text $i")))
        .toDF("doc_id", "text")
      val exact = Corpus.dedupAgainstCorpus(batch, corpus, "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bloom = Corpus.bloomDedupAgainstCorpus(batch, corpus, "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      bloom == exact
    }

  property("split assignment: exhaustive, disjoint, scale-invariant in the weights") =
    forAll(Gen.chooseNum(1, 20), Gen.chooseNum(1, 20), Gen.chooseNum(1, 20),
        Gen.chooseNum(1.0, 100.0)) { (wa, wb, wc, scale) =>
      val df = (0L until 150L).map(i => (i, s"d$i")).toDF("doc_id", "text")
      def assign(s: Double) = Corpus.assignSplits(df, "doc_id",
        Seq("train" -> wa * s, "val" -> wb * s, "test" -> wc * s))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val base = assign(1.0)
      // every row exactly once (the map covers all ids — when-chain is total)
      base.keySet == (0L until 150L).toSet &&
        // scaling every weight equally moves nothing
        assign(scale) == base
    }

  property("temperature mix: tau=1 keeps the natural mix intact") =
    forAll(Gen.chooseNum(2, 5)) { nSources =>
      val df = (0L until 300L)
        .map(i => (i, s"s${(i % nSources.toLong)}")).toDF("doc_id", "source")
      // at tau=1 target shares equal natural shares -> budget = total,
      // every keep-fraction is 1: the mix must be the identity
      Corpus.temperatureMix(df, "source", "doc_id", tau = 1.0).count() == 300L
    }

  property("source mix: membership is a pure function of the id") =
    forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (fa, fb) =>
      val df = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
        .toDF("doc_id", "source")
      def run() = Corpus.sourceMix(df, "source", "doc_id",
        Map("a" -> fa), defaultFrac = fb)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val first = run()
      // repartitioned input selects the identical membership
      val second = Corpus.sourceMix(df.repartition(7), "source", "doc_id",
        Map("a" -> fa), defaultFrac = fb)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      first == second
    }

  property("luhnValid agrees with the reference checksum on random digit strings") =
    forAll(Gen.chooseNum(13, 19).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 9)).map(_.mkString))) { digits =>
      def refLuhn(s: String): Boolean = {
        val sum = s.reverse.zipWithIndex.map { case (c, i) =>
          val d = c - '0'
          if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
        }.sum
        sum % 10 == 0
      }
      val got = Seq(Tuple1(digits)).toDF("s")
        .select(Corpus.luhnValid(col("s"))).head().getBoolean(0)
      got == refLuhn(digits)
    }

  property("interleaveSources: positions are always a 1..N permutation, " +
    "blocks are source-ordered, and the order ignores partitioning") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(1, 6)).map(_.take(5))) { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => (s.toLong * 1000 + i, s"src$s"))
      }
      val df = rows.toDF("id", "src")
      val out = Corpus.interleaveSources(df, "id", "src").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      val n = rows.length
      val isPerm = out.map(_._3).sorted.toSeq == (1L to n)
      // within block `seq`, sources appear in source order
      val blockOrdered = out.groupBy(_._2).values.forall { blk =>
        blk.sortBy(_._3).map(_._1).toSeq == blk.map(_._1).sorted.toSeq
      }
      val again = Corpus.interleaveSources(df.repartition(5), "id", "src")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
      isPerm && blockOrdered && again == out.toSet
    }

  property("noveltyScore: novelty is 1 for disjoint docs, and n_novel <= n_grams") =
    forAll(Gen.chooseNum(2, 5)) { k =>
      // docs over disjoint alphabets can share no gram
      val docs = (0 until 4).map(i =>
        (i.toLong, (0 until 10).map(j => s"w$i-$j").mkString(" ")))
      val out = Corpus.noveltyScore(docs.toDF("id", "t"), "id", "t", k)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      out.forall { case (g, nv, s) => g == nv && s == 1.0 }
    }
}
