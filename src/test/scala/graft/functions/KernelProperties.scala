package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Property suites for the round-9 codegen kernels, each checked
  * against the formulation it replaced (or a direct invariant) on
  * randomized inputs the fixtures don't exercise — unicode, empty
  * tokens, adversarial whitespace.
  */
object KernelProperties extends Properties("graft.functions.kernels") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  // text over a small alphabet with stopwords, unicode, and varied
  // whitespace separators (space, tab, newline)
  private val wordGen: Gen[String] = Gen.oneOf(
    "the", "a", "of", "and", "to", "in", "is", "it",
    "cat", "dog", "x", "καί", "的", "", "the")
  private val sepGen: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(12, wordGen)
    seps <- Gen.listOfN(12, sepGen)
    lead <- Gen.oneOf("", " ", "\t")
  } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString

  // arbitrary strings heavy in quotes/backslashes — the characters the
  // CLI's hand-built JSON must escape
  private val nastyGen: Gen[String] =
    Gen.listOfN(16, Gen.oneOf("\"", "\\", "\\\"", "\\\\", "a", "b ",
      "{", "}", ":", ",", "καί", "", "\n", "\r", "\t", "\u0001", "\u001f"))
      .map(_.mkString)

  property("Cli jsonEsc leaves no raw control characters in the escaped form") =
    forAll(nastyGen) { s =>
      graft.cli.Cli.jsonEsc(s).forall(_ >= ' ')
    }

  property("Cli jsonEsc/jsonUnesc round-trips arbitrary quote/backslash soup") =
    forAll(nastyGen) { s =>
      graft.cli.Cli.jsonUnesc(graft.cli.Cli.jsonEsc(s)) == s
    }

  property("Cli jsonEsc output never contains an unescaped quote") =
    forAll(nastyGen) { s =>
      // every " in the escaped form is preceded by an odd run of \
      val e = graft.cli.Cli.jsonEsc(s)
      e.zipWithIndex.forall { case (c, i) =>
        c != '"' || (i - e.lastIndexWhere(_ != '\\', i - 1)) % 2 == 0
      }
    }

  property("stopword kernel == the HOF formulation it replaced (both semantics)") =
    forAll(Gen.listOfN(5, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val list = graft.llm.TextAnalysis.stopwords("en")
      val rows = df.select(col("id"),
          StopwordCount.occurrences(col("t"), list).as("k_occ"),
          StopwordCount.distinctHits(col("t"), list).as("k_dis"),
          size(filter(split(trim(col("t")), "\\s+"), w =>
            array_contains(array(list.map(lit): _*), w))).as("h_occ"),
          size(array_intersect(array_distinct(split(trim(col("t")), "\\s+")),
            array(list.map(lit): _*))).as("h_dis"))
        .collect()
      rows.forall(r => r.getInt(1) == r.getInt(3) && r.getInt(2) == r.getInt(4))
    }

  private val byteTextGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 600)
    cs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', 'é', '的')))
  } yield cs.mkString

  property("CDC chunks tile the byte range exactly for arbitrary text") =
    forAll(Gen.listOfN(4, byteTextGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val rows = df.select(col("id"), col("t"),
          CdcChunks.chunks(col("t"), 8, 64, 4).as("ch"))
        .collect()
      rows.forall { r =>
        val nBytes = r.getString(1).getBytes("UTF-8").length
        val ch = r.getSeq[org.apache.spark.sql.Row](2)
          .map(c => (c.getInt(0), c.getInt(1)))
        var pos = 0
        val tiled = ch.forall { case (off, len) =>
          val ok = off == pos && len > 0 && len <= 64; pos += len; ok
        }
        tiled && pos == nBytes
      }
    }

  // random word-level edits for the winnowing guarantee
  private val editTextGen: Gen[(String, String)] = for {
    n <- Gen.chooseNum(12, 30)
    words = (1 to n).map(i => s"u${i}q${i * 3 % 7}")
    cut <- Gen.chooseNum(0, 5)
  } yield (words.mkString(" "),
    // edit: drop `cut` words from the FRONT — the tail run stays shared
    words.drop(cut).mkString(" "))

  property("winnowing: a shared tail of >= w+k-1 words always yields a common fingerprint") =
    forAll(editTextGen) { case (a, b) =>
      val df = Seq((1L, a), (2L, b)).toDF("id", "t")
      val fps = df.select(col("id"),
          Winnow.fingerprints(TextShingles.grams(col("t"), 3), 4).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      // b is a suffix of a with >= 7 shared words -> guaranteed overlap
      fps(1L).intersect(fps(2L)).nonEmpty
    }

  property("shard assignment equals the naive prefix sum for random weights") =
    forAll(Gen.listOfN(40, Gen.chooseNum(0, 50))) { weights =>
      val df = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w")
      val got = graft.llm.Corpus.assignShards(df, "id", col("w"), 64L,
          orderBuckets = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val naive = weights.zipWithIndex
        .map { case (w, i) =>
          (i.toLong, w.toLong, math.floorMod(i.toLong * 2654435761L, 1048576L))
        }
        .sortBy(t => (t._3, t._1))
      var pre = 0L
      val expect = naive.map { case (id, w, _) =>
        val s = pre / 64L; pre += w; id -> s
      }.toMap
      got == expect
    }
}
