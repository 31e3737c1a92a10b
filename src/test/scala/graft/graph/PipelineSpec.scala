package graft.graph

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.llm.{Corpus, TextAnalysis, TextDedup}

/** End-to-end corpus pipeline through the graph layer: the §2.6
  * operators wired as code nodes over versioned stores — the shape a
  * user of the reference would actually deploy (ingest → clean →
  * near-dup collapse → chunk → pack), with thresholds bound as typed
  * node parameters and each stage reading its upstream store.
  */
class PipelineSpec extends SparkSpec {

  private def write(dir: String, name: String, text: String): Unit = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, text)
  }

  test("ingest -> clean -> dedup -> chunk/pack pipeline runs as a graph") {
    val dir = tmpDir("pipeline")
    write(dir, "graph.yml",
      """functions:
        |  - node_file: clean.scala
        |    id: clean001
        |    inputs: {docs: raw_docs}
        |    outputs: {out: clean_docs}
        |    parameters: {min_tokens: 5}
        |  - node_file: dedup.scala
        |    id: dedup001
        |    inputs: {docs: clean_docs}
        |    outputs: {out: unique_docs}
        |  - node_file: chunk.scala
        |    id: chunk001
        |    inputs: {docs: unique_docs}
        |    outputs: {out: chunks}
        |  - node_file: pack.scala
        |    id: pack0001
        |    inputs: {docs: unique_docs}
        |    outputs: {out: packed}
        |stores:
        |  - table: raw_docs
        |  - table: clean_docs
        |  - table: unique_docs
        |  - table: chunks
        |  - table: packed
        |""".stripMargin)

    val clean = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val minTokens = ctx.parameter[Int]("min_tokens")
        val out = ctx.table("out")
        out.replace(Corpus.redactPii(
          ctx.table("docs").read
            .filter(TextAnalysis.tokenCount(col("text")) >= minTokens),
          "text", out = "text_redacted")
          .drop("text").withColumnRenamed("text_redacted", "text"))
        out.flush()
      }
    }
    val dedup = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out")
        out.replace(TextDedup.dropNearDuplicates(
          ctx.table("docs").read, "doc_id", "text"))
        out.flush()
      }
    }
    val chunk = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out")
        out.replace(Corpus.chunkDocuments(
          ctx.table("docs").read, "doc_id", "text", 8, 2))
        out.flush()
      }
    }
    val pack = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out")
        out.replace(Corpus.packSequences(
          ctx.table("docs").read, "doc_id", "text", budget = 64))
        out.flush()
      }
    }

    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
      codeNodes = Map("clean.scala" -> clean, "dedup.scala" -> dedup,
        "chunk.scala" -> chunk, "pack.scala" -> pack))
    assert(runner.validate().isEmpty)

    val fixture = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
      // plant a PII hit and an exact duplicate so every stage has work
      .withColumn("text", when(col("doc_id") === 7,
        concat(col("text"), lit(" mail me at a.b@example.com"))).otherwise(col("text")))
    val seed = runner.tableHandle("raw_docs")
    seed.append(fixture); seed.flush()

    runner.run()

    val cleanDocs = runner.tableHandle("clean_docs").read
    val unique = runner.tableHandle("unique_docs").read
    val chunks = runner.tableHandle("chunks").read
    val packed = runner.tableHandle("packed").read

    // clean: PII gone, short docs gone
    assert(cleanDocs.filter(col("text").contains("example.com")).count() == 0)
    assert(cleanDocs.filter(col("text").contains("<EMAIL>")).count() == 1)
    // dedup: survivors equal a direct call on the cleaned store
    val direct = TextDedup.dropNearDuplicates(cleanDocs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(unique.select("doc_id").collect().map(_.getLong(0)).toSet == direct)
    assert(unique.count() < cleanDocs.count()) // fixture contains planted near-dups
    // chunk: every unique doc produced at least one chunk
    assert(chunks.select("doc_id").distinct().count() == unique.count())
    // pack: every unique doc assigned exactly once, budget respected
    assert(packed.count() == unique.count())
    assert(packed.filter(!col("oversize")).groupBy("bin")
      .agg(sum("n_tokens").as("t")).filter(col("t") > 64).count() == 0)
  }

  test("web ingest pipeline: html strip -> url dedup -> quality gate -> bloom ingest") {
    val dir = tmpDir("webpipe")
    write(dir, "graph.yml",
      """functions:
        |  - node_file: strip.scala
        |    id: strip001
        |    inputs: {pages: raw_pages}
        |    outputs: {out: stripped}
        |  - node_file: urldedup.scala
        |    id: urldd001
        |    inputs: {docs: stripped}
        |    outputs: {out: url_unique}
        |  - node_file: gate.scala
        |    id: gate0001
        |    inputs: {docs: url_unique}
        |    outputs: {out: gated}
        |    parameters: {min_words: 40}
        |  - node_file: ingest.scala
        |    id: ingst001
        |    inputs: {batch: gated}
        |    outputs: {out: corpus}
        |stores:
        |  - table: raw_pages
        |  - table: stripped
        |  - table: url_unique
        |  - table: gated
        |  - table: corpus
        |""".stripMargin)

    val strip = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out")
        out.replace(ctx.table("pages").read
          .withColumn("text", Corpus.htmlToText(col("html"))).drop("html"))
        out.flush()
      }
    }
    // one survivor per canonical URL (min doc_id wins) — crawl dedup
    val urldedup = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out")
        val docs = ctx.table("docs").read
          .withColumn("curl", Corpus.canonicalUrl(col("url")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("curl").orderBy("doc_id")
        out.replace(docs.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn"))
        out.flush()
      }
    }
    val gate = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out")
        val docs = ctx.table("docs").read
        val verdicts = TextAnalysis.gopherFilter(docs, "doc_id", "text",
          minWords = ctx.parameter[Int]("min_words").toLong)
        out.replace(docs.join(
          verdicts.filter(col("keep")).select("doc_id"), Seq("doc_id")))
        out.flush()
      }
    }
    val ingest = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        // the corpus is this node's own output store (aggregate-into-
        // own-table ingest — reading it through the output handle
        // keeps the DAG acyclic)
        val out = ctx.table("out")
        val batch = ctx.table("batch").read.select("doc_id", "text")
        val fresh =
          if (out.exists)
            Corpus.bloomDedupAgainstCorpus(batch, out.read, "text").drop("fp")
          else batch
        out.append(fresh)
        out.flush()
      }
    }

    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh2"),
      codeNodes = Map("strip.scala" -> strip, "urldedup.scala" -> urldedup,
        "gate.scala" -> gate, "ingest.scala" -> ingest))
    assert(runner.validate().isEmpty)

    // pages: html-wrapped fixture text; ids 0/1 share a canonical URL
    // (tracking params + case differ); id 2 is too short to pass the gate
    val fixture = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(50)
      // the fixture is stopword-free word soup; give pages the Gopher
      // stopword mass a real crawl page has so the gate can pass
      .withColumn("text", concat(col("text"),
        lit(" the deal and the offer of the day that we have with them")))
      .withColumn("html", concat(lit("<html><body><p>"), col("text"),
        lit("</p><script>x()</script></body></html>")))
      .withColumn("url", concat(lit("HTTP://Ex.com/p/"),
        (col("doc_id") % 25).cast("string"),
        when(col("doc_id") < 25, lit("?utm_source=a")).otherwise(lit(""))))
      .withColumn("html", when(col("doc_id") === 2,
        lit("<p>tiny page</p>")).otherwise(col("html")))
      .select("doc_id", "url", "html")
    val seed = runner.tableHandle("raw_pages")
    seed.append(fixture); seed.flush()

    runner.run()

    val stripped = runner.tableHandle("stripped").read
    assert(stripped.filter(col("text").contains("<")).count() == 0)
    // 50 pages → 25 canonical URLs (utm/case variants collapse)
    val urlUnique = runner.tableHandle("url_unique").read
    assert(urlUnique.count() == 25)
    assert(urlUnique.agg(max("doc_id")).head().getLong(0) < 25) // min-id wins
    val gated = runner.tableHandle("gated").read
    assert(gated.filter(col("doc_id") === 2).count() == 0) // short page gated out
    assert(gated.count() > 0)
    // re-running ingest against the now-populated corpus adds nothing
    val corpus = runner.tableHandle("corpus")
    val before = corpus.read.count()
    val again = Corpus.bloomDedupAgainstCorpus(
      gated.select("doc_id", "text"), corpus.read, "text")
    assert(again.count() == 0, "second ingest of the same batch must dedup to zero")
    assert(before == gated.count())
  }
}
