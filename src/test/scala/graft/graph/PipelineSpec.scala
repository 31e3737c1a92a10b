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
}
