package graft.graph

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.llm.{Corpus, TextAnalysis, TextDedup}

/** The LLM data-prep chain published as a `uses:`-able component — the
  * reference's composition story (components are versioned subgraphs
  * resolved from a registry, /root/reference/patterns/cli/configuration/
  * edit.py:175-200) carrying THIS engine's real operators: a host graph
  * pulls `acme/llmprep@v1` from the zip registry (and again over the
  * loopback HTTP registry) and runs ingest → clean → near-dup collapse
  * → chunk end-to-end through the graph layer.
  */
class ComponentPipelineSpec extends SparkSpec {

  private def write(dir: String, name: String, text: String): Unit = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, text)
  }

  /** The component: clean (PII + min-token gate, threshold as a typed
    * parameter) → near-dup collapse → chunk, wired over stores.
    */
  private def authorComponent(): String = {
    val comp = tmpDir("llmprep-component")
    write(comp, "graph.yml",
      """title: llm data prep
        |functions:
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
        |stores:
        |  - table: clean_docs
        |""".stripMargin)
    comp
  }

  private val codeNodes: Map[String, CodeNode] = Map(
    "clean.scala" -> new CodeNode {
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
    },
    "dedup.scala" -> new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out")
        out.replace(TextDedup.dropNearDuplicates(
          ctx.table("docs").read, "doc_id", "text"))
        out.flush()
      }
    },
    "chunk.scala" -> new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out")
        out.replace(Corpus.chunkDocuments(
          ctx.table("docs").read, "doc_id", "text", 8, 2))
        out.flush()
      }
    })

  private def runHost(resolver: String => Option[GraphManifest]): Unit = {
    val dir = tmpDir("llmprep-host")
    write(dir, "graph.yml",
      """functions:
        |  - uses: acme/llmprep@v1
        |    id: prep00001
        |stores:
        |  - table: raw_docs
        |  - table: unique_docs
        |  - table: chunks
        |""".stripMargin)
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
      codeNodes = codeNodes, componentResolver = resolver)
    assert(runner.validate().isEmpty,
      s"validation: ${runner.validate().mkString("; ")}")

    val fixture = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
      .withColumn("text", when(col("doc_id") === 7,
        concat(col("text"), lit(" mail me at a.b@example.com"))).otherwise(col("text")))
    val seed = runner.tableHandle("raw_docs")
    seed.append(fixture); seed.flush()
    runner.run()

    val unique = runner.tableHandle("unique_docs").read
    val chunks = runner.tableHandle("chunks").read
    // PII redacted inside the component's first stage
    assert(unique.filter(col("text").contains("example.com")).count() == 0)
    // near-dup collapse actually dropped planted duplicates
    assert(unique.count() > 0 && unique.count() < fixture.count())
    // every surviving doc chunked
    assert(chunks.select("doc_id").distinct().count() == unique.count())
  }

  test("LLM prep chain as uses: component from the zip registry") {
    val comp = authorComponent()
    val registry = tmpDir("llmprep-zipreg")
    Files.createDirectories(Paths.get(registry, "acme", "llmprep"))
    Packaging.packageGraphTo(comp, s"$registry/acme/llmprep/v1.zip")
    runHost(Packaging.componentResolverFromZips(registry))
  }

  test("LLM prep chain as uses: component over the HTTP registry") {
    val comp = authorComponent()
    val registry = tmpDir("llmprep-httpreg")
    Files.createDirectories(Paths.get(registry, "acme", "llmprep"))
    Packaging.packageGraphTo(comp, s"$registry/acme/llmprep/v1.zip")
    val server = new ComponentRegistryServer(registry)
    try runHost(Packaging.componentResolverFromHttp(server.baseUrl))
    finally server.stop()
  }
}
