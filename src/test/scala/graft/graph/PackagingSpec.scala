package graft.graph

import java.nio.file.{Files, Paths}
import graft.SparkSpec

class PackagingSpec extends SparkSpec {

  private def write(dir: String, name: String, text: String): Unit = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, text)
  }

  test("packageGraph zips non-ignored contents deterministically; unpack round-trips") {
    val dir = tmpDir("pkg")
    write(dir, "graph.yml", "functions: []\n")
    write(dir, "sub/query.sql", "select 1 as one")
    write(dir, ".git/HEAD", "ref: refs/heads/main")   // ignored dir
    write(dir, "junk.pyc", "bytecode")                 // ignored file
    val z1 = Packaging.packageGraph(dir)
    val z2 = Packaging.packageGraph(dir)
    assert(z1.sameElements(z2)) // byte-identical: digests are meaningful
    val out = tmpDir("unpacked")
    Packaging.unpack(z1, out)
    assert(Files.readString(Paths.get(out, "sub/query.sql")) == "select 1 as one")
    assert(!Files.exists(Paths.get(out, ".git/HEAD")))
    assert(!Files.exists(Paths.get(out, "junk.pyc")))
    assert(GraphManifest.load(out).functions.isEmpty)
  }

  test("unpack rejects zip-slip entries") {
    val bytes = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bytes)
    zip.putNextEntry(new java.util.zip.ZipEntry("../escape.txt"))
    zip.write("boom".getBytes); zip.closeEntry(); zip.close()
    val e = intercept[IllegalArgumentException](
      Packaging.unpack(bytes.toByteArray, tmpDir("slip")))
    assert(e.getMessage.contains("escapes destination"))
  }

  test("uses: org/component@v1 resolves from a packaged zip registry end-to-end") {
    // author a component, package it into the registry layout
    val comp = tmpDir("component")
    write(comp, "count.sql", "select count(*) as n from {{ input }}")
    write(comp, "graph.yml",
      """functions:
        |  - node_file: count.sql
        |    id: count001
        |    inputs: {input: src}
        |    outputs: {out: result}
        |stores:
        |  - table: src
        |  - table: result
        |""".stripMargin)
    val registry = tmpDir("zipreg")
    Files.createDirectories(Paths.get(registry, "acme", "wordcount"))
    Packaging.packageGraphTo(comp, s"$registry/acme/wordcount/v1.zip")

    val dir = tmpDir("graph")
    write(dir, "graph.yml",
      """functions:
        |  - uses: acme/wordcount@v1
        |    id: comp00001
        |stores:
        |  - table: src
        |  - table: result
        |""".stripMargin)
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
      componentResolver = Packaging.componentResolverFromZips(registry))
    assert(runner.validate().isEmpty)
    import spark.implicits._
    val seed = runner.tableHandle("src")
    seed.append(Seq(1L, 2L, 3L).toDF("id")); seed.flush()
    runner.run()
    assert(runner.tableHandle("result").read.head().getLong(0) == 3L)
    // unknown version stays unresolved (validation error, not a crash)
    assert(Packaging.componentResolverFromZips(registry)("acme/wordcount@v9").isEmpty)
  }

  test("uses: org/component@v1 resolves over the HTTP registry wire") {
    // same component as the zip-registry test, served over loopback HTTP
    val comp = tmpDir("component-http")
    write(comp, "count.sql", "select count(*) as n from {{ input }}")
    write(comp, "graph.yml",
      """functions:
        |  - node_file: count.sql
        |    id: count001
        |    inputs: {input: src}
        |    outputs: {out: result}
        |stores:
        |  - table: src
        |  - table: result
        |""".stripMargin)
    val registry = tmpDir("httpreg")
    Files.createDirectories(Paths.get(registry, "acme", "wordcount"))
    Packaging.packageGraphTo(comp, s"$registry/acme/wordcount/v1.zip")
    val server = new ComponentRegistryServer(registry)
    try {
      val resolver = Packaging.componentResolverFromHttp(server.baseUrl)
      val dir = tmpDir("graph-http")
      write(dir, "graph.yml",
        """functions:
          |  - uses: acme/wordcount@v1
          |    id: comp00001
          |stores:
          |  - table: src
          |  - table: result
          |""".stripMargin)
      val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
        componentResolver = resolver)
      assert(runner.validate().isEmpty)
      import spark.implicits._
      val seed = runner.tableHandle("src")
      seed.append(Seq(1L, 2L, 3L, 4L).toDF("id")); seed.flush()
      runner.run()
      assert(runner.tableHandle("result").read.head().getLong(0) == 4L)
      // 404s resolve to None; traversal-shaped keys are not keys
      assert(resolver("acme/wordcount@v9").isEmpty)
      assert(resolver("acme/../etc@passwd").isEmpty)
      // second resolve serves from the unpack cache (no re-fetch needed
      // after the server stops)
      server.stop()
      assert(resolver("acme/wordcount@v1").isDefined)
    } finally { try server.stop() catch { case _: Exception => () } }
  }
}
