package graft.core

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("version lifecycle: create, activate, swap, reset retains data") {
    val cat = new Catalog(tmpDir("cat"))
    assert(cat.meta("t").isEmpty)
    val v1 = cat.newVersion("t")
    assert(v1 == "v00000001")
    cat.setActive("t", v1, 10L)
    assert(cat.activePath("t").get.endsWith("t/v00000001"))
    assert(cat.recordCount("t") == 10L)

    val v2 = cat.newVersion("t")
    cat.setActive("t", v2, 20L)
    assert(cat.activePath("t").get.endsWith(v2))
    // old version still listed (retained until GC)
    assert(cat.meta("t").get.versions.map(_.id) == List(v1, v2))

    cat.reset("t")
    assert(cat.activePath("t").isEmpty)
    assert(cat.meta("t").get.versions.size == 2)
  }

  test("metadata survives reopen (atomic file persistence)") {
    val root = tmpDir("cat")
    val cat = new Catalog(root)
    val v = cat.newVersion("t")
    cat.setActive("t", v, 5L)
    cat.update("t")(_.copy(uniqueOn = List("id")))
    val cat2 = new Catalog(root)
    val m = cat2.meta("t").get
    assert(m.activeVersion.contains(v) && m.uniqueOn == List("id"))
    assert(cat2.listTables() == Seq("t"))
  }

  test("vacuum deletes only non-active versions") {
    val cat = new Catalog(tmpDir("cat"))
    val v1 = cat.newVersion("t"); cat.setActive("t", v1, 1L)
    val v2 = cat.newVersion("t"); cat.setActive("t", v2, 1L)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(cat.versionPath("t", v1)))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(cat.versionPath("t", v2)))
    val dead = cat.vacuum("t")
    assert(dead == Seq(v1))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(cat.versionPath("t", v1))))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(cat.versionPath("t", v2))))
  }

  test("concurrent batch sequences are unique across threads (per-table lock)") {
    val cat = new Catalog(tmpDir("cat-conc"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val seqs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val futs = (1 to 8).map(_ => pool.submit(new Runnable {
      def run(): Unit = (1 to 50).foreach(_ => seqs.add(cat.nextBatchSeq("t")))
    }))
    futs.foreach(_.get())
    pool.shutdown()
    assert(seqs.size == 400) // read-modify-write never lost an update
  }
}
