package graft.graph

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Zip-vs-directory diff semantics replicated from the reference
  * (/root/reference/tests/cli/test_diffs.py:8-73): identical trees
  * diff empty; added/removed flip with `fromRemote`; text changes get
  * a difflib-shaped unified diff, binary changes a one-line marker.
  */
class GraphDiffSpec extends AnyFunSuite {

  test("diffs between zip and dir (test_diffs golden)") {
    val dir = Files.createTempDirectory("graft-diff")
    val txt = dir.resolve("t.txt")
    val txt2 = dir.resolve("t2.txt")
    val bin = dir.resolve("b.bin")
    Files.writeString(txt, "foo\nbar\nbaz")
    Files.writeString(txt2, "foo\nbar\nbaz")
    Files.write(bin, Array[Byte](0xf1.toByte, 0xf2.toByte, 0xf3.toByte))
    val zip = Packaging.packageGraph(dir.toString)

    val clean = GraphDiff.diffZipAndDir(zip, dir, fromRemote = false)
    assert(clean.isEmpty, s"expected empty diff, got $clean")

    Files.delete(txt2)
    Files.writeString(dir.resolve("t3.txt"), "t3")
    Files.writeString(txt, "foo\nbar2\nbaz\nqux")
    Files.write(bin, Array[Byte](0xf1.toByte, 0xff.toByte))

    val local = GraphDiff.diffZipAndDir(zip, dir, fromRemote = false)
    assert(local.added == Seq("t3.txt"))
    assert(local.removed == Seq("t2.txt"))
    val localChanged = local.changed.toMap
    assert(localChanged.keySet == Set("b.bin", "t.txt"))
    assert(localChanged("b.bin") == Seq(
      "--- <remote> b.bin",
      "+++ <local>  b.bin",
      "Binary contents differ"))
    assert(localChanged("t.txt") == Seq(
      "--- <remote> t.txt",
      "+++ <local>  t.txt",
      "@@ -1,3 +1,4 @@",
      " foo",
      "-bar",
      "+bar2",
      " baz",
      "+qux"))

    val remote = GraphDiff.diffZipAndDir(zip, dir, fromRemote = true)
    assert(remote.added == Seq("t2.txt"))
    assert(remote.removed == Seq("t3.txt"))
    val remoteChanged = remote.changed.toMap
    assert(remoteChanged("t.txt") == Seq(
      "--- <remote> t.txt",
      "+++ <local>  t.txt",
      "@@ -1,4 +1,3 @@",
      " foo",
      "-bar2",
      "+bar",
      " baz",
      "-qux"))
    assert(remoteChanged("b.bin")(2) == "Binary contents differ")
  }

  test("hunk splitting and context trimming match difflib") {
    val a = (1 to 30).map(i => s"line$i")
    val b = a.updated(4, "LINE5").updated(24, "LINE25")
    val d = GraphDiff.unifiedDiff(a, b, "<remote> f", "<local>  f")
    // two hunks (equal run between edits > 2n), 3 lines of context each
    assert(d.count(_.startsWith("@@")) == 2)
    assert(d.contains("@@ -2,7 +2,7 @@"))
    assert(d.contains("@@ -22,7 +22,7 @@"))
    assert(d.contains("-line5") && d.contains("+LINE5"))
    assert(d.contains("-line25") && d.contains("+LINE25"))
    // single-line files: ranges drop the ,1 like difflib
    val single = GraphDiff.unifiedDiff(Vector("x"), Vector("y"), "a", "b")
    assert(single.contains("@@ -1 +1 @@"))
    // identical inputs: no output at all
    assert(GraphDiff.unifiedDiff(a, a, "a", "b").isEmpty)
    // pure insertion into empty file: difflib's 0-length from-range
    val ins = GraphDiff.unifiedDiff(Vector.empty, Vector("n1", "n2"), "a", "b")
    assert(ins.contains("@@ -0,0 +1,2 @@"))
  }

  test("render produces the upload-preview layout") {
    val d = DiffResult(Seq("a.txt"), Seq("b.txt"),
      Seq("c.txt" -> Seq("--- <remote> c.txt", "+++ <local>  c.txt",
        "@@ -1 +1 @@", "-x", "+y")))
    val full = d.render()
    assert(full.contains("Added:\n- a.txt"))
    assert(full.contains("Deleted:\n- b.txt"))
    assert(full.contains("Modified:"))
    assert(full.contains("-x"))
    val names = d.render(context = false)
    assert(names.contains("- c.txt") && !names.contains("-x"))
  }
}
