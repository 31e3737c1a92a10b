package graft.graph

import org.scalatest.funsuite.AnyFunSuite

/** Golden round-trip cases replicated from the reference's editor tests
  * (/root/reference/tests/configuration/test_config_editor.py:8-202):
  * comments, key order, and indentation must survive every edit; `<id>`
  * in an expectation matches any generated 8-char id.
  */
class GraphConfigEditorSpec extends AnyFunSuite {

  private def editor(s: String): GraphConfigEditor =
    GraphConfigEditor.fromString(s.stripMargin.trim)

  private def assertDump(e: GraphConfigEditor, expected: String): String = {
    val exp = expected.stripMargin.trim
    var dump = e.dump().trim
    if (exp.contains("<id>"))
      dump = dump.replaceAll("id: \\w+", "id: <id>")
    assert(dump == exp, s"\n--- got ---\n$dump\n--- want ---\n$exp")
    e.dump().trim
  }

  test("round trip preserves comments and layout (test_round_trip)") {
    val s = """title: graph
              |functions:
              |  - webhook: out # eol comment
              |  # node 1
              |  - node_file: node_1.py
              |    inputs:
              |      in: out"""
    assertDump(editor(s), s)
  }

  test("round trip with unindented list items (test_round_trip_no_indent)") {
    val s = """functions:
              |- webhook: out # eol comment
              |- node_file: node_1.py
              |  inputs:
              |   in: out"""
    assertDump(editor(s), s)
  }

  test("add node to existing nodes keeps the eol comment") {
    val before = """functions:
                   |  - webhook: out # eol comment"""
    val after = """functions:
                  |  - webhook: out # eol comment
                  |  - node_file: node.py
                  |    id: <id>"""
    assertDump(editor(before).addNode("node.py"), after)
  }

  test("add node to empty graph creates the functions section") {
    val before = """title: graph"""
    val after = """title: graph
                  |functions:
                  |  - node_file: node.py
                  |    id: <id>"""
    assertDump(editor(before).addNode("node.py"), after)
  }

  test("add webhook with all fields") {
    val before = """title: graph"""
    val after = """title: graph
                  |functions:
                  |  - webhook: hook
                  |    title: n
                  |    id: ab234567
                  |    description_file: desc.md"""
    assertDump(
      editor(before).addWebhook("hook", "n", "ab234567", "desc.md"), after)
  }

  test("add store with all fields") {
    val before = """title: graph"""
    val after = """title: graph
                  |stores:
                  |  - table: st
                  |    id: ab234567
                  |    schema: sc"""
    assertDump(editor(before).addTable("st", "ab234567", "sc"), after)
  }

  test("add node with all fields") {
    val before = """title: graph
                   |functions:
                   |  - webhook: hook"""
    val after = """title: graph
                  |functions:
                  |  - webhook: hook
                  |  - node_file: node.py
                  |    trigger: 1 * * * *
                  |    inputs:
                  |      node_in: hook
                  |    outputs:
                  |      node_out: my_table
                  |    parameters:
                  |      limit: 2
                  |    title: my node
                  |    id: ab234567"""
    assertDump(
      editor(before).addNode("node.py",
        trigger = "1 * * * *",
        inputs = Seq("node_in" -> "hook"),
        outputs = Seq("node_out" -> "my_table"),
        parameters = Seq("limit" -> 2),
        title = "my node",
        id = "ab234567"),
      after)
  }

  test("add component uses with all fields") {
    val before = """title: graph
                   |functions:
                   |  - webhook: hook"""
    val after = """title: graph
                  |functions:
                  |  - webhook: hook
                  |  - uses: org/component@v1
                  |    trigger: 1 * * * *
                  |    inputs:
                  |      node_in: hook
                  |    outputs:
                  |      node_out: my_table
                  |    parameters:
                  |      limit: 2
                  |    title: my node
                  |    id: ab234567"""
    assertDump(
      editor(before).addComponentUses("org/component@v1",
        trigger = "1 * * * *",
        inputs = Seq("node_in" -> "hook"),
        outputs = Seq("node_out" -> "my_table"),
        parameters = Seq("limit" -> 2),
        title = "my node",
        id = "ab234567"),
      after)
  }

  test("add missing node ids fills functions and stores, keeps existing") {
    val before = """functions:
                   |  - node_file: a.py
                   |    title: a
                   |  - node_file: b.py
                   |    id: foo
                   |  - node_file: c.py
                   |stores:
                   |  - table: t
                   |  - stream: s"""
    val after = """functions:
                  |  - node_file: a.py
                  |    title: a
                  |    id: <id>
                  |  - node_file: b.py
                  |    id: <id>
                  |  - node_file: c.py
                  |    id: <id>
                  |stores:
                  |  - table: t
                  |    id: <id>
                  |  - stream: s
                  |    id: <id>"""
    val e = editor(before).addMissingNodeIds()
    val dump = assertDump(e, after)
    assert(dump.contains("id: foo"))
  }

  test("duplicate node_file / webhook / table / id rejected") {
    val base = editor("""functions:
                        |  - node_file: a.py
                        |    id: aaaa1111
                        |stores:
                        |  - table: t""")
    intercept[IllegalArgumentException](base.addNode("a.py"))
    intercept[IllegalArgumentException](base.addNode("b.py", id = "aaaa1111"))
    intercept[IllegalArgumentException](base.addTable("t"))
    val hooked = editor("""functions:
                          |  - webhook: h""")
    intercept[IllegalArgumentException](hooked.addWebhook("h"))
  }

  test("generated ids are 8-char [0-9a-z]; NoId omits the key") {
    val e = editor("""title: g""").addNode("n.py")
    val id = "id: (\\w+)".r.findFirstMatchIn(e.dump()).get.group(1)
    assert(id.matches("[0-9a-z]{8}"))
    val e2 = editor("""title: g""").addNode("n.py", id = GraphConfigEditor.NoId)
    assert(!e2.dump().contains("id:"))
  }

  test("write + reopen round-trips through disk; edits parse via Manifest loader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfgedit")
    val p = dir.resolve("graph.yml")
    java.nio.file.Files.writeString(p,
      "title: g\nfunctions:\n  - node_file: a.sql # keep me\n")
    GraphConfigEditor(p)
      .addTable("tbl", id = "ab234567")
      .addMissingNodeIds()
      .write()
    val text = java.nio.file.Files.readString(p)
    assert(text.contains("# keep me"))
    // a second editor sees the same state (reference lru_cache semantics
    // are per-instance; reopening re-reads the file)
    val again = GraphConfigEditor(p).dump()
    assert(again == text)
    // and the result is loadable by the manifest parser
    val m = GraphManifest.load(p.toString)
    assert(m.stores.exists(_.name == "tbl"))
  }
}
