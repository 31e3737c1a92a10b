package graft.graph

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Programmatic graph.yml editing with round-trip fidelity — the Scala
  * face of the reference's `GraphConfigEditor`
  * (/root/reference/patterns/cli/configuration/edit.py:19-232): add
  * function nodes / stores / webhooks / `uses:` components and fill in
  * missing node ids, writing the yaml back with comments, key order,
  * and blank lines untouched.
  *
  * Where the reference round-trips through ruyaml (a comment-preserving
  * YAML engine), this editor works on the RAW LINES and only ever
  * appends whole entries to a section or inserts single `id:` lines —
  * untouched text is preserved byte-for-byte, which is strictly
  * stronger round-trip fidelity than a parse/re-emit cycle. Reads
  * (title/slug, duplicate detection) go through the same snakeyaml
  * parse the [[Manifest]] loader uses, so an edit that would produce an
  * unparsable or duplicate-id graph fails here, not at compile time.
  *
  * Indentation matches the reference's sniffing (edit.py:44-57): list
  * items indent to the least-indented `- ` already in the file
  * (default 2), and entry keys continue 2 past the dash.
  */
final class GraphConfigEditor private (
    private var lines: Vector[String],
    val path: Option[Path],
    rng: scala.util.Random) {

  import GraphConfigEditor._

  // ---- output ----------------------------------------------------------

  /** The edited config as a yaml string. */
  def dump(): String = lines.mkString("\n") + (if (lines.isEmpty) "" else "\n")

  /** Write the config back to the file this editor was opened on. */
  def write(): GraphConfigEditor = {
    val p = path.getOrElse(
      throw new IllegalStateException("editor opened without a path"))
    Files.writeString(p, dump())
    this
  }

  // ---- reads (through the same parser the Manifest loader uses) --------

  private def parsed: java.util.Map[String, Object] = {
    val m = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](dump())
    if (m == null) new java.util.LinkedHashMap[String, Object]() else m
  }

  private def sectionEntries(section: String): Seq[Map[String, Any]] =
    Option(parsed.get(section)).toSeq.flatMap {
      case l: java.util.List[_] => l.asScala.toSeq.collect {
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, v) => String.valueOf(k) -> (v: Any) }.toMap
      }
      case _ => Nil
    }

  def getTitle: Option[String] =
    Option(parsed.get("title")).map(String.valueOf)

  def getSlug: Option[String] =
    Option(parsed.get("slug")).map(String.valueOf)

  // ---- top-level scalars -----------------------------------------------

  def setName(name: String): GraphConfigEditor = setTopLevel("title", name)
  def setSlug(slug: String): GraphConfigEditor = setTopLevel("slug", slug)

  private def setTopLevel(key: String, value: String): GraphConfigEditor = {
    val re = s"""^$key:.*$$""".r
    val idx = lines.indexWhere(l => re.findFirstIn(l).isDefined)
    val rendered = s"$key: ${renderScalar(value)}"
    if (idx >= 0) lines = lines.updated(idx, rendered)
    else {
      // a new top-level key lands at the end of the mapping, matching
      // ruyaml's dict-append behavior
      while (lines.nonEmpty && lines.last.trim.isEmpty) lines = lines.init
      lines = lines :+ rendered
    }
    this
  }

  // ---- entry builders (edit.py:101-200) --------------------------------

  /** Append a function node (edit.py:101-126). `id = AutoId` (default)
    * generates a fresh 8-char id; `id = NoId` omits the key.
    */
  def addNode(
      nodeFile: String,
      trigger: String = null,
      inputs: Seq[(String, String)] = Nil,
      outputs: Seq[(String, String)] = Nil,
      parameters: Seq[(String, Any)] = Nil,
      title: String = null,
      id: String = AutoId,
      descriptionFile: String = null): GraphConfigEditor =
    addFunctionEntry(
      Seq("node_file" -> nodeFile, "trigger" -> trigger,
        "inputs" -> inputs, "outputs" -> outputs, "parameters" -> parameters,
        "title" -> title, "id" -> resolveId(id),
        "description_file" -> descriptionFile))

  /** Append a webhook node (edit.py:156-173). */
  def addWebhook(
      webhook: String,
      title: String = null,
      id: String = AutoId,
      descriptionFile: String = null): GraphConfigEditor =
    addFunctionEntry(
      Seq("webhook" -> webhook, "title" -> title, "id" -> resolveId(id),
        "description_file" -> descriptionFile))

  /** Append a `uses:` component node (edit.py:175-200). */
  def addComponentUses(
      componentKey: String,
      trigger: String = null,
      inputs: Seq[(String, String)] = Nil,
      outputs: Seq[(String, String)] = Nil,
      parameters: Seq[(String, Any)] = Nil,
      title: String = null,
      id: String = AutoId,
      descriptionFile: String = null): GraphConfigEditor =
    addFunctionEntry(
      Seq("uses" -> componentKey, "trigger" -> trigger,
        "inputs" -> inputs, "outputs" -> outputs, "parameters" -> parameters,
        "title" -> title, "id" -> resolveId(id),
        "description_file" -> descriptionFile))

  /** Append a store (edit.py:128-154). */
  def addTable(
      name: String,
      id: String = AutoId,
      schema: String = null): GraphConfigEditor = {
    val entry = Seq("table" -> name, "id" -> resolveId(id), "schema" -> schema)
    val existing = sectionEntries("stores")
    for ((k, v) <- entry if v != null && v != Nil)
      if (Seq("table", "stream", "id").contains(k) &&
          existing.exists(_.get(k).map(String.valueOf).contains(String.valueOf(v))))
        throw new IllegalArgumentException(
          s"$k '$v' already defined in the graph configuration")
    appendEntry("stores", entry)
  }

  /** Add a random id to any function or store entry that doesn't
    * specify one (edit.py:202-207).
    */
  def addMissingNodeIds(): GraphConfigEditor = {
    Seq("functions", "stores").foreach { section =>
      // re-locate after each insertion (indices shift)
      var inserted = true
      while (inserted) {
        inserted = false
        locateSection(section).foreach { case (start, end, itemIndent) =>
          val items = itemStarts(start, end, itemIndent)
          val withEnds = items.zip(items.drop(1) :+ end)
          withEnds.find { case (s, e) =>
            !lines.slice(s, e).exists(_.matches("""\s*id:.*"""))
          }.foreach { case (s, e) =>
            // insert after the entry's last non-blank line
            val last = (s until e).reverse
              .find(i => lines(i).trim.nonEmpty).getOrElse(s)
            val keyIndent = " " * (itemIndent + 2)
            lines = lines.patch(last + 1,
              Seq(s"${keyIndent}id: ${GraphManifest.newNodeId(rng)}"), 0)
            inserted = true
          }
        }
      }
    }
    this
  }

  // ---- line-level mechanics --------------------------------------------

  private def resolveId(id: String): String =
    if (id == AutoId) GraphManifest.newNodeId(rng) else if (id == NoId) null else id

  private def addFunctionEntry(entry: Seq[(String, Any)]): GraphConfigEditor = {
    val existing = sectionEntries("functions")
    for ((k, v) <- entry if v != null && v != Nil)
      if (Seq("node_file", "id", "webhook").contains(k) &&
          existing.exists(_.get(k).map(String.valueOf).contains(String.valueOf(v))))
        throw new IllegalArgumentException(
          s"$k '$v' already defined in the graph configuration")
    appendEntry("functions", entry)
  }

  /** Least-indented `- ` in the file decides item indentation
    * (edit.py:44-50); default 2.
    */
  private def itemIndentDefault: Int = {
    val ms = lines.flatMap("""^( *)-""".r.findFirstMatchIn(_))
      .map(_.group(1).length)
    if (ms.isEmpty) 2 else ms.min
  }

  /** (startLine, endLine, itemIndent) of a top-level list section; end
    * is exclusive and trims trailing blank lines.
    */
  private def locateSection(section: String): Option[(Int, Int, Int)] = {
    val head = lines.indexWhere(_.matches(s"""$section:\\s*(#.*)?"""))
    if (head < 0) return None
    var end = head + 1
    while (end < lines.length &&
      !lines(end).matches("""\S.*""")) end += 1 // next top-level key = col-0 text
    while (end > head + 1 && lines(end - 1).trim.isEmpty) end -= 1
    val indents = (head + 1 until end)
      .flatMap(i => """^( *)-""".r.findFirstMatchIn(lines(i)))
      .map(_.group(1).length)
    val indent = if (indents.isEmpty) itemIndentDefault else indents.min
    Some((head + 1, end, indent))
  }

  private def itemStarts(start: Int, end: Int, itemIndent: Int): Seq[Int] =
    (start until end).filter(i =>
      lines(i).matches(s"""^${" " * itemIndent}- .*"""))

  private def appendEntry(section: String, entry: Seq[(String, Any)]): GraphConfigEditor = {
    val kept = entry.filter { case (_, v) => v != null && v != Nil }
    locateSection(section) match {
      case Some((_, end, itemIndent)) =>
        lines = lines.patch(end, renderEntry(kept, itemIndent), 0)
      case None =>
        // create the section at the end of the file (edit.py:96-98)
        while (lines.nonEmpty && lines.last.trim.isEmpty) lines = lines.init
        lines = lines ++ (s"$section:" +: renderEntry(kept, itemIndentDefault))
    }
    this
  }

  private def renderEntry(kv: Seq[(String, Any)], itemIndent: Int): Seq[String] = {
    val dash = " " * itemIndent + "- "
    val keyIndent = " " * (itemIndent + 2)
    val rendered = kv.flatMap {
      case (k, m: Seq[_]) =>
        val pairs = m.collect { case (mk, mv) => (String.valueOf(mk), mv) }
        s"$k:" +: pairs.map { case (mk, mv) =>
          s"  $mk: ${renderScalar(mv)}"
        }
      case (k, v) => Seq(s"$k: ${renderScalar(v)}")
    }
    rendered.zipWithIndex.map {
      case (l, 0) => dash + l
      case (l, _) => keyIndent + l
    }
  }

  /** Plain scalars exactly as ruyaml emits them for the reference's
    * golden cases; quote only when plain YAML would misparse.
    */
  private def renderScalar(v: Any): String = v match {
    case null => "null"
    case s: String if s.isEmpty => "''"
    case s: String if needsQuote(s) => "'" + s.replace("'", "''") + "'"
    case other => String.valueOf(other)
  }

  private def needsQuote(s: String): Boolean =
    s.matches("""[-?:#&*!|>'"%@`{}\[\],].*""") || s.contains(": ") ||
      s.endsWith(":") || s != s.trim
}

object GraphConfigEditor {
  /** Default `id` sentinel: generate a fresh 8-char node id
    * (reference `MISSING`, edit.py:16,109-113).
    */
  val AutoId: String = " auto"

  /** Omit the id key entirely (reference `id=None`). */
  val NoId: String = " none"

  /** Open an existing graph.yml (normalizes \r\n like edit.py:36-42). */
  def apply(path: Path, rng: scala.util.Random = new scala.util.Random()): GraphConfigEditor = {
    val text = Files.readString(path).replace("\r\n", "\n")
    new GraphConfigEditor(splitKeepAll(text), Some(path), rng)
  }

  /** Start from an empty config (reference `read=False`). */
  def empty(path: Option[Path] = None,
      rng: scala.util.Random = new scala.util.Random()): GraphConfigEditor =
    new GraphConfigEditor(Vector.empty, path, rng)

  /** Parse from a yaml string without a backing file. */
  def fromString(text: String,
      rng: scala.util.Random = new scala.util.Random()): GraphConfigEditor =
    new GraphConfigEditor(splitKeepAll(text.replace("\r\n", "\n")), None, rng)

  private def splitKeepAll(text: String): Vector[String] = {
    val t = if (text.endsWith("\n")) text.dropRight(1) else text
    if (t.isEmpty) Vector.empty else t.split("\n", -1).toVector
  }
}
