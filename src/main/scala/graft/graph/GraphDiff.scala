package graft.graph

import java.io.ByteArrayInputStream
import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.nio.file.{Files, Path}
import java.util.zip.ZipInputStream

/** Added / removed / changed files between a packaged graph zip and a
  * working directory — the reference's upload/download preview
  * (/root/reference/patterns/cli/services/diffs.py:13-70): text files
  * get a unified diff, binary files a one-line "Binary contents
  * differ", and the `fromRemote` flag flips which side counts as
  * added vs removed (downloading shows the remote's perspective).
  *
  * CLI-side metadata tooling: graph configs are a few KB, so the diff
  * is a driver-local LCS — no Spark involved.
  */
final case class DiffResult(
    added: Seq[String],
    removed: Seq[String],
    changed: Seq[(String, Seq[String])]) {

  def isEmpty: Boolean = added.isEmpty && removed.isEmpty && changed.isEmpty
  def nonEmpty: Boolean = !isEmpty

  /** Plain-text rendering (diffs.py:73-101 without the rich markup). */
  def render(context: Boolean = true, full: Boolean = true): String = {
    val sb = new StringBuilder
    if (full && added.nonEmpty)
      sb ++= "Added:\n" ++= added.map(a => s"- $a\n").mkString += '\n'
    if (full && removed.nonEmpty)
      sb ++= "Deleted:\n" ++= removed.map(a => s"- $a\n").mkString += '\n'
    if (changed.nonEmpty) {
      sb ++= "Modified:\n"
      if (context)
        sb ++= changed.map(_._2.mkString("\n")).mkString("\n", "\n\n", "\n")
      else sb ++= changed.map { case (n, _) => s"- $n\n" }.mkString
    }
    sb.toString
  }
}

object GraphDiff {

  /** Diff a graph zip ([[Packaging.packageGraph]]'s format) against a
    * directory (diffs.py:28-70). `fromRemote = false`: the zip is the
    * old state (upload preview); `true`: the zip is the remote being
    * pulled (download preview) — added/removed and diff direction flip,
    * the `<remote>`/`<local>` labels do not.
    */
  def diffZipAndDir(zipBytes: Array[Byte], root: Path,
      fromRemote: Boolean): DiffResult = {
    val added = Seq.newBuilder[String]
    val removed = Seq.newBuilder[String]
    val changed = Seq.newBuilder[(String, Seq[String])]
    val allInZip = scala.collection.mutable.Set.empty[String]

    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    var entry = zin.getNextEntry
    while (entry != null) {
      if (!entry.isDirectory) {
        val name = entry.getName
        allInZip += name
        val dst = root.resolve(name)
        if (!Files.isRegularFile(dst)) {
          (if (fromRemote) added else removed) += name
        } else {
          val zipBytesE = zin.readAllBytes()
          val fsBytes = Files.readAllBytes(dst)
          (decodeUtf8(zipBytesE), decodeUtf8(fsBytes)) match {
            case (Some(zc), Some(fc)) =>
              if (zc != fc) {
                val (from, to) = if (fromRemote) (fc, zc) else (zc, fc)
                val d = unifiedDiff(from, to,
                  s"<remote> $name", s"<local>  $name")
                changed += name -> d
              }
            case _ =>
              if (!java.util.Arrays.equals(zipBytesE, fsBytes))
                changed += name -> Seq(
                  s"--- <remote> $name",
                  s"+++ <local>  $name",
                  "Binary contents differ")
          }
        }
      }
      entry = zin.getNextEntry
    }
    zin.close()

    Packaging.contents(root).foreach { p =>
      val rel = root.relativize(p).toString.replace('\\', '/')
      if (!allInZip(rel)) (if (fromRemote) removed else added) += rel
    }
    DiffResult(added.result(), removed.result(), changed.result())
  }

  /** Strict UTF-8 decode split into lines; None = binary
    * (diffs.py:43-46's UnicodeDecodeError branch).
    */
  private def decodeUtf8(bytes: Array[Byte]): Option[Vector[String]] =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
      val s = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      Some(if (s.isEmpty) Vector.empty
        else s.split("\r\n|\r|\n", -1).toVector match {
          // splitlines(keepends=False) drops a trailing newline's empty tail
          case v if v.last.isEmpty && s.matches("(?s).*(\r\n|\r|\n)$") => v.init
          case v => v
        })
    } catch { case _: CharacterCodingException => None }

  // ---- difflib-compatible unified diff ---------------------------------

  private sealed trait Tag
  private case object Equal extends Tag
  private case object Replace extends Tag
  private case object Delete extends Tag
  private case object Insert extends Tag
  private final case class Op(tag: Tag, i1: Int, i2: Int, j1: Int, j2: Int)

  /** Unified diff with difflib's exact output shape (unified_diff with
    * lineterm=""): `---`/`+++` headers, `@@ -a,b +c,d @@` hunks with 3
    * lines of context, single-line ranges printed without the `,1`.
    */
  def unifiedDiff(a: IndexedSeq[String], b: IndexedSeq[String],
      fromFile: String, toFile: String, n: Int = 3): Seq[String] = {
    val groups = groupOpcodes(opcodes(a, b), n)
    if (groups.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    out += s"--- $fromFile"
    out += s"+++ $toFile"
    groups.foreach { g =>
      val (first, last) = (g.head, g.last)
      out += s"@@ -${fmtRange(first.i1, last.i2)} +${fmtRange(first.j1, last.j2)} @@"
      g.foreach { op =>
        op.tag match {
          case Equal => (op.i1 until op.i2).foreach(i => out += " " + a(i))
          case Replace =>
            (op.i1 until op.i2).foreach(i => out += "-" + a(i))
            (op.j1 until op.j2).foreach(j => out += "+" + b(j))
          case Delete => (op.i1 until op.i2).foreach(i => out += "-" + a(i))
          case Insert => (op.j1 until op.j2).foreach(j => out += "+" + b(j))
        }
      }
    }
    out.result()
  }

  /** difflib._format_range_unified. */
  private def fmtRange(start: Int, stop: Int): String = {
    val length = stop - start
    if (length == 1) s"${start + 1}"
    else s"${if (length == 0) start else start + 1},$length"
  }

  /** difflib.SequenceMatcher.get_grouped_opcodes (context trimming and
    * hunk splitting on long equal runs).
    */
  private def groupOpcodes(codes0: Seq[Op], n: Int): Seq[Seq[Op]] = {
    var codes = if (codes0.isEmpty) Seq(Op(Equal, 0, 1, 0, 1)) else codes0
    codes.head match {
      case Op(Equal, i1, i2, j1, j2) =>
        codes = Op(Equal, math.max(i1, i2 - n), i2, math.max(j1, j2 - n), j2) +:
          codes.tail
      case _ =>
    }
    codes.last match {
      case Op(Equal, i1, i2, j1, j2) =>
        codes = codes.init :+
          Op(Equal, i1, math.min(i2, i1 + n), j1, math.min(j2, j1 + n))
      case _ =>
    }
    val nn = n + n
    val groups = Seq.newBuilder[Seq[Op]]
    var group = Seq.newBuilder[Op]
    codes.foreach { op =>
      var i1 = op.i1; var j1 = op.j1
      if (op.tag == Equal && op.i2 - i1 > nn) {
        group += Op(Equal, i1, math.min(op.i2, i1 + n), j1, math.min(op.j2, j1 + n))
        groups += group.result()
        group = Seq.newBuilder[Op]
        i1 = math.max(i1, op.i2 - n); j1 = math.max(j1, op.j2 - n)
      }
      group += Op(op.tag, i1, op.i2, j1, op.j2)
    }
    val lastGroup = group.result()
    if (lastGroup.nonEmpty && !(lastGroup.length == 1 && lastGroup.head.tag == Equal))
      groups += lastGroup
    groups.result()
  }

  /** equal/replace/delete/insert runs from an LCS alignment (common
    * prefix/suffix trimmed first, DP over the middle).
    */
  private def opcodes(a: IndexedSeq[String], b: IndexedSeq[String]): Seq[Op] = {
    val na = a.length; val nb = b.length
    var pre = 0
    while (pre < na && pre < nb && a(pre) == b(pre)) pre += 1
    var suf = 0
    while (suf < na - pre && suf < nb - pre &&
      a(na - 1 - suf) == b(nb - 1 - suf)) suf += 1
    val ma = na - pre - suf; val mb = nb - pre - suf

    // LCS table over the trimmed middle
    val dp = Array.ofDim[Int](ma + 1, mb + 1)
    var i = ma - 1
    while (i >= 0) {
      var j = mb - 1
      while (j >= 0) {
        dp(i)(j) =
          if (a(pre + i) == b(pre + j)) dp(i + 1)(j + 1) + 1
          else math.max(dp(i + 1)(j), dp(i)(j + 1))
        j -= 1
      }
      i -= 1
    }

    val ops = Seq.newBuilder[Op]
    if (pre > 0) ops += Op(Equal, 0, pre, 0, pre)
    var (x, y) = (0, 0)
    // walk the alignment as single-line steps, then merge into runs
    val runs = Seq.newBuilder[(Char, Int, Int)] // ('='|'-'|'+', ai, bi)
    while (x < ma && y < mb) {
      if (a(pre + x) == b(pre + y)) { runs += (('=', x, y)); x += 1; y += 1 }
      else if (dp(x + 1)(y) >= dp(x)(y + 1)) { runs += (('-', x, y)); x += 1 }
      else { runs += (('+', x, y)); y += 1 }
    }
    while (x < ma) { runs += (('-', x, y)); x += 1 }
    while (y < mb) { runs += (('+', x, y)); y += 1 }

    // merge step sequence into opcodes
    var curTag: Char = 0
    var si = 0; var sj = 0 // run start
    var ci = 0; var cj = 0 // cursor
    def emit(): Unit = if (curTag != 0) {
      val op = curTag match {
        case '=' => Op(Equal, pre + si, pre + ci, pre + sj, pre + cj)
        case _ =>
          val t = if (ci > si && cj > sj) Replace
            else if (ci > si) Delete else Insert
          Op(t, pre + si, pre + ci, pre + sj, pre + cj)
      }
      ops += op
    }
    runs.result().foreach { case (c, ai, bi) =>
      val cls = if (c == '=') '=' else 'x' // deletes+inserts merge into one block
      if (curTag == 0 || cls != curTag) {
        emit(); curTag = cls; si = ai; sj = bi; ci = ai; cj = bi
      }
      if (c == '=') { ci = ai + 1; cj = bi + 1 }
      else if (c == '-') ci = ai + 1
      else cj = bi + 1
    }
    emit()
    if (suf > 0) ops += Op(Equal, na - suf, na, nb - suf, nb)

    // merge adjacent Equal ops (prefix + first middle run may touch)
    val merged = Seq.newBuilder[Op]
    var prev: Op = null
    ops.result().foreach { op =>
      if (prev != null && prev.tag == Equal && op.tag == Equal && prev.i2 == op.i1)
        prev = Op(Equal, prev.i1, op.i2, prev.j1, op.j2)
      else { if (prev != null) merged += prev; prev = op }
    }
    if (prev != null) merged += prev
    merged.result()
  }
}
