package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) record parsing — the container format web crawls
  * (Common Crawl et al.) actually arrive in, so it is the true FIRST
  * step of a web-scale ingest pipeline, ahead of the HTML→text /
  * cleaning chain ([[Corpus.htmlToText]], l51). A WARC file is a
  * concatenation of records: a `WARC/1.0` version line, CRLF-separated
  * `Name: value` headers (Content-Length is mandatory), a blank line,
  * `Content-Length` payload bytes, and a CRLF CRLF record terminator.
  *
  * The walk is hardened to the same liveness rules as the RIFF/
  * ISO-BMFF walks in [[Multimodal]]: Content-Length is an UNTRUSTED
  * value (negative / non-numeric / larger than the remaining payload →
  * stop cleanly with the records parsed so far; never a hang, never an
  * exception escaping a task), header scanning is bounded, and a
  * missing terminator ends the walk rather than derailing it.
  *
  * Scale shape: pure per-row scan work inside `mapPartitions` (binary
  * container parsing has no expression form), no shuffle; at 100 TB
  * one would map this over whole WARC.gz file payloads read as
  * binaryFile rows — embarrassingly parallel, cost linear in bytes.
  */
object Warc {

  /** Serialize (headers, payload) pairs as a WARC/1.0 byte stream —
    * fixture synthesis for specs/registry (Content-Length appended
    * automatically).
    */
  def warcBytes(records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (headers, payload) =>
      val head = new StringBuilder("WARC/1.0\r\n")
      headers.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
      head.append(s"Content-Length: ${payload.length}\r\n\r\n")
      out.write(head.toString.getBytes("US-ASCII"))
      out.write(payload)
      out.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    out.toByteArray
  }

  /** Deterministic per-id WARC fixture: `id%3+1` response records with
    * planted URIs (`http://w{id}.example/p{r}`) and HTML-ish bodies,
    * preceded by one request record (which downstream extraction
    * filters out by type).
    */
  def attachWarcPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = df.schema.add(StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val recs = Seq(
          (Seq("WARC-Type" -> "request",
            "WARC-Target-URI" -> s"http://w$id.example/p0"),
            s"GET /p0 HTTP/1.1".getBytes("US-ASCII"))) ++
          (0 until (id % 3 + 1).toInt).map { k =>
            (Seq("WARC-Type" -> "response",
              "WARC-Target-URI" -> s"http://w$id.example/p$k",
              "WARC-Record-ID" -> s"<urn:graft:$id-$k>"),
              s"<html><body>doc $id page $k</body></html>".getBytes("US-ASCII"))
          }
        Row.fromSeq(r.toSeq :+ warcBytes(recs))
      }
    }(encoder)
  }

  /** Parse a WARC byte stream into records: (rec_idx, warc_type,
    * target_uri, content_length, body) — body decoded as UTF-8 text
    * (web-archive payloads are HTTP text in this pipeline's scope).
    * Malformed input yields the records parsed before the damage.
    */
  private[llm] def parseRecords(bytes: Array[Byte])
      : Seq[(Long, String, String, Long, String)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, String)]
    if (bytes == null) return out.toSeq
    var pos = 0L
    val n = bytes.length.toLong
    var idx = 0L
    def lineAt(p: Long): Option[(String, Long)] = {
      // bounded scan for CRLF; headers never legitimately exceed 8 KiB
      var i = p
      val limit = math.min(p + 8192, n - 1)
      while (i <= limit) {
        if (bytes(i.toInt) == '\r' && i + 1 < n && bytes(i.toInt + 1) == '\n')
          return Some((new String(bytes, p.toInt, (i - p).toInt, "UTF-8"), i + 2))
        i += 1
      }
      None
    }
    while (pos < n) {
      lineAt(pos) match {
        case Some((version, afterVersion)) if version.startsWith("WARC/") =>
          var p = afterVersion
          var warcType = ""
          var uri = ""
          var contentLength = -1L
          var ok = true
          var done = false
          while (ok && !done) {
            lineAt(p) match {
              case Some(("", next)) => p = next; done = true
              case Some((line, next)) =>
                val colon = line.indexOf(':')
                if (colon > 0) {
                  val k = line.substring(0, colon).trim
                  val v = line.substring(colon + 1).trim
                  k.toLowerCase(java.util.Locale.ROOT) match {
                    case "warc-type" => warcType = v
                    case "warc-target-uri" => uri = v
                    case "content-length" =>
                      contentLength = try v.toLong catch { case _: Exception => -1L }
                    case _ => ()
                  }
                }
                p = next
              case None => ok = false
            }
          }
          // untrusted length: negative or overrunning the buffer ends the walk
          if (!ok || contentLength < 0 || p + contentLength > n) return out.toSeq
          val body = new String(bytes, p.toInt, contentLength.toInt, "UTF-8")
          out += ((idx, warcType, uri, contentLength, body))
          idx += 1
          pos = p + contentLength + 4 // skip CRLF CRLF terminator
        case _ => return out.toSeq
      }
    }
    out.toSeq
  }

  /** Explode each payload's WARC records into rows. Null payloads and
    * junk bytes contribute zero rows (a crawl shard with a corrupt
    * member loses that member, not the task).
    */
  def warcRecords(df: DataFrame, payloadCol: String): DataFrame = {
    val base = StructType(df.schema.filterNot(_.name == payloadCol))
    val schema = base
      .add(StructField("rec_idx", LongType))
      .add(StructField("warc_type", StringType))
      .add(StructField("target_uri", StringType))
      .add(StructField("content_length", LongType))
      .add(StructField("body", StringType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == payloadCol).map(_._2)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val kept = keepIdx.map(r.get).toSeq
        parseRecords(r.getAs[Array[Byte]](payloadIdx)).map {
          case (i, t, u, cl, b) => Row.fromSeq(kept ++ Seq(i, t, u, cl, b))
        }
      }
    }(encoder)
  }
}
