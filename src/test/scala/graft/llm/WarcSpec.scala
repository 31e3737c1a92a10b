package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC record walk: round-trip, type filtering, and corrupt-shard
  * liveness (l85).
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  test("warc round-trip: every planted record comes back with type, uri, body") {
    val docs = Seq(0L, 1L, 2L, 5L).toDF("doc_id")
    val out = Warc.warcRecords(
        Warc.attachWarcPayload(docs, "doc_id"), "payload")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getString(5)))
    // per doc: 1 request + id%3+1 responses, in record order
    docs.collect().map(_.getLong(0)).foreach { id =>
      val recs = out.filter(_._1 == id).sortBy(_._2)
      val expected = 1 + (id % 3 + 1).toInt
      assert(recs.length == expected, s"doc $id: ${recs.length} records")
      assert(recs.head._3 == "request")
      recs.tail.zipWithIndex.foreach { case ((_, _, t, uri, body), k) =>
        assert(t == "response")
        assert(uri == s"http://w$id.example/p$k")
        assert(body.contains(s"doc $id page $k"))
      }
    }
  }

  test("content-length is honored exactly (bodies with CRLFs inside survive)") {
    val tricky = "line1\r\n\r\nWARC/1.0 fake\r\nline2".getBytes("UTF-8")
    val bytes = Warc.warcBytes(Seq(
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "http://a"), tricky),
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "http://b"),
        "after".getBytes("UTF-8"))))
    val recs = Warc.parseRecords(bytes)
    assert(recs.length == 2)
    assert(recs(0)._5 == new String(tricky, "UTF-8"),
      "payload containing CRLF + a fake version line must not split the record")
    assert(recs(1)._3 == "http://b" && recs(1)._5 == "after")
  }

  test("corrupt shards: junk, truncation, negative/overrunning lengths — parsed prefix, no hang") {
    // pure junk -> zero records
    assert(Warc.parseRecords("not a warc at all".getBytes("UTF-8")).isEmpty)
    assert(Warc.parseRecords(null).isEmpty)
    // valid record followed by a record whose declared length overruns
    val good = Warc.warcBytes(Seq(
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "http://ok"),
        "fine".getBytes("UTF-8"))))
    val overrun = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999\r\n\r\nshort").getBytes("UTF-8")
    val recs = Warc.parseRecords(good ++ overrun)
    assert(recs.length == 1 && recs.head._5 == "fine")
    // negative length -> stop at the damage
    val neg = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: -5\r\n\r\n").getBytes("UTF-8")
    assert(Warc.parseRecords(good ++ neg).length == 1)
    // truncated mid-header -> parsed prefix only
    assert(Warc.parseRecords(good ++ "WARC/1.0\r\nWARC-Ty".getBytes("UTF-8"))
      .length == 1)
  }

  test("warc -> htmlToText chain extracts clean text from response bodies") {
    val docs = Seq(3L).toDF("doc_id")
    val text = Warc.warcRecords(Warc.attachWarcPayload(docs, "doc_id"), "payload")
      .filter(col("warc_type") === "response")
      .select(Corpus.htmlToText(col("body")).as("t"))
      .collect().map(_.getString(0))
    assert(text.nonEmpty)
    text.foreach(t => assert(!t.contains("<") && t.contains("doc 3 page")))
  }
}
