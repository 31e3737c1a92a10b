package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.Fixtures
import graft.core.{Catalog, State, StreamCursor, TableHandle}
import graft.graph.{GraphManifest, GraphRunner}

/** SURVEY.md §2.1/§2.2/§2.4 engine operators surfaced as driver-checkable
  * queries: each runs the REAL engine code path (catalog + Table facade
  * + stream cursor + graph runner) in a throwaway warehouse and returns
  * the resulting DataFrame, with a plain-SQL DuckDB oracle describing
  * the expected relational outcome.
  */
object EngineQueries {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  val all: Seq[QuerySpec] = Seq(

    // S5 — upsert as key-merged MERGE: base = orders not divisible by 3,
    // incoming = doubled prices for even keys; engine result must equal
    // the relational full-outer/coalesce formulation.
    QuerySpec.df("s05_upsert",
      """with base as (
        |  select o_orderkey, o_totalprice, o_orderstatus
        |  from orders where o_orderkey % 3 <> 0
        |), inc as (
        |  select o_orderkey,
        |    cast(round(cast(o_totalprice as decimal(12,2)) * 2, 2) as double) as o_totalprice
        |  from orders where o_orderkey % 2 = 0
        |)
        |select coalesce(i.o_orderkey, b.o_orderkey) as o_orderkey,
        |  cast(round(cast(coalesce(i.o_totalprice, b.o_totalprice) as decimal(12,2)), 2) as double) as o_totalprice,
        |  b.o_orderstatus as o_orderstatus
        |from base b full outer join inc i on b.o_orderkey = i.o_orderkey""".stripMargin) {
      (s, d) =>
        val orders = Fixtures.table(s, d, "orders")
        val h = new TableHandle(s, new Catalog(tmp("graft-upsert")), "t")
          .init(uniqueOn = Seq("o_orderkey"))
        h.append(orders.filter(col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))
        h.flush()
        h.upsert(orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"),
            round(col("o_totalprice").cast("decimal(12,2)") * 2, 2)
              .cast("double").as("o_totalprice")))
        h.flush()
        h.read.select(col("o_orderkey"),
          round(col("o_totalprice").cast("decimal(12,2)"), 2)
            .cast("double").as("o_totalprice"),
          col("o_orderstatus"))
    },

    // T1/T6 — stream cursor with exclusive seek: the engine's
    // incremental slice must equal the plain strictly-greater filter.
    QuerySpec.df("t01_stream_seek",
      """select event_id, user_id, event_type from events
        |where event_id > (select max(event_id) // 2 from events)""".stripMargin) {
      (s, d) =>
        val root = tmp("graft-stream")
        val h = new TableHandle(s, new Catalog(root), "ev")
          .init(strictlyMonotonicOrdering = Some("event_id"))
        h.append(Fixtures.table(s, d, "events")
          .select("event_id", "user_id", "event_type"))
        h.flush()
        val cursor = StreamCursor.forTable(h, new State(root, "qnode"))
        val mid = Fixtures.headLongOrZero(Fixtures.table(s, d, "events")
          .agg(max("event_id"))) / 2
        cursor.seek(mid)
        cursor.df().select("event_id", "user_id", "event_type")
    },

    // G1/U3 — the §7.2 graph slice through the real GraphRunner:
    // SQL node with {{ table }} / {{ param }} templating writing a
    // versioned output store.
    QuerySpec.df("g01_graph_slice",
      """select l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity as bigint)) as bigint) as qty,
        |  cast(round(sum(cast(l_extendedprice as decimal(12,2))
        |       * (1 - cast(l_discount as decimal(4,2)))), 2) as double) as rev,
        |  count(*) as cnt
        |from lineitem where l_quantity <= 45
        |group by l_returnflag, l_linestatus""".stripMargin) {
      (s, d) =>
        val dir = tmp("graft-graph")
        Files.writeString(Paths.get(dir, "agg.sql"),
          """select l_returnflag, l_linestatus,
            |  cast(sum(cast(l_quantity as bigint)) as bigint) as qty,
            |  cast(round(sum(cast(l_extendedprice as decimal(12,2))
            |       * (1 - cast(l_discount as decimal(4,2)))), 2) as double) as rev,
            |  count(*) as cnt
            |from {{ lineitem }} where l_quantity <= {{ max_qty }}
            |group by l_returnflag, l_linestatus""".stripMargin)
        Files.writeString(Paths.get(dir, "graph.yml"),
          """title: slice
            |functions:
            |  - node_file: agg.sql
            |    id: aggnode01
            |    inputs: {lineitem: lineitem_raw}
            |    outputs: {out: lineitem_agg}
            |    parameters: {max_qty: 45}
            |stores:
            |  - table: lineitem_raw
            |  - table: lineitem_agg
            |""".stripMargin)
        val runner = new GraphRunner(s, GraphManifest.load(dir), tmp("graft-wh"))
        val seed = runner.tableHandle("lineitem_raw")
        seed.append(Fixtures.table(s, d, "lineitem"))
        seed.flush()
        runner.run()
        runner.tableHandle("lineitem_agg").read
    },

    // S9 — auto-fields: strictly monotonic base32 id + created
    // timestamp. The id VALUES are engine-assigned (nondeterministic
    // across layouts) so they can't hash-match an oracle — but their
    // CONTRACT is a set of theorems checkable in-query (the q12
    // promotion pattern): uniqueness, the 26-char base32hex shape,
    // strict cross-flush monotonicity (every second-flush id sorts
    // after every first-flush id — batchSeq strictly increases), and
    // created_at presence. The oracle asserts each verdict is `true`;
    // any id-generator regression flips a boolean and fails the hash.
    QuerySpec.df("s09_monotonic_id",
      """select doc_id, true as mid_unique, true as mid_shape_ok,
        |  true as batch_order_ok, true as created_ok
        |from documents""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = new TableHandle(s, new Catalog(tmp("graft-mono")), "t")
        .init(addMonotonicId = Some("mid"), addCreated = Some("created_at"))
      val docs = Fixtures.table(s, d, "documents").select("doc_id", "text")
      // two flushes: the second batch's ids must ALL sort after the
      // first's (strict monotonicity across executions, S9 contract)
      h.append(docs.filter(col("doc_id") % 2 === 0)); h.flush()
      h.append(docs.filter(col("doc_id") % 2 =!= 0)); h.flush()
      val t = h.read
      val b0max = t.filter(col("doc_id") % 2 === 0)
        .agg(max(col("mid")).as("_b0max"))
      t.crossJoin(broadcast(b0max))
        .withColumn("mid_unique",
          count(lit(1)).over(Window.partitionBy("mid")) === 1)
        .withColumn("mid_shape_ok",
          length(col("mid")) === 26 && col("mid").rlike("^[0-9a-v]{26}$"))
        .withColumn("batch_order_ok",
          (col("doc_id") % 2 === 0) || col("mid") > col("_b0max"))
        .withColumn("created_ok", col("created_at").isNotNull)
        .select("doc_id", "mid_unique", "mid_shape_ok", "batch_order_ok",
          "created_ok")
    },
  )
}
