package graft.queries

import org.apache.spark.sql.functions._
import graft.Fixtures

/** SURVEY.md §2.3 rows Q28–Q34: arrays/higher-order functions, explode,
  * maps, JSON, hashing, pivot, sampling.
  */
object SemiStructured {

  val all: Seq[QuerySpec] = Seq(

    // Q28 — array + higher-order functions over embedding: array<float>.
    // Elements are cast to double *before* arithmetic and folded
    // sequentially in both engines → bit-identical sums.
    QuerySpec.sql("q28_arrays",
      """select vec_id,
        |  size(embedding) as dim,
        |  round(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),
        |                  cast(0 as double), (a, x) -> a + x), 4) as norm2,
        |  round(cast(try_element_at(embedding, 1) as double), 4) as e0,
        |  round(cast(try_element_at(embedding, 64) as double), 4) as e63,
        |  round(cast(array_max(embedding) as double), 4) as mx,
        |  round(cast(array_min(embedding) as double), 4) as mn,
        |  size(filter(embedding, x -> x > 0)) as n_pos,
        |  size(array_distinct(embedding)) as n_uniq,
        |  case when array_contains(embedding, cast(0 as float)) then 1 else 0 end as has_zero,
        |  round(cast(sort_array(embedding)[0] as double), 4) as sorted0
        |from embeddings""".stripMargin,
      """select vec_id,
        |  len(embedding) as dim,
        |  round(list_sum(list_transform(embedding, x -> cast(x as double) * cast(x as double))), 4) as norm2,
        |  round(cast(embedding[1] as double), 4) as e0,
        |  round(cast(embedding[64] as double), 4) as e63,
        |  round(cast(list_max(embedding) as double), 4) as mx,
        |  round(cast(list_min(embedding) as double), 4) as mn,
        |  len(list_filter(embedding, x -> x > 0)) as n_pos,
        |  len(list_distinct(embedding)) as n_uniq,
        |  case when list_contains(embedding, cast(0 as float)) then 1 else 0 end as has_zero,
        |  round(cast(list_sort(embedding)[1] as double), 4) as sorted0
        |from embeddings""".stripMargin),

    // Q28b — array constructors: sequence/slice + higher-order fold
    QuerySpec.sql("q28b_array_ctors",
      """select p_partkey,
        |  size(sequence(1, p_size % 10 + 1)) as seq_len,
        |  cast(aggregate(sequence(1, p_size % 10 + 1), cast(0 as bigint),
        |                 (a, x) -> a + x) as bigint) as tri,
        |  cast(element_at(slice(sequence(1, 20), 3, 4), 1) as bigint) as sliced0,
        |  cast(array_position(sequence(0, 18, 2), 8) as bigint) as pos8
        |from part""".stripMargin,
      """select p_partkey,
        |  len(range(1, p_size % 10 + 2)) as seq_len,
        |  cast(list_sum(range(1, p_size % 10 + 2)) as bigint) as tri,
        |  cast(range(1, 21)[3:6][1] as bigint) as sliced0,
        |  cast(list_position(range(0, 19, 2), 8) as bigint) as pos8
        |from part""".stripMargin),

    // Q29 — explode / UDTF shape: word histogram over documents
    QuerySpec.df("q29_explode",
      """select word, count(*) as cnt, count(distinct doc_id) as n_docs
        |from (select doc_id, unnest(string_split(text, ' ')) as word from documents) t
        |group by word""".stripMargin) {
      (s, d) =>
        Fixtures.table(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
    },

    // Q30 — map functions: parse props JSON into a map, explode entries
    QuerySpec.df("q30_maps",
      """select k as key, cast(json_extract(props, '$.' || k) as bigint) as val,
        |       count(*) as cnt
        |from (select props, unnest(json_keys(props)) as k from events) t
        |group by 1, 2""".stripMargin) {
      (s, d) =>
        Fixtures.table(s, d, "events")
          .select(explode(from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))))
          .groupBy(col("key"), col("value").as("val"))
          .agg(count(lit(1)).as("cnt"))
          .select("key", "val", "cnt")
    },

    // Q31 — JSON extraction + aggregation per event_type
    QuerySpec.sql("q31_json",
      """select event_type,
        |  cast(sum(cast(get_json_object(props, '$.k') as bigint)) as bigint) as sum_k,
        |  max(cast(get_json_object(props, '$.k') as bigint)) as max_k,
        |  count(*) as cnt
        |from events group by event_type""".stripMargin,
      """select event_type,
        |  cast(sum(cast(json_extract(props, '$.k') as bigint)) as bigint) as sum_k,
        |  max(cast(json_extract(props, '$.k') as bigint)) as max_k,
        |  count(*) as cnt
        |from events group by event_type""".stripMargin),

    // Q32 — cryptographic hashes (row fingerprints)
    QuerySpec.sql("q32_hash",
      """select doc_id, md5(text) as h_md5, sha2(text, 256) as h_sha
        |from documents where doc_id % 5 = 0""".stripMargin,
      """select doc_id, md5(text) as h_md5, sha256(text) as h_sha
        |from documents where doc_id % 5 = 0""".stripMargin),

    // Q32b — Spark-native hashes. PROMOTED (r14, the l38 planted-
    // constant pattern): xxhash64/crc32 have no DuckDB implementation,
    // but their values over FIXED strings are constants — the entry
    // hashes the three CompressPlants texts (doc_id % 3 classes) and
    // the oracle pins the six values as hard-coded literals measured
    // at authoring time. Any drift in the kernels (a Spark upgrade
    // changing xxhash64 seeds/semantics, a crc polynomial regression)
    // moves the output away from the pinned literals and fails the
    // hash compare — exactly the portability tripwire a fingerprint
    // family needs (every LSH band key rides xxhash64).
    QuerySpec.df("q32b_xxhash",
      s"""select doc_id,
         |  cast(case when doc_id % 3 = 0 then ${CompressPlants.xxRepetitive}
         |       when doc_id % 3 = 1 then ${CompressPlants.xxProse}
         |       else ${CompressPlants.xxNoise} end as bigint) as h_xx,
         |  cast(case when doc_id % 3 = 0 then ${CompressPlants.crcRepetitive}
         |       when doc_id % 3 = 1 then ${CompressPlants.crcProse}
         |       else ${CompressPlants.crcNoise} end as bigint) as h_crc
         |from documents""".stripMargin) { (s, d) =>
      val planted = Fixtures.table(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(CompressPlants.repetitive))
          .when(col("doc_id") % 3 === 1, lit(CompressPlants.prose))
          .otherwise(lit(CompressPlants.noise)).as("text"))
      planted.select(col("doc_id"), xxhash64(col("text")).as("h_xx"),
        crc32(col("text")).as("h_crc"))
    },

    // Q33 — pivot: revenue by nation × order status
    QuerySpec.df("q33_pivot",
      """select n_name,
        |  cast(coalesce(round(sum(case when o_orderstatus = 'F' then cast(o_totalprice as decimal(12,2)) end), 2), 0) as double) as rev_f,
        |  cast(coalesce(round(sum(case when o_orderstatus = 'O' then cast(o_totalprice as decimal(12,2)) end), 2), 0) as double) as rev_o,
        |  cast(coalesce(round(sum(case when o_orderstatus = 'P' then cast(o_totalprice as decimal(12,2)) end), 2), 0) as double) as rev_p
        |from orders
        |  join customer on o_custkey = c_custkey
        |  join nation on c_nationkey = n_nationkey
        |group by n_name""".stripMargin) {
      (s, d) =>
        Fixtures.table(s, d, "orders")
          .join(broadcast(Fixtures.table(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Fixtures.table(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(round(sum(col("o_totalprice").cast("decimal(12,2)")), 2).cast("double"))
          .select(col("n_name"),
            coalesce(col("F"), lit(0.0)).as("rev_f"),
            coalesce(col("O"), lit(0.0)).as("rev_o"),
            coalesce(col("P"), lit(0.0)).as("rev_p"))
    },

    // Q33b — unpivot (wide → long), oracle via the portable UNION ALL form
    QuerySpec.df("q33b_unpivot",
      """select l_orderkey, l_linenumber, 'price' as metric, l_extendedprice as v
        |from lineitem where l_orderkey % 200 = 0
        |union all
        |select l_orderkey, l_linenumber, 'disc', l_discount
        |from lineitem where l_orderkey % 200 = 0
        |union all
        |select l_orderkey, l_linenumber, 'tax', l_tax
        |from lineitem where l_orderkey % 200 = 0""".stripMargin) {
      (s, d) =>
        Fixtures.table(s, d, "lineitem")
          .filter(col("l_orderkey") % 200 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice").as("price"),
            col("l_discount").as("disc"), col("l_tax").as("tax"))
          .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("price"), col("disc"), col("tax")), "metric", "v")
    },

    // Q34 — sampling: hash-based seeded Bernoulli sample. A
    // multiplicative hash over the row key replaces engine-RNG
    // TABLESAMPLE so the SAME rows are selected by any engine, any
    // retry, any partitioning — which is also the reproducibility
    // property a 100 TB pipeline needs from its sampler (RNG sampling
    // changes membership whenever a task re-runs). ~5% rate: the odd
    // multiplier permutes Z_2^20, so `< 52429` of 1048576 keeps 5.0%.
    // Intermediate products stay < 2^52 — no int64 overflow in either
    // engine's checked arithmetic.
    QuerySpec.shared("q34_sample",
      """select l_orderkey, l_linenumber, l_quantity
        |from lineitem
        |where ((((l_orderkey * 9973 + l_linenumber) % 1000003) * 2654435761) % 1048576) < 52429
        |""".stripMargin),
  )
}
