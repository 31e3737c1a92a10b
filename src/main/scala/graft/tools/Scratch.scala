package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe; not part of the engine.
  *
  * Round-8 question: l02's 100×-corpus growth is candidate-collision
  * bound (the (16 hashes, 8 bands, r=2) default has its LSH S-curve
  * knee at (1/8)^(1/2) ≈ 0.35 Jaccard, so the scaled corpus's ~0.7-
  * Jaccard cross-replica pairs all collide and must be verified even
  * though the 0.8 threshold then drops them). Does raising r — the
  * documented scale knob (TextDedup.minhashLshPairs scaladoc) — restore
  * near-linear cost on the same 100× corpus?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1x100")
    val docs = graft.Fixtures.table(spark, d, "documents")

    def probe(label: String, numHashes: Int, bands: Int): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.llm.TextDedup.minhashLshPairs(
          docs, "doc_id", "text",
          numHashes = numHashes, bands = bands, shingleK = 3, threshold = 0.8)
          .count()
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n pairs")
      }
    }
    // r=2 (the sf0.1 default): S-curve knee 0.35 — collision-dense here
    // (the 191 s BENCH number); measured once for the record
    probe("minhash b=8 r=2", 16, 8)
    // r=8: knee (1/8)^(1/8) = 0.77 — cross-replica 0.7-Jaccard pairs
    // stop colliding; recall at j=0.8 drops to 1-(1-0.8^8)^8 ≈ 77%
    // per the S-curve (near-1.0 dups, the bulk of real corpora, stay
    // ~100%) — the standard throughput/recall trade at crawl scale
    probe("minhash b=8 r=8", 64, 8)
  }
}
