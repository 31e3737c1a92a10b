package graft.queries

/** Planted-constant fixtures for the l38 DEFLATE-ratio oracle.
  *
  * The TEXTS are pure constants (deterministic construction, no
  * runtime input). The RATIOS are hard-coded literals measured from
  * `graft.functions.TextCompressOps.deflateRatio` at authoring time —
  * deliberately NOT computed by calling the kernel here, which would
  * be circular (a kernel regression would shift the oracle constant
  * in lockstep and hide itself). With literals, a regression moves
  * the Spark output away from the pinned oracle value and fails the
  * driver's hash compare.
  *
  * Stability: ratio = raw-DEFLATE(BEST_SPEED) size / UTF-8 size, a
  * pure function of (string, zlib build). The driver's Spark runs use
  * this container's JVM, the same one that measured the literals;
  * TextCompressOps' scaladoc covers the coarse-threshold robustness
  * argument for zlib drift in general deployments.
  */
object CompressPlants {

  /** Class 0 (doc_id % 3 == 0): templated repetition — the boilerplate
    * failure mode; DEFLATE collapses the repeats.
    */
  val repetitive: String =
    "the same boilerplate line repeats here again and again " * 8

  /** Class 1 (doc_id % 3 == 1): natural prose — mid-range ratio, the
    * band the keep-gate (0.3, 0.95) accepts.
    */
  val prose: String =
    "Large training corpora mix natural prose with templated spam and " +
      "encoded junk; a cheap compression probe separates all three " +
      "without any model, vocabulary, or language assumption, because " +
      "redundancy is exactly what DEFLATE measures."

  /** Class 2 (doc_id % 3 == 2): LCG noise over the 94 printable ASCII
    * chars, short enough that DEFLATE's framing overhead pushes the
    * ratio past 1.0 — the encoded-junk failure mode the (0.3, 0.95)
    * gate rejects from above. (A 36-char alphabet at length 300
    * measured 0.72 — dynamic Huffman compresses low-entropy alphabets
    * below the gate, which would put the junk class in the keep band.)
    */
  val noise: String = {
    val sb = new StringBuilder
    var x = 0x243F6A8885A308D3L // pi bits: fixed, arbitrary seed
    var i = 0
    while (i < 100) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append((33 + ((x >>> 33) % 94)).toChar)
      i += 1
    }
    sb.toString
  }

  // Hard-coded kernel measurements (6dp, matching compressionSignals'
  // in-query rounding). Re-measure ONLY when the planted texts change:
  //   TextCompressOps.deflateRatio(UTF8String.fromString(text))
  val repetitiveRatio: Double = 0.131818 // 58 / 440 bytes
  val proseRatio: Double = 0.724138      // 168 / 232 bytes
  val noiseRatio: Double = 1.02          // 102 / 100 bytes (expands)

  // q32b's pinned engine-hash literals over the same three texts
  // (xxhash64 seed-42 / CRC-32), measured at authoring time — the
  // same non-circular rule as the ratios: any kernel or Spark-upgrade
  // drift moves the query output away from these and fails the hash.
  val xxRepetitive: Long = -3955790421481226900L
  val xxProse: Long = 7501523814037462427L
  val xxNoise: Long = 7163085181753288022L
  val crcRepetitive: Long = 2743273425L
  val crcProse: Long = 792811505L
  val crcNoise: Long = 3754459632L

  /** l83/l84's pinned CDC chunk tables of the three texts (gear-hash,
    * minLen 16 / maxLen 256 / 6 mask bits — the operator defaults),
    * measured at authoring time: (class, chunk_idx, offset, len, fp).
    * Same non-circular rule as above — a rolling-hash, boundary, or
    * FNV fingerprint regression moves the query output away from
    * these. The repetitive class carries REAL chunk-level dedup
    * (its period-55 text collapses to 4 distinct fingerprints), so
    * l84's dedup arithmetic is exercised, not degenerate.
    */
  val cdcChunks: Seq[(Int, Long, Int, Int, Long)] = Seq(
    (0, 0L, 0, 19, 6464197775544430538L),
    (0, 1L, 19, 20, -8846591452302860388L),
    (0, 2L, 39, 35, 7697631605868071499L),
    (0, 3L, 74, 20, -8846591452302860388L),
    (0, 4L, 94, 35, 7697631605868071499L),
    (0, 5L, 129, 20, -8846591452302860388L),
    (0, 6L, 149, 35, 7697631605868071499L),
    (0, 7L, 184, 20, -8846591452302860388L),
    (0, 8L, 204, 35, 7697631605868071499L),
    (0, 9L, 239, 20, -8846591452302860388L),
    (0, 10L, 259, 35, 7697631605868071499L),
    (0, 11L, 294, 20, -8846591452302860388L),
    (0, 12L, 314, 35, 7697631605868071499L),
    (0, 13L, 349, 20, -8846591452302860388L),
    (0, 14L, 369, 35, 7697631605868071499L),
    (0, 15L, 404, 20, -8846591452302860388L),
    (0, 16L, 424, 16, -7102803925981135714L),
    (1, 0L, 0, 34, 7005529557322922073L),
    (1, 1L, 34, 78, 5833496356269670543L),
    (1, 2L, 112, 20, -4128162769121437938L),
    (1, 3L, 132, 22, 1390644380232124110L),
    (1, 4L, 154, 25, -4414364570112663585L),
    (1, 5L, 179, 53, 2077679571038063556L),
    (2, 0L, 0, 49, 4204217270126407608L),
    (2, 1L, 49, 51, -5888816533924584996L))

  /** The literals as a DuckDB VALUES list for the l83 oracle. */
  def cdcChunksValuesSql: String = cdcChunks
    .map { case (c, i, o, l, f) => s"($c, $i, $o, $l, $f)" }
    .mkString(", ")

  // l84's derived per-class/per-corpus constants — pure arithmetic
  // over the pinned literals (single source of truth)
  def cdcClassChunks(cls: Int): Int = cdcChunks.count(_._1 == cls)
  def cdcClassBytes(cls: Int): Int =
    cdcChunks.filter(_._1 == cls).map(_._4).sum
  def cdcDistinctChunks: Int = cdcChunks.map(_._5).distinct.size
  def cdcUniqueBytes: Int = cdcChunks.groupBy(_._5)
    .map { case (_, rows) => rows.map(_._4).min }.sum
}
