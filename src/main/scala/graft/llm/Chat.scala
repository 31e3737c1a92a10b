package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** Conversation (SFT / chat) data hygiene: structural statistics over
  * a JSON conversation column — the filters an instruction-tuning
  * pipeline applies before training (role alternation, turn counts,
  * user/assistant balance, terminal role). Operates on the standard
  * chat-transcript shape `[{"role": ..., "content": ...}, ...]`
  * (the OpenAI/ShareGPT interchange format that public SFT datasets
  * ship in).
  *
  * Scale shape: pure per-row work — one `from_json` parse plus
  * higher-order aggregates over the parsed array; no shuffle, no UDF,
  * embarrassingly parallel over 100 TB of transcripts. Malformed JSON
  * parses to null and is reported as `valid_json = false` rather than
  * failing the scan (PERMISSIVE semantics — corrupt rows are data,
  * not exceptions, at crawl scale).
  */
object Chat {

  val turnSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Per-conversation structural stats.
    *
    * Output: id, n_turns, n_user, n_assistant, user_chars,
    * assistant_chars, user_share (user_chars / total chars, 6 dp),
    * alternation_ok (roles strictly alternate user/assistant starting
    * with user), ends_assistant, valid_json.
    */
  def conversationStats(df: DataFrame, idCol: String, convCol: String): DataFrame = {
    // Parse ONCE per row (r15 opt, guide §1.2/§4): from_json is an
    // interpreted (CodegenFallback) expression and the higher-order
    // aggregates below reference the parsed array ~8 times — inlined
    // into one projection each reference RE-PARSES the JSON, and
    // subexpression elimination does not reach inside the lambda-bound
    // HOF trees. A two-step projection pins a single parse:
    // CollapseProject keeps it because the alias is non-cheap and
    // multiply referenced. Results are bit-identical (same expressions
    // over the same parsed value).
    val parsed = df.select(col(idCol),
      from_json(col(convCol), turnSchema).as("_turns"))
    val turns = col("_turns")
    def chars(role: String): Column =
      aggregate(
        filter(turns, t => t.getField("role") === role),
        lit(0L), (acc, t) => acc + length(t.getField("content")))
    def roleCount(role: String): Column =
      size(filter(turns, t => t.getField("role") === role)).cast("long")
    val userChars = chars("user")
    val assistantChars = chars("assistant")
    // strict alternation: turn i's role is "user" for even i,
    // "assistant" for odd i (0-based)
    val alternationOk = when(size(turns) <= 0, lit(false)).otherwise(forall(
      zip_with(turns, sequence(lit(0), size(turns) - 1), (t, i) =>
        t.getField("role") === when(i % 2 === 0, "user").otherwise("assistant")),
      x => x))
    parsed.select(
      col(idCol),
      coalesce(size(turns).cast("long"), lit(0L)).as("n_turns"),
      coalesce(roleCount("user"), lit(0L)).as("n_user"),
      coalesce(roleCount("assistant"), lit(0L)).as("n_assistant"),
      coalesce(userChars, lit(0L)).as("user_chars"),
      coalesce(assistantChars, lit(0L)).as("assistant_chars"),
      // invalid-JSON rows coalesce to the same defined default as
      // every other output (userChars is null there, and null would
      // silently drop the row from downstream share-threshold filters)
      coalesce(round(userChars.cast("double") /
        greatest(userChars + assistantChars, lit(1L)), 6),
        lit(0.0)).as("user_share"),
      coalesce(alternationOk, lit(false)).as("alternation_ok"),
      coalesce(
        // element_at(-1) raises on an empty array under ANSI mode —
        // guard on size so zero-turn rows report false, not an error
        when(size(turns) > 0,
          element_at(turns, -1).getField("role") === "assistant"),
        lit(false)).as("ends_assistant"),
      turns.isNotNull.as("valid_json"))
  }

  /** Turn-pair exact dedup across an SFT corpus: the (user prompt,
    * assistant response) ADJACENT pair is the training unit, and
    * public SFT mixes repeat the same pairs across conversations
    * (shared seed prompts, cross-posted datasets) — document-level
    * dedup misses them because surrounding turns differ. Per
    * conversation: `n_pairs` and `n_dup_pairs` (pairs whose
    * normalized (user, assistant) fingerprint also appears in ANOTHER
    * conversation or earlier in the same one — every occurrence after
    * the fingerprint's first is a dup).
    *
    * Scale shape: adjacent (turn, next-turn) pairs are extracted
    * IN-ROW from the parsed turns array (the array is already whole in
    * its row — a `lead` window would shuffle and sort the exploded
    * corpus by conversation id just to see the element the array
    * provides by index), pairs collapse to md5 fingerprints, ONE
    * census aggregation + a window inside (fp) groups decides
    * first-occurrence; the re-group per conversation is id-keyed.
    * No pairwise term.
    */
  def turnPairDedup(df: DataFrame, idCol: String, convCol: String): DataFrame = {
    val turns = from_json(col(convCol), turnSchema)
    // sequence() flips to a descending step when start > stop, so the
    // single-turn case must be guarded to an empty index list (the
    // repetitionSignals guard); pos is the 0-based index of the pair's
    // USER turn, matching the old posexplode numbering (element_at is
    // 1-based)
    val idxs = when(size(col("t")) >= 2, sequence(lit(0), size(col("t")) - 2))
      .otherwise(array().cast("array<int>"))
    val cands = filter(
      transform(idxs, i => struct(
        i.as("pos"),
        element_at(col("t"), i + 1).as("turn"),
        element_at(col("t"), i + 2).as("next"))),
      s => s.getField("turn").getField("role") === "user" &&
        s.getField("next").getField("role") === "assistant")
    val pairs = df.select(col(idCol).as("id"), turns.as("t"))
      .filter(col("t").isNotNull)
      .select(col("id"), explode(cands).as("pc"))
      .select(col("id"), col("pc.pos").as("pos"),
        md5(concat_ws("",
          regexp_replace(lower(trim(col("pc.turn.content"))), "\\s+", " "),
          regexp_replace(lower(trim(col("pc.next.content"))), "\\s+", " ")))
          .as("fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy(col("id"), col("pos"))
    pairs.withColumn("dup", row_number().over(w) > 1)
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_pairs"))
  }

  /** Template-phrase scan over ASSISTANT turns — the response-side
    * hygiene gate of an SFT pipeline: canned-phrase responses
    * ("as an AI language model", refusal boilerplate) teach the model
    * to parrot them, so mixes cap their rate. Counts per
    * conversation: assistant turns, turns containing any template
    * phrase (case-insensitive substring), and the flag. Phrases are
    * matched as literal substrings (no regex semantics).
    */
  def responseTemplateScan(df: DataFrame, idCol: String, convCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "at least one phrase required")
    // parse once + filter the assistant turns once (the
    // [[conversationStats]] r15 single-parse shape: both aliases are
    // non-cheap and multiply referenced, so CollapseProject keeps the
    // staged projections and each row pays ONE from_json + ONE filter)
    val assistant = df.select(col(idCol),
      filter(from_json(col(convCol), turnSchema),
        t => t.getField("role") === "assistant").as("_assistant"))
    val hit: Column => Column = c =>
      phrases.map(p => lower(c).contains(p.toLowerCase)).reduce(_ || _)
    assistant.select(col(idCol),
      coalesce(size(col("_assistant")), lit(0)).cast("long")
        .as("n_assistant_turns"),
      coalesce(size(filter(col("_assistant"),
        t => hit(t.getField("content")))),
        lit(0)).cast("long").as("n_template_turns"))
      .withColumn("flagged", col("n_template_turns") > 0)
  }
}
