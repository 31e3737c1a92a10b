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
    val turns = from_json(col(convCol), turnSchema)
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
    df.select(
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
}
