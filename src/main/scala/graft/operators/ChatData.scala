package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-format validation for instruction-tuning corpora — the
  * schema gate an SFT/chat dataset passes before training: role
  * alternation, opening/closing-role conventions, turn counts. The
  * reference engine has no chat surface; this extends the engine the
  * same way the text-quality family does (a per-group relational
  * verdict over exploded turn rows).
  */
object ChatData {

  /** Per-conversation structural stats + the composite validity verdict
    * the standard chat template requires: starts with a user turn, ends
    * with an assistant turn, roles strictly alternate, and at least one
    * full (user, assistant) exchange exists. Unknown role strings are
    * counted (`n_other`) and fail validity — a typo'd role is corrupt
    * data, not a third speaker.
    *
    * Determinism: ties in `ordCol` would make "adjacent" ambiguous, so
    * a duplicated (conversation, ordinal) fails loudly rather than
    * letting hash order pick a winner — the urlDedup null-key
    * discipline applied to ordering keys.
    *
    * Scale: one shuffle — the lag window partitioned by conversation
    * (turn counts are template-bounded, tens of rows per partition key)
    * and the per-conversation rollup reuse the same partitioning, so
    * the plan carries ONE Exchange. No driver state.
    *
    * Output: (conv_id, n_turns, n_user, n_assistant, n_other,
    * starts_user, ends_assistant, alternates, total_chars, valid).
    */
  def conversationStats(
      turns: DataFrame, convCol: String, ordCol: String,
      roleCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("ord")
    val base = turns.select(
      col(convCol).cast("long").as("conv_id"),
      col(ordCol).cast("long").as("ord"),
      col(roleCol).cast("string").as("role"),
      length(col(textCol)).cast("long").as("n_chars"))
    base
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("prev_ord", lag(col("ord"), 1).over(w))
      .withColumn("ord",
        when(col("ord") === col("prev_ord"),
          raise_error(concat(lit("conversationStats: duplicate ordinal "),
            col("ord").cast("string"), lit(" in conversation "),
            col("conv_id").cast("string"))))
          .otherwise(col("ord")))
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L))
          .as("n_assistant"),
        sum(when(col("role").isin("user", "assistant"), 0L).otherwise(1L))
          .as("n_other"),
        // first/last by ordinal via the min/max-struct argmin idiom —
        // no second window pass
        min(struct(col("ord"), col("role"))).getField("role")
          .as("first_role"),
        max(struct(col("ord"), col("role"))).getField("role")
          .as("last_role"),
        (sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          === 0L).as("alternates"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("conv_id"), col("n_turns"), col("n_user"),
        col("n_assistant"), col("n_other"),
        (col("first_role") === "user").as("starts_user"),
        (col("last_role") === "assistant").as("ends_assistant"),
        col("alternates"), col("total_chars"))
      .withColumn("valid",
        col("starts_user") && col("ends_assistant") && col("alternates") &&
          col("n_other") === 0L && col("n_turns") >= 2L)
  }
}
