package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning data preparation: the post-pretraining example
  * builders — chat-turn rendering with loss-span bookkeeping, completion
  * loss masks threaded through fixed-length packing, and DPO/RLHF
  * preference-pair construction from scored candidate pools.
  *
  * Everything here is deterministic relational arithmetic over columns
  * (no iteration, no sampling), so every operator carries a full DuckDB
  * oracle. Scale shape: all three are single-shuffle plans — rendering
  * groups by conversation, masked packing reuses [[Curation]]'s carve
  * machinery (one hash-order prefix shuffle), and preference pairing is
  * one groupBy over the candidate pool.
  */
object Sft {

  /** Render a turns relation `(conv, idx, role, content)` into one
    * training string per conversation — `<|role|>content` segments in
    * turn order joined by `\n` — plus the character spans of the
    * ASSISTANT contents, the part a completion-only SFT loss trains on.
    *
    * Returns `(conv_id, n_turns, text, assistant_spans)` where
    * `assistant_spans` is `start:end` pairs (0-based, end-exclusive,
    * `;`-joined, turn order) such that `text.substring(start, end)` IS
    * the assistant turn's content (asserted in SftSpec). Span arithmetic
    * is pure integer prefix sums over segment lengths, so the output is
    * bit-identical cross-engine.
    *
    * Plan: one window cumsum + one groupBy, both keyed by `conv` —
    * conversations are the unit of parallelism; nothing corpus-global.
    */
  def renderChat(turns: DataFrame, convCol: String, idxCol: String,
                 roleCol: String, contentCol: String): DataFrame = {
    val seg = concat(lit("<|"), col("role"), lit("|>"), col("content"))
    val w = Window.partitionBy("conv").orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = turns.select(col(convCol).as("conv"), col(idxCol).as("idx"),
        col(roleCol).as("role"), col(contentCol).as("content"))
      .withColumn("seg_len", length(seg))
      // segment start = prior segment lengths + one '\n' per prior turn
      .withColumn("start",
        (coalesce(sum(col("seg_len")).over(w), lit(0L)) +
          count(lit(1)).over(w)).cast("long"))
    t.groupBy("conv")
      .agg(count(lit(1)).cast("int").as("n_turns"),
        array_sort(collect_list(struct(col("idx"), seg.as("seg"),
          col("role"), col("start"), col("seg_len"),
          length(col("role")).as("role_len")))).as("a"))
      .select(col("conv").as("conv_id"), col("n_turns"),
        concat_ws("\n", col("a.seg")).as("text"),
        concat_ws(";", filter(transform(col("a"), s =>
          when(s.getField("role") === "assistant",
            concat((s.getField("start") + s.getField("role_len") + 4)
              .cast("string"), lit(":"),
              (s.getField("start") + s.getField("seg_len")).cast("string")))),
          x => x.isNotNull)).as("assistant_spans"))
  }

  /** Fixed-length packing of an id-encoded corpus WITH a completion loss
    * mask: per document the first `promptLenCol` tokens are prompt
    * (mask 0) and the rest completion (mask 1); the mask rides each
    * token through [[Curation.packSequencesIds]]'s carve, so example
    * boundaries, doc_starts, and token order are IDENTICAL to the
    * unmasked packer over the same corpus (asserted in SftSpec — the
    * mask is metadata, never a repartitioning force).
    *
    * Returns `(example_id, n_tokens, ids, mask, n_loss_tokens,
    * doc_starts, n_docs_started)` with `ids`/`mask` position-aligned
    * `array<int>` and `n_loss_tokens = Σ mask` (the per-example count a
    * loss normalizer needs). Conservation: Σ n_loss_tokens over examples
    * = Σ max(0, n_tokens − prompt_len) over documents.
    */
  def maskedPack(docs: DataFrame, idCol: String, idsCol: String,
                 promptLenCol: String, seqLen: Int,
                 partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val zipped = docs
      .filter(size(col(idsCol)) > 0)
      .select(col(idCol),
        zip_with(col(idsCol), sequence(lit(0), size(col(idsCol)) - 1),
          (t, p) => struct(t.as("i"),
            when(p < col(promptLenCol), lit(0)).otherwise(lit(1)).as("m")))
          .as("__zm"))
    val pre = Curation.withHashOrderPrefix(zipped, idCol,
        size(col("__zm")), partitions)
      .withColumn("__starts", array(lit(0)))
    Curation.packIdsFromPrefix(pre, "__zm", seqLen)
      .select(col("example_id"), col("n_tokens"),
        transform(col("ids"), s => s.getField("i")).as("ids"),
        transform(col("ids"), s => s.getField("m")).as("mask"),
        aggregate(col("ids"), lit(0),
          (acc, s) => acc + s.getField("m")).as("n_loss_tokens"),
        col("doc_starts"), col("n_docs_started"))
  }

  /** DPO/RLHF preference-pair construction from a scored candidate pool:
    * per prompt, `chosen` = the highest-scoring candidate and `rejected`
    * = the lowest (both tie-broken to the smaller id, so the pair is
    * deterministic under reordering), kept only when the margin clears
    * `minMargin` — below it the pair teaches nothing — and the prompt
    * has ≥2 candidates.
    *
    * Returns `(prompt, n_cands, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin)`. Plan: ONE partial-aggregating groupBy
    * over the pool (max_by/min_by combine map-side); no window, no
    * self-join — at 100 TB the cost is a single shuffle of one row per
    * prompt per map task.
    */
  def preferencePairs(cands: DataFrame, promptCol: String, idCol: String,
                      scoreCol: String, minMargin: Double = 0.0): DataFrame =
    cands.select(col(promptCol).as("prompt"), col(idCol).as("id"),
        col(scoreCol).as("score"))
      .groupBy("prompt")
      .agg(count(lit(1)).cast("long").as("n_cands"),
        max_by(col("id"), struct(col("score"), -col("id"))).as("chosen_id"),
        max("score").as("chosen_score"),
        min_by(col("id"), struct(col("score"), col("id"))).as("rejected_id"),
        min("score").as("rejected_score"))
      .withColumn("margin",
        round(col("chosen_score") - col("rejected_score"), 6))
      .filter(col("n_cands") >= 2 && col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= minMargin)
}
