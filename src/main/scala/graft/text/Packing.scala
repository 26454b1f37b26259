package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.GlobalRank

/** Sequence packing: lay the corpus out as fixed-length training
  * sequences (GPT-style "concatenate and chunk" packing). Every document
  * is placed at its global token offset in a deterministic corpus order;
  * context window `seq_id` holds global tokens
  * `[seq_id·L, (seq_id+1)·L)`; a document that crosses a window boundary
  * is split into per-window fragments. The fragment table is exactly what
  * a training loader materializes: which doc supplies which token range
  * of which sequence.
  *
  * Scale shape: the only hard part is the EXCLUSIVE global prefix sum of
  * token counts — a naive `sum(n) OVER (ORDER BY id)` moves the whole
  * table to one partition. [[GlobalRank.withRunningOffset]] does it as a
  * distributed range-sort + O(partitions) driver reduce + broadcast
  * offsets (the two-pass rank idiom), so packing is two lightweight jobs
  * over one shuffle. Fragment explosion is pure codegen'd
  * `sequence`/`greatest`/`least` arithmetic — no UDFs, no further
  * shuffles. Compose with `Sampling.withMixOrder` upstream when the
  * corpus order should be the reproducible training shuffle rather than
  * the id order.
  *
  * Token semantics match the family: `split(text, " ")` with trailing
  * empties kept (an empty text is one empty token — it still occupies a
  * slot, as it would after tokenization produces at least an EOS).
  */
object Packing {

  /** Fragment table: (id, seq_id, doc_off, seq_off, n_toks) — this doc
    * contributes its tokens `[doc_off, doc_off + n_toks)` to sequence
    * `seq_id` at in-sequence offset `seq_off`. Invariants (spec-pinned):
    * fragments of a doc partition its tokens; every sequence except the
    * last carries exactly `seqLen` tokens. */
  def fragments(df: DataFrame, id: String, text: String,
                seqLen: Long = 256L): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val toks = df.select(col(id), size(split(col(text), " ", -1)).cast("long").as("__n"))
    val placed = GlobalRank.withRunningOffset(toks, Seq(col(id)), "__n", "__start")
    // Window span of doc [start, start+n): floor(start/L) .. floor((start+n-1)/L).
    // n >= 1 always (split of "" is [""]), so the span is never empty.
    val L = lit(seqLen)
    val firstSeq = expr(s"__start DIV $seqLen")
    val lastSeq = expr(s"(__start + __n - 1) DIV $seqLen")
    val fragStart = greatest(col("__start"), col("seq_id") * L)
    val fragEnd = least(col("__start") + col("__n"), (col("seq_id") + 1) * L)
    placed
      .select(col(id), col("__n"), col("__start"),
        explode(sequence(firstSeq, lastSeq)).as("seq_id"))
      .select(col(id), col("seq_id"),
        (fragStart - col("__start")).as("doc_off"),
        (fragStart - col("seq_id") * L).as("seq_off"),
        (fragEnd - fragStart).as("n_toks"))
  }
}
