package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.GlobalRank

/** Token-budget corpus selection: "fill a B-token training budget with the
  * best-scoring documents". Docs are ranked by (score desc, id asc); a doc
  * is selected iff the running token total through it (inclusive) still
  * fits the budget — the greedy prefix rule every budgeted-corpus cut uses.
  *
  * Scale shape: the semantic spec is `sum(n_tokens) OVER (ORDER BY score
  * DESC, id)` — a single-partition window Spark would funnel the whole
  * corpus through. The implementation rides
  * [[GlobalRank.withRunningOffset]]: a range-partitioned distributed sort
  * on (score desc, id), an O(partitions) per-partition sum collect, a
  * broadcast of cumulative partition offsets, one stamping pass. Driver
  * state is O(partitions) regardless of corpus size.
  */
object Budget {

  /** @param score deterministic quality expression over the doc row
    *              (must be reproducible in the oracle — rounded ratios of
    *              exact counts, not floats of unknown provenance)
    * @return (id, score, n_tokens, cum_tokens, selected) — cum_tokens is
    *         the INCLUSIVE running sum in selection order */
  def tokenBudgetSelect(docs: DataFrame, id: String, text: String,
      score: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = docs.select(col(id), score.as("score"),
      size(split(col(text), " ")).cast("long").as("n_tokens"))
    GlobalRank.withRunningOffset(base,
        order = Seq(col("score").desc, col(id).asc),
        valueCol = "n_tokens", offsetCol = "__cum_before")
      .select(col(id), col("score"), col("n_tokens"),
        (col("__cum_before") + col("n_tokens")).as("cum_tokens"),
        (col("__cum_before") + col("n_tokens") <= budget).cast("int")
          .as("selected"))
  }
}
