package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Token-budget selection: exact greedy-prefix model parity, boundary
  * semantics (a doc that would overflow the budget is excluded even if a
  * later smaller doc would fit — greedy prefix, not knapsack), tie order,
  * and partitioning independence. */
class BudgetSpec extends SparkSpecBase {

  import spark.implicits._

  // (id, text) with token counts 4, 2, 3, 2, 5 and scores via length rank
  private val corpus = Seq(
    (1L, "a b c d"),      // 4 tokens
    (2L, "e f"),          // 2
    (3L, "g h i"),        // 3
    (4L, "j k"),          // 2
    (5L, "l m n o p"))    // 5

  test("greedy prefix matches the driver model; overflow doc excluded") {
    // score = n_tokens (longest first): order 5(5), 1(4), 3(3), 2(2), 4(2)
    // budget 10: cum 5, 9, 12>10 stop — but greedy prefix also excludes
    // everything AFTER the first overflow (cum keeps growing): selected
    // = {5, 1} only, even though doc 2 (2 tokens) would "fit" 9+2=11>10.
    val got = Budget.tokenBudgetSelect(corpus.toDF("doc_id", "text"),
        "doc_id", "text",
        score = size(split(col("text"), " ")).cast("double"), budget = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(_._1)
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(5L) === ((5L, 5L, 5L, 1)))   // first: cum 5
    assert(byId(1L) === ((1L, 4L, 9L, 1)))   // cum 9
    assert(byId(3L) === ((3L, 3L, 12L, 0)))  // cum 12 > 10
    assert(byId(2L)._4 === 0)                // cum 14 — never re-fits
    assert(byId(4L)._4 === 0)
    assert(got.map(_._3).sorted.toSeq === Seq(5L, 9L, 12L, 14L, 16L))
  }

  test("score ties break by ascending id in the cumsum order") {
    // docs 2 and 4 both score 2.0; doc 2 (smaller id) accumulates first
    val got = Budget.tokenBudgetSelect(corpus.toDF("doc_id", "text"),
        "doc_id", "text",
        score = size(split(col("text"), " ")).cast("double"), budget = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got(2L) === 14L) // 5+4+3+2
    assert(got(4L) === 16L)
  }

  test("every doc exactly once; independent of input partitioning") {
    val df = corpus.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Budget.tokenBudgetSelect(d, "doc_id", "text",
          score = size(split(col("text"), " ")).cast("double"), budget = 10L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4)))
        .toSet
    val one = run(df.repartition(1))
    assert(one.map(_._1) === Set(1L, 2L, 3L, 4L, 5L))
    assert(one === run(df.repartition(7)))
  }
}
