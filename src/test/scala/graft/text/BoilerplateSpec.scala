package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Boilerplate removal semantics: per-source frequency scoping, order
  * preservation in the rebuilt text, the all-boiler edge, and partition
  * independence. */
class BoilerplateSpec extends SparkSpecBase {

  import spark.implicits._

  // src A: header repeats in all 3 docs; body lines unique.
  // src B: only 2 docs share the header — below minDocs=3, kept.
  // doc 4: consists ONLY of src-A boilerplate → empty clean_text.
  // doc 5's body contains the SAME line twice (both instances counted).
  private val corpus = Seq(
    (1L, "A", "sub now\nalpha one\nbye"),
    (2L, "A", "sub now\nbeta two\nbye"),
    (3L, "A", "sub now\ngamma three\nbye"),
    (4L, "A", "sub now\nbye"),
    (5L, "A", "sub now\ndelta\ndelta\nbye"),
    (6L, "B", "sub now\nb-doc one"),
    (7L, "B", "sub now\nb-doc two"))

  private def run(minDocs: Long = 3L) =
    Boilerplate.removeBoilerplate(
        corpus.toDF("doc_id", "source", "text"), "doc_id", "text", "source",
        minDocs)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("per-source repeated lines are removed; unique lines survive in order") {
    val got = run()
    assert(got === Seq(
      (1L, 3L, 2L, "alpha one"),
      (2L, 3L, 2L, "beta two"),
      (3L, 3L, 2L, "gamma three"),
      (4L, 2L, 2L, ""), // all-boiler doc keeps an EMPTY clean text, not dropped
      (5L, 4L, 2L, "delta\ndelta"), // repeated unique line kept twice, in order
      // src B's "sub now" appears in only 2 docs — below minDocs, kept
      (6L, 2L, 0L, "sub now\nb-doc one"),
      (7L, 2L, 0L, "sub now\nb-doc two")))
  }

  test("frequency scoping is per SOURCE, not corpus-wide") {
    // corpus-wide, "sub now" occurs in 7 docs; per-source it is 5 (A) and
    // 2 (B). minDocs=6 must keep it everywhere.
    val got = run(minDocs = 6L)
    assert(got.forall(_._3 === 0L), "no line crosses the per-source bound")
  }

  test("line order in the rebuilt text is the original order") {
    val df = Seq((1L, "S", "z last?\na first\nz last?\nm mid"),
        (2L, "S", "z last?\nother"), (3L, "S", "z last?\nmore"))
      .toDF("doc_id", "source", "text")
    val got = Boilerplate.removeBoilerplate(df, "doc_id", "text", "source", 3L)
      .filter(col("doc_id") === 1L).collect()(0)
    assert(got.getString(3) === "a first\nm mid",
      "kept lines must re-join in document order")
  }

  test("independent of input partitioning") {
    val df = corpus.toDF("doc_id", "source", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      Boilerplate.removeBoilerplate(d, "doc_id", "text", "source", 3L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    assert(rows(df.repartition(1)) === rows(df.repartition(7)))
  }
}
