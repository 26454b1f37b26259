package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-frequency boilerplate removal — the C4/CCNet contract (Raffel et
  * al. 2020 §2.2 "we removed ... boilerplate"; Wenzek et al. 2020's
  * paragraph-hash dedup): a LINE is boilerplate when the same line occurs
  * in at least `minDocs` distinct documents of the same source (site
  * navigation, subscribe banners, copyright footers — content that
  * repeats per-site but carries no training signal). Keyed by
  * (source, md5(line)), so the contract is hash-exact and the DuckDB
  * oracle reproduces it byte-for-byte, collisions included (the q26/q85
  * dedup-family convention).
  *
  * Scale shape (100 TB): the line-frequency table is the word-count
  * shape — (source, line-hash) counts map-side combined before one
  * exchange; the boiler set after the `>= minDocs` filter is bounded by
  * total_lines / minDocs and in practice tiny (it is exactly the
  * repeated content), so the join back to the line stream broadcasts
  * under AQE; reassembly groups by document, so per-group state is one
  * document's lines. No collect, no UDFs — the rebuild of `clean_text`
  * is collect_list + array_sort + transform inside one aggregate.
  *
  * Ref: the reference has no boilerplate stage; north-star text-pipeline
  * extension (SURVEY §2 extension, the q85–q93 family).
  */
object Boilerplate {

  private def lineHash(line: Column): Column = md5(line)

  /** Per-document boilerplate report: (id, n_lines, n_boiler,
    * clean_text) where `clean_text` is the document's non-boilerplate
    * lines re-joined with '\n' in original order. A document whose every
    * line is boilerplate keeps an EMPTY clean_text (it stays in the
    * output — dropping rows is the caller's curation decision, q88's
    * job, not the scrubber's). */
  def removeBoilerplate(docs: DataFrame, id: String, text: String,
      source: String, minDocs: Long): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would flag every line as boilerplate")
    val lines = docs
      .select(col(id), col(source),
        posexplode(split(col(text), "\n")))
      .withColumnRenamed("pos", "__pos")
      .withColumnRenamed("col", "__line")
      .withColumn("__lh", lineHash(col("__line")))

    // (source, line-hash) document frequency; only the boilerplate rows
    // (freq >= minDocs) survive into the join side
    val boiler = lines
      .groupBy(col(source), col("__lh"))
      .agg(countDistinct(col(id)).as("__ldf"))
      .filter(col("__ldf") >= minDocs)
      .select(col(source), col("__lh"), lit(1).as("__boiler"))

    lines
      .join(boiler, Seq(source, "__lh"), "left")
      .withColumn("__boiler", coalesce(col("__boiler"), lit(0)))
      .groupBy(col(id))
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(col("__boiler")).cast("long").as("n_boiler"),
        concat_ws("\n", transform(
          array_sort(collect_list(
            when(col("__boiler") === 0, struct(col("__pos"), col("__line"))))),
          x => x.getField("__line"))).as("clean_text"))
  }
}
