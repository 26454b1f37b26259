package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index retrieval over a document corpus: BM25 query search and
  * TF-IDF term extraction — the relevance-scoring stage of a training-data
  * pipeline (query-driven data selection, decontamination-by-relevance,
  * "find the docs about X" curation triage).
  *
  * Scale shape (the part that matters at 100 TB):
  *   - Document length and corpus stats ride the token scan map-side; the
  *     corpus-wide (N, Σdl) aggregate is ONE scalar row, broadcast back
  *     via crossJoin — no collect.
  *   - BM25 filters tokens against the literal query-term set BEFORE any
  *     exchange, so shuffle volume is proportional to matching postings,
  *     not corpus tokens; per-term document frequencies are a ≤|query|-row
  *     aggregate, broadcast.
  *   - Top-k is `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject
  *     (per-partition heaps + driver merge), never a global sort.
  *   - TF-IDF is the word-count shape: (doc, term) counts map-side
  *     combined; the tf ⋈ df join shuffles on term, where AQE's skew-join
  *     splits stopword-grade hot keys; the per-doc top-m window partitions
  *     by document, so window state is bounded by one document's vocabulary.
  *
  * Determinism across engines (the DuckDB oracle): tf/df/dl/N are exact
  * longs; each double expression is written as the identical operation
  * tree on both sides (Scala-computed constants interpolated as decimal
  * literals, left-associative products/divisions); scores are rounded to
  * 6 dp before ranking and output, with id/term tie-breaks — the q87 DSIR
  * convention.
  *
  * Ref semantics: the reference has no IR stage; this extends the
  * north-star text family (SURVEY §2 extension, like q85-q93).
  */
object Retrieval {

  private def tokens(text: Column): Column = split(text, " ")

  /** BM25 (Robertson/Sparck Jones, k1/b form; Lucene's idf variant
    * ln(1 + (N - df + 0.5)/(df + 0.5)), which is non-negative for any df)
    * of a fixed query-term set against every document; returns the top-k
    * docs as (id, n_terms, score), score desc / id asc.
    *
    * `query` terms are matched as whole whitespace tokens (the family
    * tokenizer). Documents matching no term score nothing and never leave
    * the map stage.
    */
  def bm25TopK(docs: DataFrame, id: String, text: String, query: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k > 0, "k must be positive")
    val terms = query.distinct
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b

    val toked = docs.select(col(id), tokens(col(text)).as("__toks"))
      .select(col(id), size(col("__toks")).cast("long").as("__dl"),
        col("__toks"))

    // ONE scalar row (N, Σdl) — broadcast back; avgdl = Σdl/N in double.
    val stats = toked.agg(count(lit(1)).cast("long").as("__n"),
      sum(col("__dl")).cast("long").as("__sumdl"))

    // Postings restricted to the query terms BEFORE the exchange: the
    // groupBy shuffles only (doc, query-term) hits, map-side combined.
    val tf = toked
      .select(col(id), col("__dl"), explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(terms: _*))
      .groupBy(col(id), col("__dl"), col("__term"))
      .agg(count(lit(1)).cast("long").as("__tf"))

    // ≤ |query| rows; broadcast into the per-posting scoring map.
    val dft = tf.groupBy(col("__term"))
      .agg(count(lit(1)).cast("long").as("__df"))

    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val idf = log(lit(1.0) +
      ((col("__n") - col("__df")).cast("double") + lit(0.5)) /
        (col("__df").cast("double") + lit(0.5)))
    val termScore = idf * (col("__tf").cast("double") * lit(k1p1)) /
      (col("__tf").cast("double") +
        lit(k1) * (lit(oneMinusB) + lit(b) * col("__dl").cast("double") / avgdl))

    tf.join(broadcast(dft), "__term")
      .crossJoin(broadcast(stats))
      .select(col(id), termScore.as("__ts"))
      .groupBy(col(id))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum(col("__ts")), 6).as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }

  /** Fragment of the BM25 oracle SQL shared by the spec and the registry:
    * the identical operation tree in DuckDB. `termsList` e.g.
    * "'data','window'". */
  def bm25OracleSql(termsList: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      d AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM t),
      stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM d),
      tf AS (SELECT doc_id, tok AS term, count(*)::BIGINT AS tf
             FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
             WHERE tok IN ($termsList) GROUP BY 1, 2),
      dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      sc AS (SELECT tf.doc_id,
          ln(1.0 + ((n - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5))
            * (tf::DOUBLE * $k1p1)
            / (tf::DOUBLE + $k1 * ($oneMinusB + $b * dl::DOUBLE
                 / (sumdl::DOUBLE / n::DOUBLE))) AS ts
        FROM tf JOIN dft USING (term) JOIN d USING (doc_id) CROSS JOIN stats)
      SELECT doc_id, count(*)::BIGINT AS n_terms, round(sum(ts), 6) AS score
      FROM sc GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT $k"""
  }

  /** Top-m TF-IDF terms per document: tfidf = (tf/dl) · ln(N/df), ranked
    * within each document by 6-dp-rounded score desc, term asc. The
    * standard keyword-extraction / topic-triage primitive.
    */
  def tfidfTopTerms(docs: DataFrame, id: String, text: String,
      m: Int): DataFrame = {
    require(m > 0, "m must be positive")
    import org.apache.spark.sql.expressions.Window

    val toked = docs.select(col(id), tokens(col(text)).as("__toks"))
      .select(col(id), size(col("__toks")).cast("long").as("__dl"),
        col("__toks"))

    val stats = toked.agg(count(lit(1)).cast("long").as("__n"))

    // Word-count shape: map-side combine collapses each partition's
    // (doc, term) stream before the exchange.
    val tf = toked
      .select(col(id), col("__dl"), explode(col("__toks")).as("term"))
      .groupBy(col(id), col("__dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("__tf"))

    // Vocabulary-sized; the join back shuffles on term (AQE splits
    // stopword-grade skew; at oracle scale it broadcasts).
    val dft = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("__df"))

    val tfidf = col("__tf").cast("double") / col("__dl").cast("double") *
      log(col("__n").cast("double") / col("__df").cast("double"))

    val w = Window.partitionBy(col(id))
      .orderBy(col("tfidf").desc, col("term").asc)

    tf.join(dft, "term")
      .crossJoin(broadcast(stats))
      .select(col(id), col("term"), round(tfidf, 6).as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
      .select(col(id), col("term"), col("rank").cast("long").as("rank"),
        col("tfidf"))
  }

  /** DuckDB oracle fragment for [[tfidfTopTerms]]. */
  def tfidfOracleSql(m: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      stats AS (SELECT count(*)::BIGINT AS n FROM t),
      tf AS (SELECT doc_id, dl, tok AS term, count(*)::BIGINT AS tf
             FROM (SELECT doc_id, len(toks)::BIGINT AS dl, unnest(toks) AS tok
                   FROM t)
             GROUP BY 1, 2, 3),
      dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      sc AS (SELECT tf.doc_id, tf.term,
          round(tf::DOUBLE / dl::DOUBLE * ln(n::DOUBLE / df::DOUBLE), 6)
            AS tfidf
        FROM tf JOIN dft USING (term) CROSS JOIN stats),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term ASC) AS rank FROM sc)
      SELECT doc_id, term, rank::BIGINT AS rank, tfidf
      FROM r WHERE rank <= $m ORDER BY doc_id, rank"""
}
