package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.similarity.Similarity

/** Embedding similarity search over `embeddings` (north-star ANN
  * operators). Cosine math is double-precision with index-order summation
  * on both engines; results are rounded to 6 dp for hash stability.
  */
object VectorQueries extends QueryPack {

  override def queries: Seq[(String, QueryDef)] = Seq(

    "q33_cosine_topk" -> QueryDef(
      (s, dir) => Similarity.cosineTopK(Tables.embeddings(s, dir), "vec_id",
          "embedding", k = 3)
        .orderBy(col("id_a"), col("rank")),
      Some("""WITH p AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_cosine_similarity(a.v, b.v) AS cosine
          FROM p a, p b WHERE a.vec_id <> b.vec_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY id_a
                        ORDER BY cosine DESC, id_b) AS rank FROM pairs)
        SELECT id_a, id_b, rank, round(cosine, 6) AS cosine
        FROM r WHERE rank <= 3 ORDER BY id_a, rank"""),
      "Brute-force cosine top-k (exact ANN baseline)"),

    // Scale path: LSH-bucketed ANN (adaptive signature width, no driver
    // state). Approximate by construction, so the oracle is rows-only
    // (no SQL) — correctness is covered by the spec asserting recall
    // against q33 on the same data.
    "q34_lsh_topk" -> QueryDef(
      (s, dir) => Similarity.lshCosineTopK(Tables.embeddings(s, dir), "vec_id",
          "embedding", k = 3, tables = 8)
        .orderBy(col("id_a"), col("rank")),
      None,
      "LSH random-hyperplane bucketed ANN top-k (100 TB scale path)"),

    // Same exact-kNN semantics as q33, computed by the fully-distributed
    // block nested-loop path (no collect, no broadcast) — proving the
    // 100 TB shape returns byte-identical results.
    "q44_cosine_topk_blocked" -> QueryDef(
      (s, dir) => Similarity.cosineTopKBlocked(Tables.embeddings(s, dir), "vec_id",
          "embedding", k = 3, probeBlocks = 8, buildBlocks = 8)
        .orderBy(col("id_a"), col("rank")),
      Some("""WITH p AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_cosine_similarity(a.v, b.v) AS cosine
          FROM p a, p b WHERE a.vec_id <> b.vec_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY id_a
                        ORDER BY cosine DESC, id_b) AS rank FROM pairs)
        SELECT id_a, id_b, rank, round(cosine, 6) AS cosine
        FROM r WHERE rank <= 3 ORDER BY id_a, rank"""),
      "Blocked exact kNN: grid-partitioned block nested-loop, no broadcast"),

    "q35_label_centroids" -> QueryDef(
      (s, dir) => Similarity.labelCentroids(Tables.embeddings(s, dir), "label",
          "embedding")
        .orderBy(col("label"), col("pos")),
      Some("""SELECT label, pos, round(avg(x), 6) AS centroid
        FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                     unnest(embedding)::DOUBLE AS x FROM embeddings) t
        GROUP BY label, pos ORDER BY label, pos"""),
      "Per-label embedding centroids (posexplode + groupBy, fully distributed)")
  )
}
