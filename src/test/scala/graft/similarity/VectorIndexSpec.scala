package graft.similarity

import graft.SparkSpecBase

/** Persisted vector index ([[VectorIndex]]): serve ≡ per-call on all
  * three entry points, signature-driven rebuild on in-place append,
  * no rebuild on an unchanged re-read, per-call fallback for in-memory
  * sources. */
class VectorIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def v(seed: Int): Array[Float] =
    Array.tabulate(64)(j => (math.sin(seed * 97.0 + j) * 0.5).toFloat)

  /** 40 vectors in 4 loose clusters with labels, written as ONE file so
    * an append later is a new file (the in-place shape). */
  private def writeCorpus(dir: String, n: Int = 40): Unit =
    (1 to n).map(i => (i.toLong, v(i % 4), i % 3))
      .toDF("vec_id", "embedding", "label").repartition(1)
      .write.mode("overwrite").parquet(dir)

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("serve ≡ per-call: ivf, pq, and knn-labels row-for-row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vecidx")
    val src = tmp.toString + "/emb.parquet"
    val idx = tmp.toString + "/vecindex"
    writeCorpus(src)
    val df = spark.read.parquet(src)

    val ivfIdx = VectorIndex.ivfTopKIndexed(df, "vec_id", "embedding",
      k = 3, probes = 4, idx, sourceTag = src)
    val ivfDir = Similarity.ivfCosineTopK(df, "vec_id", "embedding",
      k = 3, cells = 0, probes = 4)
    assert(rowsOf(ivfIdx) === rowsOf(ivfDir))
    assert(ivfIdx.schema === ivfDir.schema)

    val pqIdx = VectorIndex.ivfPqTopKIndexed(df, "vec_id", "embedding",
      k = 3, probes = 4, idx, sourceTag = src)
    val pqDir = Similarity.ivfPqTopK(df, "vec_id", "embedding",
      k = 3, cells = 0, probes = 4)
    assert(rowsOf(pqIdx) === rowsOf(pqDir))
    assert(pqIdx.schema === pqDir.schema)

    val knnIdx = VectorIndex.knnLabelsIndexed(df, "vec_id", "embedding",
      "label", k = 5, probes = 4, idx, sourceTag = src)
    val knnDir = Similarity.knnLabels(df, "vec_id", "embedding", "label",
      k = 5, cells = 0, probes = 4)
    assert(rowsOf(knnIdx) === rowsOf(knnDir))
    assert(knnIdx.schema === knnDir.schema)
  }

  test("one build serves all three; unchanged re-read never rebuilds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vecidx")
    val src = tmp.toString + "/emb.parquet"
    val idx = tmp.toString + "/vecindex"
    writeCorpus(src)
    def df = spark.read.parquet(src)
    val b0 = VectorIndex.buildsStarted.get()
    VectorIndex.ivfTopKIndexed(df, "vec_id", "embedding", 3, 4, idx, src)
      .collect()
    assert(VectorIndex.buildsStarted.get() === b0 + 1)
    // q78/q94 on the same corpus + config: signature hit, no build
    VectorIndex.ivfPqTopKIndexed(df, "vec_id", "embedding", 3, 4, idx, src)
      .collect()
    VectorIndex.knnLabelsIndexed(df, "vec_id", "embedding", "label", 5, 4,
      idx, src).collect()
    assert(VectorIndex.buildsStarted.get() === b0 + 1,
      "fresh index must be reused across all three entry points")
  }

  test("in-place append invalidates: full rebuild, results track the new corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vecidx")
    val src = tmp.toString + "/emb.parquet"
    val idx = tmp.toString + "/vecindex"
    writeCorpus(src)
    def df = spark.read.parquet(src)
    VectorIndex.ivfTopKIndexed(df, "vec_id", "embedding", 3, 4, idx, src)
      .collect()
    // append new vectors IN PLACE: the re-read sameResult-matches the
    // old plan, only the content signature can catch it
    (101 to 110).map(i => (i.toLong, v(i % 4), i % 3))
      .toDF("vec_id", "embedding", "label").repartition(1)
      .write.mode("append").parquet(src)
    val b1 = VectorIndex.buildsStarted.get()
    val served = VectorIndex.ivfTopKIndexed(df, "vec_id", "embedding",
      3, 4, idx, src)
    val direct = Similarity.ivfCosineTopK(df, "vec_id", "embedding",
      3, 0, 4)
    assert(rowsOf(served) === rowsOf(direct))
    assert(served.collect().map(_.getLong(0)).toSet.exists(_ > 100L),
      "appended vectors must appear in the served neighbors")
    assert(VectorIndex.buildsStarted.get() === b1 + 1,
      "an in-place append must trigger exactly one full rebuild")
  }

  test("in-memory source: per-call fallback, no artifact written") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vecidx")
    val idx = tmp.toString + "/vecindex"
    val df = (1 to 40).map(i => (i.toLong, v(i % 4), i % 3))
      .toDF("vec_id", "embedding", "label")
    val b0 = VectorIndex.buildsStarted.get()
    val out = VectorIndex.ivfTopKIndexed(df, "vec_id", "embedding",
      3, 4, idx, sourceTag = "mem")
    val direct = Similarity.ivfCosineTopK(df, "vec_id", "embedding", 3, 0, 4)
    assert(rowsOf(out) === rowsOf(direct))
    assert(VectorIndex.buildsStarted.get() === b0)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(idx)))
  }
}
