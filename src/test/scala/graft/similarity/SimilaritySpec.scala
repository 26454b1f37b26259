package graft.similarity

import graft.SparkSpecBase

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f)),   // closest to 1
    (3L, Seq(0.0f, 1.0f)),   // orthogonal to 1
    (4L, Seq(-1.0f, 0.0f))   // opposite of 1
  ).toDF("vec_id", "embedding")

  test("cosineTopK: exact ranking by cosine, tie-broken by id") {
    val out = Similarity.cosineTopK(vecs, "vec_id", "embedding", 3)
      .filter($"id_a" === 1L).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id_b")).toSeq === Seq(2L, 3L, 4L))
    assert(out(0).getAs[Double]("cosine") > 0.99)
    assert(math.abs(out(1).getAs[Double]("cosine")) < 1e-9)
    assert(out(2).getAs[Double]("cosine") === -1.0)
  }

  test("lshCosineTopK: identical-direction vectors always share a bucket") {
    val out = Similarity.lshCosineTopK(vecs, "vec_id", "embedding", 3, planes = 4, tables = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // 1 and 2 point the same way -> same sign pattern on every hyperplane
    assert(out.contains((1L, 2L)) && out.contains((2L, 1L)))
  }

  test("lsh recall vs brute force on real embeddings (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("id_a") -> r.getAs[Long]("id_b")).toMap
    val approx = Similarity.lshCosineTopK(emb, "vec_id", "embedding", 1, planes = 4, tables = 8)
      .collect().map(r => r.getAs[Long]("id_a") -> r.getAs[Long]("id_b")).toMap
    val hits = exact.count { case (a, b) => approx.get(a).contains(b) }
    // 4 planes x 8 tables over 200 vectors: recall 1-(1-p^4)^8, well above 0.5
    assert(hits.toDouble / exact.size > 0.5,
      s"recall ${hits.toDouble / exact.size} too low")
  }

  test("cosineNearDupPairs: exactly the pairs clearing the rounded threshold") {
    val out = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // only (1,2) are near-duplicates (cos ~0.994); orthogonal/opposite
    // pairs sit far below; each pair appears once with id_a < id_b
    assert(out === Set((1L, 2L)))
  }

  test("ivfCosineTopK: recall vs brute force on real embeddings (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("id_a") -> r.getAs[Long]("id_b")).toMap
    val approx = Similarity.ivfCosineTopK(emb, "vec_id", "embedding", 1,
        cells = 16, probes = 4)
      .collect().map(r => r.getAs[Long]("id_a") -> r.getAs[Long]("id_b")).toMap
    val hits = exact.count { case (a, b) => approx.get(a).contains(b) }
    // probing 4/16 cells must still find most true nearest neighbors
    // (untrained md5 centroids: measured recall@1 ~0.54 on this slice;
    // trained centroids would do better, determinism matters more here)
    assert(hits.toDouble / exact.size > 0.5,
      s"recall ${hits.toDouble / exact.size} too low")
    // every reported neighbor must be a real vector with a valid cosine
    assert(approx.nonEmpty && approx.keySet.subsetOf(exact.keySet))
  }

  test("ivf adaptive cell count: cells=0 resolves to max(16, ceil(sqrt(n)))") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)
    // n=200 -> ceil(sqrt)=15 -> floor of 16 applies: adaptive == explicit 16
    val adaptive = Similarity.ivfCosineTopK(emb, "vec_id", "embedding", 1,
      cells = 0, probes = 4).collect().map(_.toSeq).toSet
    val explicit = Similarity.ivfCosineTopK(emb, "vec_id", "embedding", 1,
      cells = 16, probes = 4).collect().map(_.toSeq).toSet
    assert(adaptive === explicit)
  }

  test("lsh bucket cap: a degenerate duplicate cluster generates no quadratic bucket") {
    import org.apache.spark.sql.functions._
    // 1000 exact-duplicate embeddings share every sign bit in every table:
    // one 1000-member bucket per table = ~1M pairs each without the cap
    val dups = spark.range(1000).select(col("id").as("vec_id"),
      expr("array(1.0F, 0.5F, -0.25F, 0.125F)").as("embedding"))
    val capped = Similarity.lshCosineTopK(dups, "vec_id", "embedding", 1,
      planes = 4, tables = 2, maxBucket = 256)
    assert(capped.count() === 0L) // every bucket is degenerate -> skipped
    // sanity: it IS the cap doing that, not the bucketing
    val uncapped = Similarity.lshCosineTopK(dups, "vec_id", "embedding", 1,
      planes = 4, tables = 2, maxBucket = 2000)
    assert(uncapped.count() === 1000L) // top-1 per vector, all cosine 1.0
  }

  test("lsh bucket cap is not silent: skipped buckets are counted") {
    import org.apache.spark.sql.functions._
    val dups = spark.range(1000).select(col("id").as("vec_id"),
      expr("array(1.0F, 0.5F, -0.25F, 0.125F)").as("embedding"))
    val acc = spark.sparkContext.longAccumulator("test.lsh.skipped")
    Similarity.lshCosineTopK(dups, "vec_id", "embedding", 1,
      planes = 4, tables = 2, maxBucket = 256,
      skippedBuckets = Some(acc)).count()
    // one degenerate 1000-member bucket per table
    assert(acc.value === 2L, s"expected 2 skipped buckets, saw ${acc.value}")
    // and with no degenerate buckets the counter stays at zero
    val acc2 = spark.sparkContext.longAccumulator("test.lsh.skipped2")
    Similarity.lshCosineTopK(dups.limit(10), "vec_id", "embedding", 1,
      planes = 4, tables = 2, maxBucket = 256,
      skippedBuckets = Some(acc2)).count()
    assert(acc2.value === 0L)
  }

  test("near-dup router: LSH route equals the exact grid when recall is 1") {
    import org.apache.spark.sql.functions._
    // 90 planted clusters of 3 identical-direction vectors (they share
    // every bucket in every table -> recall 1 on all true pairs) among
    // deterministic pseudo-random fillers whose pairwise cosines sit far
    // below the 0.999 cut
    val rows = (0L until 450L).map { i =>
      val cluster = i / 5
      if (i % 5 < 3) { // 3 cluster members, identical direction
        val base = (0 until 16).map(d =>
          (math.sin(cluster * 16 + d + 1) * 10).toFloat)
        (i, base)
      } else {
        val v = (0 until 16).map(d =>
          (math.sin(i * 37.0 + d * 11.0) * 5).toFloat)
        (i, v)
      }
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDupPairsExact(df, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val routed = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.999,
      maxExactRows = 100) // 450 rows > 100 -> forces the LSH route
    val lsh = routed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "degenerate: no planted pairs survived the cut")
    assert(lsh === exact, "LSH route diverged from the exact grid")
    // and the default route threshold keeps small inputs on the exact grid
    val small = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(small === exact)
  }

  test("ivfCosineTopKTrained: k-means refinement does not hurt recall") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("id_a") -> r.getAs[Long]("id_b")).toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val m = df.collect()
        .map(r => r.getAs[Long]("id_a") -> r.getAs[Long]("id_b")).toMap
      exact.count { case (a, b) => m.get(a).contains(b) }.toDouble / exact.size
    }
    val untrained = recall(Similarity.ivfCosineTopK(emb, "vec_id", "embedding", 1,
      cells = 16, probes = 4))
    val trained = recall(Similarity.ivfCosineTopKTrained(emb, "vec_id", "embedding", 1,
      cells = 16, probes = 4, iters = 2))
    // everything is deterministically seeded, so these are fixed values;
    // Lloyd refinement tightens cells around the data distribution
    assert(trained >= untrained, s"trained $trained < untrained $untrained")
    assert(trained > 0.5, s"trained recall $trained too low")
  }

  test("ivfPqTopK: recall vs brute force on real embeddings (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("id_a") -> r.getAs[Long]("id_b")).toMap
    val pq = Similarity.ivfPqTopK(emb, "vec_id", "embedding", 3,
        cells = 16, probes = 4)
      .collect().groupBy(_.getAs[Long]("id_a"))
      .view.mapValues(_.map(_.getAs[Long]("id_b")).toSet).toMap
    // the true nearest neighbor should usually survive the IVF pruning,
    // the PQ shortlist, AND the exact refine into the top-3. Pure-ADC
    // ranking measured 0.385 here; the exact-cosine refine of the ADC
    // shortlist recovers to the exact-scoring IVF bound (~0.54 at these
    // cells/probes — the loss is pruning, not quantization).
    // Deterministic seeds -> a fixed value; bound set under it.
    val hits = exact.count { case (a, b) => pq.get(a).exists(_.contains(b)) }
    assert(hits.toDouble / exact.size > 0.5,
      s"recall@3 ${hits.toDouble / exact.size} too low")
    // shape: ranks 1..<=3 per query, never self
    val rows = Similarity.ivfPqTopK(emb, "vec_id", "embedding", 3,
        cells = 16, probes = 4).collect()
    assert(rows.forall(r => r.getAs[Long]("id_a") != r.getAs[Long]("id_b")))
    assert(rows.groupBy(_.getAs[Long]("id_a")).values
      .forall(g => g.map(_.getAs[Int]("rank")).sorted.sameElements(1 to g.length)))
  }

  test("ivfPqTopK: exact-duplicate vectors share codes and find each other first") {
    val dup = Seq.tabulate(64)(j => math.sin(j * 0.7).toFloat)
    val rows = (1L to 3L).map(i => (i, dup)) ++ (4L to 40L).map { i =>
      (i, Seq.tabulate(64)(j => (math.cos(i * 31 + j * 1.3) * 2).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(df, "vec_id", "embedding", 2, cells = 4, probes = 2)
      .collect().filter(_.getAs[Long]("id_a") <= 3L)
      .groupBy(_.getAs[Long]("id_a"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("id_b")).toList).toMap
    // identical vectors -> identical cells AND identical codes -> maximal
    // equal ADC scores; ties break by id, so each of 1..3 reports the
    // other two as its top-2
    assert(out(1L) === List(2L, 3L))
    assert(out(2L) === List(1L, 3L))
    assert(out(3L) === List(1L, 2L))
  }

  test("labelCentroids: positional means per label") {
    val df = Seq((0, Seq(1.0f, 3.0f)), (0, Seq(3.0f, 5.0f)), (1, Seq(2.0f, 2.0f)))
      .toDF("label", "embedding")
    val out = Similarity.labelCentroids(df, "label", "embedding")
      .orderBy("label", "pos").collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("pos"), r.getAs[Double]("centroid")))
    assert(out.toSeq === Seq((0, 1, 2.0), (0, 2, 4.0), (1, 1, 2.0), (1, 2, 2.0)))
  }

  test("knnLabels: neighborhood majority wins; mislabeled row flagged agree=0") {
    // Three tight clusters of IDENTICAL vectors (identical vector ->
    // identical IVF cell by determinism, so each cluster is guaranteed
    // co-bucketed regardless of the md5 centroid draw), 8 members each.
    // Vector 23 sits in cluster C but carries label 0 — the planted
    // label-noise row.
    val base = Map(0 -> Seq(1.0f, 0.0f, 0.0f), 1 -> Seq(0.0f, 1.0f, 0.0f),
      2 -> Seq(0.0f, 0.0f, 1.0f))
    val rows = (0L until 24L).map { i =>
      val c = (i / 8).toInt
      val lbl = if (i == 23L) 0 else c
      (i, base(c), lbl)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabels(df, "vec_id", "embedding", "label",
        k = 5, cells = 4, probes = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("label_pred"), r.getAs[Int]("agree")))).toMap
    // every vector's 5 nearest neighbors are cluster-mates (cosine 1 vs
    // <=0 cross-cluster), so label_pred = cluster majority everywhere
    rows.foreach { case (i, _, _) =>
      assert(out(i)._1 === (i / 8).toInt, s"vec $i predicted wrong label") }
    // the planted mislabel is the ONLY disagreement
    assert(out.count(_._2._2 == 0) === 1)
    assert(out(23L) === ((2, 0)))
  }

  test("knnLabels pq route: compressed scan reaches the same audit verdict") {
    // Same audit scenario at PQ-compatible shape: dim 16 (divisible by
    // the 16 subspaces), 3 clusters × 16 identical vectors (48 ≥ the
    // 32-codeword sample), row 47 planted with a wrong label. The
    // majority vote must produce the IDENTICAL verdict through the
    // ADC-shortlist + refine path — the documented 100 TB route for
    // label audits (compressed scan instead of exact scoring).
    val dim = 16
    val rows = (0L until 48L).map { i =>
      val c = (i / 16).toInt
      val v = Seq.tabulate(dim)(j => if (j == c) 1.0f else 0.0f)
      val lbl = if (i == 47L) 0 else c
      (i, v, lbl)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    def audit(usePq: Boolean) = Similarity.knnLabels(df, "vec_id",
        "embedding", "label", k = 5, cells = 4, probes = 2, pq = usePq)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("label_pred"), r.getAs[Int]("agree")))).toMap
    val pq = audit(usePq = true)
    rows.foreach { case (i, _, _) =>
      assert(pq(i)._1 === (i / 16).toInt, s"vec $i predicted wrong label") }
    assert(pq.count(_._2._2 == 0) === 1)
    assert(pq(47L) === ((2, 0)))
    // and the two routes agree verdict-for-verdict on this corpus
    assert(pq === audit(usePq = false))
  }
}
