package graft.dedup

import graft.SparkSpecBase

import scala.collection.mutable
import scala.util.Random

class ClustersSpec extends SparkSpecBase {
  import spark.implicits._

  /** Driver-side union-find — the first-principles parity model. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graph matches driver union-find") {
    val rnd = new Random(42)
    val edges = Seq.fill(600)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .filter(e => e._1 != e._2)
    assert(labelsOf(edges) === unionFind(500, edges))
  }

  test("chain converges in O(log^2 n) rounds, not diameter") {
    // A 256-node path is the worst case for naive min-propagation
    // (255 rounds); the alternating algorithm must stay logarithmic.
    // unionFindMaxEdges = 0 pins the distributed route — the default
    // route would collect 255 edges and answer in zero rounds.
    val chain = (0L until 255L).map(i => (i, i + 1))
    val (labels, rounds) =
      Clusters.ccWithIterations(chain.toDF("id_a", "id_b"), "id_a", "id_b",
        unionFindMaxEdges = 0)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 255L).map(_ -> 0L).toMap)
    assert(rounds <= 20, s"took $rounds rounds for a 256-chain")
  }

  test("union-find route and star-alternation route agree") {
    val rnd = new Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("id_a", "id_b")
    val (fast, fastRounds) =
      Clusters.ccWithIterations(df, "id_a", "id_b")
    val (distributed, distRounds) =
      Clusters.ccWithIterations(df, "id_a", "id_b", unionFindMaxEdges = 0)
    assert(fastRounds === 0)
    assert(distRounds > 0)
    val a = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = distributed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("cliques, duplicates, reversed and self pairs are tolerated") {
    val messy = Seq((5L, 3L), (3L, 5L), (5L, 5L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 11L))
    val got = labelsOf(messy)
    assert(got === Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 10L -> 10L, 11L -> 10L))
  }

  test("empty pair stream yields empty labels") {
    assert(labelsOf(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("string ids cluster by lexicographic minimum") {
    val pairs = Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("assign builds the purge table over the full corpus") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Clusters.assign(docs, pairs, "doc_id")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out === Array(
      (1L, 1L, 3L, 1), (2L, 1L, 3L, 0), (3L, 1L, 3L, 0),
      (4L, 4L, 2L, 1), (5L, 4L, 2L, 0), (9L, 9L, 1L, 1)))
  }

  test("canonicalKeep keeps the highest-score member; ties break to min id") {
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), // cluster 1: doc 2 wins on score
      (4L, 7L), (5L, 7L),              // cluster 4: tie → doc 4 wins
      (9L, 1L)                         // singleton keeps itself
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Clusters.canonicalKeep(docs, pairs, "doc_id",
        org.apache.spark.sql.functions.col("quality"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(out === Array(
      (1L, 1L, 3L, 10L, 0), (2L, 1L, 3L, 30L, 1), (3L, 1L, 3L, 20L, 0),
      (4L, 4L, 2L, 7L, 1), (5L, 4L, 2L, 7L, 0), (9L, 9L, 1L, 1L, 1)))
  }

  test("canonicalKeep null scores: lose to non-null; all-null cluster still keeps one") {
    // The aggregate form must reproduce the window form's desc-nulls-last
    // semantics: a null score never beats a non-null one, and a cluster
    // whose EVERY score is null still elects exactly one survivor
    // (min id) via the null-safe best-score match.
    val docs = Seq(
      (1L, Option.empty[Long]), (2L, Some(5L)), (3L, Some(5L)), // 2 wins (tie→min id among non-null)
      (4L, Option.empty[Long]), (5L, Option.empty[Long]),       // all-null → 4 wins
      (9L, Option.empty[Long])                                  // null-score singleton keeps itself
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Clusters.canonicalKeep(docs, pairs, "doc_id",
        org.apache.spark.sql.functions.col("quality"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getInt(4)))
    assert(out === Array(
      (1L, 1L, 3L, None, 0), (2L, 1L, 3L, Some(5L), 1), (3L, 1L, 3L, Some(5L), 0),
      (4L, 4L, 2L, None, 1), (5L, 4L, 2L, None, 0),
      (9L, 9L, 1L, None, 1)))
  }

  test("canonicalKeep plans with aggregates, never a corpus-wide window") {
    // The scale contract: per-component quantities come from
    // groupBy(cluster_id) aggregates (map-side combinable), not
    // partition-by-cluster_id windows — a near-corpus-sized component
    // must never concentrate in one window task.
    val docs = (0L until 100L).map(i => (i, i % 7)).toDF("doc_id", "quality")
    val pairs = (0L until 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val plan = Clusters.canonicalKeep(docs, pairs, "doc_id",
      org.apache.spark.sql.functions.col("quality"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"window node in canonicalKeep plan:\n$plan")
  }

  test("canonicalKeep handles a single giant component (one keep, full size)") {
    // 2000 docs in ONE chain component — the degenerate shape the window
    // form would funnel into a single task. Correctness here pins the
    // aggregate form's behavior on the worst-case topology.
    val docs = (0L until 2000L).map(i => (i, (i * 31L) % 97L))
      .toDF("doc_id", "quality")
    val pairs = (0L until 1999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val rows = Clusters.canonicalKeep(docs, pairs, "doc_id",
      org.apache.spark.sql.functions.col("quality")).collect()
    assert(rows.length === 2000)
    assert(rows.forall(_.getLong(1) === 0L))
    assert(rows.forall(_.getLong(2) === 2000L))
    assert(rows.map(_.getInt(4)).sum === 1)
    val kept = rows.find(_.getInt(4) == 1).get
    val best = rows.minBy(r => (-r.getLong(3), r.getLong(0)))
    assert(kept.getLong(0) === best.getLong(0))
  }

  test("canonicalKeep emits exactly one keep per cluster on a random graph") {
    val rnd = new Random(7)
    val docs = (0L until 300L).map(i => (i, rnd.nextInt(50).toLong))
      .toDF("doc_id", "quality")
    val pairs = Seq.fill(150)(
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter(e => e._1 != e._2).toDF("id_a", "id_b")
    val rows = Clusters.canonicalKeep(docs, pairs, "doc_id",
        org.apache.spark.sql.functions.col("quality")).collect()
    assert(rows.length === 300)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (c, members) =>
      assert(members.map(_.getInt(4)).sum === 1, s"cluster $c keep count")
      val kept = members.find(_.getInt(4) == 1).get
      val best = members.minBy(m => (-m.getLong(3), m.getLong(0)))
      assert(kept.getLong(0) === best.getLong(0), s"cluster $c wrong survivor")
      assert(members.forall(_.getLong(2) === members.length.toLong))
    }
  }
}
