package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over a near-dup PAIR stream, and the purge table
  * it implies — the missing last stage of the dedup family: the pair
  * generators ([[Dedup.ngramJaccard]], [[Dedup.minhashLsh]],
  * [[Dedup.simhashPairs]], `Similarity.cosineNearDupPairs*`) emit edges;
  * a purge needs COMPONENTS (transitive closure of near-dup-ness) and one
  * canonical survivor per component.
  *
  * Reference behavior: the reference dedups by exact content digest only
  * (`data_manager` keeps first-seen per hash); this operator is the
  * documented scale extension for near-dup families where "A~B and B~C"
  * must collapse A, B, C together even when A~C was never emitted.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Both steps
  * are one `groupBy` + one join over the EDGE stream only (never the
  * corpus), and the alternation provably converges in O(log² n) rounds —
  * unlike naive min-label propagation whose round count is the component
  * DIAMETER (a 1M-doc chain would take 1M rounds; here ~20). Every
  * shuffle is bounded by the pair count, which the upstream df/bucket
  * caps already bound linearly in corpus size.
  *
  * Scale notes: each round `localCheckpoint`s the edge set to truncate
  * lineage (iterative self-referential plans otherwise grow Catalyst
  * analysis exponentially); on a real cluster with executor loss
  * concerns, swap for `checkpoint` with a reliable checkpoint dir — the
  * algorithm is agnostic. Convergence is detected exactly (no
  * hash-signature early-stop that could wrongly converge): a cardinality
  * compare first, and only when cardinalities match a one-sided `except`
  * (equal counts + empty difference ⟹ set equality).
  */
object Clusters {

  /** Component labels for every id that appears in `pairs`:
    * `(id, cluster_id)` with `cluster_id` = the component's minimum id.
    * Ids may be any orderable atomic type (long, int, string, ...);
    * self-pairs and duplicate/reversed pairs are tolerated. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIterations: Int = 50): DataFrame =
    ccWithIterations(pairs, idA, idB, maxIterations)._1

  /** [[connectedComponents]] plus the number of large+small-star rounds
    * taken — exposed for the convergence-bound spec. */
  private[graft] def ccWithIterations(pairs: DataFrame, idA: String,
      idB: String, maxIterations: Int = 50): (DataFrame, Int) = {
    val init = pairs
      .select(col(idA).as("u"), col(idB).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

    var edges = init.localCheckpoint(true)
    var count = edges.count()
    var converged = count == 0L
    var rounds = 0
    while (!converged) {
      if (rounds >= maxIterations)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIterations rounds " +
            "(bound is O(log^2 n); this indicates a non-deterministic id ordering)")
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      rounds += 1
      val nextCount = next.count()
      converged = nextCount == count && next.except(edges).isEmpty
      edges = next
      count = nextCount
    }

    // At fixpoint the edge set is a union of stars: (member, root) with
    // root = component min. groupBy-min is belt-and-braces (and gives the
    // roots their own label via the union below).
    val labels = edges.select(col("u").as("id"), col("v").as("cluster"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster")))
      .groupBy("id").agg(min("cluster").as("cluster"))
    (labels, rounds)
  }

  /** Large-star: every node connects its LARGER neighbors to the minimum
    * of its neighborhood (including itself). One groupBy + one join over
    * the symmetrized edge stream. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u")
      .agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: orient edges high→low; every node connects its smaller
    * neighborhood (and itself) to that neighborhood's minimum. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
    val mins = oriented.groupBy("u").agg(min("v").as("m"))
    oriented.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** The purge table: EVERY document with its component id (own id when
    * unpaired), component size, and `keep` = 1 for the one canonical
    * survivor (the component minimum). `docs.where("keep = 1")` is the
    * deduplicated corpus; the rest is the purge list.
    *
    * The size window partitions by `cluster_id` — near-dup components are
    * small by construction (the pair caps bound them), so no partition is
    * hot; a degenerate giant component would concentrate its SIZE count
    * (not the corpus) in one task. */
  def assign(docs: DataFrame, pairs: DataFrame, id: String,
      idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val labels = connectedComponents(pairs, idA, idB)
      .withColumnRenamed("id", id)
    val lab = docs.select(col(id))
      .join(labels, Seq(id), "left")
      .select(col(id), coalesce(col("cluster"), col(id)).as("cluster_id"))
    lab
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("cluster_id")))
      .withColumn("keep", (col(id) === col("cluster_id")).cast("int"))
  }
}
