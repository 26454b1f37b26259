package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * SIZE-ROUTED like the rest of the family: the edge stream (never the
  * corpus) decides the route.
  *
  *  - Edge count ≤ [[Clusters.UnionFindMaxEdges]] (the common case — the
  *    upstream df/bucket caps bound pairs linearly in corpus size, and a
  *    near-dup pair stream is a tiny fraction of the corpus): ONE bounded
  *    `limit(threshold+1).collect()` and a driver-side union-find pass.
  *    Labeling 59 edges must not cost 100 Spark jobs; it costs one.
  *  - Above the threshold: alternating large-star / small-star (Kiveris
  *    et al., "Connected Components in MapReduce and Beyond", SoCC'14).
  *    Both steps are one `groupBy` + one join over the EDGE stream only,
  *    and the alternation provably converges in O(log² n) rounds — unlike
  *    naive min-label propagation whose round count is the component
  *    DIAMETER (a 1M-doc chain would take 1M rounds; here ~20).
  *
  * Distributed-path scale notes: each round `localCheckpoint`s the edge
  * set to truncate lineage (iterative self-referential plans otherwise
  * grow Catalyst analysis exponentially); on a real cluster with executor
  * loss concerns, swap for `checkpoint` with a reliable checkpoint dir —
  * the algorithm is agnostic. Convergence costs ONE cheap aggregate job
  * per round — a deterministic (count, sum(xxhash64(u,v))) signature —
  * and only when the signature repeats (candidate fixpoint) does a single
  * one-sided `except` verify exact set equality, so the expensive
  * verification runs once per call, not once per round.
  */
object Clusters {

  /** Route boundary: edge sets at or under this size are labeled with one
    * collected union-find pass (edges only — bounded by the same caps
    * that bound the shuffles); larger sets take the star alternation.
    * ~4M two-column rows is comfortably inside driver heap and far above
    * every capped pair stream the family emits at test SFs. */
  val UnionFindMaxEdges: Int = 4000000

  /** Component labels for every id that appears in `pairs`:
    * `(id, cluster_id)` with `cluster_id` = the component's minimum id.
    * Ids may be any orderable atomic type (long, int, string, ...);
    * self-pairs and duplicate/reversed pairs are tolerated. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIterations: Int = 50): DataFrame =
    ccWithIterations(pairs, idA, idB, maxIterations)._1

  /** [[connectedComponents]] plus the number of large+small-star rounds
    * taken (0 on the union-find route) — exposed for the
    * convergence-bound spec, which pins `unionFindMaxEdges = 0` to force
    * the distributed route. */
  private[graft] def ccWithIterations(pairs: DataFrame, idA: String,
      idB: String, maxIterations: Int = 50,
      unionFindMaxEdges: Int = UnionFindMaxEdges): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val idType = pairs.schema(idA).dataType
    val outSchema = StructType(Seq(
      StructField("id", idType), StructField("cluster", idType)))

    val init = pairs
      .select(col(idA).as("u"), col(idB).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

    // Materialize the (possibly expensive — PPJoin, LSH) pair pipeline
    // EXACTLY ONCE, then route on a bounded probe of the checkpointed
    // blocks. Probing the raw plan instead would let CollectLimit's
    // incremental partition scan re-run the upstream pipeline.
    val checkpointed = init.localCheckpoint(true)
    val probe = checkpointed.limit(unionFindMaxEdges + 1).collect()
    if (probe.length <= unionFindMaxEdges) {
      val labels = driverUnionFind(probe)
      val rows = labels.map { case (i, c) => Row(i, c) }
      val rdd = spark.sparkContext.parallelize(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(rows),
        math.max(1, rows.length / 500000 + 1))
      return (spark.createDataFrame(rdd, outSchema), 0)
    }

    var edges = checkpointed
    var sig = signature(edges)
    var converged = sig._1 == 0L
    var rounds = 0
    while (!converged) {
      if (rounds >= maxIterations)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIterations rounds " +
            "(bound is O(log^2 n); this indicates a non-deterministic id ordering)")
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      rounds += 1
      val nextSig = signature(next)
      // Signature equality is the cheap candidate test; `except` is the
      // exact verify and runs only at candidate convergence (equal counts
      // + empty one-sided difference ⟹ set equality).
      converged = nextSig == sig && next.except(edges).isEmpty
      edges = next
      sig = nextSig
    }

    // At fixpoint the edge set is a union of stars: (member, root) with
    // root = component min. groupBy-min is belt-and-braces (and gives the
    // roots their own label via the union below).
    val labels = edges.select(col("u").as("id"), col("v").as("cluster"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster")))
      .groupBy("id").agg(min("cluster").as("cluster"))
    (labels, rounds)
  }

  /** Deterministic per-round edge-set signature: cardinality + XOR of a
    * 64-bit row hash (order/partitioning independent, and — unlike a
    * sum — immune to ANSI-mode overflow checks; the edge set is distinct
    * so XOR-over-rows is a true set signature). Equal signatures are a
    * near-certain indicator of set equality; the caller still verifies
    * exactly with `except` before declaring convergence, so a collision
    * can only cost one extra job, never a wrong answer. */
  private def signature(edges: DataFrame): (Long, Long) = {
    val r = edges
      .agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(col("u"), col("v"))).as("s"))
      .head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** One-pass driver union-find over a collected (bounded) edge array.
    * Union-by-minimum keeps every root at its component's minimum id, so
    * `find` at the end IS the cluster label. Ids are the same orderable
    * atomics the distributed path handles (they arrive boxed and
    * Comparable). Iterative two-pass find (root walk + path compression)
    * keeps stack depth O(1) on adversarial chains. */
  private def driverUnionFind(edges: Array[Row]): Array[(Any, Any)] = {
    val parent = new java.util.HashMap[Any, Any]()
    val seen = new java.util.LinkedHashSet[Any]()
    @inline def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { x = p; p = parent.getOrDefault(x, x) }
      val root = x
      x = x0
      while (x != root) { val nxt = parent.get(x); parent.put(x, root); x = nxt }
      root
    }
    var i = 0
    while (i < edges.length) {
      val a = edges(i).get(0)
      val b = edges(i).get(1)
      seen.add(a); seen.add(b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (cmp(ra, rb) <= 0) parent.put(rb, ra) else parent.put(ra, rb)
      }
      i += 1
    }
    val out = new Array[(Any, Any)](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { val id = it.next(); out(i) = (id, find(id)); i += 1 }
    out
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
    * The corpus side is ONE left join and nothing else: every unpaired
    * document is trivially its own size-1 keep-1 cluster, so cluster
    * sizes are computed on the LABEL side (bounded by the pair stream,
    * not the corpus) before the join — the corpus never shuffles. On the
    * union-find route the label table is known-bounded and broadcast
    * explicitly (it comes from a local RDD whose size Catalyst can't
    * estimate); on the distributed route AQE decides. Never an unbounded
    * `count over (partition by cluster_id)` window, which would
    * concentrate a degenerate giant component's rows in one task. */
  def assign(docs: DataFrame, pairs: DataFrame, id: String,
      idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val (labels, rounds) = ccWithIterations(pairs, idA, idB)
    val sizes = labels.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    val labeled = labels.join(sizes, "cluster")
      .select(col("id").as(id), col("cluster").as("cluster_id"),
        col("cluster_size"))
    val right = if (rounds == 0) broadcast(labeled) else labeled
    docs.select(col(id))
      .join(right, Seq(id), "left")
      .select(col(id),
        coalesce(col("cluster_id"), col(id)).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        (coalesce(col("cluster_id"), col(id)) === col(id)).cast("int").as("keep"))
  }

  /** [[assign]] with QUALITY-AWARE survivor selection — the canonical
    * "keep the best copy" stage every training-data pipeline runs
    * between near-dup clustering and export: instead of keeping the
    * minimum-id member, each component keeps its highest-`score` member
    * (ties break to the smallest id under the column's natural
    * ordering, so the result is deterministic and exactly one row per
    * component has keep=1).
    *
    * `score` is any expression over `docs`' columns (token count, a
    * curation quality score, a perplexity negation, ...). Output:
    * `(id, cluster_id, cluster_size, score, keep)` for EVERY doc —
    * singletons keep themselves with cluster_size 1.
    *
    * Scale shape — the [[assign]] sizes-join shape, NOT a corpus-wide
    * window: every per-component quantity (size, best score, winning
    * member) is computed with `groupBy(cluster_id)` AGGREGATES over the
    * label-joined members — bounded by the pair stream, map-side
    * partially combined — and joined back. A
    * `row_number() over (partition by cluster_id)` window would
    * concentrate a degenerate near-corpus-sized component's rows in ONE
    * task (the exact anti-pattern [[assign]]'s doc forbids); an
    * aggregate's partial combine reduces the same component to one row
    * per map partition before any exchange. The corpus pays two
    * column-pruned passes over (id, score-inputs) — never the text —
    * and on the union-find route the member-info table is broadcast, so
    * the corpus is never exchanged at all.
    *
    * Survivor rule, identical to the window form it replaces (pinned by
    * `ClustersSpec` parity): highest score wins, ties to the smallest
    * id; null scores lose to non-null (`max` ignores nulls = the
    * window's desc-nulls-last), and an all-null-score component still
    * keeps exactly one member (the null-safe `<=>` match). */
  def canonicalKeep(docs: DataFrame, pairs: DataFrame, id: String,
      score: Column, idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val (labels, rounds) = ccWithIterations(pairs, idA, idB)
    val lab = labels.select(col("id").as(id), col("cluster").as("cluster_id"))
    val labRight = if (rounds == 0) broadcast(lab) else lab
    // Members of multi-member components only (inner join): everything
    // below is bounded by the pair stream; singletons never shuffle.
    val members = docs.select(col(id), score.as("score"))
      .join(labRight, Seq(id))
      .select(col(id), col("cluster_id"), col("score"))
    val stats = members.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"), max(col("score")).as("best_score"))
    // Winner = min id among best-score members. `<=>` keeps the
    // all-null-score component: max() returns null there and the
    // null-safe match admits every member, so min(id) still elects one.
    val winners = members.join(stats, "cluster_id")
      .where(col("score") <=> col("best_score"))
      .groupBy("cluster_id")
      .agg(min(col(id)).as("keep_id"))
    val memberInfo = lab
      .join(stats.select(col("cluster_id"), col("cluster_size")), "cluster_id")
      .join(winners, "cluster_id")
      .select(col(id), col("cluster_id"), col("cluster_size"), col("keep_id"))
    val infoRight = if (rounds == 0) broadcast(memberInfo) else memberInfo
    docs.select(col(id), score.as("score"))
      .join(infoRight, Seq(id), "left")
      .select(col(id),
        coalesce(col("cluster_id"), col(id)).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        col("score"),
        coalesce(col("keep_id") === col(id), lit(true)).cast("int").as("keep"))
  }
}
