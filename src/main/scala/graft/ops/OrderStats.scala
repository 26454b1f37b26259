package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Scalable EXACT grouped percentiles (SURVEY A12/A13 at scale),
  * SIZE-ROUTED PER SPEC on the number of distinct (spec, group, value)
  * cells — the family convention ([[graft.dedup.Clusters]],
  * [[graft.dedup.Contamination]]): a bounded probe picks each spec's
  * branch independently, both branches are exact, and a parity spec
  * pins them identical. Per-spec routing (r18) keeps bounded-domain
  * measures on the histogram branch when a near-unique sibling forces
  * the sort branch, so the sort carries only the specs that need it.
  *
  * Spark's `percentile` aggregate is exact but buffers every value of a
  * group inside one aggregation buffer (a value→count map — fine for
  * low-cardinality ints, fatal for near-unique doubles): with a handful
  * of groups, a 100 TB table concentrates into a handful of executor
  * buffers.
  *
  * **Histogram branch** (distinct cells ≤ [[HistogramMaxCells]] — the
  * common analytic case: bounded-domain measures like quantities,
  * prices in ticks, ratings): `groupBy(spec, group, value).count()`.
  * The map-side partial aggregate collapses each task's stream to at
  * most the cell count BEFORE the exchange, so shuffle bytes are
  * O(cells), not O(rows); the ≤cells-row result collects to the driver
  * (a bounded collect, like the route probe) which walks each (spec,
  * group)'s value-sorted cumulative counts to the exact order
  * statistics. One scan, one tiny exchange, no global sort. This is
  * the aggregate's value→count map made distributed — the buffer that
  * was fatal per-executor is fine as a driver-side result BECAUSE the
  * probe bounded it first.
  *
  * **Sort branch** (near-unique values at scale) — distributed
  * selection over a range-partitioned sort, the same family as
  * [[GlobalRank]]:
  *
  *   1. melt the requested (valueCol, p) specs into one (spec, group,
  *      value) stream and `repartitionByRange` + `sortWithinPartitions`
  *      on (spec, group, value) — a full distributed sort; a large
  *      group SPANS partitions instead of landing in one task;
  *   2. one per-partition histogram pass: counts per (spec, group) per
  *      partition — driver state O(partitions × groups × specs), never
  *      the data;
  *   3. the driver turns each percentile into at most two global indexes
  *      per (spec, group) (floor/ceil of (n−1)·p), maps them to
  *      per-partition local offsets via the histogram prefix sums, and
  *      one second pass extracts exactly those rows — a bounded collect
  *      of ≤ 2·specs·groups values;
  *   4. cost: one shuffle (the range repartition) paid once — the second
  *      pass re-reads the first pass's shuffle files (same RDD ⇒ map
  *      stage skipped) and re-runs only the in-partition sort. Nothing
  *      is cached, so the branch claims no executor storage at any
  *      scale.
  *
  * The route probe is `approx_count_distinct` over a hash of the cell —
  * one scan, sketch-sized state, no data shuffle; HLL's few-percent
  * error only moves the crossover, never correctness (both branches are
  * exact). Interpolation is shared: Spark's own formula
  * ((hi−x)·v_lo + (x−lo)·v_hi) on the floor/ceil order statistics, so
  * results are bit-compatible with the `percentile` aggregate on either
  * branch. No assumption is made about the ordering of group keys; any
  * atomic group type works. Null values are excluded, matching the
  * aggregate.
  */
object OrderStats {

  /** Histogram-branch cap on distinct (spec, group, value) cells of ONE
    * spec — bounds the cell stream the selection window exchanges (the
    * driver holds only the ≤2 straddling rows per (spec, group) since
    * r17). Above it, that spec routes to the sort branch, which keeps
    * everything distributed. */
  val HistogramMaxCells: Long = 1000000L

  /** One percentile request: `value` column, percentile in [0, 1], and
    * the output column name. */
  final case class PctSpec(value: String, p: Double, out: String)

  /** One row per group with at least one non-null value in at least one
    * spec column, with one double column per spec (null when the group
    * has no non-null values for that spec's column — and absent entirely
    * when that holds for every spec, matching what a grouped aggregate
    * over the melted non-null stream would return). Output schema:
    * (group, spec1.out, spec2.out, ...). */
  def groupedPercentiles(df: DataFrame, group: String, specs: Seq[PctSpec],
                         histogramMaxCells: Long = HistogramMaxCells): DataFrame = {
    require(specs.nonEmpty, "at least one percentile spec required")
    specs.foreach(s => require(s.p >= 0 && s.p <= 1,
      s"percentile must be in [0,1], got ${s.p}"))
    val spark = df.sparkSession
    // ONE scan of the fact table for ALL specs of a branch: explode a
    // per-row array of (spec-index, value) structs instead of unioning
    // one df.select per spec — the union form re-read the source k times
    // (k scans of a 100 TB table for a k-percentile request; q10 was the
    // only query in the suite whose plan read the same source more than
    // once). `w` is always the GLOBAL spec index, so branch results
    // merge by key.
    def meltFor(ws: Seq[Int]): DataFrame = df
      .select(col(group).as("g"),
        explode(array(ws.map { i =>
          struct(lit(i).as("w"), col(specs(i).value).cast("double").as("v"))
        }: _*)).as("wv"))
      .select(col("g"), col("wv.w").as("w"), col("wv.v").as("v"))
      .where(col("v").isNotNull)

    // Route probe, PER SPEC (r18): distinct (spec, group, value) cells,
    // approximately — a single scan with sketch-sized state (no shuffle
    // of data rows). Routing each spec independently keeps bounded-
    // domain measures (quantities, ratings — the common analytic case)
    // on the histogram branch even when a near-unique sibling spec
    // forces the sort branch: the range-partitioned sort then carries
    // ONLY the near-unique specs' rows instead of k× the fact stream,
    // and its scan prunes to just those value columns. Both branches
    // stay exact, so the split can change cost but never results.
    val cellsPerSpec: Map[Int, Long] = meltFor(specs.indices)
      .groupBy(col("w"))
      .agg(approx_count_distinct(
        xxhash64(col("w"), col("g"), col("v"))).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (histW, sortW) = specs.indices.partition(i =>
      cellsPerSpec.getOrElse(i, 0L) <= histogramMaxCells)
    val branches = Seq(
      (histW, histogramSelection _),
      (sortW, sortSelection _)
    ).collect { case (ws, sel) if ws.nonEmpty => sel(meltFor(ws), specs) }
    val totals = branches.map(_._1).fold(Map.empty)(_ ++ _)
    val picked = branches.map(_._2).fold(Map.empty)(_ ++ _)

    // Interpolate with the percentile aggregate's own formula.
    val groups = totals.keys.map(_._2).toSeq.distinct
    val outRows = groups.map { g =>
      val vals = specs.indices.map { w =>
        totals.get((w, g)) match {
          case None => null
          case Some(n) =>
            val x = specs(w).p * (n - 1)
            val lo = math.floor(x).toLong
            val hi = math.ceil(x).toLong
            val vLo = picked((w, g, lo))
            val res =
              if (lo == hi) vLo
              else (hi - x) * vLo + (x - lo) * picked((w, g, hi))
            Double.box(res)
        }
      }
      Row.fromSeq(g +: vals)
    }
    val gField = StructField(group, df.schema(group).dataType)
    val schema = StructType(gField +: specs.map(s =>
      StructField(s.out, DoubleType)).toArray.toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, 1), schema)
  }

  /** Histogram branch: value→count cells via one map-side-combined
    * aggregation, order statistics selected DISTRIBUTEDLY (r17): a
    * cumulative-count window over the cells (partitioned by (spec,
    * group), ordered by value) marks the ≤2 cells per (spec, group)
    * whose count interval straddles a wanted global index, and only
    * those rows collect. The pre-r17 form collected EVERY cell (up to
    * [[HistogramMaxCells]] rows — tens of MB of driver heap and a
    * single-threaded sort+walk); now driver state is O(groups × specs)
    * and the walk runs where the cells already live, at the cost of one
    * extra exchange of the CELL stream (≤ the cap by routing, ≪ the
    * fact stream by map-side combining).
    * Returns (per-(spec, group) total counts, wanted order statistics). */
  private def histogramSelection(melted: DataFrame, specs: Seq[PctSpec])
      : (Map[(Int, Any), Long], Map[(Int, Any, Long), Double]) = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col("w"), col("g"))
    val ordered = byGroup.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // percentile per spec index as a column (specs is driver-small)
    val pOf = specs.zipWithIndex.foldLeft(lit(Double.NaN)) {
      case (acc, (s, i)) => when(col("w") === i, lit(s.p)).otherwise(acc)
    }
    val hits = melted.groupBy(col("w"), col("g"), col("v")).count()
      .withColumn("n", sum(col("count")).over(byGroup))
      .withColumn("cum", sum(col("count")).over(ordered))
      .withColumn("x", pOf * (col("n") - 1).cast("double"))
      .withColumn("lo", floor(col("x")).cast("long"))
      .withColumn("hi", ceil(col("x")).cast("long"))
      // a cell covers global indexes [cum - count, cum)
      .filter(
        (col("lo") >= col("cum") - col("count") && col("lo") < col("cum")) ||
        (col("hi") >= col("cum") - col("count") && col("hi") < col("cum")))
      .select(col("w"), col("g"), col("v"), col("count"), col("cum"),
        col("n"), col("lo"), col("hi"))
      .collect()
    val totals = Map.newBuilder[(Int, Any), Long]
    val picked = Map.newBuilder[(Int, Any, Long), Double]
    hits.foreach { r =>
      val w = r.getInt(0); val g = r.get(1); val v = r.getDouble(2)
      val count = r.getLong(3); val cum = r.getLong(4)
      totals += (((w, g), r.getLong(5)))
      Seq(r.getLong(6), r.getLong(7)).distinct.foreach { idx =>
        if (idx >= cum - count && idx < cum) picked += (((w, g, idx), v))
      }
    }
    (totals.result(), picked.result())
  }

  /** Sort branch: distributed selection over one range-partitioned sort
    * whose shuffle both passes share. */
  private def sortSelection(melted: DataFrame, specs: Seq[PctSpec])
      : (Map[(Int, Any), Long], Map[(Int, Any, Long), Double]) = {
    val spark = melted.sparkSession
    // Range partitioning splits big (w, g) blocks across partitions; the
    // within-partition sort completes the distributed order. NO explicit
    // storage between the two passes, deliberately: `Dataset.rdd` is a
    // lazy val, so both passes execute the SAME RDD and pass 2 reuses
    // pass 1's shuffle files (the map stage is skipped; only the
    // in-partition sort re-runs — sequential disk re-read, zero memory
    // budget). Every caching alternative measured worse somewhere on the
    // ladder: an eager deserialized cache (localCheckpoint) thrashes and
    // recomputes once the melted stream outgrows the memory store
    // (120M rows / 9.4 GiB: 214 s vs 39+25 s for shuffle reuse), the
    // columnar cache pays a build cost that dominates at small scale
    // (8.8 s vs 2.5 s at 12M rows), and a serialized row cache pays Java
    // deserialization on every read. Shuffle reuse is also the only
    // option that leaves the executor storage pool untouched for the
    // rest of the pipeline. Determinism across the passes: one RDD
    // instance ⇒ one set of range boundaries and map outputs; the
    // re-run in-partition sort permutes only fully-equal (w, g, v) rows.
    val sorted = melted
      .repartitionByRange(col("w"), col("g"), col("v"))
      .sortWithinPartitions(col("w"), col("g"), col("v"))

    // Pass 1: per-partition (spec, group) histogram, in partition order.
    val hist: Array[(Int, Array[((Int, Any), Long)])] =
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val counts = scala.collection.mutable.LinkedHashMap.empty[(Int, Any), Long]
        it.foreach { r =>
          val k = (r.getInt(1), r.get(0))
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
        Iterator.single((pid, counts.toArray))
      }.collect()

    // Global count and per-partition start offset of every (w, g) block.
    val totals = scala.collection.mutable.HashMap.empty[(Int, Any), Long]
    val starts = scala.collection.mutable.HashMap.empty[(Int, (Int, Any)), Long]
    hist.sortBy(_._1).foreach { case (pid, counts) =>
      counts.foreach { case (k, c) =>
        starts((pid, k)) = totals.getOrElse(k, 0L)
        totals(k) = totals.getOrElse(k, 0L) + c
      }
    }

    // Needed global indexes per (w, g): floor/ceil of (n-1)·p.
    val wanted: Map[(Int, Any), Set[Long]] = totals.map { case (k @ (w, _), n) =>
      val x = specs(w).p * (n - 1)
      k -> Set(math.floor(x).toLong, math.ceil(x).toLong)
    }.toMap
    // Per partition: (w, g) -> sorted local offsets to extract.
    val perPartition: Map[Int, Map[(Int, Any), Array[Long]]] =
      hist.map { case (pid, counts) =>
        pid -> counts.flatMap { case (k, c) =>
          val s = starts((pid, k))
          val local = wanted(k).filter(i => i >= s && i < s + c)
            .map(_ - s).toArray.sorted
          if (local.isEmpty) None else Some(k -> local)
        }.toMap
      }.filter(_._2.nonEmpty).toMap
    val bcNeeds = spark.sparkContext.broadcast(perPartition)

    // Pass 2: extract exactly the wanted rows — a bounded collect.
    val picked: Map[(Int, Any, Long), Double] =
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        bcNeeds.value.get(pid) match {
          case None => Iterator.empty
          case Some(needs) =>
            val cursor = scala.collection.mutable.HashMap.empty[(Int, Any), Long]
            val next = scala.collection.mutable.HashMap.empty[(Int, Any), Int]
            it.flatMap { r =>
              val k = (r.getInt(1), r.get(0))
              needs.get(k) match {
                case None => None
                case Some(local) =>
                  val i = cursor.getOrElse(k, 0L)
                  cursor(k) = i + 1
                  val ptr = next.getOrElse(k, 0)
                  if (ptr < local.length && local(ptr) == i) {
                    next(k) = ptr + 1
                    Some(((k._1, k._2, starts((pid, k)) + i), r.getDouble(2)))
                  } else None
              }
            }
        }
      }.collect().toMap

    (totals.toMap, picked)
  }
}
