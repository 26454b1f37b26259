package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType,
  LongType, ShortType, StringType, StructField, StructType}
import graft.functions.SortedCommonCount.sortedCommonCount

/** Document deduplication for large-scale training-data pipelines:
  * exact, n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Hash-function choice: every hash here is `md5` (hex string) or an
  * integer derived from an md5 prefix. md5 is deterministic, identical
  * across engines (which makes the DuckDB oracle exact), and uniformly
  * distributed — MinHash only needs a random-looking total order per seed,
  * and lexicographic order over md5 hex provides one.
  *
  * Scale: all stages are hash-partitioned group-bys / joins on
  * shingle or signature keys — no driver-side state, no cross join.
  * The only quadratic step is *within candidate buckets*, which is the
  * point of LSH banding: at 100 TB the band-bucket join replaces the
  * O(n²) pairwise scan with an O(candidates) one.
  */
object Dedup {

  /** Word tokens with position, one row per (id, pos, token). */
  def tokens(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), posexplode(split(col(text), " ")).as(Seq("pos", "token")))

  /** Distinct word n-gram shingles per document (default n=3).
    * Computed array-natively (`transform` over the split token array) so
    * shingling is a pure per-row map — the previous posexplode + window
    * `lead` version shuffled the whole token stream once per call just to
    * line up adjacent tokens that were already adjacent in the array.
    * The only shuffle left is the `distinct()`.
    *
    * Deliberate trade-off: `transform` is a higher-order function
    * (interpreted, no whole-stage codegen for this projection), but
    * dropping a full shuffle of the token stream dominates the
    * interpreted-lambda cost at every scale measured (q28 17s → ~3s). */
  def shingles(df: DataFrame, id: String, text: String, n: Int = 3): DataFrame = {
    val arr = split(col(text), " ")
    df.select(col(id), explode(when(size(arr) >= n,
        transform(sequence(lit(0), size(arr) - n),
          i => concat_ws(" ", slice(arr, i + lit(1), lit(n))))))
        .as("shingle"))
      .distinct()
  }

  /** Exact dedup: canonical (min id) representative per identical text.
    * The classic hash-groupBy — one shuffle on the digest. */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("digest"))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Default document-frequency cap for shingles (see [[capByDf]]):
    * high enough to be a no-op on corpora smaller than it (df can never
    * exceed the doc count), so small-scale results and oracles are
    * unchanged, while at 100 TB it bounds every posting list. */
  val DefaultMaxDf = 10000

  /** Drop stop-shingles: shingles whose DOCUMENT FREQUENCY exceeds
    * `maxDf` are removed from the shingle set entirely (pair generation,
    * sizes, and common counts all see the capped universe — the standard
    * production-dedup semantics; a phrase shared by everyone carries no
    * discriminative signal).
    *
    * This is the skew guard for the inverted-index joins: a posting list
    * is quadratic WITHIN its bucket, so one boilerplate phrase shared by
    * 1M docs would otherwise emit 10¹² candidate pairs in one task.
    * After the cap, per-shingle pair fan-out is ≤ maxDf², independent of
    * corpus size. The df aggregation and anti-join hash on `shingle` —
    * the same key the downstream self-join shuffles on — so the guard
    * rides the exchange the join needed anyway. */
  private[dedup] def capByDf(sh: DataFrame, maxDf: Int): DataFrame = {
    val hot = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select("shingle")
    sh.join(hot, Seq("shingle"), "left_anti")
  }

  /** [[shingles]] with the [[capByDf]] stop-shingle guard applied. */
  def cappedShingles(df: DataFrame, id: String, text: String, n: Int = 3,
                     maxDf: Int = DefaultMaxDf): DataFrame =
    capByDf(shingles(df, id, text, n), maxDf)

  /** 60-bit md5-derived shingle hash (first 15 hex chars as BIGINT — the
    * same convention as [[simhash]] token hashes, reproducible in SQL as
    * `('0x' || substr(md5(shingle), 1, 15))::BIGINT`).
    *
    * Every join stage downstream of shingling keys on this LONG instead
    * of the shingle string: the distinct, the df cap, and the
    * inverted-index self-join all shuffle 8-byte keys instead of
    * ~25-byte text — a multiple off every exchange in the dedup family.
    * Collisions (≈ per-doc-pairs/2⁶⁰) are mirrored exactly by the oracle,
    * which hashes the same way. */
  private[dedup] def shingleHash: Column =
    conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long")

  /** Hashed [[cappedShingles]]: (id, shingle: long). */
  private def hashedShingles(df: DataFrame, id: String, text: String, n: Int,
                             maxDf: Int): DataFrame =
    capByDf(shingles(df, id, text, n)
      .select(col(id), shingleHash.as("shingle")), maxDf)

  /** In-kernel ordering for the pair-generation id column. Integral ids
    * compare numerically; string ids compare as UTF-8 bytes — the SAME
    * order as Spark's `Column <` (UTF8String binary) and DuckDB's default
    * collation, so the emitted id_a < id_b orientation matches what an
    * equivalent SQL self-join would produce. Anything else is rejected
    * LOUDLY at plan-build time: a silent cast (the old behavior) turned
    * non-numeric ids into nulls at runtime and changed the output id type
    * for every caller. */
  private def idOrdering(dt: DataType): Ordering[Any] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Ordering.by((v: Any) => v.asInstanceOf[Number].longValue)
    case StringType => new Ordering[Any] {
      override def compare(x: Any, y: Any): Int = {
        val a = x.asInstanceOf[String]
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val b = y.asInstanceOf[String]
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        java.lang.Integer.compare(a.length, b.length)
      }
    }
    case other => throw new IllegalArgumentException(
      s"pair-generation id column must be integral or string, got $other " +
        "(ids are ordered in-kernel and keep their type in id_a/id_b)")
  }

  /** One-shuffle capped posting-list builder: groups the (id, shingle)
    * stream by shingle, drops lists longer than `maxDf` (the [[capByDf]]
    * stop-shingle semantics) and emits every surviving row with its
    * list length attached as `__df`. Replaces the df-aggregate + join
    * form, which computed the shingle stream TWICE (once per join side)
    * and paid two extra exchanges for the same information. Memory is
    * bounded under adversarial skew: a hot posting list stops buffering
    * at maxDf+1 entries and is skipped without ever materializing. */
  private[dedup] def cappedPostings(sh: DataFrame, id: String, idType: DataType,
                             maxDf: Int): DataFrame = {
    val outSchema = StructType(Seq(StructField(id, idType),
      StructField("shingle", LongType), StructField("__df", LongType)))
    sh.select(col("shingle"), col(id))
      .groupByKey((r: Row) => r.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (shingle: Long, it: Iterator[Row]) =>
        val buf = new scala.collection.mutable.ArrayBuffer[Any](16)
        var overflow = false
        while (it.hasNext && !overflow) {
          buf += it.next().get(1)
          if (buf.length > maxDf) overflow = true
        }
        if (overflow) Iterator.empty
        else {
          val df = buf.length.toLong
          buf.iterator.map(idv => Row(idv, shingle, df))
        }
      }(Encoders.row(outSchema))
  }

  /** Per-doc arrays for the PPJoin pipeline, built in one grouped pass
    * over the capped postings plus a JVM map:
    *
    *   - `arr` — shingle hashes sorted by VALUE: the
    *     [[graft.functions.SortedCommonCount]] contract for the verify
    *     stage's two-pointer intersection;
    *   - `pre` — the PPJoin prefix: the first |S|−⌈t·|S|⌉+1 shingles in
    *     (global df asc, hash) order, i.e. the doc's RAREST shingles,
    *     so prefix posting lists stay short;
    *   - `sz` — capped distinct-shingle count.
    *
    * Both sorts run per doc in the JVM on primitive arrays — the earlier
    * Catalyst `array_sort(collect_list(struct(...)))` form paid an
    * interpreted struct comparator per element across the whole stream. */
  private[dedup] def ppjoinDocs(postings: DataFrame, id: String, idType: DataType,
                         threshold: Double): DataFrame = {
    val grouped = postings.groupBy(col(id))
      .agg(collect_list(struct(col("__df"), col("shingle"))).as("__parr"),
        count(lit(1)).as("sz"))
    val outSchema = StructType(Seq(StructField(id, idType),
      StructField("arr", ArrayType(LongType, containsNull = false)),
      StructField("pre", ArrayType(LongType, containsNull = false)),
      StructField("sz", LongType)))
    grouped.map { r =>
      val parr = r.getSeq[Row](1)
      val n = parr.length
      val dfs = new Array[Long](n); val hs = new Array[Long](n)
      var k = 0
      while (k < n) {
        val s = parr(k); dfs(k) = s.getLong(0); hs(k) = s.getLong(1); k += 1
      }
      val idx: Array[Integer] = Array.tabulate(n)(Integer.valueOf(_))
      java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
        override def compare(x: Integer, y: Integer): Int = {
          val c = java.lang.Long.compare(dfs(x), dfs(y))
          if (c != 0) c else java.lang.Long.compare(hs(x), hs(y))
        }
      })
      val p = math.max(1, math.min(n,
        n - math.ceil(threshold * n - 1e-9).toInt + 1))
      val pre = new Array[Long](p)
      k = 0
      while (k < p) { pre(k) = hs(idx(k)); k += 1 }
      val arr = hs.clone()
      java.util.Arrays.sort(arr)
      Row(r.get(0), arr, pre, n.toLong)
    }(Encoders.row(outSchema))
      .toDF()
  }

  /** Exact-Jaccard verification of candidate (id_a < id_b) pairs against
    * per-doc shingle arrays — IN-KERNEL set intersection instead of the
    * old double equi-join + `groupBy(id_a, id_b)` count, which shuffled
    * every (pair, shared-shingle) occurrence. Here the only moved rows
    * are the candidates themselves (joined twice against the linear-size
    * array table); the intersection is computed where the pair lands.
    * This was the last measured super-linear stage in the dedup family
    * (sf10 exponents 0.72/0.79): the pair-occurrence stream is gone.
    *
    * Physical shape, tuned from the sf10 stage probe:
    *   - `sorted_common_count` (native codegen two-pointer merge over the
    *     value-sorted arrays) instead of `size(array_intersect(...))`,
    *     whose hash set boxes every element — the probe's single biggest
    *     cost;
    *   - SHUFFLE_HASH hints on the docs side: a sort-merge join would
    *     sort the fat array payloads (and spill them) on every join; the
    *     hash join builds a per-partition map over the linear-size docs
    *     table and streams the candidates through.
    *
    * 2⁻⁶⁰-probability caveat, mirrored nowhere: two DIFFERENT shingles of
    * the SAME doc colliding to one 60-bit hash would make the set
    * intersection count 1 where the old join form counted the
    * multiplicity product. At ~10³ shingles/doc the per-doc probability
    * is ~10⁻¹², and the DuckDB oracle's join form would diverge
    * identically from the true string-shingle Jaccard. */
  private[dedup] def verifyJaccardArrays(docs: DataFrame, id: String,
                                  cand: DataFrame,
                                  threshold: Double): DataFrame =
    cand
      .join(docs.select(col(id).as("id_a"), col("arr").as("__arr_a"),
        col("sz").as("sz_a")).hint("shuffle_hash"), Seq("id_a"))
      .join(docs.select(col(id).as("id_b"), col("arr").as("__arr_b"),
        col("sz").as("sz_b")).hint("shuffle_hash"), Seq("id_b"))
      .withColumn("common",
        sortedCommonCount(col("__arr_a"), col("__arr_b")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** PPJoin candidate generation over exploded prefixes
    * (shingle, __id, pos, sz): one `groupByKey(shingle)` pass emits the
    * ordered pairs of each PREFIX posting list, pruned by the two PPJoin
    * bounds before anything is shuffled:
    *
    *   - length: jaccard ≥ t needs min(szA,szB) ≥ t·max(szA,szB)
    *     (common ≤ min, union ≥ max);
    *   - positional: a pair first meeting at 0-based prefix positions
    *     (pA, pB) has common ≤ 1 + min(szA−1−pA, szB−1−pB); prune when
    *     that bound is below the required ⌈t·(szA+szB)/(1+t)⌉. Pruning
    *     is per-occurrence and the FIRST shared shingle of a true pair
    *     always survives both bounds (its bound ≥ the true overlap), so
    *     no true pair is lost.
    *
    * All bounds carry ε-slack: FP rounding may only loosen them, never
    * tighten — extra candidates are killed by the exact verify.
    *
    * Long ids (the common case) take a fully PRIMITIVE tuple-encoder
    * path — the generic Row path boxes every field access, measured as
    * a real fraction of the candidate stage at sf10. Both paths emit
    * identical pairs. */
  private[dedup] def ppjoinCandidates(prefixed: DataFrame, idType: DataType,
                               threshold: Double): DataFrame = idType match {
    case LongType => ppjoinCandidatesLong(prefixed, threshold)
    case _ => ppjoinCandidatesGeneric(prefixed, idType, threshold)
  }

  private def ppjoinCandidatesLong(prefixed: DataFrame,
                                   threshold: Double): DataFrame = {
    val spark = prefixed.sparkSession
    import spark.implicits._
    val eps = 1e-9
    prefixed
      .select(col("shingle"), col("__id"), col("pos"), col("sz"))
      .as[(Long, Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        java.util.Arrays.sort(rows,
          new java.util.Comparator[(Long, Long, Int, Long)] {
            override def compare(x: (Long, Long, Int, Long),
                                 y: (Long, Long, Int, Long)): Int =
              java.lang.Long.compare(x._2, y._2)
          })
        for {
          i <- rows.indices.iterator
          j <- (i + 1 until rows.length).iterator
          if rows(i)._2 != rows(j)._2
          szA = rows(i)._4; szB = rows(j)._4
          if math.min(szA, szB) >= threshold * math.max(szA, szB) - eps
          minOv = math.ceil(threshold / (1.0 + threshold) * (szA + szB) - eps)
          ub = 1.0 + math.min(szA - 1 - rows(i)._3, szB - 1 - rows(j)._3)
          if ub >= minOv
        } yield (rows(i)._2, rows(j)._2)
      }
      .toDF("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  private def ppjoinCandidatesGeneric(prefixed: DataFrame, idType: DataType,
                                      threshold: Double): DataFrame = {
    val ord = idOrdering(idType)
    val outSchema = StructType(Seq(
      StructField("id_a", idType), StructField("id_b", idType)))
    val eps = 1e-9
    prefixed
      .select(col("shingle"), col("__id"), col("pos"), col("sz"))
      .groupByKey((r: Row) => r.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (_: Long, it: Iterator[Row]) =>
        val rows = it.toArray
        java.util.Arrays.sort(rows, new java.util.Comparator[Row] {
          override def compare(r1: Row, r2: Row): Int =
            ord.compare(r1.get(1), r2.get(1))
        })
        for {
          i <- rows.indices.iterator
          j <- (i + 1 until rows.length).iterator
          if rows(i).get(1) != rows(j).get(1)
          szA = rows(i).getLong(3); szB = rows(j).getLong(3)
          if math.min(szA, szB) >= threshold * math.max(szA, szB) - eps
          minOv = math.ceil(threshold / (1.0 + threshold) * (szA + szB) - eps)
          ub = 1.0 + math.min(szA - 1 - rows(i).getInt(2),
                              szB - 1 - rows(j).getInt(2))
          if ub >= minOv
        } yield Row(rows(i).get(1), rows(j).get(1))
      }(Encoders.row(outSchema))
      .dropDuplicates("id_a", "id_b")
  }

  /** Pairwise n-gram Jaccard similarity ≥ threshold — FULL PPJoin
    * (prefix + length + positional filtering, Xiao et al., WWW'08) with
    * in-kernel array verification. Emits (id_a < id_b, jaccard); id_a/
    * id_b keep the input id type (integral or string — anything else is
    * rejected loudly, see [[idOrdering]]).
    *
    * Shape — TWO full-stream shuffles, everything else linear in the
    * prefix stream or candidate count:
    *   1. [[cappedPostings]]: one `groupByKey(shingle)` pass computes
    *      document frequencies, applies the stop-shingle cap, and emits
    *      df-attached postings (the old df-aggregate + join form
    *      computed the shingle stream twice);
    *   2. [[ppjoinDocs]]: one `groupBy(id)` pass builds each doc's
    *      value-sorted array (verify contract) and its (df asc, hash)
    *      PPJoin prefix;
    *   3. prefix explode — each doc indexes only its RAREST shingles;
    *   4. [[ppjoinCandidates]]: per-prefix-posting-list pair emission
    *      with length + positional bounds;
    *   5. [[verifyJaccardArrays]]: native sorted-merge intersection,
    *      hash-joined — no pair-occurrence shuffle, no array sorts.
    *
    * History (measured, recorded so it isn't relitigated): round 4's
    * PREFIX-ONLY attempt with the old join-based verify ran 3× SLOWER
    * than direct common-counting — loose candidates, each exploded by
    * both full shingle lists in the verify join. The direct form then
    * became the bottleneck at sf10 (exponent 0.72: its per-posting-list
    * pair stream must be shuffled to count commons). Full PPJoin attacks
    * the candidates (df-ordered prefixes + both bounds), the array
    * verify attacks the explosion (no pair-occurrence shuffle at all).
    *
    * `maxDf` caps shingle document frequency ([[capByDf]] semantics):
    * similarity is computed over the capped shingle universe, keeping
    * per-posting-list fan-out bounded under adversarial skew. */
  def ngramJaccard(df: DataFrame, id: String, text: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDf: Int = DefaultMaxDf): DataFrame = {
    val idType = df.schema(id).dataType
    idOrdering(idType) // loud type validation up-front, both kernel paths
    val shAll = shingles(df, id, text, n)
      .select(col(id), shingleHash.as("shingle"))
    val postings = cappedPostings(shAll, id, idType, maxDf)
    val docs = ppjoinDocs(postings, id, idType, threshold).cache()
    val prefixed = docs.select(col(id).as("__id"), col("sz"),
      posexplode(col("pre")).as(Seq("pos", "shingle")))
    val cand = ppjoinCandidates(prefixed, idType, threshold)
    verifyJaccardArrays(docs.select(col(id), col("arr"), col("sz")),
      id, cand, threshold)
  }

  /** The round-5 DIRECT form of [[ngramJaccard]], kept as the parity
    * witness for the PPJoin path (DedupSpec proves result equality on
    * clustered corpora at several thresholds): inverted index → ALL
    * co-occurring pairs via a two-sided self-join (the oracle's own
    * shape, generic over id types) → common counts → inclusion-exclusion.
    * Correct and fully distributed, but its pair-occurrence stream is
    * super-linear on one box (sf10 exponent 0.72) — use [[ngramJaccard]]. */
  private[dedup] def ngramJaccardDirect(df: DataFrame, id: String, text: String,
                                        n: Int = 3, threshold: Double = 0.5,
                                        maxDf: Int = DefaultMaxDf): DataFrame = {
    val sh = hashedShingles(df, id, text, n, maxDf)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val common = sh.select(col(id).as("id_a"), col("shingle"))
      .join(sh.select(col(id).as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col(id).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(id).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Mersenne prime 2^31-1: universal-hash modulus for the minhash family.
    * Operands stay < 2^31 so products stay < 2^62 — no 64-bit overflow in
    * either engine (Spark 4 ANSI mode and DuckDB both *throw* on BIGINT
    * overflow rather than wrapping, so wrap-around mixing is not portable). */
  val MinhashP = 2147483647L

  /** Deterministic (a, b) constants per seed for the universal hash family
    * h_s(x) = (a_s·x + b_s) mod P — derived from a fixed LCG so the Spark
    * side and the DuckDB oracle inline identical literals. */
  def minhashParams(numHashes: Int): Seq[(Long, Long)] = {
    var x = 0x5DEECE66DL
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33) % (MinhashP - 1) }
    (0 until numHashes).map(_ => (next() + 1, next()))
  }

  /** MinHash signatures over HASHED shingles ((id, shingle: long) rows,
    * see [[shingleHash]]): slot s = min((a_s·(h mod P) + b_s) mod P) over
    * the doc's shingles. All `numHashes` slots are parallel aggregate
    * columns in ONE pass (map-side partial min, one shuffle of
    * id × numHashes longs) — no row explosion, and the expensive hash
    * (md5) ran once per shingle upstream; the per-slot work here is pure
    * integer arithmetic. Output: one row per id, columns mh_0 … mh_{n-1}. */
  def minhash(sh: DataFrame, id: String, numHashes: Int): DataFrame = {
    val aggs = minhashParams(numHashes).zipWithIndex.map { case ((a, b), s) =>
      min((col("__h") * a + b) % MinhashP).as(s"mh_$s")
    }
    sh.withColumn("__h", col("shingle") % MinhashP)
      .groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banded near-dup detection.
    * Bands of `rowsPerBand` signature slots; docs sharing any full band
    * signature become candidates; candidates are verified with exact
    * shingle Jaccard ≥ threshold via [[verifyJaccardArrays]] — the
    * in-kernel set intersection, so the verify stage moves only the
    * candidate rows (the old join form's (pair, shared-shingle) stream
    * was this operator's sf10 bottleneck, exponent 0.79).
    *
    * TWO full-stream shuffles total: [[cappedPostings]] (df cap), then
    * ONE `groupBy(id)` computing minhash slots AND the verify stage's
    * value-sorted shingle array AND the set size together. The round-5
    * form paid four (df agg, cap anti-join, signature agg, array agg) —
    * signatures and arrays want exactly the same exchange, so they
    * share it.
    *
    * `maxDf` guards BOTH skew surfaces: the signature pass (hot shingles
    * would dominate every doc's minhash slots) and the verify stage's
    * per-doc arrays. Signatures and Jaccard both see the capped
    * universe, so candidates and verification stay consistent. */
  def minhashLsh(df: DataFrame, id: String, text: String, n: Int = 3,
                 numHashes: Int = 12, rowsPerBand: Int = 3,
                 threshold: Double = 0.5,
                 maxDf: Int = DefaultMaxDf): DataFrame = {
    val idType = df.schema(id).dataType
    val shAll = shingles(df, id, text, n)
      .select(col(id), shingleHash.as("shingle"))
    val postings = cappedPostings(shAll, id, idType, maxDf)
    val mhAggs = minhashParams(numHashes).zipWithIndex.map { case ((a, b), s) =>
      min((col("__h") * a + b) % MinhashP).as(s"mh_$s")
    } ++ Seq(array_sort(collect_list(col("shingle"))).as("arr"),
      count(lit(1)).as("sz"))
    val mh = postings.withColumn("__h", col("shingle") % MinhashP)
      .groupBy(col(id)).agg(mhAggs.head, mhAggs.tail: _*)
      .cache()
    val nBands = numHashes / rowsPerBand
    // band signature = the band's minhash slots joined in seed order;
    // stack() melts the wide row into (band, sig) rows for the bucket join.
    val sigCols = (0 until nBands).map { b =>
      val slots = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(s => col(s"mh_$s").cast("string"))
      concat_ws("|", slots: _*).as(s"__sig$b")
    }
    val stacked = mh.select(col(id) +: sigCols: _*)
      .select(col(id), expr(s"stack($nBands, " +
        (0 until nBands).map(b => s"$b, __sig$b").mkString(", ") +
        ") as (band, sig)"))
    val bandSig = stacked.select(col(id), col("band"), col("sig"))
    val cand = bandSig.select(col(id).as("id_a"), col("band"), col("sig"))
      .join(bandSig.select(col(id).as("id_b"), col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify candidates with exact Jaccard, in-kernel, against the
    // arrays that rode the signature exchange
    verifyJaccardArrays(mh.select(col(id), col("arr"), col("sz")),
      id, cand, threshold)
  }

  /** SimHash fingerprint over distinct tokens, `bits` ≤ 60.
    * Token hash = first 15 md5 hex chars as a 60-bit int (wide enough for
    * production-grade 60-bit fingerprints — banding over narrow
    * fingerprints collides catastrophically on clustered corpora; 15 hex
    * chars stay safely inside BIGINT range in both engines); each bit
    * votes ±1; fingerprint bit = majority (sum > 0). All bit votes are
    * parallel aggregate columns in ONE groupBy pass (map-side partial
    * sums) — no bits× row explosion. Returns (id, simhash: long). */
  def simhash(df: DataFrame, id: String, text: String, bits: Int = 16): DataFrame = {
    require(bits <= 60, s"simhash supports at most 60 bits, got $bits")
    val toks = tokens(df, id, text).select(col(id), col("token")).distinct()
      .withColumn("h", conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"))
    val voteAggs = (0 until bits).map { b =>
      sum(when(expr(s"shiftright(h, $b) & 1") === 1L, 1).otherwise(-1)).as(s"__v$b")
    }
    val voted = toks.groupBy(col(id)).agg(voteAggs.head, voteAggs.tail: _*)
    val fp = (0 until bits)
      .map(b => when(col(s"__v$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    voted.select(col(id), fp.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist.
    * Candidate generation is the pigeonhole banding used at scale: split
    * the fingerprint into maxDist+1 bit segments — any pair within maxDist
    * must agree exactly on ≥1 segment — and equi-join on (segment, value).
    * No cartesian product anywhere.
    *
    * The fingerprints RIDE THROUGH the segment join (8 bytes each), so
    * hamming computes and filters in the join stage itself — candidates
    * failing the distance cut die before the dedup `distinct`, and there
    * is no join-back to the fingerprint table. The earlier form
    * distinct-ed the full candidate set, then joined fingerprints on
    * twice; carrying 16 bytes is far cheaper than moving every candidate
    * pair two more times. */
  def simhashPairs(df: DataFrame, id: String, text: String,
                   bits: Int = 16, maxDist: Int = 3): DataFrame = {
    val sh = simhash(df, id, text, bits)
    val nSeg = maxDist + 1
    val segBits = bits / nSeg
    require(segBits > 0, "bits must exceed maxDist")
    val segs = sh.sparkSession.range(nSeg).select(col("id").as("seg"))
    val banded = sh.crossJoin(broadcast(segs))
      .withColumn("seg_val",
        expr(s"shiftright(simhash, cast(seg * $segBits as int)) % ${1L << segBits}"))
    val a = banded.select(col(id).as("id_a"), col("simhash").as("sh_a"),
      col("seg"), col("seg_val"))
    val b = banded.select(col(id).as("id_b"), col("simhash").as("sh_b"),
      col("seg"), col("seg_val"))
    a.join(b, Seq("seg", "seg_val"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist) // prune BEFORE the pair dedup
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }
}
