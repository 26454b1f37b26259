package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev-only scale-ladder generator: expand a driver testdata directory by
  * an integer factor (default ×10: sf0.1 → "sf1") so per-query scaling
  * exponents can be MEASURED instead of argued. Output goes under
  * target/ (never into the read-only /root/testdata).
  *
  * Replication is copy-index key-shifting, designed so every operator
  * family scales its WORK linearly and none scales its RESULT
  * super-linearly (which would change the workload, not just its size):
  *
  *   - fact/dim keys shift by (max_key+1)·rep — referential integrity
  *     holds within each copy; joins never cross copies;
  *   - `nation`/`region` stay as-is (genuinely fixed-cardinality dims);
  *   - `documents` token-salts every token of copy rep>0 with `_r<rep>`:
  *     near-dup/shingle structure is preserved WITHIN a copy and shares
  *     nothing ACROSS copies — identical text copies would instead make
  *     every dedup pair count grow quadratically in the factor;
  *   - `embeddings` rotates the vector by rep positions; each full lap
  *     of rotations (rep / d) applies a per-lap ±1 SIGN PATTERN to the
  *     components (lap 0: identity; lap 1: global negation — the
  *     original scheme, so factors ≤ 2·d reproduce the r9 ladders
  *     bit-for-bit; lap ≥ 2: a deterministic xxhash64 sign per
  *     component). A sign pattern preserves norms EXACTLY and preserves
  *     within-copy cosines exactly (⟨p⊙x, p⊙y⟩ = Σ p_i² x_i y_i =
  *     ⟨x,y⟩), while copies of one base vector from different laps see
  *     ⟨p⊙x, q⊙x⟩ = Σ p_i q_i x_i² ≈ 0 — so every copy is globally
  *     distinct at ANY factor and no duplicate-vector artifact inflates
  *     near-dup output (the original scheme repeated vectors exactly
  *     beyond factor 2·d = 128 over 64 dims, which is why the ×1000
  *     sf100 embeddings carried ~8 exact copies of each distinct
  *     vector);
  *   - `events` keeps its timestamps (density grows, horizon fixed —
  *     how a busier venue looks) and shifts event/user ids.
  *
  * `runMain graft.tools.ScaleUp [srcDir] [dstDir] [factor] [tables]`
  * — `tables` is an optional comma list (e.g. `documents,embeddings`)
  * restricting which tables are generated, for single-family ladder
  * points where scaling the full schema would waste most of the disk.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val tables = args.lift(3).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.localFromEnv()
    scaleAll(spark, src, dst, factor, tables)
    spark.stop()
  }

  def scaleAll(spark: SparkSession, src: String, dst: String, factor: Int,
               tables: Option[Set[String]] = None): Unit = {
    def want(name: String): Boolean = tables.forall(_.contains(name))
    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .option("compression", "snappy").parquet(s"$dst/$name.parquet")

    /** max(key)+1 — the per-copy shift stride for one key domain. */
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).collect()(0).getLong(0) + 1L

    /** Replicate `factor`× in one pass: explode a rep index, then apply
      * per-copy column rewrites. */
    def reps(df: DataFrame): DataFrame =
      df.withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
    def shifted(c: String, s: Long) = (col(c) + col("__rep") * s).as(c)

    if (Seq("customer", "orders", "part", "supplier", "lineitem").exists(want)) {
      val custS = stride(read("customer"), "c_custkey")
      val ordS = stride(read("orders"), "o_orderkey")
      val partS = stride(read("part"), "p_partkey")
      val suppS = stride(read("supplier"), "s_suppkey")

      if (want("customer"))
        write(reps(read("customer")).select(shifted("c_custkey", custS),
          col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
          "customer", 4)
      if (want("supplier"))
        write(reps(read("supplier")).select(shifted("s_suppkey", suppS),
          col("s_name"), col("s_nationkey"), col("s_acctbal")), "supplier", 1)
      if (want("part"))
        write(reps(read("part")).select(shifted("p_partkey", partS),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
          col("p_retailprice")), "part", 4)
      if (want("orders"))
        write(reps(read("orders")).select(shifted("o_orderkey", ordS),
          shifted("o_custkey", custS), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority")), "orders", 8)
      if (want("lineitem"))
        write(reps(read("lineitem")).select(shifted("l_orderkey", ordS),
          shifted("l_partkey", partS), shifted("l_suppkey", suppS),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate")), "lineitem", 16)
    }

    // dims copied as-is
    if (want("region"))
      read("region").write.mode("overwrite").parquet(s"$dst/region.parquet")
    if (want("nation"))
      read("nation").write.mode("overwrite").parquet(s"$dst/nation.parquet")

    // events: session reads TIMESTAMP(NANOS) as long (nanosAsLong);
    // the scaled copy stores the same epoch-nanos as plain INT64, which
    // Tables.events handles identically.
    if (want("events")) {
      val ev = read("events")
      val evS = stride(ev, "event_id")
      val userS = stride(ev, "user_id")
      write(reps(ev).select(shifted("event_id", evS), col("ts"),
        shifted("user_id", userS), col("event_type"), col("value"),
        col("props")), "events", 8)
    }

    if (want("documents")) {
      val docs = read("documents")
      val docS = stride(docs, "doc_id")
      val salted = when(col("__rep") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit("_r"), col("__rep"))), " "))
      write(reps(docs).select(shifted("doc_id", docS), salted.as("text"),
        col("lang"), col("source"), length(salted).cast("long").as("n_chars")),
        "documents", 8)
    }

    if (want("embeddings")) {
      val emb = read("embeddings")
      val vecS = stride(emb, "vec_id")
      val d = size(col("embedding"))
      val rot = col("__rep") % d
      val rotated = when(rot === 0, col("embedding")).otherwise(
        concat(slice(col("embedding"), rot + 1, d - rot),
          slice(col("embedding"), lit(1), rot)))
      // per-lap sign pattern (see scaladoc): lap 0 identity and lap 1
      // global negation reproduce the original ≤2d scheme bit-for-bit;
      // later laps get deterministic per-component xxhash64 signs, so
      // copies stay globally distinct at any factor while norms and
      // within-copy cosines are preserved exactly
      val lap = (col("__rep") / d).cast("int")
      val placed = when(lap === 0, rotated)
        .when(lap === 1, transform(rotated, x => -x))
        .otherwise(transform(rotated, (x, i) =>
          when(pmod(xxhash64(lap, i), lit(2)) === 0, x).otherwise(-x)))
      write(reps(emb).select(shifted("vec_id", vecS),
        placed.as("embedding"), col("label")), "embeddings", 4)
    }
  }
}
