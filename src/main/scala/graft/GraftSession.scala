package graft

import org.apache.spark.sql.SparkSession

/** Single place where graft sessions are constructed, so engine-required
  * configs are set at SESSION BUILD time, never mutated mid-query:
  *
  *   - `nanosAsLong`: the `events` table carries TIMESTAMP(NANOS), which
  *     Spark's TimestampType (micros) cannot represent — read the raw
  *     INT64 instead (see [[Tables.events]]);
  *   - `shuffle.partitions` sized to the core count (local mode; a real
  *     cluster sizes this to executors × cores with AQE coalescing);
  *   - AQE partition coalescing off: the small local shuffles here are
  *     compute-dense (md5/cosine), and coalescing to 1 partition would
  *     serialize that work;
  *   - AQE runtime SMJ→SHJ conversion ON (`maxShuffledHashJoinLocal
  *     MapThreshold`): joins whose build side turns out small at runtime
  *     (dedup verify stages — candidate-sized builds) become hash joins
  *     with no sort, while genuinely large builds stay sort-merge and
  *     spill instead of OOMing in `HashedRelation`. This replaces the
  *     static SHUFFLE_HASH hints the dedup family used to carry: a hint
  *     cannot see runtime sizes, and the sf100 ladder showed both
  *     failure modes (docs-sized build OOM, then a 30M-candidate build
  *     OOM on the q27 verify);
  *   - UTC so timestamp functions agree with the DuckDB oracle.
  */
object GraftSession {

  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      // deployment-grade extension wiring: custom functions, the native
      // as-of planner strategy, and the ASOF JOIN parser/resolution pair
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // Default: one shuffle partition per core (the driver contract at
      // sf0.1). SPARK_GRAFT_SHUFFLE_PARTITIONS overrides for scale-ladder
      // runs: a cluster sizes partition count to DATA (executors × cores,
      // or AQE), and holding it at 32 while data grows 100× grows every
      // per-task working set 100× — the sf100 census measured the result
      // as ×52 GC growth on exactly-linear work and shuffle volume.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
      // Shuffle files are deleted only when the driver GCs the dependency
      // objects; the default periodic-GC interval (30 min) lets a
      // multi-run bench session accumulate every completed run's shuffle
      // output on disk — the 4M-vector q84 ladder run filled the disk
      // with ~6 finished runs' files before its own shuffle could write.
      // 5 min bounds the on-disk footprint to roughly one run's worth.
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** cpus from SPARK_GRAFT_CPUS (default 4 — the driver contract). */
  def localFromEnv(): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
}
