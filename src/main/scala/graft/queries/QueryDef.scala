package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gated query: a Spark implementation plus (optionally)
  * the equivalent SQL the driver runs in DuckDB over the same parquet
  * tables. Conventions that make the hash-compare deterministic:
  *   - every computed column is aliased identically on both sides;
  *   - every float aggregate is `round(...)`ed identically on both sides
  *     (absorbs summation-order ULP differences between engines);
  *   - every result carries a total-order `ORDER BY` on both sides;
  *   - `first`/`last` semantics are always resolved via `row_number` over a
  *     unique (ts, id) ordering — never engine-dependent aggregates.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    description: String)

trait QueryPack {
  def queries: Seq[(String, QueryDef)]

  /** Spread a single-file input across cores before row-local heavy
    * compute (md5/tokenize/hash). The testdata tables are one row group
    * each, so the scan yields ONE partition and everything downstream of
    * it that doesn't shuffle would run single-threaded. An explicit
    * round-robin repartition survives AQE.
    *
    * GATED on the scan's actual split count: when the reader already
    * supplies enough partitions (any real multi-file/cluster input), the
    * repartition would be a gratuitous full shuffle — so it is skipped. */
  protected def balanced(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= par) df else df.repartition(par)
  }
}
