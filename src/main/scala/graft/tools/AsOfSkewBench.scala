package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.AsOfJoin

/** Dev-only skew bench: plain vs salted backward as-of on a ONE-SYMBOL
  * stream (the reference's signal streams are per-symbol, so the hot-key
  * case is the NORMAL case, not an adversarial one). q73 already proves
  * the two paths result-equal; this main records the performance claim
  * that motivates the salted variant — the plain union+window puts the
  * whole key in one task, the salted one spreads it by time bucket.
  *
  * `runMain graft.tools.AsOfSkewBench [nTicks] [nSignals] [buckets]`
  * (defaults 5M / 50k / 256). Prints median-of-3 seconds per variant.
  */
object AsOfSkewBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nSig = args.lift(1).map(_.toLong).getOrElse(50000L)
    val buckets = args.lift(2).map(_.toLong).getOrElse(256L)
    val spark = GraftSession.localFromEnv()
    import spark.implicits._

    val stepMs = 7L
    val ticks = spark.range(n).select(lit("EURUSD").as("sym"),
      (col("id") * stepMs).as("ts"), col("id").as("tick_id")).cache()
    val signals = spark.range(nSig).select(lit("EURUSD").as("sym"),
      (col("id") * (n * stepMs / nSig)).as("ts"), col("id").as("sig")).cache()
    ticks.count(); signals.count() // materialize inputs out of the timing

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[asof-skew] $label: runs ${ts.map(t => f"$t%.2f").mkString(" ")} median ${ts(1)}%.2f s")
      ts(1)
    }

    val plain = time("plain backward (hot key -> one task)") {
      AsOfJoin.backward(ticks, signals, Seq("sym"), "ts", "ts", Seq("sig"))
    }
    val salted = time(s"salted backward ($buckets buckets)") {
      AsOfJoin.backwardSalted(ticks, signals, Seq("sym"), "ts", "ts", Seq("sig"),
        bucketMs = n * stepMs / buckets)
    }
    println(f"""{"bench":"asof_hot_key","n_ticks":$n,"n_signals":$nSig,""" +
      f""""plain_sec":$plain%.3f,"salted_sec":$salted%.3f,""" +
      f""""speedup":${plain / salted}%.2f}""")
    spark.stop()
  }
}
