package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Opt-in re-run of the size-route scale witnesses (round-9 evidence:
  * 74M real simhash edges take the star-alternation CC branch, 10.4M
  * real eval hashes take the contamination inverted-index branch, both
  * with diff=0 parity against the bounded branches). Heavy by design —
  * gated behind `SPARK_GRAFT_SCALE_SPECS=1` so `sbt test` stays fast:
  *
  *   SPARK_GRAFT_SCALE_SPECS=1 sbt "testOnly graft.tools.RouteScaleSpec"
  *
  * Missing witness corpora are generated on demand with [[ScaleUp]]
  * (documents only): ×10 of sf0.1 for CC (~50k docs saturate 16-bit
  * simhash past the 4M-edge cap), ×200 for contamination (1M docs,
  * 25% eval slice > 8M distinct 13-gram hashes). Uses its own
  * `local[32]` session (the scale session, not the 4-thread spec one).
  */
class RouteScaleSpec extends AnyFunSuite {

  private val optIn = sys.env.get("SPARK_GRAFT_SCALE_SPECS").contains("1")

  private lazy val spark = graft.GraftSession.localFromEnv()

  /** Generate `dstDir/documents.parquet` via ScaleUp if absent. */
  private def ensureDocs(dstDir: String, factor: Int): String = {
    val p = java.nio.file.Paths.get(s"$dstDir/documents.parquet")
    if (!java.nio.file.Files.exists(p))
      ScaleUp.scaleAll(spark, "/root/testdata/sf0.1", dstDir, factor,
        Some(Set("documents")))
    dstDir
  }

  test("CC route: real edge volume picks star-alternation, parity diff 0") {
    assume(optIn, "set SPARK_GRAFT_SCALE_SPECS=1 to run the scale witnesses")
    val w = RouteScale.ccWitness(spark, ensureDocs("target/sf1", 10))
    info(s"edges=${w.edges} cap=${w.cap} route=${w.route} " +
      f"sec=${w.sec}%.1f ufSec=${w.ufSec}%.1f labels=${w.labels}")
    assert(w.edges > w.cap, "corpus no longer crosses the union-find cap")
    assert(w.rounds > 0, "distributed star-alternation branch not taken")
    assert(w.parityDiff === 0L)
  }

  test("contamination route: real hash volume picks the join, parity diff 0") {
    assume(optIn, "set SPARK_GRAFT_SCALE_SPECS=1 to run the scale witnesses")
    val w = RouteScale.contaminationWitness(spark,
      ensureDocs("target/sf20docs", 200))
    info(s"eval_hashes=${w.evalHashes} cap=${w.cap} route=${w.route} " +
      f"sec=${w.sec}%.1f bcSec=${w.bcSec}%.1f rows=${w.rows}")
    assert(w.evalHashes > w.cap, "eval slice no longer crosses the cap")
    assert(w.route === "inverted-index join")
    assert(w.parityDiff === 0L)
  }
}
