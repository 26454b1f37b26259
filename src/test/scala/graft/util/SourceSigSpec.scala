package graft.util

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSpecBase

/** The r18 distributed-listing contract of [[SourceSig.fileListing]]:
  * past [[SourceSig.parallelListingDirs]] distinct parent directories
  * the per-parent metadata RPCs run as one Spark job, with byte-
  * identical results and the same RPC accounting as the sequential
  * driver loop. */
class SourceSigSpec extends SparkSpecBase {

  test("distributed listing past the parent-dir threshold: same result, counted") {
    val root = Files.createTempDirectory("sourcesig_par")
    // one seed parquet file, copied into N sibling dirs — N single-file
    // parents, each on the small-subset (getFileStatus) path
    val seedDir = root.resolve("seed")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.parquet(seedDir.toString)
    val part = Files.list(seedDir).toArray.map(_.toString)
      .filter(p => p.toString.endsWith(".parquet")).head.toString
    val nDirs = SourceSig.parallelListingDirs + 3
    val dirs = (1 to nDirs).map { i =>
      val d = root.resolve(f"d$i%03d")
      Files.createDirectories(d)
      Files.copy(Paths.get(part), d.resolve("part-0.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
      d.toString
    }
    val df = spark.read.parquet(dirs: _*)

    val calls0 = SourceSig.listingCalls.get()
    val par0 = SourceSig.parallelListings.get()
    val listed = SourceSig.fileListing(df)
    assert(SourceSig.parallelListings.get() - par0 === 1L,
      "expected the distributed listing path")
    // one getFileStatus per single-file parent
    assert(SourceSig.listingCalls.get() - calls0 === nDirs.toLong)
    assert(listed.map(_.path).length === nDirs)
    assert(listed.map(_.path) === listed.map(_.path).sorted)
    // byte-identical to a ground-truth java.io stat of the same files
    listed.foreach { f =>
      val p = Paths.get(new java.net.URI(f.path))
      assert(f.len === Files.size(p), f.path)
      assert(f.mtime === Files.getLastModifiedTime(p).toMillis, f.path)
    }
    // and the signature is stable across repeated calls
    assert(SourceSig.contentSig(df) === SourceSig.contentSig(df))
  }

  test("below the threshold the sequential driver loop serves (no job)") {
    val root = Files.createTempDirectory("sourcesig_seq")
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v").write.parquet(root.resolve("t").toString)
    val df = spark.read.parquet(root.resolve("t").toString)
    val par0 = SourceSig.parallelListings.get()
    val listed = SourceSig.fileListing(df)
    assert(SourceSig.parallelListings.get() === par0)
    assert(listed.nonEmpty)
  }
}
