package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Training-shard assignment: exact model parity (md5 fold → mod →
  * within-shard hash order), dense 0-based positions, determinism, and
  * partitioning independence. */
class ShardsSpec extends SparkSpecBase {

  import spark.implicits._

  /** Driver-side model: the family 60-bit md5 fold. */
  private def fold(k: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(k.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def model(keys: Seq[Long], s: Int): Map[Long, (Int, Long)] =
    keys.map(k => (k, fold(k))).groupBy { case (_, h) => (h % s).toInt }
      .flatMap { case (shard, members) =>
        members.sortBy { case (k, h) => (h, k) }.zipWithIndex
          .map { case ((k, _), pos) => k -> ((shard, pos.toLong)) }
      }

  test("assignment matches the driver-side model exactly") {
    val keys = (0L until 500L)
    val got = Shards.assign(keys.toDF("seq_id"), "seq_id", 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === model(keys, 8))
  }

  test("positions are dense 0..n-1 per shard; every key exactly once") {
    val keys = (0L until 977L)
    val rows = Shards.assign(keys.toDF("seq_id"), "seq_id", 13).collect()
    assert(rows.length === 977)
    assert(rows.map(_.getLong(0)).toSet === keys.toSet)
    rows.groupBy(_.getInt(1)).foreach { case (shard, members) =>
      assert(members.map(_.getLong(2)).sorted.toSeq ===
        (0L until members.length.toLong), s"shard $shard positions not dense")
    }
  }

  test("assignment is independent of input partitioning") {
    val df = (0L until 400L).toDF("seq_id")
    val one = Shards.assign(df.repartition(1), "seq_id", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val many = Shards.assign(df.repartition(17), "seq_id", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(one === many)
  }

  test("single shard degenerates to a global hash-order permutation") {
    val keys = (0L until 100L)
    val rows = Shards.assign(keys.toDF("seq_id"), "seq_id", 1)
      .orderBy(col("pos")).collect()
    assert(rows.map(_.getInt(1)).toSet === Set(0))
    val expect = keys.sortBy(k => (fold(k), k))
    assert(rows.map(_.getLong(0)).toSeq === expect)
  }
}
