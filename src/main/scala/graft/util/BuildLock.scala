package graft.util

import org.apache.spark.sql.SparkSession

/** Best-effort single-writer lock for on-disk index artifacts
  * (`graft.text.Retrieval.buildPostingsIndex`, the vector index): two
  * concurrent builders would race their manifest renames — each manifest
  * is self-consistent, so the loser's docs are silently dropped, a lost
  * update. The lock makes that contract LOUD: a second builder fails
  * fast while a live build holds the lock file; a lock older than
  * [[StaleMs]] is a crashed builder's leftover and is stolen.
  *
  * Steal protocol (round 17 — closes the double-steal race): two
  * contenders could both observe `age >= StaleMs`; the slower one's
  * unconditional delete then removed the faster stealer's FRESH lock and
  * both acquires succeeded. Now (a) the stale lock is deleted only if
  * its (token, mtime) is UNCHANGED since the staleness check — a fresh
  * lock or a heartbeat in between aborts the steal — and (b) after any
  * acquire the lock is re-read and the build proceeds only if it still
  * carries OUR token, so a stealer that slipped between our create and
  * our verify is detected and we abort instead of double-building.
  *
  * Still best-effort by design: exclusive-create is not atomic on every
  * Hadoop scheme (e.g. S3A), and the conditional delete has its own
  * read-then-delete window. The correctness backstop remains the atomic
  * manifest rename; the lock narrows the lost-update window from
  * build-length to milliseconds and names the misuse.
  *
  * A heartbeat refreshes the lock's mtime every [[beatMs]] so a LIVE
  * long-running build (a 100 TB full rebuild runs far past 30 min) is
  * never mistaken for a crashed one — staleness only accrues on a dead
  * builder. */
object BuildLock {

  val StaleMs: Long = 30L * 60L * 1000L

  def beatMs: Long = StaleMs / 6

  /** Test-only interleave hook, invoked between the staleness decision
    * and the conditional delete — lets a spec simulate the faster
    * stealer landing its fresh lock in that window. */
  private[graft] var interleaveForTest: () => Unit = () => ()

  def withLock[T](spark: SparkSession, lockPath: String)(body: => T): T = {
    val lock = new org.apache.hadoop.fs.Path(lockPath)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(lock.getParent)
    val token = java.util.UUID.randomUUID().toString
    def tryAcquire(): Boolean =
      try {
        val out = fs.create(lock, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    /** (token bytes, mtime) of the live lock file, None if absent. */
    def currentState(): Option[(String, Long)] =
      try {
        val st = fs.getFileStatus(lock)
        val in = fs.open(lock)
        val bytes = try in.readAllBytes() finally in.close()
        Some((new String(bytes, "UTF-8"), st.getModificationTime))
      } catch { case _: java.io.IOException => None }
    if (!tryAcquire()) {
      val st0 = currentState()
      val age = st0.map(s => System.currentTimeMillis() - s._2)
        .getOrElse(Long.MaxValue)
      if (age < StaleMs) throw new IllegalStateException(
        s"another build holds $lock (age ${age / 1000}s); " +
          "index builds are single-writer per indexPath")
      interleaveForTest()
      if (st0.isDefined) {
        // delete ONLY the exact lock we judged stale: a different token
        // or mtime means another stealer (or a late heartbeat) got here
        // first — deleting ITS lock would re-open the double-steal
        if (currentState() != st0) throw new IllegalStateException(
          s"stale lock $lock was replaced during the steal; " +
            "another builder won — not deleting its lock")
        fs.delete(lock, false)
      }
      if (!tryAcquire()) throw new IllegalStateException(
        s"could not acquire $lock after stealing a stale lock")
    }
    // post-acquire verify: a contender that judged OUR fresh lock part of
    // a racing steal may have deleted it — proceed only as the owner
    if (!currentState().map(_._1).contains(token))
      throw new IllegalStateException(
        s"lost $lock to a concurrent steal immediately after acquiring")
    val beat = new Thread(() => {
      try {
        while (!Thread.interrupted()) {
          Thread.sleep(beatMs)
          try {
            val now = System.currentTimeMillis()
            fs.setTimes(lock, now, now)
          } catch { case scala.util.control.NonFatal(_) => () }
        }
      } catch { case _: InterruptedException => () }
    })
    beat.setDaemon(true)
    beat.setName("graft-index-lock-heartbeat")
    beat.start()
    try body finally {
      beat.interrupt()
      // release only OUR lock: a mis-timed stealer's fresh lock must
      // survive the original owner's release
      if (currentState().map(_._1).contains(token)) fs.delete(lock, false)
    }
  }
}
