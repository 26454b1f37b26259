package graft.util

import graft.SparkSpecBase

/** The single-writer lock's steal protocol (round 17, ADVICE medium):
  * two contenders observing a stale lock must not BOTH acquire — the
  * slower one's delete used to remove the faster stealer's fresh lock.
  * The conditional delete (unchanged (token, mtime) only) plus the
  * post-acquire owner verify make the second steal abort loudly. */
class BuildLockSpec extends SparkSpecBase {

  private def tmpLock(): String =
    java.nio.file.Files.createTempDirectory("graft_lock").toString +
      "/_build.lock"

  private def plantLock(path: String, token: String, ageMs: Long): Unit = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new java.io.FileOutputStream(f)
    try w.write(token.getBytes("UTF-8")) finally w.close()
    assert(f.setLastModified(System.currentTimeMillis() - ageMs))
  }

  test("acquire, run, release; a held lock fails fast") {
    val lock = tmpLock()
    var ran = false
    BuildLock.withLock(spark, lock) {
      ran = true
      assert(new java.io.File(lock).exists(), "lock file held during body")
      val ex = intercept[IllegalStateException] {
        BuildLock.withLock(spark, lock) { fail("second writer must not run") }
      }
      assert(ex.getMessage.contains("single-writer"))
    }
    assert(ran)
    assert(!new java.io.File(lock).exists(), "lock released after body")
  }

  test("a stale lock is stolen and the build runs") {
    val lock = tmpLock()
    plantLock(lock, "dead-builder", BuildLock.StaleMs + 60000L)
    var ran = false
    BuildLock.withLock(spark, lock) { ran = true }
    assert(ran)
    assert(!new java.io.File(lock).exists())
  }

  test("steal aborts when a faster stealer replaced the stale lock") {
    val lock = tmpLock()
    plantLock(lock, "dead-builder", BuildLock.StaleMs + 60000L)
    // simulate the faster contender winning INSIDE our steal window:
    // between our staleness check and our delete, the stale lock is
    // replaced by a fresh one carrying the winner's token
    BuildLock.interleaveForTest = () => {
      new java.io.File(lock).delete()
      plantLock(lock, "faster-stealer", 0L)
    }
    try {
      val ex = intercept[IllegalStateException] {
        BuildLock.withLock(spark, lock) { fail("loser must not build") }
      }
      assert(ex.getMessage.contains("replaced during the steal"))
      // the winner's fresh lock SURVIVES the aborted steal — this is the
      // exact file the unconditional delete used to destroy
      val in = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(lock))
      assert(new String(in, "UTF-8") === "faster-stealer")
    } finally BuildLock.interleaveForTest = () => ()
  }

  test("vanished lock during steal: acquire retries cleanly") {
    val lock = tmpLock()
    plantLock(lock, "dead-builder", BuildLock.StaleMs + 60000L)
    // the faster stealer deleted the stale lock but has not created its
    // own yet: our conditional delete sees None != Some(stale) and aborts
    // rather than guessing
    BuildLock.interleaveForTest = () => new java.io.File(lock).delete()
    try {
      val ex = intercept[IllegalStateException] {
        BuildLock.withLock(spark, lock) { fail("must not run") }
      }
      assert(ex.getMessage.contains("replaced during the steal"))
    } finally BuildLock.interleaveForTest = () => ()
  }
}
