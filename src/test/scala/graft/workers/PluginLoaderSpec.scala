package graft.workers

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime
import org.scalatest.funsuite.AnyFunSuite

/** X4 (`tests/framework/user_namespace/test_user_discovery.py`): path
  * loading via introspection, error handling, registry caching, and
  * hot reload — the reference's contract re-expressed over in-process
  * scalac + classloader-per-version. */
class PluginLoaderSpec extends AnyFunSuite {

  private def validWorker(className: String, warmup: Int): String =
    s"""import graft.workers.Workers._
       |import org.apache.spark.sql.DataFrame
       |class $className extends Worker {
       |  val name = "USER/$className"
       |  val params = Seq(ParamDef("period", IntParam, "14", min = Some(1)))
       |  def warmupBars(c: Map[String, String]): Int = $warmup
       |  def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
       |                close: String, volume: String,
       |                c: Map[String, String]): DataFrame = df
       |}
       |""".stripMargin

  private val notAWorker =
    """class JustAHelper { def x: Int = 1 }
      |""".stripMargin

  private val syntaxError =
    """class Broken extends {{{
      |""".stripMargin

  private def write(dir: Path, name: String, code: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, code.getBytes("UTF-8"))
    p
  }

  private def tmpDir: Path = {
    val d = Files.createTempDirectory("plugin-spec-")
    d.toFile.deleteOnExit()
    d
  }

  test("load worker by absolute path — class found via introspection") {
    val loader = new PluginLoader()
    val file = write(tmpDir, "my_indicator.scala", validWorker("MyIndicatorWorker", 10))
    val w = loader.loadPathWorker(file.toString)
    assert(w.name === "USER/MyIndicatorWorker")
    assert(w.warmupBars(Map.empty) === 10)
    assert(w.validate(Map("period" -> "20"))("period") === "20")
  }

  test("load worker by path relative to an explicit base") {
    val loader = new PluginLoader()
    val dir = tmpDir
    write(dir, "relative_worker.scala", validWorker("RelativeWorker", 2))
    val w = loader.loadPathWorker("relative_worker.scala", basePath = Some(dir))
    assert(w.name === "USER/RelativeWorker")
  }

  test("missing file → loud error naming the path") {
    val loader = new PluginLoader()
    val e = intercept[IllegalArgumentException] {
      loader.loadPathWorker(tmpDir.resolve("nonexistent.scala").toString)
    }
    assert(e.getMessage.contains("not found"))
  }

  test("compile error → loud error with compiler messages") {
    val loader = new PluginLoader()
    val file = write(tmpDir, "broken.scala", syntaxError)
    val e = intercept[IllegalArgumentException] {
      loader.loadPathWorker(file.toString)
    }
    assert(e.getMessage.contains("failed to compile"))
  }

  test("zero Worker implementations → 'Expected exactly 1'") {
    val loader = new PluginLoader()
    val file = write(tmpDir, "not_a_worker.scala", notAWorker)
    val e = intercept[IllegalArgumentException] {
      loader.loadPathWorker(file.toString)
    }
    assert(e.getMessage.contains("Expected exactly 1"))
  }

  test("two Worker implementations → 'Expected exactly 1', both named") {
    val loader = new PluginLoader()
    val file = write(tmpDir, "two_workers.scala",
      validWorker("WorkerA", 1) + validWorker("WorkerB", 2))
    val e = intercept[IllegalArgumentException] {
      loader.loadPathWorker(file.toString)
    }
    assert(e.getMessage.contains("Expected exactly 1"))
    assert(e.getMessage.contains("WorkerA") && e.getMessage.contains("WorkerB"))
  }

  test("one Worker + helper classes → loads the worker") {
    val loader = new PluginLoader()
    val file = write(tmpDir, "worker_with_helper.scala",
      notAWorker + validWorker("WorkerWithHelper", 5))
    val w = loader.loadPathWorker(file.toString)
    assert(w.name === "USER/WorkerWithHelper")
  }

  test("a Scala `object` worker loads as its singleton") {
    val loader = new PluginLoader()
    val code =
      """import graft.workers.Workers._
        |import org.apache.spark.sql.DataFrame
        |object SingletonWorker extends Worker {
        |  val name = "USER/SingletonWorker"
        |  val params = Seq.empty
        |  def warmupBars(c: Map[String, String]): Int = 7
        |  def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
        |                close: String, volume: String,
        |                c: Map[String, String]): DataFrame = df
        |}
        |""".stripMargin
    val file = write(tmpDir, "singleton.scala", code)
    val w = loader.loadPathWorker(file.toString)
    assert(w.name === "USER/SingletonWorker")
  }

  test("registry caches by file version — second load does not recompile") {
    val loader = new PluginLoader()
    val file = write(tmpDir, "cached.scala", validWorker("CachedWorker", 3))
    val w1 = loader.loadPathWorker(file.toString)
    val n = loader.compileCount
    val w2 = loader.loadPathWorker(file.toString)
    assert(loader.compileCount === n)
    assert(w1 eq w2)
  }

  test("hot reload: an edited file yields the NEW worker; old instance survives") {
    val loader = new PluginLoader()
    val dir = tmpDir
    val file = write(dir, "evolving.scala", validWorker("EvolvingWorker", 1))
    val v1 = loader.loadPathWorker(file.toString)
    assert(v1.warmupBars(Map.empty) === 1)

    write(dir, "evolving.scala", validWorker("EvolvingWorker", 99))
    // Defend against same-millisecond writes: force a distinct mtime.
    Files.setLastModifiedTime(file,
      FileTime.fromMillis(Files.getLastModifiedTime(file).toMillis + 1000))

    val v2 = loader.loadPathWorker(file.toString)
    assert(v2.warmupBars(Map.empty) === 99)
    assert(!(v1 eq v2))
    // The superseded instance keeps answering from its own classloader.
    assert(v1.warmupBars(Map.empty) === 1)
  }

  test("invalidate() forces a recompile even with unchanged mtime") {
    val loader = new PluginLoader()
    val file = write(tmpDir, "rescan.scala", validWorker("RescanWorker", 4))
    loader.loadPathWorker(file.toString)
    val n = loader.compileCount
    loader.invalidate(file.toString)
    loader.loadPathWorker(file.toString)
    assert(loader.compileCount === n + 1)
  }
}
