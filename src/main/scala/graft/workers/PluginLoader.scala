package graft.workers

import java.net.URLClassLoader
import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._
import scala.tools.nsc.{Global, Settings}
import scala.tools.nsc.reporters.StoreReporter

import graft.workers.Workers.Worker

/** X4: USER-namespace worker discovery + hot reload
  * (`Readme.md:81`, `tests/framework/user_namespace/test_user_discovery.py`,
  * `worker_factory.py` `_load_path_worker`).
  *
  * The reference loads user `.py` files by path, introspects for exactly
  * one `AbstractWorker` subclass, caches by path, and re-loads when the
  * file changes. The JVM analogue: compile the user's `.scala` source
  * in-process (scala-compiler ships on the Spark classpath), load the
  * emitted classes through a FRESH `URLClassLoader`, and introspect for
  * exactly one concrete [[Workers.Worker]] implementation. Hot reload
  * falls out of the classloader-per-version design: the cache key is
  * `(canonical path, mtime, size)`, so an edited file gets a new
  * compile + loader while older instances keep running unchanged —
  * exactly the semantics `sys.modules` juggling approximates in Python.
  *
  * Thread-safe; compilation happens at most once per file version
  * (`TrieMap.getOrElseUpdate` on the version key).
  */
final class PluginLoader(classpath: String = PluginLoader.defaultClasspath) {

  private case class Version(path: String, mtime: Long, size: Long)
  private val cache = TrieMap.empty[Version, Worker]
  /** Compile count, exposed so tests can prove the cache short-circuits. */
  @volatile var compileCount: Int = 0

  /** Load the single Worker implementation from a `.scala` source file.
    *
    * @param path      absolute path, or relative to `basePath`
    * @param basePath  resolution base for relative paths (cwd default)
    * @throws IllegalArgumentException file not found / compile error /
    *         zero or multiple Worker implementations — fail-fast with a
    *         message naming the file, mirroring the reference's
    *         `ValueError` contract. */
  def loadPathWorker(path: String, basePath: Option[Path] = None): Worker = {
    val file = {
      val p = Paths.get(path)
      if (p.isAbsolute) p else basePath.getOrElse(Paths.get(".")).resolve(p)
    }
    if (!Files.isRegularFile(file))
      throw new IllegalArgumentException(s"worker file not found: $file")
    val canonical = file.toRealPath()
    val v = Version(canonical.toString, Files.getLastModifiedTime(canonical).toMillis,
      Files.size(canonical))
    cache.getOrElseUpdate(v, compileAndInstantiate(canonical))
  }

  /** Drop every cached version of `path` (the reference's explicit
    * rescan). Subsequent loads recompile even if mtime is unchanged. */
  def invalidate(path: String): Unit = {
    val canonical = Paths.get(path).toRealPath().toString
    cache.keys.filter(_.path == canonical).foreach(cache.remove)
  }

  private def compileAndInstantiate(src: Path): Worker = {
    val outDir = Files.createTempDirectory("graft-plugin-")
    outDir.toFile.deleteOnExit()

    val settings = new Settings()
    settings.outputDirs.setSingleOutput(outDir.toString)
    settings.classpath.value = classpath
    val reporter = new StoreReporter(settings)
    val global = new Global(settings, reporter)
    val run = new global.Run()
    run.compile(List(src.toString))
    if (reporter.hasErrors) {
      val msgs = reporter.infos.filter(_.severity == reporter.ERROR)
        .map(i => s"${i.pos.line}: ${i.msg}").toSeq.sorted.mkString("; ")
      throw new IllegalArgumentException(s"worker file failed to compile: $src — $msgs")
    }

    // Fresh loader per compiled version — THE hot-reload mechanism.
    val loader = new URLClassLoader(Array(outDir.toUri.toURL),
      classOf[Worker].getClassLoader)
    val classNames = Files.walk(outDir).iterator().asScala
      .filter(p => p.toString.endsWith(".class"))
      .map { p =>
        outDir.relativize(p).toString.stripSuffix(".class")
          .replace(java.io.File.separatorChar, '.')
      }.toSeq.sorted

    val candidates = classNames.flatMap { name =>
      val cls =
        try Class.forName(name, false, loader)
        catch { case _: Throwable => null }
      Option(cls).filter { c =>
        classOf[Worker].isAssignableFrom(c) &&
          !c.isInterface &&
          !java.lang.reflect.Modifier.isAbstract(c.getModifiers)
      }
    }
    // A Scala `object Foo extends Worker` emits Foo AND Foo$; both are
    // concrete Worker classes but they are ONE plugin. Collapse on the
    // module suffix before counting.
    val distinct = candidates.groupBy(_.getName.stripSuffix("$")).toSeq
      .sortBy(_._1).map(_._2.head)

    if (distinct.size != 1)
      throw new IllegalArgumentException(
        s"Expected exactly 1 Worker implementation in $src, found " +
          s"${distinct.size}${if (distinct.nonEmpty) ": " + distinct.map(_.getName.stripSuffix("$")).mkString(", ") else ""}")

    compileCount += 1
    instantiate(distinct.head)
  }

  private def instantiate(cls: Class[_]): Worker =
    // `object Foo` → singleton MODULE$ field on Foo$; `class Foo` → no-arg ctor.
    if (cls.getName.endsWith("$"))
      cls.getField("MODULE$").get(null).asInstanceOf[Worker]
    else
      cls.getDeclaredConstructor().newInstance().asInstanceOf[Worker]
}

object PluginLoader {
  /** The forked JVM's flat classpath (sbt `Test / fork := true` and
    * `spark-submit` both launch with `java -cp <full classpath>`), plus
    * any URLClassLoader URLs above us for embedded launchers. */
  def defaultClasspath: String = {
    val fromLoaders = Iterator.iterate(getClass.getClassLoader)(_.getParent)
      .takeWhile(_ != null)
      .collect { case u: URLClassLoader => u.getURLs.toSeq }
      .flatten
      .collect { case url if url.getProtocol == "file" => Paths.get(url.toURI).toString }
      .toSeq
    (sys.props("java.class.path").split(java.io.File.pathSeparator).toSeq ++ fromLoaders)
      .distinct.mkString(java.io.File.pathSeparator)
  }
}
