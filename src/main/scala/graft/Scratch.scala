package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Session-scoped scratch space for query-internal materializations
  * (shingle/signature tables, format round-trip fixtures, temp
  * warehouses). Everything lives under ONE root that a JVM shutdown hook
  * deletes recursively — without this, each bench/verify invocation
  * leaked its `Files.createTempDirectory` dirs forever (the bench runs
  * every query twice, so leaks compound across the session).
  *
  * `overwritable` returns a DETERMINISTIC path per (kind, key): repeat
  * invocations of the same query in one session write to the same
  * location with SaveMode.Overwrite instead of minting a fresh dir —
  * bounding within-session disk growth to one copy per query.
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** Fresh unique dir under the managed root (for fixtures that must not
    * collide, e.g. Graft warehouses whose createTable rejects reuse). */
  def fresh(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** Stable per-(kind, key) path under the managed root; caller writes
    * with overwrite mode. */
  def overwritable(kind: String, key: String): String =
    root.resolve(kind + "_" + math.abs(key.hashCode).toString).toString

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      catch { case _: Throwable => () }
      finally walk.close()
    }
}
