package graft.table

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Child-JVM committer for CrossProcessCommitSpec: N metadata commits
  * (one table property each) against the warehouse dir in args — a
  * SEPARATE PROCESS, so the only coordination with the parent's
  * commits is the filesystem CAS itself (no shared JVM locks, no
  * shared TableMeta caches). */
object CommitStressChild {
  def main(args: Array[String]): Unit = {
    val t = new GraftTable(java.nio.file.Paths.get(args(0)))
    val n = args(1).toInt
    val prefix = args(2)
    for (i <- 1 to n)
      TableMeta.commitRetry(t.dir, maxAttempts = 10000) { m =>
        m.copy(tableProperties = Some(m.allProperties + (s"$prefix-$i" -> "1")))
      }
  }
}

/** SURVEY's shared-catalog non-goal claims the filesystem CAS commit
  * is sufficient where a REST catalog service isn't available — i.e.
  * independent WRITER PROCESSES on one warehouse never lose commits.
  * The existing TableSpec concurrency cases all race threads inside
  * one JVM (where java-level memory effects could mask a broken
  * protocol); this spec races a genuinely separate JVM against the
  * test JVM and asserts every commit from both sides survives. */
class CrossProcessCommitSpec extends AnyFunSuite {

  test("two JVMs committing against one warehouse lose no commits") {
    val cat = new GraftCatalog(graft.Scratch.fresh("xproc_wh"))
    cat.createSchema("db")
    val t = cat.createTable("db.t",
      StructType(Seq(StructField("id", LongType))))
    val n = 120
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val pb = new ProcessBuilder(javaBin,
      "-cp", System.getProperty("java.class.path"),
      "graft.table.CommitStressChild",
      t.localDir.toString, n.toString, "child")
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.to(
      java.nio.file.Files.createTempFile("xproc", ".log").toFile))
    val proc = pb.start()
    // parent commits race the child process commit-for-commit
    for (i <- 1 to n)
      TableMeta.commitRetry(t.dir, maxAttempts = 10000) { m =>
        m.copy(tableProperties = Some(m.allProperties + (s"parent-$i" -> "1")))
      }
    assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "child JVM did not finish")
    assert(proc.exitValue() === 0, "child JVM committer failed")
    val props = t.meta.allProperties
    val missing = (1 to n).flatMap { i =>
      Seq(s"parent-$i", s"child-$i").filterNot(props.contains)
    }
    assert(missing.isEmpty,
      s"${missing.size} commits lost under cross-process contention: ${missing.take(8).mkString(", ")}")
    // version history is strictly linear: every surviving version
    // document loads (no torn/partial publishes)
    val (ver, m) = TableMeta.load(t.dir)
    assert(ver >= 2 * n, s"expected >= ${2 * n} committed versions, got $ver")
    assert(m.allProperties.size >= 2 * n)
  }
}
