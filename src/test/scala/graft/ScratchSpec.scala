package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the artifact-keying contract of Scratch: distinct keys (e.g.
  * two corpus dirs in one JVM) must never alias to one path, and
  * materializedOnce must build per key, serve the cached artifact on
  * repeat, and retry after a failed build. */
class ScratchSpec extends AnyFunSuite {

  test("overwritable: distinct keys get distinct paths, same key is stable") {
    val a = Scratch.overwritable("spec_kind", "/data/corpusA")
    val b = Scratch.overwritable("spec_kind", "/data/corpusB")
    assert(a !== b)
    assert(a === Scratch.overwritable("spec_kind", "/data/corpusA"))
    // hashCode-colliding strings ("Aa"/"BB" is the classic pair) must
    // NOT share a path — the cross-corpus aliasing hazard the digest
    // keying exists to close
    assert("Aa".hashCode === "BB".hashCode)
    assert(Scratch.overwritable("spec_kind", "Aa") !==
      Scratch.overwritable("spec_kind", "BB"))
    // path segment stays filesystem-safe (hex digest, no '-' from
    // abs(Int.MinValue)-style surprises)
    val seg = new java.io.File(a).getName
    assert(seg.matches("spec_kind_[0-9a-f]{16}"))
  }

  test("materializedOnce: builds once per key, isolates corpora, retries after failure") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(key: String): String =
      Scratch.materializedOnce("spec_mat", key) { path =>
        builds.incrementAndGet()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(path), key.getBytes("UTF-8"))
      }
    val pa = build("corpusA")
    val pb = build("corpusB")
    assert(builds.get === 2)
    assert(pa !== pb)
    // repeat serves the cache — no rebuild, and corpus A's artifact
    // still holds corpus A's content (no cross-corpus serving)
    assert(build("corpusA") === pa)
    assert(builds.get === 2)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(pa)), "UTF-8") === "corpusA")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(pb)), "UTF-8") === "corpusB")
    // a failed build must not poison the key: the next caller retries
    var first = true
    def flaky(): String = Scratch.materializedOnce("spec_mat", "flaky") { path =>
      if (first) { first = false; sys.error("transient") }
      java.nio.file.Files.write(java.nio.file.Paths.get(path), Array[Byte](1))
    }
    intercept[RuntimeException](flaky())
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(flaky())))
  }

  test("materializedOnce: a self-cycle fails loudly instead of deadlocking") {
    val e = intercept[IllegalStateException] {
      Scratch.materializedOnce("spec_cycle", "k") { _ =>
        Scratch.materializedOnce("spec_cycle", "k")(_ => ())
        ()
      }
    }
    assert(e.getMessage.contains("re-entered itself"))
    // the failed build must not poison the key
    val p = Scratch.materializedOnce("spec_cycle", "k") { path =>
      java.nio.file.Files.write(java.nio.file.Paths.get(path), Array[Byte](7))
    }
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
  }

  test("materializedOnce: waiters see the builder's exception class, not CompletionException") {
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val builder = new Thread(() => {
      try Scratch.materializedOnce("spec_wrap", "k") { _ =>
        started.countDown(); release.await()
        throw new java.io.FileNotFoundException("gone")
      } catch { case _: Throwable => () }
    })
    builder.start()
    started.await()
    @volatile var seen: Throwable = null
    val waiter = new Thread(() => {
      try Scratch.materializedOnce("spec_wrap", "k")(_ => ())
      catch { case e: Throwable => seen = e }
    })
    waiter.start()
    Thread.sleep(100) // let the waiter block on the in-flight future
    release.countDown()
    builder.join(); waiter.join()
    // the waiter either joined the failing future (must see the RAW
    // exception) or arrived after the remove and rebuilt green (null)
    assert(seen == null || seen.isInstanceOf[java.io.FileNotFoundException],
      s"waiter saw ${String.valueOf(seen)}")
  }

  test("objectOnce: racing callers share one instance, builder runs once, failure retries") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[AnyRef]()
    val threads = (1 to 8).map(_ => new Thread(() => {
      barrier.await()
      results.add(Scratch.objectOnce("spec_obj", "k") {
        builds.incrementAndGet(); new Object
      })
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get === 1, "racing callers must not run the builder twice")
    assert(results.size === 8)
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSet.size === 1, "all callers must see the same instance")
    // distinct keys build separately
    Scratch.objectOnce("spec_obj", "k2") { builds.incrementAndGet(); new Object }
    assert(builds.get === 2)
    // a failed build clears the slot: the next caller rebuilds
    var failed = 0
    intercept[IllegalArgumentException] {
      Scratch.objectOnce("spec_obj", "k3") { failed += 1; throw new IllegalArgumentException("boom") }
    }
    val v = Scratch.objectOnce("spec_obj", "k3") { failed += 1; "ok" }
    assert(v === "ok" && failed === 2)
    // self-cycle fails loudly instead of deadlocking on its own future
    val e = intercept[IllegalStateException] {
      Scratch.objectOnce("spec_obj", "k4") {
        Scratch.objectOnce("spec_obj", "k4")("inner")
      }
    }
    assert(e.getMessage.contains("re-entered"))
  }
}
