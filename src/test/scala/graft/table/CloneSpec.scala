package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shallow-clone semantics: zero-copy manifest borrowing, read
  * equality (plain + MoR), and fully independent evolution. */
class CloneSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def mkCat() = {
    val cat = new GraftCatalog(graft.Scratch.fresh("clone_spec_wh"))
    cat.createSchema("db")
    cat
  }

  private def rows(range: Range, tag: String) = {
    import spark.implicits._
    range.map(i => (i.toLong, tag)).toDF("k", "v")
  }

  private def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("k").collect().map(_.getLong(0)).toSeq.sorted

  private def dataFiles(t: GraftTable): Seq[java.nio.file.Path] = {
    val dd = t.localDir.resolve("data")
    if (!java.nio.file.Files.exists(dd)) Nil
    else {
      val walk = java.nio.file.Files.walk(dd)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(p =>
          java.nio.file.Files.isRegularFile(p)).toSeq
      } finally walk.close()
    }
  }

  test("clone copies zero data bytes and reads the source state exactly") {
    val cat = mkCat()
    val src = cat.createTable("db.src", schema)
    src.append(rows(0 until 100, "a"))
    src.delete(spark, col("k") % 10 === 0)
    val clone = src.cloneTo(cat, "db.cl")
    assert(dataFiles(clone).isEmpty, "shallow clone must copy no data files")
    assert(keys(clone.read(spark)) === keys(src.read(spark)))
    assert(keys(clone.read(spark)) === (0L until 100L).filter(_ % 10 != 0))
  }

  test("clone carries MoR positional deletes across") {
    val cat = mkCat()
    val src = cat.createTable("db.src_mor", schema)
    src.append(rows(0 until 50, "a"))
    src.deleteMoR(spark, col("k") < 5)
    val clone = src.cloneTo(cat, "db.cl_mor")
    assert(dataFiles(clone).isEmpty)
    assert(keys(clone.read(spark)) === (5L until 50L))
  }

  test("clone and source evolve independently after the fork") {
    val cat = mkCat()
    val src = cat.createTable("db.src_ev", schema)
    src.append(rows(0 until 10, "a"))
    val clone = src.cloneTo(cat, "db.cl_ev")
    // writes on either side are invisible to the other
    clone.append(rows(100 until 110, "clone-only"))
    src.append(rows(200 until 210, "src-only"))
    assert(keys(clone.read(spark)) === ((0L until 10L) ++ (100L until 110L)))
    assert(keys(src.read(spark)) === ((0L until 10L) ++ (200L until 210L)))
    // a CoW delete on the clone rewrites the BORROWED file into a
    // clone-owned one; the source's physical file and content survive
    val srcFilesBefore = dataFiles(src).map(_.toString).toSet
    clone.delete(spark, col("k") === 3L)
    assert(keys(clone.read(spark)) ===
      ((0L until 10L).filterNot(_ == 3L) ++ (100L until 110L)))
    assert(keys(src.read(spark)) === ((0L until 10L) ++ (200L until 210L)))
    assert(dataFiles(src).map(_.toString).toSet === srcFilesBefore,
      "clone-side delete must not touch source files")
    assert(dataFiles(clone).nonEmpty, "CoW rewrite lands in the clone's own dir")
  }

  test("expireSnapshots on a clone never deletes borrowed source files") {
    val cat = mkCat()
    val src = cat.createTable("db.src_gc", schema)
    src.append(rows(0 until 40, "a"))
    val clone = src.cloneTo(cat, "db.cl_gc")
    // CoW rewrite on the clone: snapshot 2 owns fresh files, snapshot 1
    // (the borrowed manifest) becomes expirable
    clone.delete(spark, col("k") === 7L)
    val srcFilesBefore = dataFiles(src).map(_.toString).toSet
    assert(srcFilesBefore.nonEmpty)
    // expire everything but the head — snapshot 1's "orphans" are the
    // borrowed ABSOLUTE paths; physical GC must skip them
    clone.expireSnapshots(System.currentTimeMillis() + 60000L, retainLast = 1)
    assert(dataFiles(src).map(_.toString).toSet === srcFilesBefore,
      "clone-side expire must not delete the source's files")
    assert(keys(src.read(spark)) === (0L until 40L),
      "source must stay fully readable after clone-side expire")
    assert(keys(clone.read(spark)) === (0L until 40L).filterNot(_ == 7L))
  }

  test("eq-delete then append then clone keeps the re-appended rows") {
    import spark.implicits._
    val cat = mkCat()
    val src = cat.createTable("db.src_eq", schema)
    src.append(rows(0 until 20, "a"))
    // equality-delete k in {3, 4} ...
    src.deleteMoREquality(spark, Seq(3L, 4L).toDF("k"))
    // ... then re-append k=3: newer than the delete, must stay live
    src.append(rows(3 until 4, "reborn"))
    assert(keys(src.read(spark)) === ((0L until 20L).filterNot(_ == 4L)))
    val clone = src.cloneTo(cat, "db.cl_eq")
    // the clone borrows ALL files by absolute path; the eq-delete seq
    // guard must still see the re-appended file as NEWER than the delete
    assert(keys(clone.read(spark)) === ((0L until 20L).filterNot(_ == 4L)),
      "clone read must not re-apply the eq-delete to the newer append")
  }

  test("borrowed eq-deletes never eat the clone's own post-clone appends") {
    import spark.implicits._
    val cat = mkCat()
    val src = cat.createTable("db.src_eq2", schema)
    src.append(rows(0 until 10, "a"))
    src.deleteMoREquality(spark, Seq(5L).toDF("k"))
    val clone = src.cloneTo(cat, "db.cl_eq2")
    // re-introduce the deleted key ON THE CLONE: the new file's seq
    // must outrank the borrowed eq-delete's source-era seq (the clone's
    // snapshot counter continues from the source's, it doesn't restart)
    clone.append(rows(5 until 6, "reborn"))
    assert(keys(clone.read(spark)) === ((0L until 10L).filterNot(_ == 5L) :+ 5L).sorted,
      "the clone's own append must not be eaten by a borrowed eq-delete")
    assert(keys(src.read(spark)) === (0L until 10L).filterNot(_ == 5L))
  }

  test("deep clone survives destructive source maintenance (the shallow hazard)") {
    import spark.implicits._
    val cat = mkCat()
    val src = cat.createTable("db.src_deep", schema)
    src.append(rows(0 until 60, "a"))
    src.deleteMoR(spark, col("k") < 5)                       // positional delete
    src.deleteMoREquality(spark, Seq(55L).toDF("k"))         // equality delete
    val want = keys(src.read(spark))
    assert(want === ((5L until 60L).filterNot(_ == 55L)))
    val deep = src.deepCloneTo(cat, "db.cl_deep")
    assert(dataFiles(deep).nonEmpty, "deep clone must own physical copies")
    assert(keys(deep.read(spark)) === want)
    // destroy the source: CoW rewrite + expire physically GCs every
    // original file — the exact sequence that breaks a shallow clone
    src.rewriteDataFiles(spark, targetFiles = 1)
    src.expireSnapshots(System.currentTimeMillis() + 60000L, retainLast = 1)
    assert(keys(deep.read(spark)) === want,
      "deep clone must be independent of source GC")
    // and the clone's manifest is fully relative: nothing points home
    assert(deep.meta.currentSnapshot.get.manifest.forall(f =>
      !f.path.startsWith("/") && !f.path.contains(":/")))
  }

  test("deep clone refuses absolute-entry sources with positional deletes") {
    import spark.implicits._
    val cat = mkCat()
    val src = cat.createTable("db.src_deepabs", schema)
    src.append(rows(0 until 10, "a"))
    val shallow = src.cloneTo(cat, "db.cl_shal")     // absolute borrowed entries
    shallow.deleteMoR(spark, col("k") === 1L)        // positional delete on them
    val e = intercept[IllegalArgumentException](
      shallow.deepCloneTo(cat, "db.cl_deepabs"))
    assert(e.getMessage.contains("rewriteDataFiles"))
    // the documented remedy works: compact, then deep clone succeeds
    shallow.rewriteDataFiles(spark, targetFiles = 1)
    val deep = shallow.deepCloneTo(cat, "db.cl_deepabs2")
    assert(keys(deep.read(spark)) === (0L until 10L).filterNot(_ == 1L))
  }

  test("cloning an empty table fails loudly") {
    val cat = mkCat()
    val src = cat.createTable("db.src_empty", schema)
    val e = intercept[IllegalStateException](src.cloneTo(cat, "db.cl_empty"))
    assert(e.getMessage.contains("empty table"))
  }
}
