package graft.table

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{Path => HPath}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import GraftIO.RichHPath

/** A SQL VIEW persisted in warehouse metadata — the Iceberg view-spec
  * analog for the filesystem catalog. The definition is SQL TEXT plus
  * the name-resolution context captured at creation (default catalog +
  * namespace), so a body written with bare table names re-resolves
  * identically from any session. Views are LATE-BINDING (like Iceberg
  * views): the body re-analyzes at every read, so additive schema
  * changes on the underlying tables flow through, and a change that
  * breaks a referenced column (e.g. RENAME COLUMN) fails the read
  * loudly — never silently wrong.
  *
  * Storage: `warehouse/<db>/<view>/meta/view-v<N>.json`, one exclusive-
  * create file per version (GraftIO.publishExclusive — the same CAS
  * primitive table commits use), newest N wins. CREATE OR REPLACE is a
  * publish of v(N+1); racing replaces serialize on the version number.
  * A directory holds EITHER a table (meta/version-hint.text) or a view,
  * never both — both create paths guard. */
case class GraftViewDef(
    name: String,
    sql: String,
    defaultCatalog: String,
    defaultNamespace: Seq[String],
    schemaJson: String, // informational: the body's schema AT CREATION
    comment: Option[String] = None,
    properties: Option[Map[String, String]] = None,
    version: Int = 1) {
  def allProperties: Map[String, String] = properties.getOrElse(Map.empty)
}

object GraftViews {

  private implicit val fmts: Formats = DefaultFormats

  private val ViewFileRe = """view-v(\d+)\.json""".r

  private[table] def metaDir(viewDir: HPath): HPath = viewDir.resolve("meta")

  /** Highest published view version in the dir, 0 when none. */
  private def currentVersion(viewDir: HPath): Int = {
    val md = metaDir(viewDir)
    if (!GraftIO.isDirectory(md)) 0
    else GraftIO.list(md).map(_.getPath.getName).collect {
      case ViewFileRe(n) => n.toInt
    }.maxOption.getOrElse(0)
  }

  def exists(viewDir: HPath): Boolean = currentVersion(viewDir) > 0

  def load(viewDir: HPath): Option[GraftViewDef] = {
    val v = currentVersion(viewDir)
    if (v == 0) None
    else Some(Serialization.read[GraftViewDef](new String(
      GraftIO.readAllBytes(metaDir(viewDir).resolve(s"view-v$v.json")),
      StandardCharsets.UTF_8)))
  }

  /** Publish `d` as the next version. `replace = false` requires the
    * view not to exist; a lost CAS race retries once from the advanced
    * version (replace) or fails loudly (create). */
  def publish(viewDir: HPath, d: GraftViewDef, replace: Boolean): GraftViewDef = {
    var attempts = 0
    while (attempts < 16) {
      val cur = currentVersion(viewDir)
      if (cur > 0 && !replace)
        throw new IllegalStateException(s"view ${d.name} already exists")
      GraftIO.mkdirs(metaDir(viewDir))
      val next = d.copy(version = cur + 1)
      val bytes = Serialization.writePretty(next).getBytes(StandardCharsets.UTF_8)
      if (GraftIO.publishExclusive(
          metaDir(viewDir).resolve(s"view-v${cur + 1}.json"), bytes))
        return next
      attempts += 1
    }
    throw new IllegalStateException(
      s"view ${d.name}: lost ${attempts} replace races; giving up")
  }
}
