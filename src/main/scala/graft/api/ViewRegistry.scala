package graft.api

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Stored-view registry — the analog of the reference's server-side view
  * store: `Table.get_view` takes a view NAME and compiles the stored
  * definition (seaserpent/base.py:1359), `Table.views` enumerates them
  * (base.py:368). [[ViewCompiler.getView]] covers the compile half; this
  * registry adds persist/enumerate/load-by-name so a caller can port
  * `table.get_view("my-view")` verbatim.
  *
  * Storage is one JSON file per view at `<dir>/<table>/<name>.json` on the
  * driver-local filesystem (java.nio, not Spark I/O): view metadata is
  * O(KB) control-plane state like the reference server's, so a distributed
  * write path would be the wrong tool; file-per-view keeps saves atomic
  * per definition with no read-modify-write of a shared manifest.
  *
  * Term typing survives the round-trip through JSON's native scalar types
  * (string/number/boolean); integral numbers come back as Long and
  * fractional as Double — Catalyst coerces either against the column type
  * exactly as it does for the in-memory literals ViewCompiler sees.
  */
object ViewRegistry {

  private val Json4sFormats: Formats = DefaultFormats

  // ------------------------------------------------------------- codec

  private def termToJson(t: Any): JValue = t match {
    case null            => JNull
    case s: String       => JString(s)
    case b: Boolean      => JBool(b)
    case i: Int          => JLong(i.toLong)
    case l: Long         => JLong(l)
    case s: Short        => JLong(s.toLong)
    case b: Byte         => JLong(b.toLong)
    case f: Float        => JDouble(f.toDouble)
    case d: Double       => JDouble(d)
    case d: BigDecimal   => JDecimal(d)
    case other => throw new IllegalArgumentException(
      s"view filter term of type ${other.getClass.getName} is not JSON-storable")
  }

  private def termFromJson(v: JValue): Any = v match {
    case JNull        => null
    case JString(s)   => s
    case JBool(b)     => b
    case JLong(l)     => l
    case JInt(i)      => i.toLong
    case JDouble(d)   => d
    case JDecimal(d)  => d
    case other => throw new IllegalArgumentException(s"unexpected term JSON: $other")
  }

  private[api] def toJson(view: ViewDef): String = {
    val ast = JObject(
      "name" -> JString(view.name),
      "conjunction" -> JString(view.conjunction),
      "filters" -> JArray(view.filters.toList.map(f => JObject(
        "column" -> JString(f.column),
        "predicate" -> JString(f.predicate),
        "terms" -> JArray(f.terms.toList.map(termToJson))))),
      "sorts" -> JArray(view.sorts.toList.map { case (c, asc) =>
        JObject("column" -> JString(c), "ascending" -> JBool(asc)) }),
      "hidden_columns" -> JArray(view.hiddenCols.toList.map(JString(_))))
    JsonMethods.pretty(JsonMethods.render(ast))
  }

  private[api] def fromJson(s: String): ViewDef = {
    implicit val fmts: Formats = Json4sFormats
    val ast = JsonMethods.parse(s)
    ViewDef(
      name = (ast \ "name").extract[String],
      filters = (ast \ "filters") match {
        case JArray(fs) => fs.map(f => ViewFilter(
          (f \ "column").extract[String],
          (f \ "predicate").extract[String],
          (f \ "terms") match {
            case JArray(ts) => ts.map(termFromJson)
            case _ => Nil
          }))
        case _ => Nil
      },
      sorts = (ast \ "sorts") match {
        case JArray(ss) => ss.map(x =>
          ((x \ "column").extract[String], (x \ "ascending").extract[Boolean]))
        case _ => Nil
      },
      hiddenCols = (ast \ "hidden_columns") match {
        case JArray(hs) => hs.map(_.extract[String])
        case _ => Nil
      },
      conjunction = (ast \ "conjunction").extract[String])
  }

  // ---------------------------------------------------------- registry

  private def viewPath(dir: String, table: String, name: String): Path = {
    require(name.nonEmpty && !name.contains('/') && !name.contains('\\') &&
      name != "." && name != "..",
      s"view name '$name' is not a valid registry key")
    Paths.get(dir, table, s"$name.json")
  }

  /** Persist (create or overwrite) a view definition. */
  def save(dir: String, table: String, view: ViewDef): Unit = {
    val p = viewPath(dir, table, view.name)
    Files.createDirectories(p.getParent)
    Files.write(p, toJson(view).getBytes(StandardCharsets.UTF_8))
  }

  /** Enumerate stored view names for a table (reference `Table.views`,
    * base.py:368), sorted for determinism. */
  def views(dir: String, table: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(dir, table)
    if (!Files.isDirectory(d)) Nil
    else {
      val st = Files.list(d)
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json")).toSeq.sorted
      finally st.close()
    }
  }

  /** Load a stored definition by name. */
  def load(dir: String, table: String, name: String): ViewDef = {
    val p = viewPath(dir, table, name)
    require(Files.exists(p), s"no stored view '$name' for table '$table' in " +
      s"$dir (have: ${views(dir, table).mkString(", ")})")
    fromJson(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  /** `table.get_view(name)` — load the stored definition and compile it
    * against the table (reference base.py:1359). */
  def getView(t: Table, dir: String, name: String,
              hideCols: Boolean = true, sort: Boolean = true): DataFrame =
    ViewCompiler.getView(t, load(dir, t.name, name), hideCols, sort)
}
