package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.MetadataBuilder

/** riptable's metadata/doc surface (`rt_meta.py`) re-expressed on Spark
  * schema metadata, plus the `register_function` extension mechanism
  * (`rt_fastarray.py:6052`).
  *
  * Mapping:
  *  - `apply_schema` (`rt_meta.py:205`) — descriptive dictionaries
  *    (Description / Steward / Detail) attach to columns. Riptable keeps
  *    them in a `_meta` dict on the array; here they live in each
  *    `StructField`'s `Metadata`, so they survive `select`/`withColumn`/
  *    rename chains and serialize with the schema (e.g. into Parquet
  *    footers). Returns the deviations map like the reference (schema
  *    entries naming columns the frame doesn't have).
  *  - `info` (`rt_meta.py:303`) / `doc` (`rt_meta.py:341`) — read the
  *    descriptions back as a structured `Info` / rendered text block.
  *  - `FastArray.register_function(name, func)` (`rt_fastarray.py:6052`)
  *    — riptable patches methods onto the class at runtime (numba
  *    extensions use it). The JVM analog is two-fold:
  *      1. The STATIC route (preferred, zero cost): an implicit value
  *         class, the documented recipe —
  *         {{{
  *         implicit class MyOps(private val df: DataFrame) extends AnyVal {
  *           def myOp(k: String): DataFrame = df.groupBy(k).count()
  *         }
  *         // import MyOps; df.myOp("k") — compiles to a static call
  *         }}}
  *      2. The DYNAMIC route (name known only at runtime — the
  *         rt_fastarraynumba shape): `Meta.registerFunction(name, doc,
  *         fn)` below, a named registry with doc strings, invoked via
  *         `Meta.call(name, df)`. Registered docs surface through
  *         `Meta.functionDoc` / `Meta.registeredFunctions` exactly like
  *         riptable's info/doc surface does for data.
  */
object Meta {

  private val DescriptionKey = "graft.description"
  private val StewardKey = "graft.steward"
  private val DetailKey = "graft.detail"

  val NoDescription = "no description"
  val NoSteward = "no steward"

  /** One column's descriptive dictionary (rt_meta.py apply_schema keys). */
  final case class ColSchema(description: String = NoDescription,
                             steward: String = NoSteward,
                             detail: Option[String] = None)

  /** Info rows returned by `info` (rt_meta.py:289 Item). */
  final case class Item(name: String, tpe: String, description: String,
                        steward: String)
  /** rt_meta.py:237 Info (title + per-column items). */
  final case class Info(title: Option[String], items: Seq[Item])

  /** apply_schema (`rt_meta.py:205`): attach Description/Steward/Detail
    * to the named columns via schema metadata. Returns the annotated
    * frame and the deviations — schema entries that name no column.
    */
  def applySchema(df: DataFrame,
                  schema: Map[String, ColSchema]): (DataFrame, Seq[String]) = {
    val (present, missing) = schema.partition { case (c, _) => df.columns.contains(c) }
    val out = present.foldLeft(df) { case (d, (c, s)) =>
      val mb = new MetadataBuilder()
        .withMetadata(d.schema(c).metadata)
        .putString(DescriptionKey, s.description)
        .putString(StewardKey, s.steward)
      s.detail.foreach(mb.putString(DetailKey, _))
      d.withColumn(c, d(c).as(c, mb.build()))
    }
    (out, missing.keys.toSeq.sorted)
  }

  /** info (`rt_meta.py:303`): every column with its type and any
    * attached description/steward.
    */
  def info(df: DataFrame, title: Option[String] = None): Info =
    Info(title, df.schema.fields.toIndexedSeq.map { f =>
      val d = if (f.metadata.contains(DescriptionKey))
        f.metadata.getString(DescriptionKey) else NoDescription
      val s = if (f.metadata.contains(StewardKey))
        f.metadata.getString(StewardKey) else NoSteward
      Item(f.name, f.dataType.simpleString, d, s)
    })

  /** doc (`rt_meta.py:341`): the info block rendered as text — the
    * interactive `Dataset.doc` affordance.
    */
  def doc(df: DataFrame, title: Option[String] = None): String = {
    val i = info(df, title)
    val head = i.title.map(t => s"$t\n").getOrElse("")
    head + i.items.map(it =>
      f"  ${it.name}%-24s ${it.tpe}%-12s ${it.description} [${it.steward}]")
      .mkString("\n")
  }

  /** Detail string for one column, if set (rt_meta DETAIL_KEY). */
  def detail(df: DataFrame, column: String): Option[String] = {
    val m = df.schema(column).metadata
    if (m.contains(DetailKey)) Some(m.getString(DetailKey)) else None
  }

  // ---- register_function (rt_fastarray.py:6052), dynamic route ----

  private val fnReg =
    new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame => DataFrame)]()

  /** Register a named frame-level function with a doc string — the
    * runtime analog of `FastArray.register_function`. Re-registering a
    * name replaces it (matching setattr semantics).
    */
  def registerFunction(name: String, docString: String,
                       fn: DataFrame => DataFrame): Unit =
    fnReg.put(name, (docString, fn))

  /** Invoke a registered function by name. */
  def call(name: String, df: DataFrame): DataFrame = {
    val e = fnReg.get(name)
    require(e != null, s"no registered function '$name' " +
      s"(registered: ${registeredFunctions.mkString(", ")})")
    e._2(df)
  }

  /** The doc string a function was registered with. */
  def functionDoc(name: String): Option[String] =
    Option(fnReg.get(name)).map(_._1)

  /** All registered function names, sorted. */
  def registeredFunctions: Seq[String] = {
    import scala.jdk.CollectionConverters._
    fnReg.keySet().asScala.toSeq.sorted
  }

  /** Remove a registered function (test hygiene). */
  def unregisterFunction(name: String): Unit = fnReg.remove(name)
}
