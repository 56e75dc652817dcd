package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Display layer — riptable footers/labels plus the DisplayTable
  * rendering rules (§2.11).
  *
  * Reference: `Dataset.footer_set_values` (`riptable/rt_dataset.py:5613`),
  * label columns (`riptable/rt_struct.py:2939`), DisplayTable
  * (`riptable/rt_display.py:192`) with its option set
  * (`riptable/Utils/display_options.py:93-223`): HEAD_ROWS/TAIL_ROWS
  * elision, PRECISION fixed-point floats, E_THRESHOLD scientific
  * cutover with E_PRECISION digits, MAX_STRING_WIDTH truncation,
  * NUMBER_SEPARATOR thousands grouping, right-justified numerics
  * (`riptable/Utils/rt_display_properties.py:246`), and `Inv` for
  * invalid cells. Footers/labels live as column metadata on the schema
  * (survives select/rename); rendering is inherently driver-side
  * small-data — the collect is head+tail rows, never the frame.
  */
object Display {

  private val FooterKey = "graft.footer"
  private val LabelKey = "graft.label"

  /** DisplayOptions twin (`riptable/Utils/display_options.py`):
    * defaults match the reference (HEAD_ROWS=15, TAIL_ROWS=15,
    * PRECISION=2, E_PRECISION=3, E_THRESHOLD=6, MAX_STRING_WIDTH=15,
    * NUMBER_SEPARATOR off).
    */
  case class Options(headRows: Int = 15,
                     tailRows: Int = 15,
                     rowAll: Boolean = false,
                     precision: Int = 2,
                     ePrecision: Int = 3,
                     eThreshold: Int = 6,
                     maxStringWidth: Int = 15,
                     numberSeparator: Boolean = false,
                     separatorChar: Char = ',')

  /** footer_set_values: attach a footer string per column. */
  def withFooters(df: DataFrame, footers: Map[String, String]): DataFrame = {
    footers.foldLeft(df) { case (d, (c, footer)) =>
      val meta = new MetadataBuilder()
        .withMetadata(d.schema(c).metadata)
        .putString(FooterKey, footer).build()
      d.withColumn(c, d(c).as(c, meta))
    }
  }

  /** label_set: mark columns as row labels (shown first). */
  def withLabels(df: DataFrame, labels: Seq[String]): DataFrame =
    labels.foldLeft(df) { (d, c) =>
      val meta = new MetadataBuilder()
        .withMetadata(d.schema(c).metadata)
        .putBoolean(LabelKey, true).build()
      d.withColumn(c, d(c).as(c, meta))
    }

  def footers(df: DataFrame): Map[String, String] =
    df.schema.fields.flatMap { f =>
      if (f.metadata.contains(FooterKey)) Some(f.name -> f.metadata.getString(FooterKey))
      else None
    }.toMap

  def labelColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.metadata.contains(LabelKey) && f.metadata.getBoolean(LabelKey) => f.name
    }.toSeq

  /** Thousands grouping on the integer digits only (the reference
    * groups both ints and the integer part of fixed floats,
    * `rt_display_properties.py:246,259`).
    */
  private def group(digits: String, sep: Char): String = {
    val (sign, body) = if (digits.startsWith("-")) ("-", digits.tail) else ("", digits)
    val (intPart, rest) = body.span(_.isDigit)
    sign + intPart.reverse.grouped(3).mkString(sep.toString).reverse + rest
  }

  /** One cell → display string, per the reference's per-type rules:
    * null/NaN invalids render `Inv`; floats are fixed-point at
    * `precision` until |v| crosses the 10^±E_THRESHOLD band, then
    * scientific at `ePrecision`; strings clip to `maxStringWidth`.
    */
  def formatCell(v: Any, dt: DataType, o: Options): String = v match {
    case null => "Inv"
    case d: Double if d.isNaN => "Inv"
    case f: Float if f.isNaN => "Inv"
    case d: Double => formatFloat(d, o)
    case f: Float => formatFloat(f.toDouble, o)
    case n @ (_: Long | _: Int | _: Short | _: Byte) =>
      val s = n.toString
      if (o.numberSeparator) group(s, o.separatorChar) else s
    case b: java.math.BigDecimal => b.toPlainString
    case s: String =>
      if (s.length <= o.maxStringWidth) s
      else s.take(math.max(1, o.maxStringWidth - 3)) + "..."
    case ts: java.sql.Timestamp =>
      ts.toInstant.toString.stripSuffix("Z").replace('T', ' ')
    case other => other.toString
  }

  private def formatFloat(d: Double, o: Options): String = {
    val av = math.abs(d)
    val eMax = math.pow(10, o.eThreshold)
    val eMin = math.pow(10, -o.eThreshold)
    if (d.isInfinity) { if (d > 0) "Inf" else "-Inf" }
    else if (av != 0d && (av >= eMax || av < eMin))
      s"%.${o.ePrecision}e".format(d)
    else {
      val s = s"%.${o.precision}f".format(d)
      if (o.numberSeparator) group(s, o.separatorChar) else s
    }
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Render with head…tail elision (`rt_display.py:315,499`): when the
    * frame holds more than head+tail rows and rowAll is off, show the
    * first `headRows`, one `...` separator row, and the last
    * `tailRows`. Numerics right-justify, everything else left; label
    * columns move first; footers render under their columns.
    */
  def showString(df: DataFrame, opts: Options): String = {
    val ordered = {
      val lbl = labelColumns(df)
      if (lbl.isEmpty) df
      else df.select((lbl ++ df.columns.filterNot(lbl.contains)).map(df(_)): _*)
    }
    val fields = ordered.schema.fields
    val head = fields.map(_.name)
    val total = ordered.count()
    val full = !opts.rowAll && total > (opts.headRows + opts.tailRows).toLong
    val rows: Seq[Seq[String]] =
      if (!full) {
        ordered.collect().toSeq.map(fmtRow(_, fields, opts))
      } else {
        val h = ordered.limit(opts.headRows).collect().toSeq
        val t = ordered.tail(opts.tailRows).toSeq
        (h.map(fmtRow(_, fields, opts)) :+ head.map(_ => "...").toSeq) ++
          t.map(fmtRow(_, fields, opts))
      }
    val fts = footers(df)
    val footerRow =
      if (fts.isEmpty) Nil
      else Seq(head.map(c => fts.getOrElse(c, "")).toSeq)
    val all = (head.toSeq: Seq[String]) +: (rows ++ footerRow)
    val widths = head.indices.map(i => all.map(r => r(i).length).max)
    all.map { r =>
      r.zip(widths).zipWithIndex.map { case ((s, w), i) =>
        // header + numeric cells right-justify; footers follow their
        // column's justification (reference right-justifies numerics)
        if (isNumeric(fields(i).dataType)) " " * (w - s.length) + s
        else s.padTo(w, ' ')
      }.mkString(" | ")
    }.mkString("\n")
  }

  /** Back-compat renderer: first n rows, no elision. */
  def showString(df: DataFrame, n: Int = 20): String =
    showString(df.limit(n), Options(rowAll = true))

  private def fmtRow(r: Row, fields: Array[StructField], o: Options): Seq[String] =
    fields.indices.map(i => formatCell(r.get(i), fields(i).dataType, o))
}
