package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.MetadataBuilder

/** Display affordances — riptable footers/labels (§2.11, port-as-needed).
  *
  * Reference: `Dataset.footer_set_values` (`riptable/rt_dataset.py:5613`),
  * label columns (`riptable/rt_struct.py:2939`), rendered by DisplayTable
  * (`riptable/rt_display.py:192`). Footers/labels live as column
  * metadata on the schema (survives select/rename), and a formatter
  * renders them under a collected preview — display is inherently
  * driver-side small-data.
  */
object Display {

  private val FooterKey = "graft.footer"
  private val LabelKey = "graft.label"

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

  /** Render the first n rows plus the footer line (DisplayTable analog). */
  def showString(df: DataFrame, n: Int = 20): String = {
    val ordered = {
      val lbl = labelColumns(df)
      if (lbl.isEmpty) df
      else df.select((lbl ++ df.columns.filterNot(lbl.contains)).map(df(_)): _*)
    }
    val head = ordered.columns
    val rows = ordered.limit(n).collect().map(_.toSeq.map {
      case null => "null"
      case v => v.toString
    })
    val fts = footers(df)
    val footerRow =
      if (fts.isEmpty) Nil
      else Seq(head.map(c => fts.getOrElse(c, "")).toSeq)
    val all = (head.map(_.toString).toSeq +: (rows.toSeq ++ footerRow))
    val widths = head.indices.map(i => all.map(r => r(i).length).max)
    all.map(r => r.zip(widths).map { case (s, w) => s.padTo(w, ' ') }.mkString(" | "))
      .mkString("\n")
  }
}
