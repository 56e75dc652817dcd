package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multiset (`riptable/rt_multiset.py:20`): a Struct of same-shape
  * member Datasets — the result shape of multi-function groupbys. The
  * engine's flattened form is ONE DataFrame with `member<sep>col`
  * column names (GroupOps.aggMulti's `f_col` convention,
  * `rt_multiset.py:631` flatten); this object provides the member view
  * and the depth-first function application `cascade`
  * (`rt_multiset.py:745`).
  *
  * Scale note: `members` results are PROJECTIONS of one logical plan —
  * no data is copied, and column pruning keeps each member's scan
  * narrow. `cascade` re-joins member results on the key columns; with
  * dictionary-sized multiset frames (they are aggregates by
  * construction) those joins broadcast.
  */
object MultisetOps {

  /** Member names in first-appearance order. Keys are passed
    * explicitly (NOT inferred from "name contains no sep"): real key
    * names routinely contain the separator themselves (`l_returnflag`
    * under sep "_"), so only the caller knows the key set — the same
    * reason riptable's Multiset carries its gbkeys beside the members
    * (`rt_multiset.py:724` label_fixup).
    */
  def memberNames(df: DataFrame, keys: Seq[String],
                  sep: String = "_"): Seq[String] =
    df.columns.toSeq.filterNot(keys.contains).filter(_.contains(sep))
      .map(n => n.substring(0, n.indexOf(sep))).distinct

  /** Split a flattened multiset frame into its member Datasets: key
    * columns replicate into every member; `m<sep>c` becomes member m's
    * column `c`.
    */
  def members(df: DataFrame, keys: Seq[String],
              sep: String = "_"): Map[String, DataFrame] =
    memberNames(df, keys, sep).map { m =>
      val mine = df.columns.toSeq
        .filterNot(keys.contains).filter(_.startsWith(m + sep))
      m -> df.select((keys.map(col) ++ mine.map(n =>
        col(n).as(n.substring(m.length + sep.length)))): _*)
    }.toMap

  /** cascade (`rt_multiset.py:745`): apply `f` to each member Dataset
    * and rebuild the flattened frame — member results keep their key
    * columns (as riptable's cascade expects each result to be a
    * same-keyed Dataset) and re-join on them with the `member<sep>col`
    * names restored.
    */
  def cascade(df: DataFrame, keys: Seq[String], sep: String = "_")
             (f: DataFrame => DataFrame): DataFrame = {
    val names = memberNames(df, keys, sep)
    require(names.nonEmpty, "cascade: no member-prefixed columns")
    val mem = members(df, keys, sep)
    names.map { m =>
      val fd = f(mem(m))
      val rest = fd.columns.toSeq.filterNot(keys.contains)
      fd.select((keys.map(col) ++ rest.map(c =>
        col(c).as(s"$m$sep$c"))): _*)
    }.reduce((a, b) => a.join(b, keys, "full_outer"))
  }
}
