package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SeaTable "view" = stored filters + sorts + hidden columns. The reference
  * downloads view metadata and compiles it to one SQL query
  * (Table.get_view, seaserpent/base.py:1359). We model the view definition
  * explicitly and compile it to a Catalyst plan.
  */
final case class ViewFilter(column: String, predicate: String, terms: Seq[Any])

final case class ViewDef(name: String,
                         filters: Seq[ViewFilter],
                         sorts: Seq[(String, Boolean)],     // (col, ascending)
                         hiddenCols: Seq[String],
                         // view-level `filter_conjunction` (reference
                         // base.py:1453): "And" | "Or", applied across the
                         // grouped predicates
                         conjunction: String = "And")

object ViewCompiler {

  /** Compile one grouped predicate. Mirrors the reference's predicate
    * vocabulary (base.py:1430-1460: is / is_not / is_any_of / is_none_of /
    * is_empty / is_not_empty / contains / does_not_contain / greater /
    * less / ...). */
  private def compileFilter(t: Table, f: ViewFilter): Column = {
    val col = t(f.column)
    f.predicate match {
      case "is"                  => col === f.terms.head
      case "is_not"              => col =!= f.terms.head
      case "is_any_of"           => col.isin(f.terms: _*)
      case "is_none_of"          => !col.isin(f.terms: _*)
      case "is_empty"            => col.isnull()
      case "is_not_empty"        => col.notnull()
      case "contains"            => col.contains(f.terms.head.toString)
      case "does_not_contain"    => !col.contains(f.terms.head.toString)
      case "greater"             => col > f.terms.head
      case "greater_or_equal"    => col >= f.terms.head
      case "less"                => col < f.terms.head
      case "less_or_equal"       => col <= f.terms.head
      case bad => throw new IllegalArgumentException(s"predicate '$bad'")
    }
  }

  /** `Table.get_view` analog: apply filters (per-column groups combined
    * with the view's `filter_conjunction`, as the reference groups
    * same-column is/is_not terms into is_any_of / is_none_of and then
    * joins every compiled group with the view-level AND/OR —
    * base.py:1396-1460), sorts, and hidden-column pruning. Pruning happens
    * in the same plan so the scan only reads visible columns. */
  def getView(t: Table, view: ViewDef,
              hideCols: Boolean = true, sort: Boolean = true): DataFrame = {
    // merge same-column is/is_not terms into set predicates, like the
    // reference's filters_grp; every OTHER filter compiles individually and
    // all are AND-ed (a groupBy-and-keep-head would silently drop repeated
    // contains/greater/... filters on the same column)
    // contains / does_not_contain fan out one predicate PER TERM (the
    // reference loops `for t in terms` appending one filter each —
    // base.py:1444-1448); each fanned predicate then joins the view-level
    // conjunction like any other compiled group
    val expanded = view.filters.flatMap { f =>
      if ((f.predicate == "contains" || f.predicate == "does_not_contain")
          && f.terms.size > 1)
        f.terms.map(t => ViewFilter(f.column, f.predicate, Seq(t)))
      else Seq(f)
    }
    val (mergeable, individual) = expanded.partition(f =>
      f.predicate == "is" || f.predicate == "is_not")
    val merged = mergeable.groupBy(f => (f.column, f.predicate)).map {
      case ((c, "is"), fs) if fs.map(_.terms.size).sum > 1 =>
        ViewFilter(c, "is_any_of", fs.flatMap(_.terms))
      case ((c, "is_not"), fs) if fs.map(_.terms.size).sum > 1 =>
        ViewFilter(c, "is_none_of", fs.flatMap(_.terms))
      case (_, fs) => fs.head
    }.toSeq
    val combine: (Column, Column) => Column = view.conjunction.toLowerCase match {
      case "and" => _ && _
      case "or"  => _ || _
      case bad => throw new IllegalArgumentException(
        s"filter_conjunction '$bad' (expected And/Or — reference base.py:1453)")
    }
    val pred = (merged ++ individual).map(compileFilter(t, _))
      .reduceOption(combine).getOrElse(lit(true))
    val visible = t.df.columns.filterNot(c => hideCols && view.hiddenCols.contains(c))
    var out = t.df.filter(pred).select(visible.map(t.df(_)): _*)
    if (sort && view.sorts.nonEmpty)
      out = out.orderBy(view.sorts.map { case (c, asc) =>
        if (asc) asc_nulls_first(c) else desc_nulls_last(c)
      }: _*)
    out
  }
}
