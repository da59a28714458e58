package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column completeness + cardinality in one pass —
  * the report that decides partition keys, salt factors, and dictionary
  * encodings before a 100 TB job is keyed on the wrong column.
  *
  * Shape: ONE aggregate over the scan. With `exact = true`, the multiple
  * COUNT(DISTINCT) columns plan as Spark's Expand (input ×|cols| into a
  * partial agg — map-side combined, one shuffle). At true scale pass
  * `exact = false`: approx_count_distinct(HLL) keeps the pass single-agg
  * with constant state per column. The long output shape (one row per
  * column) comes from a foldable `stack`, not a second scan.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__d_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Raw column names are interpolated into SQL below — a name containing
    // a quote or backtick would otherwise break parsing or mis-label rows.
    def lit1(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def id(s: String) = "`" + s.replace("`", "``") + "`"
    val stacked = cols
      .map(c => s"${lit1(c)}, `__total` - ${id(s"__n_$c")}, ${id(s"__d_$c")}")
      .mkString(", ")
    one.select(
      expr(s"stack(${cols.size}, $stacked) AS (column_name, n_null, n_distinct)"),
      col("__total").as("n_rows"))
      .select("column_name", "n_rows", "n_null", "n_distinct")
  }
}
