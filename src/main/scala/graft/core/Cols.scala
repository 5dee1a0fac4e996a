package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Column references for DATA-DRIVEN column names.
  *
  * `functions.col("A.B.C")` parses dots as nested-field access, so any
  * column whose name comes from user data (metric names — which for
  * MultiIndex sensors are dot-joined level tuples, `client.py:545-547`)
  * must be referenced through backtick quoting. One helper so the rule
  * lives in one place.
  */
object Cols {
  /** `col` that treats `name` as a LITERAL column name (backtick-quoted,
    * embedded backticks escaped by doubling per the SQL ident rules).
    */
  def q(name: String): Column =
    col("`" + name.replace("`", "``") + "`")
}
