package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.expr.ArrayDot

/** Session extensions: registers graft's native expressions for SQL use
  * (`SELECT array_dot(a, b)`), the `SparkSessionExtensions` injection
  * point for clusters configured with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.arrayDotDescriptor)
    e.injectFunction(GraftFunctions.hammingDescriptor)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val arrayDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => ArrayDot(children(0), children(1)))

  private[graft] val hammingDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hamming_distance"),
      new ExpressionInfo(classOf[graft.expr.HammingDistance].getName,
        "hamming_distance"),
      (children: Seq[Expression]) =>
        graft.expr.HammingDistance(children(0), children(1)))

  /** Imperative registration into an existing session (for notebooks /
    * tests where the session pre-exists).
    */
  def register(spark: SparkSession): Unit = {
    Seq(arrayDotDescriptor, hammingDescriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    ()
  }
}
