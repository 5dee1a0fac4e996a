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
    e.injectFunction(GraftFunctions.bloomAggDescriptor)
    e.injectFunction(GraftFunctions.bloomMightContainDescriptor)
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

  /** Spark's OWN bloom-filter machinery (`BloomFilterAggregate` /
    * `BloomFilterMightContain` — the expressions behind AQE runtime
    * row-level filtering), surfaced to SQL: Spark 4 keeps them out of
    * the public FunctionRegistry, but they are exactly the mergeable
    * build + codegen'd probe a bloom pre-filter needs, so we register
    * them rather than reimplement the sketch.
    * `bloom_agg(xxhash64(key)[, estimatedItems[, numBits]])` builds a
    * binary sketch; `bloom_might_contain(bf, xxhash64(key))` probes it.
    */
  private[graft] val bloomAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[Expression]) => {
        val agg = children match {
          case Seq(c) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate
              .BloomFilterAggregate(c)
          case Seq(c, items) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate
              .BloomFilterAggregate(c, items)
          case Seq(c, items, bits) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate
              .BloomFilterAggregate(c, items, bits)
          case _ => throw new IllegalArgumentException(
            "bloom_agg(child[, estimatedItems[, numBits]])")
        }
        agg.toAggregateExpression()
      })

  private[graft] val bloomMightContainDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1)))

  /** Imperative registration into an existing session (for notebooks /
    * tests where the session pre-exists).
    */
  def register(spark: SparkSession): Unit = {
    Seq(arrayDotDescriptor, hammingDescriptor, bloomAggDescriptor,
      bloomMightContainDescriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    ()
  }
}
