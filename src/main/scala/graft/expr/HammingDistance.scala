package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Hamming distance between two equal-length strings (simhash
  * bit-strings): the number of differing byte positions, NULL on length
  * mismatch. A composable formulation needs a per-character
  * split+zip+filter chain — interpreted, allocation-heavy; this is a
  * tight codegen'd byte loop over the UTF8String buffers (bit-strings
  * are ASCII, so byte compare == char compare).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"HammingDistance needs two strings, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    if (x.numBytes() != y.numBytes()) return null
    val xb = x.getBytes
    val yb = y.getBytes
    var d = 0
    var i = 0
    while (i < xb.length) {
      if (xb(i) != yb(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      s"""
         |if ($a.numBytes() != $b.numBytes()) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $xb = $a.getBytes();
         |  byte[] $yb = $b.getBytes();
         |  int $d = 0;
         |  for (int $i = 0; $i < $xb.length; $i++) {
         |    if ($xb[$i] != $yb[$i]) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Column API (Spark 4 Column↔Expression bridge). */
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(
      HammingDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
