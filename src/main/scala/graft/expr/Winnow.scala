package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint statistics (Schleimer/Wilkerson/Aiken 2003,
  * "local algorithms for document fingerprinting") as ONE native
  * expression: per document, split on single spaces (Spark `split`
  * semantics: limit −1, empties kept), hash every k-gram (first 4 md5
  * bytes — the numeric image of the composable plan's 8-hex-char
  * `substring(md5(...), 1, 8)`, with identical ordering: fixed-length
  * hex compares lexicographically exactly as the 4 bytes compare
  * unsigned), then slide a w-gram window selecting the RIGHTMOST
  * minimal hash (the `<=` fold rule) and count the DISTINCT selected
  * positions — which equals the composable plan's
  * `array_distinct("hash:pos")` count, because the position uniquely
  * determines its gram hash.
  *
  * Returns `struct<n_grams long, n_fingerprints long>`, NULL when the
  * doc has fewer than w grams (the `size(g) >= w` pre-filter). The
  * composable formulation (nested `transform`/`aggregate` folds +
  * per-gram `md5` Columns) is interpreted per element and was the
  * board's #2 steady cost at sf0.1; this is a flat byte loop with an
  * O(m) selection bitmap. CodegenFallback: per-row cost is dominated
  * by the md5 calls, not the eval dispatch.
  */
case class WinnowStats(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_fingerprints", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"winnow_stats needs a string column, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = words.length
    val m = math.max(n - (k - 1), 1)
    if (m < w) return null
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      val end = math.min(i + k, n)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      md.reset()
      val dg = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      hashes(i) = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
      i += 1
    }
    val selected = new Array[Boolean](m)
    var st = 0
    while (st <= m - w) {
      var best = st
      var j = st + 1
      while (j < st + w) {
        if (hashes(j) <= hashes(best)) best = j
        j += 1
      }
      selected(best) = true
      st += 1
    }
    var count = 0L
    i = 0
    while (i < m) { if (selected(i)) count += 1; i += 1 }
    InternalRow(m.toLong, count)
  }

  override def prettyName: String = "winnow_stats"

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowStats = copy(child = newChild)
}

object Winnow {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Column wrapper: winnowing (k-gram, w-window) fingerprint stats. */
  def winnow_stats(text: Column, k: Int, w: Int): Column = {
    require(k >= 1 && w >= 1, s"bad winnow geometry: k=$k w=$w")
    ColumnBridge.column(WinnowStats(ColumnBridge.expression(text), k, w))
  }
}
