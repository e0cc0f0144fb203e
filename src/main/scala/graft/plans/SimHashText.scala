package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a text column: bit i of the result is the
  * sign of Σ_tokens (bit i of XXH64(token) ? +1 : -1), computed in one
  * kernel call per row (same tokenizer as [[MinHashText]]). Replaces the
  * explode + 64-partial-sum aggregate: no shuffle, no interpreted
  * higher-order functions.
  */
final case class SimHashText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expects a string argument, got ${child.dataType.catalogString}")


  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SimHashText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = SimHashText.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $obj.compute($t);")
  }
}

object SimHashText {

  private val TOKEN_SEED = 0x9E3779B97F4A7C15L

  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val counts = new Array[Int](64)
    var h = 0L
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      val c: Int = if (i < bytes.length) bytes(i) & 0xFF else ' '
      val lc = if (c >= 'A' && c <= 'Z') c + 32 else c
      // TOKENIZER COPY: keep byte-for-byte in sync with NgramJaccardText.tokenHashes
      val alnum = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9') || lc >= 0x80
      if (alnum) {
        h = XXH64.hashLong(lc.toLong, if (inTok) h else TOKEN_SEED)
        inTok = true
      } else if (inTok) {
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        inTok = false
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
