package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding k-token window materialization: for a token array of
  * length n, the array of n-k+1 window strings, window i = tokens
  * [i..i+k-1] joined by `sep` (empty array when n < k).
  *
  * Why a kernel (the [[graft.ops.Dedup.dedupSpans]] hot path): the HOF
  * formulation — `transform(sequence(0, n-k), i -> concat_ws(sep,
  * slice(toks, i+1, k)))` — evaluates the lambda INTERPRETED per
  * window, knocking the projection out of whole-stage codegen (the
  * library's measured 15s→0.1s MinHash lesson; SCALE.md "NO HOF in any
  * per-row hot path"). Here the loop is a single static call inside
  * the generated code, one window string allocation each — the same
  * shape as [[NearestCentroid]].
  *
  * Cost is O(n·k) bytes copied per document (each token lands in k
  * windows); that is inherent to MATERIALIZING windows, not to this
  * kernel. Span-dedup callers that only need window identity at 100 TB
  * hash the result immediately (`xxhash64(window)`), so the string is
  * a transient in-projection value that never reaches the shuffle —
  * see dedupSpans' hashKeys knob.
  *
  * Null contract: null input → null; null ELEMENTS are not accepted
  * (tokenizers never produce them). The type check deliberately admits
  * `containsNull = true` array types — CaseWhen branch coercion widens
  * even provably-null-free token arrays (e.g. `when(empty).otherwise(
  * split(...))`, the dedupSpans tokenizer) to the nullable container
  * type — so the contract is enforced at RUNTIME: a null element
  * throws, never a silently shorter window string.
  * Registered as `sliding_windows(tokens, k, sep)` with foldable k and
  * sep ([[GraftExtensions]]).
  */
final case class SlidingWindows(
    child: Expression,
    k: Int,
    sep: UTF8String,
) extends UnaryExpression {

  require(k > 0, s"window size must be positive, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sliding_windows expects array<string>, got ${other.catalogString}")
  }

  // UTF8String compares by value, so the default case-class equality is
  // canonicalization-safe (unlike RangeSet's primitive-array fields).

  override protected def withNewChildInternal(newChild: Expression): SlidingWindows =
    copy(child = newChild)

  override def nullSafeEval(v: Any): Any =
    SlidingWindows.compute(v.asInstanceOf[ArrayData], k, sep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = SlidingWindows.getClass.getName.stripSuffix("$")
    val sepRef = ctx.addReferenceObj("swSep", sep, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $obj.compute($v, $k, $sepRef);")
  }
}

object SlidingWindows {
  /** The window loop; see class doc. Never returns null; throws on a
    * null element (UTF8String.concatWs would silently SKIP it, yielding
    * a shorter window string — a corrupt dedup key, not an error).
    */
  def compute(toks: ArrayData, k: Int, sep: UTF8String): ArrayData = {
    val n = toks.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val buf = new Array[UTF8String](k)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < k) {
        val t = toks.getUTF8String(i + j)
        if (t == null) throw new IllegalArgumentException(
          s"sliding_windows: null token at index ${i + j} — token arrays must be null-element-free")
        buf(j) = t
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, buf: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
