package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle extraction: the DISTINCT rolling k-token shingle
  * hashes of a text, as array<long> — one kernel call per row inside
  * whole-stage codegen. Shares [[NgramJaccardText]]'s tokenizer and
  * rolling XXH64 combination, so `shingle_hashes(a) ∩ shingle_hashes(b)`
  * counts exactly what `ngram_jaccard_text(a, b, k)` measures.
  *
  * This exists because the higher-order-function shingle formulation
  * ([[graft.ops.Dedup.shingles]]) evaluates INTERPRETED (LambdaFunction
  * is CodegenFallback): an explode over it costs ~26 s for 5000 docs at
  * sf0.1, vs sub-second through this kernel — and hashing also slims
  * every downstream exchange from shingle STRINGS to 8-byte keys.
  */
final case class ShingleText(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expects a string argument, got ${child.dataType.catalogString}")


  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): ShingleText =
    copy(child = newChild)

  override def nullSafeEval(t: Any): Any =
    ShingleText.compute(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ShingleText.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $obj.compute($t, $k);")
  }
}

object ShingleText {
  def compute(text: UTF8String, k: Int): ArrayData = {
    val set = NgramJaccardText.shingleSet(NgramJaccardText.tokenHashes(text), k)
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    // deterministic order for reproducible dumps/tests
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
