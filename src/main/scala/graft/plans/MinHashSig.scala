package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: one pass over an `array<long>` of shingle
  * hashes maintaining `numHashes` running minima — signature[i] =
  * min over h of XXH64(h, seed=i).
  *
  * Why a custom expression (SURVEY §7.4 escape hatch): the built-in
  * formulation (`numHashes` × `array_min(transform(hashes, …))`)
  * allocates `numHashes` intermediate arrays per row — measured
  * allocation-bound at ~14s for 5000 docs regardless of cores. This
  * kernel allocates one `long[numHashes]` per row and runs the tight
  * two-level loop in generated code: ~100× less garbage, embarrassingly
  * parallel.
  */
final case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val v = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(v, i.toLong)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val uad = classOf[UnsafeArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |long[] _mins = new long[$numHashes];
         |java.util.Arrays.fill(_mins, Long.MAX_VALUE);
         |int _n = $arr.numElements();
         |for (int _j = 0; _j < _n; _j++) {
         |  long _v = $arr.getLong(_j);
         |  for (int _i = 0; _i < $numHashes; _i++) {
         |    long _h = $xxh.hashLong(_v, (long) _i);
         |    if (_h < _mins[_i]) _mins[_i] = _h;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray(_mins);
       """.stripMargin
    })
  }
}
