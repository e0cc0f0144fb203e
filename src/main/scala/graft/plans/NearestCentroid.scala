package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native argmax-cosine centroid assignment: for one vector, the
  * (similarity, label) of the nearest of k centroids, as a
  * struct<sim: double, id: int>.
  *
  * Why a kernel: the expression formulation — `greatest` over k
  * `struct(cosine(vec, lit(centroid)), label)` branches — is linear in
  * k at the AST level (k × dim literal nodes, k VecDot calls per row
  * re-reading the input array). It is fine at the 8-centroid gate
  * scale and collapses at IVF/SemDeDup operating scale (k grows with
  * the corpus: k ∝ n / target-cluster-size means hundreds to thousands
  * of centroids at 100 TB). Here the k×dim matrix is ONE row-major
  * Java double[] baked into the plan as a reference object, the loop
  * runs inside whole-stage codegen, and the input vector is read once
  * (its norm computed once, not once per centroid).
  *
  * Arithmetic parity with the expression path (pinned by AnnSpec):
  * per-centroid similarity is EXACTLY `Ann.cosine` over `vec_dot` —
  * left-to-right double accumulation of dot(v,c), dot(v,v), dot(c,c),
  * sim = d > 0 ? dot/(sqrt·sqrt) : 0.0 — and the argmax is EXACTLY
  * `greatest(struct(sim, id))`: lexicographic max, i.e. highest sim,
  * ties to the higher label, NaN ordered above any non-NaN
  * (Double.compare semantics, same as Spark's struct ordering).
  *
  * A vector whose length differs from the centroid dim yields NULL
  * (the malformed row surfaces loudly; the expression path instead
  * folds mismatches to sim 0.0 through cosine's null-guard, so parity
  * is claimed for well-formed corpora only — the only kind the
  * operators accept).
  *
  * Registered as `nearest_centroid(vec, flat_matrix, labels)` where
  * `flat_matrix` is a foldable row-major array<double> literal of
  * length k×dim and `labels` a foldable array<int> literal of length k
  * — bounded model metadata by the same contract as
  * [[graft.ops.Ann.ivfTopK]]'s centroid argument.
  */
final case class NearestCentroid(
    child: Expression,
    flat: Array[Double],
    labels: Array[Int],
) extends UnaryExpression {

  private val dim: Int = flat.length / labels.length

  override def dataType: DataType = StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("id", IntegerType, nullable = false)))
  override def nullable: Boolean = true // null input or length mismatch
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData], flat, labels, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = NearestCentroid.getClass.getName.stripSuffix("$")
    val flatRef = ctx.addReferenceObj("ncFlat", flat, "double[]")
    val labelsRef = ctx.addReferenceObj("ncLabels", labels, "int[]")
    val lf = isFloat
    // freshName, NOT a fixed identifier: with a non-nullable child the
    // block is emitted unbraced at method scope, so two instances in
    // one generated method would collide (the RangeSet.scala hazard)
    val r = ctx.freshName("ncR")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |InternalRow $r = $obj.compute($v, $flatRef, $labelsRef, $dim, $lf);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
}

object NearestCentroid {
  /** Argmax loop; see class doc for the exact-parity contract. */
  def compute(
      vec: ArrayData,
      flat: Array[Double],
      labels: Array[Int],
      dim: Int,
      isFloat: Boolean,
  ): InternalRow = {
    val n = vec.numElements()
    if (n != dim) return null
    // dot(v,v) once, left-to-right, float widened per element like vec_dot
    var vv = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      vv += x * x
      i += 1
    }
    val nv = math.sqrt(vv)
    var bestSim = 0.0
    var bestId = 0
    var first = true
    var c = 0
    while (c < labels.length) {
      val off = c * dim
      var vc = 0.0
      var cc = 0.0
      var j = 0
      while (j < dim) {
        val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        val y = flat(off + j)
        vc += x * y
        cc += y * y
        j += 1
      }
      val d = nv * math.sqrt(cc)
      val sim = if (d > 0) vc / d else 0.0
      val id = labels(c)
      // lexicographic (sim, id) max with Double.compare NaN/±0 order —
      // identical to greatest(struct(sim, id))
      val cmp = java.lang.Double.compare(sim, bestSim)
      if (first || cmp > 0 || (cmp == 0 && id > bestId)) {
        bestSim = sim; bestId = id; first = false
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestSim, bestId))
  }
}
