package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** IVF probe-list ranking with the centroid matrix as DATA, not plan
  * literals: one expression node regardless of k.
  *
  * The first formulation (Similarity.ivfProbeListsExpr) builds an
  * `array(struct(quant_dot(emb, lit(c₀)), …), …)` with one literal + one
  * dot expression PER CENTROID — correct, but the plan tree grows O(k·dim)
  * and codegen/analysis costs explode around k ≈ 10³, while IVF wants
  * k ≈ √N (10⁶ at 10¹² vectors). Here the quantized centroids ride along
  * as a constructor field — serialized once with the task, registered via
  * `ctx.addReferenceObj` in codegen — so the expression tree is O(1) and
  * assignment stays a zero-shuffle per-row loop at any k.
  *
  * Math contract (identical to the expression path, oracle-portable):
  * embedding quantized round-half-away ×10⁴ (as [[QuantVec]]), exact int64
  * dots against each centroid, rank by (dot DESC, list_id ASC), return the
  * first `nProbe` list ids.
  */
object IvfProbeImpl {
  private def q(x: Double): Long = QuantVec.q(x)

  def probe(arr: ArrayData, ids: Array[Int], cents: Array[Array[Long]],
      nProbe: Int): ArrayData = {
    val dim = arr.numElements()
    // fail loud on a dimension mismatch (e.g. centroids packed from a
    // previous embedding model): a truncated dot would return
    // plausible-but-wrong assignments and recall would degrade silently
    if (dim != cents(0).length)
      throw new IllegalArgumentException(
        s"embedding dim $dim != centroid dim ${cents(0).length} — " +
          "centroids were built for a different embedding column")
    val qe = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      // fail loud on null elements too: ArrayData.getFloat would read a
      // null slot as 0.0 and silently skew every centroid dot —
      // inconsistent with the dimension check's fail-loud stance
      if (arr.isNullAt(d))
        throw new IllegalArgumentException(
          s"embedding has a null element at index $d — ivf_probe_lists " +
            "requires fully-populated vectors (filter or impute upstream)")
      qe(d) = q(arr.getFloat(d).toDouble)
      d += 1
    }
    val k = cents.length
    val dots = new Array[Long](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      var s = 0L
      d = 0
      while (d < dim) { s += qe(d) * c(d); d += 1 }
      dots(j) = s
      j += 1
    }
    // nProbe argmax passes with ties to the smaller list id — O(k·nProbe),
    // negligible next to the O(k·dim) dot loop above
    val m = math.min(nProbe, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < m) {
      var best = -1
      j = 0
      while (j < k) {
        if (!used(j) && (best < 0 ||
            dots(j) > dots(best) ||
            (dots(j) == dots(best) && ids(j) < ids(best)))) best = j
        j += 1
      }
      used(best) = true
      out(p) = ids(best)
      p += 1
    }
    new GenericArrayData(out)
  }
}

case class IvfProbeLists(
    child: Expression,
    ids: Array[Int],
    cents: Array[Array[Long]],
    nProbe: Int
) extends UnaryExpression {
  require(cents.nonEmpty && ids.length == cents.length,
    "need at least one centroid and one id per centroid")
  require(cents.forall(_.length == cents(0).length),
    "all centroids must have the same dimension")
  require(nProbe > 0, "nProbe must be positive")
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        // containsNull = true is accepted (parquet reads arrays as
        // nullable-element even when no element is null) but a null
        // ELEMENT throws in IvfProbeImpl.probe — ArrayData.getFloat
        // would otherwise read it as 0.0f and silently skew the dots,
        // against this expression's fail-loud stance
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ivf_probe_lists requires array<float> embeddings, got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivf_probe_lists"
  override protected def nullSafeEval(input: Any): Any =
    IvfProbeImpl.probe(input.asInstanceOf[ArrayData], ids, cents, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the centroid matrix is a REFERENCE OBJECT, not generated literals —
    // generated-code size stays constant in k
    val idsRef = ctx.addReferenceObj("ivfIds", ids, "int[]")
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "long[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.IvfProbeImpl.probe($c, $idsRef, $centsRef, $nProbe)")
  }
  override protected def withNewChildInternal(c: Expression): IvfProbeLists =
    copy(child = c)
}
