package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic sampling gate in basis points: fmix64 (the same
  * splitmix-style finalizer [[SignLshImpl.weight]] uses for LSH
  * hyperplanes) of an int64 id, reduced to [0, 10000). A row is "in the
  * sample at rate r bp" iff gate < r — so samples at different rates NEST
  * (r1 < r2 ⇒ sample(r1) ⊆ sample(r2)), re-runs are reproducible with no
  * stored randomness, and the oracle replays the exact bit pattern with
  * UBIGINT xor/shift + HUGEINT mod-2^64 multiplies (q_sample_mix).
  *
  * The final `% 10000` has the usual modulo bias of ~2^-31 per bucket —
  * irrelevant for curation sampling and exactly reproduced by the oracle.
  */
object SampleHashImpl {
  /** The full mixed value — a BIJECTION on int64 (xor-shift and odd-
    * constant multiply are both invertible), so distinct ids get distinct
    * keys: ordering by it is a deterministic, seedless global shuffle
    * with zero collision risk, valid as a unique packing order column.
    */
  def mix(id: Long): Long = {
    var x = id ^ 0x9E3779B97F4A7C15L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  def gateBp(id: Long): Long = (mix(id) >>> 20) % 10000L
}

case class SampleHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sample_gate_bp"
  // fail at analysis, not with a mode-dependent runtime cast: interpreted
  // eval would CCE on a non-long child while codegen silently widens
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sample_gate_bp requires a bigint id, got ${child.dataType} — " +
          "cast the id to long first")
  override protected def nullSafeEval(input: Any): Any =
    SampleHashImpl.gateBp(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.SampleHashImpl.gateBp($c)")
  override protected def withNewChildInternal(c: Expression): SampleHash =
    copy(child = c)
}

/** Deterministic global-shuffle key: the FULL fmix64 value of an int64 id
  * (the same mix [[SampleHash]] reduces to a gate). Because the mix is a
  * bijection, ordering by it is a uniform, reproducible, seedless shuffle
  * of the corpus — the "shuffle the training data" step before shard
  * packing — and the key is unique whenever the id is, satisfying
  * packShards' unique-order-column contract with no tiebreaker. The
  * oracle replays the identical bit pattern (UBIGINT xor/shift + HUGEINT
  * mod-2^64 multiplies), interpreted back as SIGNED int64 order.
  */
case class ShuffleHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shuffle_hash64"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shuffle_hash64 requires a bigint id, got ${child.dataType} — " +
          "cast the id to long first")
  override protected def nullSafeEval(input: Any): Any =
    SampleHashImpl.mix(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.SampleHashImpl.mix($c)")
  override protected def withNewChildInternal(c: Expression): ShuffleHash =
    copy(child = c)
}
