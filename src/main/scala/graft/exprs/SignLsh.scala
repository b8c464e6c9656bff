package graft.exprs

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass sign-bit LSH bucket id: `nBits` hyperplane dot products over a
  * float embedding in a single JVM loop. Bit-identical to the HOF
  * composition it replaces (Similarity.lshBucketHof — same splitmix weight
  * derivation, same integer accumulation), tested in OpsSpec.
  *
  * EXACT-INTEGER math end to end (oracle-portable): hyperplane weights are
  * pseudo-random INTEGERS in [-2^20, 2^20) derived from a splitmix-style
  * 64-bit mix of (bit, dim), the embedding is quantized exactly like
  * [[QuantVec]] (round-half-away ×10^4, |q| ≤ ~2^14), and the sign test is
  * on the int64 dot (≤ 2^40 for 64 dims — no overflow, no float-summation
  * order sensitivity). The DuckDB oracle reproduces every step in SQL
  * (UBIGINT xor/shift + HUGEINT mod-2^64 multiply).
  *
  * The HOF form evaluates `nBits` interpreted zip_with+aggregate passes per
  * row; this is one compiled loop with the hyperplane matrix computed once
  * per (nBits, dim) and cached per executor.
  */
object SignLshImpl {
  private val cache = new ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  /** splitmix-style integer weight in [-2^20, 2^20). */
  def weight(bit: Int, d: Int): Long = {
    var x = (bit.toLong << 32) ^ d.toLong ^ 0x9E3779B97F4A7C15L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    (x >>> 43) - (1L << 20)
  }

  private def weights(nBits: Int, dim: Int): Array[Array[Long]] =
    cache.computeIfAbsent((nBits, dim), { case (b, d) =>
      Array.tabulate(b, d)(weight)
    })

  private def q(x: Double): Long = QuantVec.q(x)

  def bucket(arr: ArrayData, nBits: Int): Long = {
    val dim = arr.numElements()
    val w = weights(nBits, dim)
    val qe = new Array[Long](dim)
    var d = 0
    while (d < dim) { qe(d) = q(arr.getFloat(d).toDouble); d += 1 }
    var out = 0L
    var b = 0
    while (b < nBits) {
      val wb = w(b)
      var dot = 0L
      d = 0
      while (d < dim) {
        dot += qe(d) * wb(d)
        d += 1
      }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class SignLsh(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits > 0 && nBits <= 63, "nBits must be in 1..63")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_lsh"
  override protected def nullSafeEval(input: Any): Any =
    SignLshImpl.bucket(input.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.SignLshImpl.bucket($c, $nBits)")
  override protected def withNewChildInternal(c: Expression): SignLsh =
    copy(child = c)
}
