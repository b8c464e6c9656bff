package graft.exprs

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass sign-bit LSH bucket id: `nBits` hyperplane dot products over a
  * float embedding in a single JVM loop. Bit-identical to the HOF
  * composition it replaces (Similarity.lshBucketHof — same splitmix weight
  * derivation, same double accumulation order), tested in OpsSpec.
  *
  * The HOF form evaluates `nBits` interpreted zip_with+aggregate passes per
  * row; this is one compiled loop with the hyperplane matrix computed once
  * per (nBits, dim) and cached per executor.
  */
object SignLshImpl {
  private val cache = new ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** splitmix-style weight in [-1, 1), identical to the HOF derivation. */
  private def weight(bit: Int, d: Int): Double = {
    var x = (bit.toLong << 32) ^ d.toLong ^ 0x9E3779B97F4A7C15L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    (x >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  private def weights(nBits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nBits, dim), { case (b, d) =>
      Array.tabulate(b, d)(weight)
    })

  def bucket(arr: ArrayData, nBits: Int): Long = {
    val dim = arr.numElements()
    val w = weights(nBits, dim)
    var out = 0L
    var b = 0
    while (b < nBits) {
      val wb = w(b)
      var dot = 0.0
      var d = 0
      while (d < dim) {
        dot += arr.getFloat(d).toDouble * wb(d)
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
