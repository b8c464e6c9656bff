package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

/** One conversation turn — the engine's primary input row.
  *
  * Shape fixed by the driver contract (BASELINE.json `input_hint`):
  * `(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  * ts:timestamp)`. `text`/`tool` are nullable (Option semantics of the
  * reference, wary/src/lib.rs:267-279).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

object Turn {
  val schema: StructType = StructType(
    Seq(
      StructField("conv_id", StringType, nullable = false),
      StructField("turn_idx", IntegerType, nullable = false),
      StructField("role", StringType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("tool", StringType, nullable = true),
      StructField("ts", TimestampType, nullable = false)
    )
  )
}

/** Deterministic synthetic transcript generator (no external data).
  *
  * Properties chosen to exercise the engine the way a 10^12-turn production
  * table would:
  *  - conversation sizes follow a Zipf-ish long tail plus a few
  *    "mega-conversations" (skew realism — SURVEY.md §7.4 item 9);
  *  - `text` mixes ASCII and Unicode (Greek capitals, ß, İ, emoji,
  *    NBSP U+00A0) to exercise casing/trim/length parity (SURVEY.md §7.4);
  *  - duplicate `ts` values within a conversation and out-of-order rows to
  *    exercise leakage ordering; NULL `text`/`tool` to exercise `required`.
  *
  * Generation is distributed: we parallelize over conversation ids and
  * generate each conversation's turns on executors — the driver never holds
  * the table, so the same code scales to arbitrarily large synthetic inputs.
  */
object TranscriptGen {
  private val roles = Array("user", "assistant", "system", "tool")
  private val tools = Array("search", "calc", "browse", "code", null, null)
  private val words = Array(
    "the", "turn", "agent", "tool", "call", "answer", "query", "spark",
    "join", "window", "feature", "Straße", "ὈΔΥΣΣΕΎΣ", "İstanbul",
    "emoji😀", "café", " padded ", "ok"
  )

  /** xorshift-ish deterministic hash → [0, 1) */
  private def u01(seed: Long): Double = {
    var x = seed * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 29; x *= 0x94D049BB133111EBL
    x ^= x >>> 32
    (x >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Turns for one conversation, deterministic in (seed, convNo). */
  def turnsFor(seed: Long, convNo: Long, maxLen: Int): Seq[Turn] = {
    val convId = s"conv_$convNo"
    // Zipf-ish: most convs short; every 97th conv is a mega-conversation.
    val base = 2 + (u01(seed ^ convNo) * 18).toInt
    val n =
      if (convNo % 97 == 0) maxLen
      else math.min(base * (1 + (u01(seed ^ (convNo * 31)) * 3).toInt), maxLen)
    val t0 = 1700000000000L + (convNo % 1000L) * 60000L
    (0 until n).map { i =>
      val r = u01(seed ^ (convNo * 1315423911L) ^ i.toLong)
      val role = roles(((r * 977).toInt) % roles.length)
      val nWords = 1 + ((r * 7919).toInt % 9)
      val text =
        if (r < 0.04) null // exercise required / Option semantics
        else
          (0 until nWords)
            .map(k => words(((r * 104729).toInt + k * 31 + i) % words.length))
            .mkString(" ") + (if (r < 0.2) "  " else "")
      val tool = tools(((r * 31337).toInt) % tools.length)
      // duplicate ts for ~10% of turns (ties) and occasional backwards step
      // (out-of-order ingestion) — leakage ordering must survive both.
      val step = if (r < 0.1) 0L else 1000L + (r * 5000).toLong
      val jitter = if (r > 0.9) -500L else 0L
      Turn(convId, i, role, text, tool, new Timestamp(t0 + i * step + jitter))
    }
  }

  /** Distributed generation of `nConvs` conversations. */
  def generate(
      spark: SparkSession,
      nConvs: Long,
      seed: Long = 42L,
      maxLen: Int = 4096,
      partitions: Int = 32
  ): Dataset[Turn] = {
    import spark.implicits._
    spark
      .range(0L, nConvs, 1L, partitions)
      .as[Long]
      .flatMap(c => turnsFor(seed, c, maxLen))
  }

  def generateDF(spark: SparkSession, nConvs: Long, seed: Long = 42L): DataFrame =
    generate(spark, nConvs, seed).toDF()
}
