package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint-resumable partitioned batch writes with per-partition
  * lineage + metrics (north rule: "resumable from checkpoint with
  * per-partition lineage and row-count/skew metrics").
  *
  * Mechanics (local-parquet emulation of Iceberg snapshot commits —
  * SURVEY.md §7.4 item 7; in production each bucket commit maps to an
  * Iceberg snapshot and the manifest to the snapshot log):
  *
  *  - output is hash-bucketed on a key column into `nBuckets` directories
  *    `bucket=N`;
  *  - a run writes ONLY buckets absent from the manifest, in a single
  *    distributed pass (dynamic partitioned write into a staging dir);
  *  - each completed bucket is atomically promoted (directory rename) and
  *    recorded as a manifest entry `_manifest/bucket-N.json` carrying
  *    lineage (input path, run id) and metrics (row count);
  *  - a killed run leaves only staging garbage + already-committed
  *    buckets; rerunning converges to the identical final output.
  */
object Checkpoint {

  final case class BucketEntry(bucket: Int, rows: Long, input: String, runId: String)

  private def manifestDir(out: String): Path = Paths.get(out, "_manifest")

  def committedBuckets(out: String): Set[Int] = {
    val dir = manifestDir(out)
    if (!Files.exists(dir)) Set.empty
    else
      scala.util.Using.resource(Files.list(dir)) { stream =>
        stream.iterator.asScala
          .map(_.getFileName.toString)
          .collect { case s if s.startsWith("bucket-") && s.endsWith(".json") =>
            s.stripPrefix("bucket-").stripSuffix(".json").toInt
          }
          .toSet
      }
  }

  /** Returns the set of buckets committed by this run. */
  def write(
      df: DataFrame,
      keyCol: String,
      out: String,
      nBuckets: Int,
      input: String,
      runId: String
  ): Set[Int] = {
    val done = committedBuckets(out)
    if (done.size == nBuckets) return Set.empty
    val bucketed = df.withColumn("__bucket", pmod(hash(col(keyCol)), lit(nBuckets)))
    val remaining = bucketed.filter(!col("__bucket").isin(done.toSeq: _*))

    val staging = s"$out/_staging_$runId"
    // one distributed pass over the remaining rows
    remaining.write
      .mode("overwrite")
      .partitionBy("__bucket")
      .parquet(staging)

    Files.createDirectories(manifestDir(out))
    val spark = df.sparkSession
    val stagingPath = Paths.get(staging)
    val promoted = scala.collection.mutable.Set[Int]()

    // Per-bucket manifest row counts from ONE job over the staged output
    // (__bucket is its partition column, so count() is served from parquet
    // footers) — NOT one read-back job per bucket, which at real bucket
    // counts means thousands of sequential driver round-trips.
    val stagedCounts: Map[Int, Long] =
      if (Files.exists(stagingPath) && {
          scala.util.Using.resource(Files.list(stagingPath))(
            _.iterator.asScala.exists(
              _.getFileName.toString.startsWith("__bucket=")))
        })
        spark.read.parquet(staging)
          .groupBy("__bucket").count()
          .collect()
          .map(r => r.getInt(0) -> r.getLong(1))
          .toMap
      else Map.empty

    def commit(b: Int, rows: Long): Unit = {
      val entry =
        s"""{"bucket":$b,"rows":$rows,"input":"$input","run_id":"$runId"}"""
      val tmp = manifestDir(out).resolve(s".bucket-$b.json.$runId.tmp")
      Files.writeString(tmp, entry)
      // createLink, not ATOMIC_MOVE: POSIX rename REPLACES an existing
      // target, so a rival's manifest entry landing between a check and
      // our move would be silently overwritten (clobbering its run_id
      // lineage). A hard link is atomic AND fails if the target exists —
      // first committer wins, always; the loser's data is the identical
      // deterministic recomputation, so dropping its entry is correct.
      try Files.createLink(manifestDir(out).resolve(s"bucket-$b.json"), tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally Files.deleteIfExists(tmp)
      promoted += b
    }

    // Concurrent writers: staging dirs are per-runId so two racing runs
    // only meet at promotion. The manifest entry is the commit point —
    // checked per bucket, and RE-checked immediately before any
    // destructive replace: a target dir that exists with a manifest
    // entry is a rival's commit (possibly landed between the two checks)
    // and stands; a target dir WITHOUT a manifest entry is a stale
    // partial from a dead run and is safe to replace. The residual
    // window — a rival's rename landing in the instant between our
    // second check and our own move — surfaces as the move FAILING
    // (rename onto an existing directory), which is caught below and
    // treated as a lost race: the rival promoted the identical
    // deterministic recomputation and its manifest commit follows, so
    // skipping is correct. No path deletes data that carries a manifest
    // entry at the moment of deletion.
    def committedMeanwhile(b: Int): Boolean =
      Files.exists(manifestDir(out).resolve(s"bucket-$b.json"))
    (0 until nBuckets).filterNot(done.contains).foreach { b =>
      val staged = stagingPath.resolve(s"__bucket=$b")
      if (committedMeanwhile(b)) () // lost the race — the other run's commit stands
      else if (Files.exists(staged)) {
        val target = Paths.get(out, s"bucket=$b")
        if (Files.exists(target) && committedMeanwhile(b)) {
          () // rival committed between the two checks — its data stands
        } else {
          if (Files.exists(target)) { // stale partial from a dead run
            deleteRecursively(target)
          }
          try {
            Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
            commit(b, stagedCounts.getOrElse(b, 0L))
          } catch {
            case _: java.nio.file.FileSystemException
                if Files.exists(target) =>
              // a rival renamed its (identical) staged copy into place
              // between our check and our move — its promotion stands;
              // remaining buckets continue promoting normally
              ()
          }
        }
      } else {
        // the bucket genuinely has no rows in this input — commit it as
        // empty so resumes don't rescan the input for it forever.
        // Re-check for a rival commit landed since the loop's first check
        // (mirrors the staged-data branch); the commit itself is
        // first-writer-wins (createLink) so even the residual window
        // cannot clobber a rival's manifest entry.
        if (!committedMeanwhile(b)) commit(b, 0L)
      }
    }
    deleteRecursively(stagingPath)
    promoted.toSet
  }

  /** Read back the committed dataset (all buckets). */
  def read(spark: SparkSession, out: String): DataFrame =
    spark.read.parquet(s"$out/bucket=*")

  /** Operational repair: drop chosen buckets' data + manifest entries so
    * the next [[write]] recomputes exactly those buckets from the input
    * (e.g. after upstream data corruption is fixed for a key range). The
    * Iceberg analogue is rewriting the affected partitions in a new
    * snapshot.
    */
  def invalidate(out: String, buckets: Set[Int]): Unit =
    buckets.foreach { b =>
      deleteRecursively(Paths.get(out, s"bucket=$b"))
      Files.deleteIfExists(manifestDir(out).resolve(s"bucket-$b.json"))
    }

  /** Per-partition metrics from the manifest: rows per bucket + skew ratio
    * (max/mean) — the report the north rule asks to emit per partition.
    */
  def metrics(out: String): (Map[Int, Long], Double) = {
    val dir = manifestDir(out)
    if (!Files.exists(dir)) return (Map.empty, 0.0)
    val rows = scala.util.Using.resource(Files.list(dir)) { stream =>
      stream.iterator.asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .map { p =>
          val s = Files.readString(p)
          val b = """"bucket":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
          val r = """"rows":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
          b -> r
        }
        .toMap
    }
    val skew =
      if (rows.isEmpty) 0.0
      else rows.values.max.toDouble / (rows.values.sum.toDouble / rows.size)
    (rows, skew)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { stream =>
        stream.sorted(java.util.Comparator.reverseOrder())
          .iterator.asScala.foreach(Files.delete)
      }
}
