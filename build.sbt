ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "waryspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Scratch space (temp dirs: streaming checkpoints, staged replay files,
// checkpoint/compaction rewrites) models per-node local SSDs, same as the
// spark.local.dir=/dev/shm choice in GraftSession: on this single box the
// one shared ext4 disk is an artificial bottleneck a real N-node cluster
// doesn't have. Override with SPARK_GRAFT_TMPDIR to point at a real disk.
val graftTmpDir = settingKey[String]("scratch dir for forked JVMs")
graftTmpDir := {
  val d = sys.env.getOrElse("SPARK_GRAFT_TMPDIR", "/dev/shm/graft-tmp")
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
  d
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Djava.io.tmpdir=${graftTmpDir.value}",
  // local[32] runs driver + all 32 executor threads in ONE JVM: size the
  // heap like 32 cores' worth of executors, not like a laptop driver —
  // an undersized heap turns the 200-query sweep into GC-bound noise
  // (storage blocks from eager intermediates pile up between GCs).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
