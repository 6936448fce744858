ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fortune500financialinsightspipelinespark"
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
// Forked run output must reach stdout RAW: sbt's default logger prefixes
// every forked line with "[info] ", which breaks any consumer that parses
// Bench/Verify's single JSON output line from stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's trailing "[success] Total time" line so the JSON
// line is also the LAST stdout line (robust to last-line parsers).
Global / showSuccess := false
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Dozens of queries in one JVM generate enough codegen classes to fill
  // the default 240m code cache; when it fills, the JIT disables itself
  // until the sweeper catches up and whole stages run interpreted
  // (10-50x). Oversize the cache and always compile large generated
  // methods.
  "-XX:ReservedCodeCacheSize=2g",
  "-XX:-DontCompileHugeMethods",
  // Shuffle files / spill / localCheckpoint blocks on tmpfs: the VM's
  // block device shows bursty multi-second IO stalls that randomly
  // inflate shuffle-heavy queries 10-20x; shuffle volumes here are tiny
  // (MBs) so RAM-backed local dirs are safe — at sf<=1 scales. At sf100
  // a single wide aggregate spills tens of GB, which on tmpfs IS RAM:
  // the kernel OOM-kills the JVM once heap + tmpfs spill crosses
  // physical memory (r13 finding). Scale probes override to a
  // disk-backed dir (SPARK_GRAFT_LOCAL_DIR=/tmp/spark-local), which is
  // also the real-cluster posture: executors spill to local SSDs, never
  // to memory-backed filesystems.
  s"-Dspark.local.dir=${sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")}",
  // 32 concurrent local tasks need headroom: an 8g heap showed
  // timing-dependent many-x GC swings on the CPU-heavy text queries
  // (the host has 128 GiB; the forked JVM is the only Spark process).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
