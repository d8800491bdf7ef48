ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "audiostodatasetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The DuckDB JDBC driver is loaded reflectively by the K2 sink (prod ships
// it alongside the app jar). For the sink's e2e spec AND the
// k2_duckdb_roundtrip oracle entry (runMain), pick it up from the local
// cache if present; the spec self-cancels when it is absent.
val duckdbJdbcJars = Def.setting {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  // keep ONLY the newest match: with two cached versions the winning driver
  // class would be classpath-order-dependent (version ordered numerically)
  def ver(f: File): (Int, Int, Int) = {
    val ns = "\\d+".r.findAllIn(f.getName.stripPrefix("duckdb_jdbc-"))
      .map(_.toInt).toList
    (ns.headOption.getOrElse(0), ns.lift(1).getOrElse(0), ns.lift(2).getOrElse(0))
  }
  (cache ** "duckdb_jdbc-*.jar").get
    .sortBy(ver).lastOption.toSeq.map(Attributed.blank(_))
}
Test / unmanagedJars ++= duckdbJdbcJars.value
Runtime / unmanagedJars ++= duckdbJdbcJars.value
Test / fork := true
run / fork := true
// The driver parses the TAIL of `sbt "runMain graft.Bench"` output for the
// one-line metric JSON (BENCH_r{N}.json "parsed" was null r1-r8). Two sbt
// artifacts broke it: the logger's "[info] "/"[error] " prefixes on every
// forked-process line, and the "[success] Total time: ..." trailer printed
// AFTER the metric line. StdoutOutput passes the forked JVM's stdout/stderr
// through verbatim (no prefixes), and showSuccess drops the trailer — so the
// metric line Bench prints last is the literal last line of output.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// (showSuccess IS consumed — by the command engine, which lintUnused can't see)
Global / excludeLintKeys += showSuccess
// Record the CONTENT fingerprint of the source tree at compile time
// (round-16 verdict task 3): graft.Bench marks a run "-stale" when the
// running classes don't match the sources, and the pre-r17 heuristic
// compared MTIMES (sources newer than classes), so an edit-then-revert or
// a bare `touch` evicted clean runs from their median series. Writing the
// hash the compiler actually saw makes the check exact: Bench compares
// this file's content to the same hash recomputed at run time. The hash
// function below MUST stay byte-identical to graft.Bench.codeFingerprint
// (same trees, same feed order) — BenchFingerprintSpec pins the equality.
// Anchored at an explicit base dir (round-17 advice: bare relative File
// constructors resolve against the sbt PROCESS CWD, so an sbt launched from
// outside the repo root recorded the hash of an empty walk). The FED path
// strings stay repo-relative — built from the seed string, not f.getPath —
// so the hash is byte-identical to graft.Bench.codeFingerprint (and to the
// pre-r18 value); BenchFingerprintSpec pins the equality.
def graftSrcFingerprint(base: File): String = {
  val md = java.security.MessageDigest.getInstance("SHA-256")
  def feed(rel: String, f: File): Unit =
    if (f.isDirectory) {
      if (f.getName != "target")
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName)
          .foreach(c => feed(rel + "/" + c.getName, c))
    } else if (f.isFile) {
      md.update((rel + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(java.nio.file.Files.readAllBytes(f.toPath))
      md.update(0.toByte)
    }
  Seq("src/main", "build.sbt", "project").foreach(p => feed(p, new File(base, p)))
  md.digest().map("%02x".format(_)).mkString.take(16)
}
Compile / compile := {
  val analysis = (Compile / compile).value
  // hashed after the compile completes (sbt runs .value deps before the
  // body). An edit DURING the compile is therefore recorded as the new
  // tree — a window the mtime heuristic had too; the next compile closes
  // it, and a mid-BENCH edit is caught separately ("-editedmidrun").
  IO.write((Compile / classDirectory).value.getParentFile / "graft-src.fp",
    graftSrcFingerprint(baseDirectory.value))
  analysis
}
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
  // 24g default: the 129-query bench/verify surface in ONE local[32] JVM
  // (streaming state, broadcasts, staged sources) GC-thrashes at 8g —
  // measured as 10-20x spikes on late-run queries (embed_pq 1.8s solo vs
  // 26s at the tail of a full run).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Extra -D flags for the forked run/test JVMs (e.g. the harness knobs
// -Dgraft.stateStore=rocksdb, -Dgraft.streamDebug=true) without editing
// the build: SPARK_GRAFT_JAVA_OPTS="-Dgraft.stateStore=rocksdb" sbt ...
javaOptions ++= sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
