ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "biolakehousespark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 30 bench queries × (warm + timed) in one JVM accumulate broadcast and
  // codegen tenured garbage; 8g heaps hit GC collapse (one q23 run
  // measured 55 s vs its real ~4 s). The box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // 30 queries × several whole-stage-codegen units exhaust the default
  // 240 MB code cache mid-bench; once it flushes, late queries run
  // interpreted (observed 8x slowdowns on the wide-aggregate ones).
  // Sized 1g for 37 queries; at 45 queries late-alphabet queries (q24+)
  // went unstable (0.9 s vs 3.0 s across runs) — 2g restores stability.
  "-XX:ReservedCodeCacheSize=2g",
)
