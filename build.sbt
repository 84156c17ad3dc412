ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "databasetobigqueryspark"
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
  // JVM default TZ too, not just Spark's session TZ: java.sql.Timestamp
  // string constructors (JdbcSpec fixtures) and Derby interpret
  // wall-clock strings in the JVM default zone — on a non-UTC host the
  // UTC-pinned assertions would otherwise shift by the host offset
  "-Duser.timezone=UTC",
  // 24g default: the full bench suite (~300 queries, streaming state
  // stores, memoized checkpoint blocks) runs in ONE JVM; at 8g the tail of
  // the suite ran GC-pressured and multi-stage queries measured 2-3x their
  // isolated cost, and at 16g the round-15 suite (more soft-held memoized
  // frames after the shared-frame dedup work) showed pass-2/3 soft-ref
  // clearing — a cleared FrameMemo entry rebuilds its frame on whichever
  // consumer runs next (d_dedup_keep reps 1.9/3.9/4.1 s in the r15-opt
  // run-A receipt), exactly the misattribution the prewarm exists to
  // prevent. The box has 128 GiB; SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
