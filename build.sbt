ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mortarparquetsupportspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // ~190 heavy-codegen queries × 3 passes generate enough Janino
  // classes to pressure the default 240 MB JIT code cache late in a
  // shared-JVM suite (the recurring bench-tail ghost); headroom keeps
  // the compiler on even in single-JVM mode
  "-XX:ReservedCodeCacheSize=512m",
)
// The two differential-fuzz suites each execute hundreds of full query
// plans; run each in its OWN forked JVM (and everything else in a third)
// so per-JVM heap stays bounded at the stock -Xmx8g. Groups run
// sequentially — parallel Spark JVMs would skew any timing-sensitive
// assertions and fight over CPU.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  def group(name: String, ts: Seq[TestDefinition]) =
    Tests.Group(name, ts, Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  val solo = Set("graft.BgpPropertySpec", "graft.ExprFuzzSpec")
  val (heavy, rest) = tests.partition(t => solo(t.name))
  heavy.map(t => group(t.name, Seq(t))) :+ group("main", rest)
}
Test / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 1))
