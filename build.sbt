ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "6824mapreducespark"
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
// Raw stdout for forked runs: sbt's default LoggedOutput prefixes every
// stdout line with "[info] ", which breaks line-oriented JSON parsing of
// the Bench/Verify contract output (a parser looking for a line starting
// with '{' never finds one).
run / outputStrategy := Some(StdoutOutput)
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
)
// local-cluster executor processes resolve their classpath through the
// spark-launcher, which needs the Scala suffix pinned when SPARK_HOME is a
// binary dist driven from outside spark-submit.
Test / envVars ++= Map(
  "SPARK_SCALA_VERSION" -> "2.13",
  "SPARK_HOME" -> "/opt/spark",
)
// SpeculationSpec needs a local-cluster[...] SparkContext and there is one
// SparkContext per JVM, so it cannot share the JVM where every other suite
// holds TestSpark's local[n] context — give it its own forked group.
Test / testGrouping := {
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
  val (spec, rest) = (Test / definedTests).value
    .partition(_.name == "graft.SpeculationSpec")
  Seq(
    Tests.Group("main", rest, Tests.SubProcess(opts)),
    Tests.Group("speculation", spec, Tests.SubProcess(opts)),
  )
}
// Flake amplification for the timing-sensitive suites (the reference's
// test-mr-many.sh analog): 5 back-to-back green passes or bust.
addCommandAlias("flakeLoop",
  Seq.fill(5)("testOnly graft.StreamingSpec graft.FaultToleranceSpec")
    .mkString(";", ";", ""))
