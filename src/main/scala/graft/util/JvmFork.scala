package graft.util

/** Shared command-line builder for benchmark child JVMs: JDK-17 module
  * opens for Spark, and the JIT recompilation-cutoff flags pinned
  * explicitly — the measured JVM must carry them no matter which launch
  * path (sbt runMain, tools/run.sh, bare java) started the parent (see
  * build.sbt javaOptions comment for the sticky-deopt pathology). */
object JvmFork {
  val addOpensPkgs: Seq[String] = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar")

  def command(mainClass: String, args: Seq[String]): Seq[String] = {
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
    Seq(System.getProperty("java.home") + "/bin/java") ++
      addOpensPkgs.flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED")) ++
      Seq("-XX:PerMethodRecompilationCutoff=-1",
        "-XX:PerBytecodeRecompilationCutoff=-1",
        s"-Xmx$mem", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", System.getProperty("java.class.path"), mainClass) ++ args
  }
}
