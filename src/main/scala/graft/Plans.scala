package graft

/** Dump `.explain("formatted")` for named declared queries to files —
  * the r18 optimization round's plan-evidence artifact
  * (plans/r18/<name>_<tag>.txt). Usage:
  *
  *   sbt "runMain graft.Plans <tag> <name>[,<name>...]"
  *
  * Reads the data dir from SPARK_GRAFT_SF_DIR (default sf0.01 — plan
  * SHAPE, not timing, is the artifact) and cores from SPARK_GRAFT_CPUS.
  * Harness-style queries (standing-index builds, stream drives) run
  * their side effects before returning the final frame; the dumped plan
  * is the plan of that certified output frame.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Plans <tag> <name>[,<name>...]")
    val Array(tag, namesCsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Sessions.local(cpus, cpus)
    val outDir = java.nio.file.Paths.get(s"plans/r18")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"wrote plans/r18/${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
    System.exit(0)
  }
}
