package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared contract queries (r18
  * optimization round: the judge checks plan claims against committed
  * plan files, and the optimization loop mines them for Exchange counts,
  * join strategies, and scan pushdown).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> [suffix] [q01_name,q02_name,...]
  *
  * Writes one `<outDir>/<query>_<suffix>.txt` per query (suffix defaults
  * to `before`). Session settings mirror Bench so the plans are the ones
  * the bench actually runs (same shuffle-partition count, same tz).
  * Queries whose builders run eager work (checkpointed pipelines,
  * iterative contraction) execute that work here — the dump is the final
  * returned frame's plan, exactly what the noop sink drives.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else "before"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val sweep = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    var failed = 0
    sweep.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
        System.err.println(s"[plandump] $name: ${plan.linesIterator.size} lines, " +
          s"$exchanges Exchange nodes")
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
