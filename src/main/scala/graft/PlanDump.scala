package graft

import org.apache.spark.sql.SparkSession

/** Maintenance util for PLANS.md / plans/r*: prints (or writes) the
  * formatted physical plan of one or more registry queries.
  * Usage: runMain graft.PlanDump <query[,query2,...]> [sfDir] [outDir]
  *  - one query, no outDir: plan prints to stdout (the original shape)
  *  - outDir given: each query's plan lands at <outDir>/<query>.txt
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      outDir match {
        case None => df.explain("formatted")
        case Some(dir) =>
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$name.txt"), txt)
          println(s"[plandump] wrote $dir/$name.txt")
      }
      // between queries: drop per-query persists so one dump's cache
      // doesn't change the next plan's shape (InMemoryRelation nodes)
      SparkEntry.release(spark)
    }
    spark.stop()
  }
}
