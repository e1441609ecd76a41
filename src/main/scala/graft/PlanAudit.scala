package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plans of the queries whose plan SHAPE is
  * the 100-TB story (scan-stage fusion, broadcast joins, partition pruning,
  * pushed filters), for auditing into PLANS.md. Not part of the driver
  * contract — a development tool. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_clustered_scan", "q_pip_rect", "q_pip_rect_exec", "q_pip_polygon", "q_tile_counts")
    // SPARK_GRAFT_PLAN_FINAL=1: execute first, then explain — shows the
    // AQE-final plan (runtime SMJ->broadcast conversions, coalesced stages)
    // instead of the static isFinalPlan=false tree.
    val runFirst = sys.env.getOrElse("SPARK_GRAFT_PLAN_FINAL", "0") == "1"
    for (n <- names) {
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (runFirst) df.collect()
      df.explain("formatted")
    }
    spark.stop()
  }
}
