package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Feasibility/tuning probe for `local-cluster[N,cores,mem]` masters in
  * this sandbox (round-4 verdict ask #1 option b): real worker JVMs +
  * real executor processes on one host — the faithful model of ADDING
  * MACHINES that the north rule's N -> 4N criterion means, vs widening
  * one shared session. Run:
  * `sbt "runMain graft.ClusterProbe <executors> <coresPerExec> <rowsM> [bigmem] [taskMult]"`
  * — `bigmem=1` sets spark.executor.memory=2560m (standalone's 1g
  * default young-GC-throttles allocation-heavy fleets ~10%; Bench's
  * clusterSession always sets it). */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val execs = if (args.length > 0) args(0).toInt else 2
    val cores = if (args.length > 1) args(1).toInt else 4
    val rows = (if (args.length > 2) args(2).toLong else 10L) * 1000000L
    val apc = args.length > 3 && args(3) == "1"
    val taskMult = if (args.length > 4) args(4).toInt else 4
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val b = SparkSession.builder()
      .master(s"local-cluster[$execs,$cores,3072]")
      .config("spark.sql.shuffle.partitions", execs * cores)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
      .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
    val b2 = if (apc) b.config("spark.executor.memory", "2560m") else b
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def job(): Long = {
        val pts = spark.range(rows, 2 * rows, 1, execs * cores * taskMult)
          .withColumn("lat", ((col("id") * 9973 + 12345) % 18000).cast("double") / lit(100.0) - lit(90.0))
          .withColumn("lon", ((col("id") * 31337 + 54321) % 36000).cast("double") / lit(100.0) - lit(180.0))
        val tiled = graft.operators.Tiling.tileAssign(pts, "lat", "lon", 8)
        val joined = graft.plans.S2PipJoin.pipJoinExec(tiled, "lat", "lon", SparkEntryRegions.rects)
        joined.agg(count(lit(1)), sum(length(col("tile_token")))).head().getLong(0)
      }
      job() // warm
      val t0 = System.nanoTime()
      val m = job()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CLUSTER_PROBE_OK execs=$execs cores=$cores rows=$rows apc=$apc matches=$m sec=$sec%.2f rps=${rows / sec}%.0f")
    } finally spark.stop()
  }
}
