package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{SpatialJoin, Tiling}

/** Benchmark main.
  *
  * Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},
  *  "flagship_rows_per_sec":R,
  *  "scaling":{"cores_n":8,"cores_4n":32,"rows_per_sec_n":..,
  *             "rows_per_sec_4n":..,"efficiency":..},"sf":dir}
  *
  * The flagship job is the north-rule workload: S2 tile assignment + covering
  * PIP join over a points table expanded `BENCH_EXPAND`x from the orders keys
  * (so the measured job is millions of rows even at sf0.1, enough to expose
  * parallel scaling). The scaling section runs the identical job in two fresh
  * sessions at local[N] and local[4N] — the sandbox proxy for an N- vs
  * 4N-executor cluster (see BASELINE.md).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The flagship: expanded points -> leaf cell + level-8 tile + covering PIP
    * join against the rect regions; returns processed row count. */
  private def flagship(spark: SparkSession, sfDir: String, expand: Int): Long = {
    import graft.functions.s2functions._
    val base = spark.read.parquet(s"$sfDir/orders.parquet").select("o_orderkey")
    val pts = base
      .withColumn("__i", explode(sequence(lit(0), lit(expand - 1))))
      .withColumn("k", col("o_orderkey") * expand + col("__i"))
      .withColumn("lat", ((col("k") * 9973 + 12345) % 18000).cast("double") / lit(100.0) - lit(90.0))
      .withColumn("lon", ((col("k") * 31337 + 54321) % 36000).cast("double") / lit(100.0) - lit(180.0))
      .drop("__i")
    val tiled = Tiling.tileAssign(pts, "lat", "lon", 8)
    // count both the tiles and the join matches so neither is optimized away
    val joined = SpatialJoin.pipJoin(tiled, "lat", "lon", SparkEntryRegions.rects)
    tiled.agg(count(col("tile")), sum(length(col("tile_token")))).collect()
    joined.count()
  }

  private def timeFlagship(cores: Int, sfDir: String, expand: Int, reps: Int): (Long, Double) = {
    val spark = session(cores)
    try {
      val nRows = spark.read.parquet(s"$sfDir/orders.parquet").count() * expand
      var best = Double.MaxValue
      var i = 0
      while (i < reps) {
        val t0 = System.nanoTime()
        flagship(spark, sfDir, expand)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      (nRows, best)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val expand = sys.env.getOrElse("SPARK_GRAFT_EXPAND", "64").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    // --- per-query timings at the driver-chosen parallelism ---
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // flagship throughput at the same parallelism
    val nRows = spark.read.parquet(s"$sfDir/orders.parquet").count() * expand
    flagship(spark, sfDir, expand) // warm up codegen + page cache
    val tF0 = System.nanoTime()
    flagship(spark, sfDir, expand)
    val flagshipSec = (System.nanoTime() - tF0) / 1e9
    val flagshipRps = nRows / flagshipSec
    spark.stop()

    // --- scaling evidence: identical job at N and 4N cores ---
    val scalingJson = if (doScaling) {
      val coresN = math.max(1, cpus / 4)
      val (rowsN, secN) = timeFlagship(coresN, sfDir, expand, reps = 2)
      val (rows4, sec4) = timeFlagship(cpus, sfDir, expand, reps = 2)
      val rpsN = rowsN / secN
      val rps4 = rows4 / sec4
      val eff = (rps4 / rpsN) / (cpus.toDouble / coresN)
      f"""{"cores_n":$coresN,"cores_4n":$cpus,"rows_per_sec_n":$rpsN%.1f,"rows_per_sec_4n":$rps4%.1f,"efficiency":$eff%.3f}"""
    } else "null"

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"flagship_rows":$nRows,"flagship_sec":$flagshipSec%.3f,"flagship_rows_per_sec":$flagshipRps%.1f,"scaling":$scalingJson,"sf":"$sfDir"}""")
  }
}

/** Query regions shared between SparkEntry and Bench. */
object SparkEntryRegions {
  import graft.s2.{R1Interval, S1Interval, S2LatLngRect, S2Region}
  def rects: Seq[(String, S2Region)] = {
    def rect(latLo: Double, latHi: Double, lngLo: Double, lngHi: Double): S2LatLngRect =
      S2LatLngRect(
        R1Interval(math.toRadians(latLo), math.toRadians(latHi)),
        S1Interval(math.toRadians(lngLo), math.toRadians(lngHi)))
    Seq(
      "r_europe" -> rect(35.005, 60.005, -10.005, 30.005),
      "r_andes" -> rect(-40.005, -5.005, -80.005, -60.005),
      "r_pacific_wrap" -> rect(-15.005, 15.005, 160.005, -160.005))
  }
}
