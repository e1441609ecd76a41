package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin
import graft.plans.S2PipJoin
object ExecBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").config("spark.driver.host","localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pts = spark.range(100000000L, 200000000L, 1, 64)
      .withColumn("lat", ((col("id") * 9973 + 12345) % 18000).cast("double") / lit(100.0) - lit(90.0))
      .withColumn("lon", ((col("id") * 31337 + 54321) % 36000).cast("double") / lit(100.0) - lit(180.0))
    def t(name: String)(mk: => Long): Unit = {
      mk // warm
      var best = Double.MaxValue
      for (_ <- 0 until 2) { val t0=System.nanoTime(); mk; best = math.min(best,(System.nanoTime()-t0)/1e9) }
      println(f"$name: ${100e6/best/1e6}%.1f M rows/s (n=${mk})")
    }
    t("declarative pipJoin ") { SpatialJoin.pipJoin(pts.toDF(), "lat", "lon", SparkEntryRegions.rects).count() }
    t("custom S2PipJoinExec") { S2PipJoin.pipJoinExec(pts.toDF(), "lat", "lon", SparkEntryRegions.rects).count() }
    spark.stop()
  }
}
