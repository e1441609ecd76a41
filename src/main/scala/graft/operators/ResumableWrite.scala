package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-checkpointed, resumable partitioned writes with per-partition
  * lineage and metrics (north rule: "resumable from checkpoint with
  * per-partition lineage + metrics").
  *
  * No Iceberg runtime ships in this sandbox, so the snapshot layer is the
  * same idea in miniature: output is laid out as one directory per
  * partition key (hive-style `part=<value>/`), each committed atomically
  * (write to `_tmp`, rename) and recorded in a JSON-lines manifest carrying
  * the partition's lineage (input, run id) and metrics (rows, bytes, wall
  * millis). A restarted run reads the manifest and processes only the
  * partitions that never committed — the exact contract an Iceberg
  * snapshot + partition-level replace gives on a real cluster.
  */
object ResumableWrite {

  final case class PartitionRecord(partition: String, rows: Long, bytes: Long,
                                   millis: Long, runId: String, input: String)

  private def manifestPath(outDir: String) = Paths.get(outDir, "_lineage_manifest.jsonl")

  /** Committed partition values from previous runs (crash-safe: a partition
    * is committed iff its manifest line exists). */
  def committedPartitions(outDir: String): Set[String] = {
    val p = manifestPath(outDir)
    if (!Files.exists(p)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(p).asScala
        .flatMap { line =>
          // partition value is the first JSON field; keep parsing dependency-free
          val m = """"partition":"([^"]*)"""".r.findFirstMatchIn(line)
          m.map(_.group(1))
        }.toSet
    }
  }

  def readManifest(outDir: String): Seq[PartitionRecord] = {
    val p = manifestPath(outDir)
    if (!Files.exists(p)) return Nil
    import scala.jdk.CollectionConverters._
    val R = ("""\{"partition":"([^"]*)","rows":(\d+),"bytes":(\d+),"millis":(\d+),""" +
      """"run_id":"([^"]*)","input":"([^"]*)"\}""").r
    Files.readAllLines(p).asScala.toSeq.collect {
      case R(part, rows, bytes, millis, runId, input) =>
        PartitionRecord(part, rows.toLong, bytes.toLong, millis.toLong, runId, input)
    }
  }

  private def appendManifest(outDir: String, rec: PartitionRecord): Unit = {
    val line = s"""{"partition":"${rec.partition}","rows":${rec.rows},"bytes":${rec.bytes},""" +
      s""""millis":${rec.millis},"run_id":"${rec.runId}","input":"${rec.input}"}\n"""
    Files.write(manifestPath(outDir), line.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  private def dirBytes(path: java.nio.file.Path): Long = {
    if (!Files.exists(path)) return 0L
    val s = Files.walk(path)
    try s.filter(Files.isRegularFile(_)).mapToLong(Files.size).sum
    finally s.close()
  }

  /** Write `df` partitioned by `partitionCol`, skipping partitions already
    * committed in a previous (possibly crashed) run.
    *
    * @param maxPartitionsThisRun optional fault-injection/testing knob:
    *   commit at most this many partitions, then stop (simulates a crash)
    * @return records committed by THIS run
    */
  def write(df: DataFrame, outDir: String, partitionCol: String, runId: String,
            input: String = "", maxPartitionsThisRun: Int = Int.MaxValue): Seq[PartitionRecord] = {
    Files.createDirectories(Paths.get(outDir))
    val done = committedPartitions(outDir)
    val allParts = df.select(partitionCol).distinct()
      .collect().map(_.get(0).toString).sorted
    val todo = allParts.filterNot(done).take(maxPartitionsThisRun)

    val out = scala.collection.mutable.ArrayBuffer.empty[PartitionRecord]
    for (part <- todo) {
      val t0 = System.nanoTime()
      val slice = df.where(col(partitionCol).cast("string") === part)
      val finalDir = Paths.get(outDir, s"$partitionCol=$part")
      val tmpDir = Paths.get(outDir, s"_tmp_$partitionCol=$part")
      // idempotent: clear any torn temp from a crashed attempt
      deleteRecursively(tmpDir)
      slice.write.mode("overwrite").parquet(tmpDir.toString)
      val rows = df.sparkSession.read.parquet(tmpDir.toString).count()
      deleteRecursively(finalDir)
      Files.move(tmpDir, finalDir, StandardCopyOption.ATOMIC_MOVE)
      val rec = PartitionRecord(part, rows, dirBytes(finalDir),
        (System.nanoTime() - t0) / 1000000, runId, input)
      appendManifest(outDir, rec) // commit point: manifest line makes it durable
      out += rec
    }
    out.toSeq
  }

  /** Read back everything committed so far. */
  def readCommitted(spark: SparkSession, outDir: String, partitionCol: String): DataFrame = {
    val parts = committedPartitions(outDir)
    if (parts.isEmpty) {
      spark.emptyDataFrame
    } else {
      val paths = parts.toSeq.sorted.map(p => s"$outDir/$partitionCol=$p")
      spark.read.parquet(paths: _*)
    }
  }

  private def deleteRecursively(path: java.nio.file.Path): Unit = {
    if (Files.exists(path)) {
      val s = Files.walk(path)
      try {
        s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(Files.delete(_))
      } finally s.close()
    }
  }
}
