package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Snapshot-manifest scale rehearsal (round 13 — the VERDICT r12 #4
  * claim, evidenced): fabricate a landing of `<partitions> ×
  * <filesPerPartition>` data files (payload-free — publish/validate
  * are LISTING-bound and never read file contents), then time the
  * executor-side listing, a publish, and a distributed validate at
  * that file count. The driver's working set stays O(partitions): the
  * walk touches directories only, the file rows live in executors,
  * and validate is a manifest⋈live join.
  *
  * Usage: `runMain graft.SnapRehearsal <partitions> <filesPerPartition> [...]`
  * (pairs repeat: `30 1000 100 1000` runs 30k then 100k files).
  */
object SnapRehearsal {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (Array(nPart, perPart) <- args.map(_.toInt).grouped(2)) {
      val dir = java.nio.file.Files.createTempDirectory("snap-rehearsal").toString
      val root = java.nio.file.Paths.get(dir)
      val payload = Array[Byte](1, 2, 3)
      for (p <- 0 until nPart) {
        val d = root.resolve(s"batch_id=$p")
        java.nio.file.Files.createDirectories(d)
        for (i <- 0 until perPart)
          java.nio.file.Files.write(d.resolve(f"part-$i%05d.parquet"), payload)
      }
      val t0 = System.nanoTime()
      val listed = graft.sources.Snapshots.dataFilesFrame(spark, dir).count()
      val tList = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val published = graft.sources.Snapshots.publish(spark, dir, 1)
      val tPub = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val notOk = graft.sources.Snapshots.validate(spark, dir, 1)
        .filter(col("status") =!= "ok").count()
      val tVal = (System.nanoTime() - t2) / 1e9
      println(f"""{"partitions":$nPart,"files":${nPart.toLong * perPart},""" +
        f""""listed":$listed,"published":$published,"validate_not_ok":$notOk,""" +
        f""""list_s":$tList%.1f,"publish_s":$tPub%.1f,"validate_s":$tVal%.1f}""")
    }
    spark.stop()
  }
}
