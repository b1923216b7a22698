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
  *
  * CATALOG axis (round 14 — VERDICT r13 #7): `--catalog <nVersions>
  * <keepLast>` rehearses the weekly-release workflow at catalog scale —
  * publish `nVersions` versions of one landing, time the one-pass
  * [[graft.sources.Snapshots.versions]] catalog read at full depth,
  * `expireVersions(keepLast)`, the catalog read after retention, and a
  * `dataCardAsOf` pinned to an old SURVIVING version. The claims being
  * priced: the catalog read is O(1) Spark jobs at any version count
  * (the r13 shape ran one job per version), and retention + per-version
  * cards stay interactive at a few years of daily publishes.
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
    if (args.headOption.contains("--catalog")) {
      catalogRehearsal(spark, args(1).toInt, args(2).toInt)
      spark.stop(); return
    }
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

  private def catalogRehearsal(spark: SparkSession, nVersions: Int,
                               keepLast: Int): Unit = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap-catalog").toString
    // a small real landing (cards need readable parquet + text)
    (1L to 200L).map(i =>
        (i, s"landed document number $i carrying assorted vocabulary " +
          s"item$i for the catalog rehearsal"))
      .toDF("doc_id", "text").coalesce(2).write.parquet(s"$dir/batch_id=1")
    val t0 = System.nanoTime()
    for (v <- 1 to nVersions)
      graft.sources.Snapshots.publish(spark, dir, v, publisher = s"rel-$v")
    val tPub = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val full = graft.sources.Snapshots.versions(spark, dir).count()
    val tCatFull = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val expired = graft.sources.Snapshots
      .expireVersions(spark, dir, keepLast).size
    val tExpire = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val left = graft.sources.Snapshots.versions(spark, dir).count()
    val tCatAfter = (System.nanoTime() - t3) / 1e9
    // a card pinned to the OLDEST surviving version — the release
    // reviewer's read against a years-old published corpus
    val oldest = nVersions - keepLast + 1
    val t4 = System.nanoTime()
    val cardRows = graft.operators.CorpusOps
      .dataCardAsOf(spark, dir, oldest).count()
    val tCard = (System.nanoTime() - t4) / 1e9
    println(f"""{"versions":$nVersions,"keep_last":$keepLast,""" +
      f""""publish_all_s":$tPub%.1f,"catalog_full_s":$tCatFull%.1f,""" +
      f""""expired":$expired,"expire_s":$tExpire%.1f,""" +
      f""""catalog_after":$left,"catalog_after_s":$tCatAfter%.1f,""" +
      f""""card_rows":$cardRows,"card_s":$tCard%.1f}""")
  }
}
