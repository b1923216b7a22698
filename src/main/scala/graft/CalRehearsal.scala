package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration-cost rehearsal (round 13): prices what the
  * recall-derived admission nprobe (VERDICT r12 #2) costs the handoff
  * and what it CHOOSES at each scale — the knob's price tag, published
  * the way HnRehearsal prices the negative miner. Per scale dir:
  * trained-PQ refresh wall, calibration-sweep wall, the chosen nprobe,
  * and the measured held-out re-encode recall.
  *
  * Usage: `runMain graft.CalRehearsal <sfDir> [<sfDir> ...]`
  */
object CalRehearsal {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = java.nio.file.Files.createTempDirectory("cal-rehearsal")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val e = Tables.load(spark, dir, "embeddings")
        .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))
        .select(col("vec_id"), col("emb"), col("label"))
      val table = "cal_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val t0 = System.nanoTime()
      operators.Ann.refreshPqIndex(e, table, quantizer = "kmeans")
      val tRefresh = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (np, rec) = operators.Ann.calibratePqScreenNprobe(spark, table, 0.99)
      val tCal = (System.nanoTime() - t1) / 1e9
      println(f"""{"dir":"$dir","n_vecs":${e.count()},""" +
        f""""refresh_s":$tRefresh%.1f,"calibrate_s":$tCal%.1f,""" +
        f""""chosen_nprobe":$np,"measured_recall":$rec%.4f}""")
    }
    spark.stop()
  }
}
