package graft
import org.apache.spark.sql.SparkSession
object OneQ {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_SHUFFLE overrides the shuffle width for scale
    // rehearsals (the PLANS.md sf3 probe of when 32 partitions stops
    // being enough); the bench itself always runs the default 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Two untimed warmups per query before the timed min-of-3: wide generated
    // aggregates need ~3 executions before C2 fully compiles them (see the
    // measurement note in Bench.scala), so a cold first slot would publish
    // order-dependent numbers and defeat cross-round isolated compares.
    // the persistent-RDD sweep mirrors Bench/Verify (VERDICT r10 #1):
    // eager localCheckpoint blocks aren't cacheManager-tracked, and a
    // fork measuring a pin-carrying query must not let run N's blocks
    // pressure run N+1
    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    for (q <- args) {
      for (_ <- 1 to 2) {
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        sweep()
      }
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        sweep()
      }
    }
    spark.stop()
  }
}
