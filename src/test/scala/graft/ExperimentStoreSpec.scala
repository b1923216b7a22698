package graft

import graft.sources.ExperimentStore
import graft.sources.ExperimentStore.Intervention
import java.nio.file.Files

class ExperimentStoreSpec extends SparkSpec {

  private def newDir(): String =
    Files.createTempDirectory("expstore").toString

  private def intv(id: String, start: String, end: Option[String] = None) =
    Intervention(id, s"intv-$id", "supplement", "details", start, end, 3, "", "2024-01-01T00:00:00")

  test("add → list → end → delete round-trips through versioned snapshots") {
    val dir = newDir()
    ExperimentStore.addIntervention(spark, dir, intv("a", "2024-01-05"))
    ExperimentStore.addIntervention(spark, dir, intv("b", "2024-01-10", Some("2024-01-20")))
    val listed = ExperimentStore.listInterventions(spark, dir).collect()
    assert(listed.map(_.getAs[String]("id")).sorted.toSeq == Seq("a", "b"))

    ExperimentStore.endIntervention(spark, dir, "a", "2024-01-15")
    val ended = ExperimentStore.listInterventions(spark, dir)
      .filter("id = 'a'").collect().head
    assert(ended.getAs[String]("end_day") == "2024-01-15")

    ExperimentStore.deleteIntervention(spark, dir, "b")
    assert(ExperimentStore.listInterventions(spark, dir).count() == 1)
  }

  test("an empty store lists zero rows and never errors") {
    val dir = newDir()
    assert(ExperimentStore.listInterventions(spark, dir).count() == 0)
    assert(ExperimentStore.activeInterventions(spark, dir, "2024-01-15").count() == 0)
  }

  test("active filter replays the tracker's is_active rule at an explicit asOf day") {
    val dir = newDir()
    ExperimentStore.addIntervention(spark, dir, intv("open", "2024-01-05"))
    ExperimentStore.addIntervention(spark, dir, intv("past", "2024-01-01", Some("2024-01-10")))
    ExperimentStore.addIntervention(spark, dir, intv("ending-today", "2024-01-01", Some("2024-01-15")))
    val active = ExperimentStore.activeInterventions(spark, dir, "2024-01-15")
      .collect().map(_.getAs[String]("id")).sorted.toSeq
    assert(active == Seq("ending-today", "open"))
  }

  test("overlap probe flags temporal confounds, closing open ends at asOf") {
    val dir = newDir()
    ExperimentStore.addIntervention(spark, dir, intv("x", "2024-01-05", Some("2024-01-12")))
    ExperimentStore.addIntervention(spark, dir, intv("y", "2024-01-20"))
    // window inside x
    val hit = ExperimentStore.checkOverlaps(spark, dir, "2024-01-10", Some("2024-01-11"), "2024-01-30")
    assert(hit.collect().map(_.getAs[String]("id")).toSeq == Seq("x"))
    // open-ended window from the 15th overlaps only the still-open y
    val hit2 = ExperimentStore.checkOverlaps(spark, dir, "2024-01-15", None, "2024-01-30")
    assert(hit2.collect().map(_.getAs[String]("id")).toSeq == Seq("y"))
    // disjoint window
    val none = ExperimentStore.checkOverlaps(spark, dir, "2024-01-01", Some("2024-01-02"), "2024-01-30")
    assert(none.count() == 0)
  }

  test("a stale read version cannot commit (the If-Match precondition), a fresh one can") {
    import spark.implicits._
    val dir = newDir()
    ExperimentStore.addIntervention(spark, dir, intv("a", "2024-01-05"))   // v=1
    // writer W read at v=1; a concurrent writer commits v=2 first
    val interloper = Seq(intv("b", "2024-01-10")).toDS.toDF
    assert(ExperimentStore.commitAt(interloper, dir, 1))                   // v=2 claimed
    // W's commit against its stale read version must be refused...
    val wNext = Seq(intv("c", "2024-01-12")).toDS.toDF
    assert(!ExperimentStore.commitAt(wNext, dir, 1))
    // ...and succeed after re-reading (the reload-and-retry of mutate)
    assert(ExperimentStore.commitAt(wNext, dir, 2))
    val ids = ExperimentStore.listInterventions(spark, dir)
      .collect().map(_.getAs[String]("id")).sorted.toSeq
    assert(ids == Seq("c"))                                                 // v=3 is W's frame
    // no staging litter left behind from the refused commit
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val litter = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith(".staging"))
    assert(litter.isEmpty, litter.mkString(","))
  }

  test("racing writers for one version stage in isolation: the loser's rows never reach the snapshot") {
    import spark.implicits._
    val dir = newDir()
    ExperimentStore.addIntervention(spark, dir, intv("a", "2024-01-05"))   // v=1
    // Both writers read v=1 and race for v=2. Staging paths are unique per
    // attempt, so neither can write into the other's staged directory; the
    // committed v=2 must be EXACTLY the winner's frame, never a mix.
    val winner = Seq(intv("a", "2024-01-05"), intv("w", "2024-02-01")).toDS.toDF
    val loser = Seq(intv("a", "2024-01-05"), intv("l", "2024-03-01")).toDS.toDF
    assert(ExperimentStore.commitAt(winner, dir, 1))
    assert(!ExperimentStore.commitAt(loser, dir, 1))
    val ids = spark.read.parquet(s"$dir/v=2")
      .collect().map(_.getAs[String]("id")).sorted.toSeq
    assert(ids == Seq("a", "w"), s"committed snapshot polluted: $ids")
  }
}
