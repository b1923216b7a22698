package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned physical tables behind an ATOMIC current pointer — reader-
  * side snapshot isolation for standing-index refreshes (round 14 —
  * VERDICT r13 #2).
  *
  * The problem this closes: a refresh of a standing index rewrote its
  * managed tables IN PLACE (clearStaleLocation deletes the location,
  * then `saveAsTable(overwrite)` drops and recreates), and while every
  * WRITER serializes under the admission lock, the SERVING reads
  * ([[graft.operators.Ann.searchPqIndex]] /
  * [[graft.operators.Ann.searchSemanticIndex]] from another session)
  * take no lock — a reader racing a refresh could observe a partially
  * rewritten table or a cleared location. A real table format's commit
  * protocol hands that reader the OLD snapshot; this is that protocol
  * rebuilt from the repo's own primitives (the [[ExperimentStore]]
  * staged-rename discipline, applied to a pointer file).
  *
  * Mechanics: each refresh writes a complete NEW generation of the
  * index's tables under physical names `<logical>__g<N>[,_<side>…]`,
  * then atomically re-points `<warehouse>/_graft_pointers/<logical>` at
  * the new generation (staged write + rename-with-OVERWRITE — one
  * filesystem metadata op; on HDFS the namenode arbitrates it, the
  * local-fs twin is an atomic rename(2)). Readers resolve the pointer
  * ONCE per query plan, so a plan built against generation N keeps
  * reading N's files even while N+1 lands — N's files are never touched
  * by the swap. Old generations retire only after a GRACE of one
  * generation ([[retire]] keeps current + previous), bounding the disk
  * overhead at ≤ 2× per index while giving in-flight readers a full
  * refresh cycle to finish.
  *
  * Resolution is IDENTITY for unversioned names: a table refreshed
  * before this round (no pointer file) resolves to itself, so legacy
  * indexes keep working and adopt generations on their next refresh.
  */
object TablePointer {

  private def warehouseDir(s: SparkSession): String =
    s.conf.get("spark.sql.warehouse.dir")

  private def pointerPath(s: SparkSession, logical: String): Path =
    new Path(s"${warehouseDir(s)}/_graft_pointers/$logical")

  private def fsOf(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The CURRENT physical name of `logical` — the pointer's contents,
    * or `logical` itself when no pointer exists (an index never
    * refreshed under generations, or a name that is already physical:
    * `x__g2` has no pointer, so resolution is idempotent and internal
    * code can pass either form).
    */
  def resolve(s: SparkSession, logical: String): String = {
    val p = pointerPath(s, logical)
    val fs = fsOf(s, p)
    if (!fs.exists(p)) logical
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        val v = new String(buf, 0, math.max(n, 0),
          java.nio.charset.StandardCharsets.UTF_8).trim
        if (v.isEmpty) logical else v
      } finally in.close()
    }
  }

  private val GenSuffix = "__g(\\d+)$".r

  /** The generation number encoded in a physical name — 0 for an
    * unversioned (legacy) name.
    */
  def generationOf(physical: String): Int =
    GenSuffix.findFirstMatchIn(physical).map(_.group(1).toInt).getOrElse(0)

  /** The physical name the NEXT refresh should write — current
    * generation + 1. A refresh that crashed before its swap left debris
    * at this name; the caller's clearStaleLocation-before-write handles
    * it (the next refresh stages the same generation number again,
    * because the pointer never moved).
    *
    * Writer contract: REFRESHES of one logical table must serialize —
    * two concurrent stagers would derive the same generation number and
    * interleave writes into one physical table. Every production
    * refresh path already does (Curate's handoff and Admit's WAL repair
    * both run under the admission lock); the pointer protocol isolates
    * READERS from writers, it does not arbitrate writer-vs-writer —
    * that is the lock's job, as it was before generations existed.
    */
  def stage(s: SparkSession, logical: String): String =
    s"${logical}__g${generationOf(resolve(s, logical)) + 1}"

  /** Atomically re-point `logical` at `physical` — the commit. Staged
    * write + rename with OVERWRITE: readers resolve either the old or
    * the new target, never a partial file.
    */
  def swap(s: SparkSession, logical: String, physical: String): Unit = {
    val target = pointerPath(s, logical)
    val fs = fsOf(s, target)
    fs.mkdirs(target.getParent)
    val staged = new Path(target.getParent,
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}-${target.getName}")
    val os = fs.create(staged, true)
    try os.write(physical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    // FileContext.rename(OVERWRITE) is the atomic-replace HDFS exposes;
    // FileSystem.rename would fail on an existing destination
    org.apache.hadoop.fs.FileContext.getFileContext(target.toUri,
        s.sparkContext.hadoopConfiguration)
      .rename(staged, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Drop every generation older than current − (keepLast − 1), plus
    * the pre-generation unversioned table once ≥ keepLast generations
    * exist — the grace period: a reader that resolved before the last
    * swap still has its whole generation on disk. `sideSuffixes` names
    * the family's companion tables (e.g. `_centroids`); the empty
    * suffix (the main table) is always included. Returns the dropped
    * physical prefixes.
    */
  def retire(s: SparkSession, logical: String,
             sideSuffixes: Seq[String], keepLast: Int = 2): Seq[String] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val curGen = generationOf(resolve(s, logical))
    if (curGen == 0) return Seq.empty
    val cutoff = curGen - (keepLast - 1)
    val dropGens =
      (1 until cutoff).map(g => s"${logical}__g$g") ++
        (if (cutoff >= 1) Seq(logical) else Seq.empty)
    for (prefix <- dropGens; suffix <- "" +: sideSuffixes) {
      val t = s"$prefix$suffix"
      s.sql(s"DROP TABLE IF EXISTS default.`$t`")
      // the orphaned location too (a remnant must not block a much-later
      // generation-number reuse) — resolved by the catalog's own path
      // rule, not a hand-glued warehouse-dir concat (the ADVICE r12
      // clearStaleLocation lesson)
      Ingest.clearStaleLocation(s, t)
    }
    dropGens
  }

  /** Test seam: delete ONLY the pointer file, leaving tables intact —
    * specs forge the pre-generation (legacy) state with it to pin the
    * migration path (resolve falls back to the logical name).
    */
  private[graft] def dropPointer(s: SparkSession, logical: String): Unit = {
    val p = pointerPath(s, logical)
    val fs = fsOf(s, p)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Test/lifecycle helper: delete the pointer and EVERY generation of
    * `logical` (including the unversioned name) — the clean-slate drop
    * specs and rebuilds-from-nothing use.
    */
  def dropAll(s: SparkSession, logical: String,
              sideSuffixes: Seq[String]): Unit = {
    val p = pointerPath(s, logical)
    val pfs = fsOf(s, p)
    val curGen = generationOf(resolve(s, logical))
    if (pfs.exists(p)) pfs.delete(p, false)
    val prefixes = logical +: (1 to curGen + 2).map(g => s"${logical}__g$g")
    for (prefix <- prefixes; suffix <- "" +: sideSuffixes) {
      val t = s"$prefix$suffix"
      s.sql(s"DROP TABLE IF EXISTS default.`$t`")
      Ingest.clearStaleLocation(s, t)
    }
  }
}
