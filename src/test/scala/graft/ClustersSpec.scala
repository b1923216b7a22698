package graft

import graft.operators.Clusters
import org.apache.spark.sql.functions._

/** Connected-components contract: exact cluster assignments on known
  * graph shapes, and cluster semantics over the real near-dup corpus.
  */
class ClustersSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    Clusters.connectedComponents(
        edges.toDF("src", "dst"), nodes.toDF("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
  }

  test("chains, stars, cycles and singletons resolve to the component minimum") {
    // chain 1-2-3-4-5, star 10-{11,12,13}, cycle 20-21-22-20, singleton 30
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (22L, 20L))
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 13L, 20L, 21L, 22L, 30L)
    val labels = cc(edges, nodes)
    Seq(1L, 2L, 3L, 4L, 5L).foreach(n => assert(labels(n) == 1L, s"chain node $n"))
    Seq(10L, 11L, 12L, 13L).foreach(n => assert(labels(n) == 10L, s"star node $n"))
    Seq(20L, 21L, 22L).foreach(n => assert(labels(n) == 20L, s"cycle node $n"))
    assert(labels(30L) == 30L, "singleton keeps its own id")
  }

  test("the CC loop leaves only the final labels pinned (O(1) snapshots)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // a 12-node path graph forces ~12 propagation rounds (one hop per
    // round, plus the convergence check — inside the default maxIter) —
    // the shape where an O(rounds) pinned-snapshot leak would be widest
    val edges = (0L until 11L).map(i => (i, i + 1))
    val labels = Clusters.connectedComponents(
      edges.toDF("src", "dst"), (0L until 12L).toDF("id"))
    assert(labels.select("cluster_id").distinct().count() == 1)
    assert(Clusters.lastIters > 2, "path graph should take several rounds")
    // every superseded round and the edge frames were released; at most
    // the FINAL labels snapshot may remain pinned
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"CC loop leaked ${leaked.size} pinned RDDs: $leaked")
  }

  test("edge direction is irrelevant") {
    val a = cc(Seq((5L, 1L), (3L, 5L)), Seq(1L, 3L, 5L))
    assert(a == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("q46 groups every injected duplicate with its source and keeps one canonical per cluster") {
    val out = Clusters.q46DedupClusters(spark, Sf).cache()
    // injected dup (id + 10000) must share its source's cluster
    val dupRows = out.filter(col("doc_id") >= 10000)
      .select(col("doc_id"), col("cluster_id")).collect()
    assert(dupRows.nonEmpty)
    val byId = out.select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    dupRows.foreach { r =>
      val (dup, cl) = (r.getLong(0), r.getLong(1))
      assert(byId(dup - 10000) == cl, s"dup $dup not clustered with its source")
    }
    // exactly one canonical per cluster, and it is the minimum member
    val bad = out.groupBy("cluster_id")
      .agg(sum(col("is_canonical").cast("int")).as("n_canon"),
        min("doc_id").as("min_id"), first("cluster_id").as("cid"))
      .filter(col("n_canon") =!= 1 || col("min_id") =!= col("cid"))
    assert(bad.count() == 0, "each cluster has exactly one canonical = min id")
    // every doc appears exactly once
    assert(out.count() == graft.operators.Dedup.corpus(spark, Sf).count())
    // the guarded candidate graph is star/clique-shaped: label
    // propagation must hit fixpoint in a handful of rounds, and the
    // loop must notice (a 20-round run on this graph means the
    // convergence check broke, even if the answer is still right)
    assert(Clusters.lastIters <= 5, s"CC took ${Clusters.lastIters} rounds")
  }

  test("q122 mirror matrix equals an independent recomputation from the q46 labels") {
    val labels = Clusters.q46DedupClusters(spark, Sf)
      .filter(col("cluster_size") >= 2)
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcMap = graft.operators.Dedup.corpus(spark, Sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // naive recomputation: per cluster count docs per source, expand
    // ordered pairs, sum the pair mass
    val byCluster = labels.groupBy(_._2).values.map(_.map(d => srcMap(d._1)))
    val expect = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    for (cluster <- byCluster) {
      val counts = cluster.groupBy(identity).view.mapValues(_.size.toLong).toMap
      for (a <- counts.keys; b <- counts.keys if a <= b) {
        val mass = if (a == b) counts(a) * (counts(a) - 1) / 2
                   else counts(a) * counts(b)
        if (mass > 0) {
          val (c0, m0) = expect.getOrElse((a, b), (0L, 0L))
          expect((a, b)) = (c0 + 1, m0 + mass)
        }
      }
    }
    val got = Clusters.q122SourceMirrors(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("dup_pairs"))).toMap
    assert(got == expect.toMap, s"got $got\nexpect $expect")
    // the injected re-crawl keeps its source, so diagonals must exist
    assert(got.keys.exists { case (a, b) => a == b }, got.keys.toString)
  }

  test("q87 dedup report accounts for every document and every droppable copy") {
    val rep = Clusters.q87DedupReport(spark, Sf).cache()
    val docs = graft.operators.Dedup.corpus(spark, Sf).count()
    val agg = rep.agg(sum("n_docs"), sum("n_redundant"), sum("n_clusters")).first()
    assert(agg.getLong(0) == docs, "every corpus document lands in exactly one cluster")
    assert(agg.getLong(1) == docs - agg.getLong(2),
      "redundant = docs minus one keeper per cluster")
    assert(rep.filter(col("cluster_size") >= 2).count() > 0,
      "injected duplicates must produce multi-doc clusters")
    rep.unpersist()
  }

  test("q84 keep-best picks exactly one keeper per cluster: the quality argmax, ties to the lowest id") {
    val out = Clusters.q84KeepBest(spark, Sf).cache()
    // one keeper per cluster, and no member outscores it
    val perCluster = out.groupBy("cluster_id").agg(
      sum(col("is_keeper")).as("n_keepers"),
      max(col("quality_score")).as("best_q"),
      max(when(col("is_keeper") === 1, col("quality_score"))).as("keeper_q"))
    assert(perCluster.filter(col("n_keepers") =!= 1).count() == 0, "exactly one keeper per cluster")
    assert(perCluster.filter(col("keeper_q") =!= col("best_q")).count() == 0,
      "the keeper carries the cluster's best quality score")
    // singleton clusters keep themselves
    val singles = out.filter(col("cluster_size") === 1)
    assert(singles.count() > 0)
    assert(singles.filter(col("keeper_doc_id") =!= col("doc_id") || col("is_keeper") =!= 1).count() == 0)
    // an injected +10000 copy has IDENTICAL text to its source, so it can
    // never strictly outscore it — a copy can top the quality ranking only
    // tied with its source, and the id tie-break then picks the source:
    // the keeper of a dup-containing cluster is never the copy
    val dupClusters = out.filter(col("doc_id") >= 10000).select("cluster_id").distinct()
    val keepers = out.filter(col("is_keeper") === 1).join(dupClusters, "cluster_id")
    assert(keepers.count() == dupClusters.count())
    assert(keepers.filter(col("doc_id") >= 10000).count() == 0,
      "a +10000 copy must never be the keeper")
    out.unpersist()
  }

  test("q149 pagerank: hand-graph values match the decimal-exact recurrence; hubs outrank leaves") {
    import spark.implicits._
    // path 1-2-3, triangle 10-11-12, star 20-{21,22,23}
    val edges = Seq((1L, 2L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (20L, 22L), (20L, 23L))
    val out = Clusters.pagerank(edges.toDF("src", "dst")).collect()
    // replay the recurrence by hand: uniform init over the edge-touched
    // nodes, PrIters rounds of (decimal-12 contribution sum, double
    // damping step) — the exact arithmetic both engines run
    val bidir = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val nbrs = bidir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = nbrs.size
    var pr: Map[Long, Double] = nbrs.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to Clusters.PrIters) {
      pr = nbrs.map { case (v, us) =>
        val mass = us.map(u => BigDecimal(pr(u) / nbrs(u).size)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        v -> (0.15 / n + 0.85 * mass.toDouble)
      }
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("pagerank_r")).toMap
    assert(got.keySet == nbrs.keySet)
    nbrs.keys.foreach(v => assert(got(v) == r6(pr(v)),
      s"node $v: got ${got(v)}, expected ${r6(pr(v))}"))
    // degrees ride the output; the star hub outranks its leaves; total
    // mass is conserved (no dangling nodes by construction)
    out.foreach(r => assert(r.getAs[Long]("deg") ==
      nbrs(r.getAs[Long]("doc_id")).size))
    assert(got(20L) > got(21L), "hub must outrank leaf")
    assert(math.abs(got.values.sum - 1.0) < 1e-4, got.values.sum.toString)
  }
}
