package graft

import graft.ml.QualityClassifier

/** The distilled quality classifier's contract: trains on the weak
  * heuristic labels, generalizes to held-out documents, and the saved
  * artifact scores identically after a load.
  */
class QualityClassifierSpec extends SparkSpec {

  // sf0.01: a stable heldout read needs a few hundred documents;
  // sf0.001's 50 are too few for a meaningful AUC
  private val Dir = "/root/testdata/sf0.01"

  test("distilled quality classifier: heldout AUC above floor, save/load identical") {
    val docs = Tables.load(spark, Dir, "documents")
    val all = QualityClassifier.labeled(docs)
    val (train, held) = QualityClassifier.trainHeldoutSplit(all)
    // the weak label must not be degenerate, or the fit is vacuous
    assert(train.select("label").distinct().count() == 2,
      "weak label degenerate on this corpus")
    val model = QualityClassifier.fit(train)
    val scored = QualityClassifier.score(model, held).cache()
    // the classifier must actually distill the heuristic: hashed
    // bag-of-words carries the token-count and stopword-count signal the
    // composite score is built from, so a linear head separates well
    // above chance on documents it never saw
    val auc = QualityClassifier.auc(scored)
    assert(auc > 0.65, f"heldout AUC $auc%.3f below floor")
    // persisted artifact scores byte-identically after a load
    val path = java.nio.file.Files.createTempDirectory("qc").toString
    QualityClassifier.save(model, path)
    val re = QualityClassifier.score(QualityClassifier.load(path), held)
    assert(scored.except(re).count() == 0 && re.except(scored).count() == 0)
    scored.unpersist()
  }
}
