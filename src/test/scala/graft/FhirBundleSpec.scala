package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class FhirBundleSpec extends SparkSpec {

  private lazy val out = Analytics.q82FhirBundle(spark, Sf).collect()

  test("q82 bundles are valid JSON whose entry count matches the declared total") {
    assert(out.nonEmpty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    out.foreach { r =>
      val root = mapper.readTree(r.getAs[String]("bundle_json"))
      assert(root.get("resourceType").asText == "Bundle")
      assert(root.get("type").asText == "collection")
      val entries = root.get("entry")
      assert(entries.isArray)
      assert(root.get("total").asLong == entries.size.toLong)
      assert(r.getAs[Long]("total") == entries.size.toLong)
    }
  }

  test("q82 first entry is the Patient resource; observations are final with positive values") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    out.take(10).foreach { r =>
      val entries = mapper.readTree(r.getAs[String]("bundle_json")).get("entry")
      val first = entries.get(0).get("resource")
      assert(first.get("resourceType").asText == "Patient")
      assert(first.get("id").asText == s"user-${r.getAs[Long]("user_id")}")
      (1 until entries.size).foreach { i =>
        val o = entries.get(i).get("resource")
        assert(o.get("resourceType").asText == "Observation")
        assert(o.get("status").asText == "final")
        assert(o.get("value_centi").asInt > 0)
        assert(o.get("subject").asText == s"Patient/user-${r.getAs[Long]("user_id")}")
      }
    }
  }

  test("q82 resource ids are deterministic name-based ids in 8-4-4-4-12 shape") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val idShape = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    val again = Analytics.q82FhirBundle(spark, Sf).collect()
    assert(out.map(_.getAs[String]("bundle_json")).toSeq ==
      again.map(_.getAs[String]("bundle_json")).toSeq, "bundles must be run-deterministic")
    out.take(5).foreach { r =>
      val entries = mapper.readTree(r.getAs[String]("bundle_json")).get("entry")
      (1 until entries.size).foreach { i =>
        val id = entries.get(i).get("resource").get("id").asText
        assert(idShape.findFirstIn(id).isDefined, s"bad id shape: $id")
      }
    }
  }
}
