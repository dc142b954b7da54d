package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PiiSpec extends SparkSpec {

  private lazy val pii = graft.Tables.pii(spark)

  test("scan counts follow the fixture's injection layout") {
    val out = Pii.scanRedact(pii).collect()
      .map(r => r.getAs[Long]("rec_id") -> r).toMap
    out.foreach { case (id, r) =>
      val expEmail = (if (id % 5 == 0) 1 else 0) + (if (id % 11 == 0) 1 else 0)
      assert(r.getAs[Int]("n_email") == expEmail, s"email @$id")
      assert(r.getAs[Int]("n_phone") == (if (id % 5 == 1) 1 else 0), s"phone @$id")
      assert(r.getAs[Int]("n_ipv4") == (if (id % 5 == 2) 1 else 0), s"ipv4 @$id")
      assert(r.getAs[Int]("n_ssn") == (if (id % 5 == 3) 1 else 0), s"ssn @$id")
      assert(r.getAs[Int]("n_card") == (if (id % 7 == 0) 1 else 0), s"card @$id")
      val total = r.getAs[Int]("n_email") + r.getAs[Int]("n_phone") +
        r.getAs[Int]("n_ipv4") + r.getAs[Int]("n_ssn") + r.getAs[Int]("n_card")
      assert(r.getAs[Int]("n_pii") == total, s"total @$id")
    }
    // decoy rows (id % 13 == 0) carry `v1.2.x` and `a@b` — neither may
    // count (65 also has a real email: exactly 1, not 2)
    assert(out(13L).getAs[Int]("n_ipv4") == 0 && out(13L).getAs[Int]("n_email") == 0)
    assert(out(65L).getAs[Int]("n_email") == 1)
  }

  test("redaction is complete: rescanning redacted text finds nothing") {
    val redacted = Pii.scanRedact(pii).select(col("rec_id"), col("redacted").as("text"))
    val rescan = Pii.scanRedact(redacted)
    assert(rescan.agg(sum("n_pii")).head.getLong(0) == 0L)
    // placeholders present where the original had hits
    val r0 = Pii.scanRedact(pii).filter(col("rec_id") === 5).head.getAs[String]("redacted")
    assert(r0.contains("<EMAIL>") && !r0.contains("@"))
  }

  test("scan is one shuffle-free codegen'd projection") {
    val plan = Pii.scanRedact(pii).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1)"), plan) // one whole-stage-codegen span
  }
}
