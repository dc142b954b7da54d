package graft

/**
 * Driver-contract registration safety net. Round 12 shipped a
 * SparkEntry that referenced an object missing from its import list —
 * `sbt test` can stay green on such a tree only if nothing forces
 * SparkEntry's class init, so the breakage surfaced first in the
 * driver's gate and zeroed the whole correctness board. This spec
 * makes that failure class a red test instead:
 *
 *  - constructing EVERY `queries` entry against sf0.001 forces
 *    SparkEntry's init plus each builder body (a missing import, a
 *    renamed column, or a bad fixture path dies here), and forcing
 *    the ANALYZED plan catches unresolved references without paying
 *    for execution;
 *  - `oracleSql` and `queries` must carry exactly the same keys — an
 *    orphan oracle is an automatic driver FAIL ("no spark output"),
 *    and a query without an oracle ships unverified;
 *  - the flagship `entry` must analyze too.
 */
class RegistrationSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("queries and oracleSql carry exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("every registered query constructs and analyzes against sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, build) =>
      try {
        val df = build(spark, sfDir)
        df.queryExecution.analyzed // force resolution, not execution
        assert(df.schema.fields.nonEmpty)
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the flagship entry analyzes") {
    SparkEntry.entry(spark).queryExecution.analyzed
  }
}
