package graft

import org.apache.spark.sql.functions._

/** The always-on registry-wide plan gate (VERDICT r7 #4): every
  * registered query's physical plan must be free of cartesian products
  * and non-allowlisted BroadcastNestedLoopJoins. Plans are only BUILT
  * (never executed), so the sweep is cheap enough for every `sbt test`
  * run — any future query that ships an unkeyed join fails CI here
  * rather than surviving until someone runs the dev main.
  */
class PlanAuditSpec extends SparkSpec {

  test("registry sweep: no cartesian / unexpected BNLJ / plan error in any query") {
    val rs = PlanAudit.sweep(spark, sf0001)
    // the sweep must actually cover the registry (guards a refactor
    // that silently empties the query map)
    assert(rs.size == SparkEntry.queries.size)
    assert(rs.size >= 100, s"registry unexpectedly small: ${rs.size}")
    val bad = PlanAudit.failures(rs)
    assert(bad.isEmpty, "plan audit failures:\n" +
      bad.map { case (n, v, d) => s"  $n: $v $d" }.mkString("\n"))
  }

  test("allowlist is not stale: every allowlisted query still exists") {
    val missing = PlanAudit.allowedBnlj.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"allowlisted but unregistered: $missing")
  }

  test("sweep detects an injected unkeyed join (the gate actually fires)") {
    val poison: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "zz_poison_cartesian" -> ((s, d) => {
        val docs = graft.util.Tables.documents(s, d).select(col("doc_id"))
        // inner join with no condition on two non-broadcastable sides
        // (threshold forced to -1 via hint-free crossJoin) = cartesian
        docs.crossJoin(docs.select(col("doc_id").as("b_id")))
      }))
    val rs = PlanAudit.sweep(spark, sf0001, poison)
    val verdicts = rs.map(r => r._1 -> r._2).toMap
    assert(Set("CARTESIAN", "UNEXPECTED-BNLJ")
        .contains(verdicts("zz_poison_cartesian")),
      s"poison query not flagged: $verdicts")
  }
}
