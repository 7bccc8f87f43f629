package graft

import org.apache.spark.sql.functions._

/** The always-on registry-wide plan gate (VERDICT r7 #4): every
  * registered query's physical plan must be free of cartesian products
  * and non-allowlisted BroadcastNestedLoopJoins. Plans are only BUILT
  * (never executed) — with two known exceptions: q112 and q115
  * materialize their sink/stream pipelines EAGERLY while the DataFrame
  * is constructed, so for those the sweep audits the final read-back
  * scan, not the per-batch/per-run join shapes. Those interior plans
  * are gated DIRECTLY by the "streaming/capstone interior plans" test
  * below (streamBatchCandidates, normalizedRunE1). The sweep is cheap
  * enough for every `sbt test` run — any future query that ships an
  * unkeyed join fails CI here rather than surviving until someone runs
  * the dev main.
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

  test("streaming/capstone interior plans are keyed (q112/q115 executed shapes)") {
    // q112/q115 run their joins inside foreachBatch / eager sink
    // materialization, so the registry sweep only sees the read-back
    // scan — audit the interior plan builders directly
    def assertKeyed(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plan has a cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plan has a BNLJ")
    }
    val docs = graft.util.Tables.documents(spark, sf0001)
    val baseSig = graft.ext.Dedup.bandedSignatures(
      docs.filter(col("doc_id") % 2 === 0), "text", "doc_id", k = 8)
    assertKeyed("streamBatchCandidates",
      graft.queries.ExtQueries.streamBatchCandidates(
        docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
        baseSig))
    assertKeyed("streamBatchSimhash",
      graft.queries.ExtQueries.streamBatchSimhash(
        docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
        graft.queries.ExtQueries.simhashBaseSig(
          docs.filter(col("doc_id") % 2 === 0))))
    assertKeyed("normalizedRunE1",
      graft.queries.CoreQueries.normalizedRunE1(spark, sf0001, "r1", 0, false))
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
