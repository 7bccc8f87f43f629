package graft

/** Selection tag for the tests whose plan BUILD executes real work
  * (streaming ingest loops, eager maintenance iterations, training
  * collects — see `PlanAudit.eagerAtBuild`). `sbt test` runs tagged
  * and untagged alike; the tag exists so a per-wave iteration can run
  * the cheap pure-plan gate alone:
  *
  *   sbt "testOnly * -- -l graft.SlowPlanAudit"   // fast gate, < 5 min
  *   sbt test                                     // full suite (round close)
  */
object SlowPlanAudit extends org.scalatest.Tag("graft.SlowPlanAudit")
