package graft

/** Value-level pins for the wave-23 streaming twins (q224–q225): each
  * must be ROW-IDENTICAL to its batch counterpart (they already share
  * one DuckDB oracle; these pins make stream ≡ batch fail loudly in
  * CI too). q224 additionally proves the mergeable-reservoir argument
  * holds under arbitrary batch membership — the stream's input split
  * is repartition(3), not the oracle's scan order.
  */
class Wave23Spec extends SparkSpec {

  test("q224 streaming reservoir is row-identical to the q211 batch card") {
    val stream = SparkEntry.queries("q224_stream_quota")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(r => (r.head.toString, r(1).toString))
    val batch = SparkEntry.queries("q211_quota_sample")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(r => (r.head.toString, r(1).toString))
    assert(stream.length == batch.length && stream.nonEmpty)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s == b, s"stream row $s != batch row $b")
    }
  }

  test("q225 streaming packing is row-identical to the q221 batch chain") {
    val stream = SparkEntry.queries("q225_stream_packing")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    val batch = SparkEntry.queries("q221_packing_chain")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    assert(stream.length == batch.length && stream.nonEmpty)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s == b, s"stream row $s != batch row $b")
    }
  }
}
