package graft

/** Driver-contract smoke: `entry` (flagship 1d-tier cascade on
  * sf0.001) must return rows, and every catalog query must have either
  * an oracle or a documented rows-only reason. */
class SparkEntrySpec extends SparkSpecBase {

  test("entry: flagship cascade returns presented 1d rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq(
      "key", "bucket", "cnt", "sum_v", "mean_v", "min_v", "max_v", "std_v"))
    assert(df.count() > 0)
  }

  test("catalog: every query key is unique and oracle coverage is the documented set") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    // the only rows-only queries are the two with inherent reasons
    // (xxhash64-defined generator; stubbed multimodal decode)
    assert(qs -- os == Set("q_synth_cascade", "q_multimodal_features"),
      s"unexpected rows-only set: ${qs -- os}")
    assert(qs.size == 121 && os.size == 119)
  }
}
