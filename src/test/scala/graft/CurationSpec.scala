package graft

import org.apache.spark.sql.Row
import graft.operators.Curation

/** Pins Curation.curate stage-by-stage on a hand-built corpus where
  * every stage's verdict is known: URL blocklist, C4 document kill,
  * Gopher word minimum, exact-dup pair resolution, decontamination,
  * boilerplate-line removal and PII redaction visible in the output
  * text, and the NULL discipline for never-reached stages. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  // 78 words, 6 sentences, stop words "the"/"and"/"that", mean word
  // length ~3.6 — passes the C4 document rule and every Gopher rule
  private val body =
    Iterator.fill(6)("the quick brown fox jumps over a lazy dog and that is fine.")
      .mkString(" ")
  private val footer = "shared footer everywhere."
  private val evalLine =
    "benchmark passage words here exactly match eval items fully today always."

  private lazy val out = {
    // body lines are per-doc unique (except the dup pair, df = 2) so
    // the boilerplate pass keeps them — a body shared by 3+ docs
    // would be line-deduped away before the flags ever see it
    val docs = Seq(
      1L -> s"alpha $body\nUnique marker one.",
      2L -> s"alpha $body\nUnique marker one.", // exact dup of doc 1
      3L -> s"no punctuation here at all\n$footer",
      4L -> s"delta $body\nContact a.b@cd.org for details.\nsee https://spam.example.com/x now item four\n$footer",
      5L -> s"echo $body\n$evalLine",
      6L -> "One two three. Four five six. Seven eight nine. Ten eleven twelve. Final sentence here.",
      7L -> s"golf $body\n$footer"
    ).toDF("doc_id", "text")
    val bench = Seq(evalLine).toDF("text")
    Curation.curate(docs, bench, blocklist = Seq("spam.example.com"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def flags(r: Row): (Any, Any, Any, Any, Any, Any) =
    (r.get(1), r.get(2), r.get(3), r.get(4), r.get(7), r.get(8))

  test("clean pass-through doc survives every stage") {
    assert(flags(out(7L)) === ((1, 1, 1, 1, 1, 1)))
    // the df=3 boilerplate footer is gone from the cleaned text
    assert(!out(7L).getString(9).contains("shared footer"))
    assert(out(7L).getString(9) === s"golf $body")
  }

  test("exact-dup pair: min doc_id wins, loser stops at dedup") {
    assert(flags(out(1L)) === ((1, 1, 1, 1, 1, 1)))
    assert(flags(out(2L)) === ((1, 1, 1, 0, null, 0)))
    assert(out(2L).get(5) == null && out(2L).get(6) == null) // no gram counts
    assert(out(1L).getString(9) === out(2L).getString(9))
  }

  test("C4 document kill: empty clean text, downstream stages NULL") {
    assert(flags(out(3L)) === ((1, 0, 0, null, null, 0)))
    assert(out(3L).getString(9) === "")
  }

  test("URL blocklist kill is computed pre-clean; PII redaction lands in text") {
    assert(flags(out(4L)) === ((0, 1, 1, null, null, 0)))
    assert(out(4L).getString(9).contains("Contact <EMAIL> for details."))
    assert(!out(4L).getString(9).contains("spam.example.com")) // line lacked punct
  }

  test("decontamination kills the eval-overlapping doc after dedup passed") {
    assert(flags(out(5L)) === ((1, 1, 1, 1, 0, 0)))
    val (n, h) = (out(5L).getLong(5), out(5L).getLong(6))
    assert(h >= 7, s"expected >=7 bench-gram hits, got $h") // 11 tokens -> 7 five-grams
    assert(h * 1000 > n * 50) // over the 5% threshold
  }

  test("Gopher word minimum kills the short doc") {
    assert(flags(out(6L)) === ((1, 1, 0, null, null, 0)))
  }

  test("scan-local gram_hits equals the broadcast-join contamination counts") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, TextAnalysis}
    val docs = Tables.documents(spark, sf("sf0.001"))
    val bench = docs.where(col("doc_id") % 97 === 0)
    val grams = Dedup.withShingles(bench, 5)
      .select(explode(col("sh")).as("gram")).distinct()
      .collect().map(_.getString(0)).toSeq
    val scanLocal = docs
      .withColumn("__toks", split(lower(col("text")), "\\s+"))
      .withColumn("__sh", Dedup.shinglesOf(col("__toks"), 5))
      .select(col("doc_id"), size(col("__sh")).cast("long").as("n_grams"),
        graft.functions.GramHits.gram_hits(col("__sh"), grams)
          .cast("long").as("hit_grams"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val joined = TextAnalysis.contamination(docs, bench)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(scanLocal === joined)
    assert(joined.values.exists(_._2 > 0), "fixture has no contaminated doc")
  }
}
