package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.functions.TextHashExpressions

/** Bit-exactness pins for the compiled md5 text-signature kernels
  * (TextHashExpressions) against the HOF compositions they replaced —
  * the exact expressions the r5 DuckDB oracles replay. Any divergence
  * here is an oracle hash-fail waiting to happen.
  */
class TextHashKernelSpec extends SparkSpecBase {
  import spark.implicits._

  /** Edge-case corpus: empty text, single word, repeated words,
    * whitespace runs, unicode, long doc — plus the sf0.001 documents
    * table for organic coverage. */
  private def fixture: DataFrame = {
    val planted = Seq(
      (100001L, ""),
      (100002L, "one"),
      (100003L, "a a a a a a a a"),
      (100004L, "alpha beta gamma delta epsilon zeta eta theta"),
      (100005L, "  leading   and \t mixed   whitespace  runs "),
      (100006L, "Ünïcode tökens mixèd ASCII words ünïcode tökens again"),
      (100007L, (1 to 200).map(i => s"w${i % 37}").mkString(" ")),
      (100008L, "exact dup body"), (100009L, "exact dup body")
    ).toDF("doc_id", "text")
    Tables.documents(spark, sf("sf0.001")).select($"doc_id", $"text")
      .unionByName(planted)
  }

  test("minhash_md5 kernel is bit-identical to the HOF min-fold (k=32)") {
    val k = 32
    val sh = Dedup.withShingles(fixture, 3)
    val both = sh.select($"doc_id",
      when(size($"sh") >= 0,
        TextHashExpressions.minhash_md5($"sh", k)).as("kern"),
      when(size($"sh") >= 0,
        transform(sequence(lit(0), lit(k - 1)), i =>
          array_min(transform($"sh", s =>
            md5(concat(i.cast("string"), lit(":"), s)))))).as("hof"))
    val bad = both.where(!($"kern" <=> $"hof")).count()
    assert(bad == 0, s"$bad rows diverge between minhash_md5 kernel and HOF fold")
    // sanity: non-degenerate rows produce k non-null hex hashes
    val row = both.where($"doc_id" === 100004L).head()
    val sig = row.getSeq[String](1)
    assert(sig.length == k && sig.forall(h => h != null && h.length == 32))
  }

  test("simhash_md5 kernel is bit-identical to the nibble-decode HOF fold") {
    val toks = fixture.withColumn("__toks", split(lower($"text"), "\\s+"))
    val both = toks.select($"doc_id",
      when(size($"__toks") >= 0,
        TextHashExpressions.simhash_md5($"__toks")).as("kern"))
      .join(
        toks
          .withColumn("tn", expr(
            """transform(
              |  transform(split(lower(text), '\\s+'), t -> substring(md5(t), 1, 16)),
              |  h -> transform(sequence(0, 15), p ->
              |         locate(substr(h, p + 1, 1), '0123456789abcdef') - 1))""".stripMargin))
          .withColumn("hof", expr(
            """CASE WHEN size(tn) >= 0 THEN aggregate(
              |  sequence(0, 63), 0L,
              |  (acc, b) -> acc + shiftleft(
              |    CASE WHEN 2 * size(filter(tn, n ->
              |      (element_at(n, CAST(b div 4 AS INT) + 1)
              |        & shiftleft(1, 3 - b % 4)) > 0)) > size(tn)
              |    THEN 1L ELSE 0L END, b)) END""".stripMargin))
          .select($"doc_id", $"hof"),
        Seq("doc_id"))
    val bad = both.where(!($"kern" <=> $"hof")).count()
    assert(bad == 0, s"$bad rows diverge between simhash_md5 kernel and HOF fold")
  }

  test("minhash_xx64 kernel is bit-identical to the xxhash64 HOF min-fold (k=32)") {
    val k = 32
    val sh = Dedup.withShingles(fixture, 3)
    val both = sh.select($"doc_id",
      when(size($"sh") >= 0,
        TextHashExpressions.minhash_xx64($"sh", k)).as("kern"),
      when(size($"sh") >= 0,
        transform(sequence(lit(0), lit(k - 1)), i =>
          array_min(transform($"sh", s => xxhash64(s, i))))).as("hof"))
    val bad = both.where(!($"kern" <=> $"hof")).count()
    assert(bad == 0, s"$bad rows diverge between minhash_xx64 kernel and HOF fold")
    // empty-shingle docs produce k nulls on both sides
    val empty = both.where($"doc_id" === 100001L).head()
    assert(empty.getSeq[Any](1).forall(_ == null) &&
      empty.getSeq[Any](2).forall(_ == null))
  }

  test("simhash_xx64 kernel is bit-identical to the xxhash64 bit-majority fold") {
    val toks = fixture.withColumn("__toks", split(lower($"text"), "\\s+"))
    val both = toks.select($"doc_id",
      when(size($"__toks") >= 0,
        TextHashExpressions.simhash_xx64($"__toks")).as("kern"),
      expr(
        """CASE WHEN size(transform(split(lower(text), '\\s+'), t -> xxhash64(t))) >= 0
          |THEN aggregate(
          |  sequence(0, 63), 0L,
          |  (acc, b) -> acc + shiftleft(
          |    CASE WHEN 2 * size(filter(
          |        transform(split(lower(text), '\\s+'), t -> xxhash64(t)),
          |        h -> (shiftright(h, b) & 1) = 1))
          |      > size(transform(split(lower(text), '\\s+'), t -> xxhash64(t)))
          |    THEN 1L ELSE 0L END, b)) END""".stripMargin).as("hof"))
    val bad = both.where(!($"kern" <=> $"hof")).count()
    assert(bad == 0, s"$bad rows diverge between simhash_xx64 kernel and HOF fold")
  }

  test("winnow_md5 kernel is bit-identical to the staged HOF winnowing") {
    val window = 4
    val g = fixture
      .withColumn("__toks", split(lower($"text"), "\\s+"))
      .withColumn("__g", TextAnalysis.gramsOf($"__toks", 4))
    val both = g.select($"doc_id",
      when(size($"__g") >= 0,
        TextHashExpressions.winnow_md5($"__g", window)).as("kern"),
      when(size($"__g") >= 0, array_distinct(
        filter(
          transform(sequence(lit(0), greatest(size($"__g") - window, lit(0))),
            i => when(i + window <= size($"__g"),
              array_min(slice(transform($"__g", x => md5(x)), i + 1, lit(window))))),
          x => x.isNotNull))).as("hof"))
    // the HOF form recomputes md5 inside the slice per window — fine
    // at spec scale; order AND multiset must agree exactly
    val bad = both.where(!($"kern" <=> $"hof")).count()
    assert(bad == 0, s"$bad rows diverge between winnow_md5 kernel and HOF winnowing")
    // short docs (< window + k − 1 words) emit nothing
    val short = both.where($"doc_id" === 100002L).head()
    assert(short.getSeq[String](1).isEmpty && short.getSeq[String](2).isEmpty)
  }
}
