package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import Q._

/** Thunder Series-parity operator queries over events, each with a
  * bit-deterministic DuckDB oracle (see SeriesOps scaladoc for the
  * exact-decimal closed-form technique). */
object SeriesQueries extends QuerySet {

  private val EPOCH0 = 1704067200L // 2024-01-01T00:00:00Z, before all events

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zscore" -> ((s, dir) =>
      ordered(SeriesOps.zscore(eventPoints(s, dir)).select("key", "ts", "v"))),
    "q_center" -> ((s, dir) =>
      ordered(SeriesOps.center(eventPoints(s, dir)).select("key", "ts", "v"))),
    "q_standardize" -> ((s, dir) =>
      ordered(SeriesOps.standardize(eventPoints(s, dir)).select("key", "ts", "v"))),
    "q_clip" -> ((s, dir) =>
      ordered(SeriesOps.clip(eventPoints(s, dir), 5.0, 100.0).select("key", "ts", "v"))),
    "q_squelch" -> ((s, dir) =>
      ordered(SeriesOps.squelch(eventPoints(s, dir), 450.0).select("key", "ts", "v"))),
    "q_between" -> ((s, dir) =>
      ordered(SeriesOps.between(eventPoints(s, dir),
        "2024-01-10 00:00:00", "2024-01-20 00:00:00").select("key", "ts", "v"))),
    "q_subsample" -> ((s, dir) =>
      ordered(SeriesOps.subsample(eventPoints(s, dir), 7).select("key", "ts", "pos", "v"))),
    // Data.astype — Spark double→int cast truncates toward zero; the
    // oracle mirrors with trunc() (DuckDB's bare CAST rounds)
    "q_astype" -> ((s, dir) =>
      ordered(SeriesAlgebra.astype(eventPoints(s, dir), "int").select("key", "ts", "v"))),
    // series.fromlist/fromarray: LOCAL values → Series → operator —
    // certifies the local-construction path end-to-end against a pure
    // VALUES oracle. Timestamps built from epoch millis so the row set
    // is independent of the JVM default timezone.
    "q_fromseq" -> ((s, _) => {
      val rows = (0 until 24).map { i =>
        (s"k${i % 3}", new java.sql.Timestamp((1704067200L + 60L * i) * 1000L), i * 0.5)
      }
      ordered(SeriesOps.center(
          graft.api.Series.fromSeq(s, rows).df
            .withColumn("ts", col("ts").cast("timestamp_ntz")))
        .select("key", "ts", "v"))
    }),
    "q_downsample" -> ((s, dir) =>
      ordered(SeriesOps.downsample(eventPoints(s, dir), 12))),
    "q_mean_by_panel" -> ((s, dir) =>
      ordered(SeriesOps.meanByPanel(eventPoints(s, dir), 24))),
    "q_detrend" -> ((s, dir) =>
      ordered(SeriesOps.detrendLinear(eventPoints(s, dir)))),
    "q_percentile" -> ((s, dir) =>
      SeriesOps.seriesPercentile(eventPoints(s, dir), 0.2)
        .select(col("key"), round(col("pct"), 6).as("pct"))
        .orderBy("key", "pct")),
    "q_normalize" -> ((s, dir) =>
      ordered(SeriesOps.normalizePercentile(eventPoints(s, dir))
        .select(col("key"), col("ts"), round(col("v"), 6).as("v")))),
    "q_correlate_time" -> ((s, dir) =>
      ordered(SeriesOps.correlateWithTime(eventPoints(s, dir), EPOCH0))),
    "q_autocorr" -> ((s, dir) =>
      ordered(SeriesOps.autocorr(eventPoints(s, dir), 1))),
    "q_convolve" -> ((s, dir) =>
      ordered(SeriesOps.convolveSame(eventPoints(s, dir), Seq(0.25, 0.5, 0.25))
        .select("key", "ts", "v"))),
    "q_dft_bin" -> ((s, dir) =>
      SeriesOps.dftBin(eventPoints(s, dir), 1)
        .select(col("key"), round(col("re"), 6).as("re"), round(col("im"), 6).as("im"))
        .orderBy("key")),
    "q_dft_multi" -> ((s, dir) =>
      SeriesOps.dftBins(eventPoints(s, dir), 3)
        .select(col("key"), col("k"),
          round(col("re"), 6).as("re"), round(col("im"), 6).as("im"))
        .orderBy("key", "k")),
    // full-spectrum FFT (r2 verdict next-#8): input zscored (exact
    // sums → bit-portable, O(1) magnitude so round(…,6) is far above
    // the FFT-vs-naive-DFT eps·log n error), keys restricted to a
    // deterministic md5 class (the oracle replays the naive O(n²) DFT
    // — fine for 1/8 of keys, pointless for all of them)
    "q_fft" -> ((s, dir) => {
      val p = eventPoints(s, dir)
        .where(conv(substring(md5(col("key")), 1, 1), 16, 10).cast("int") < 2)
      SeriesOps.fftSpectrum(SeriesOps.zscore(p))
        .select(col("key"), col("k"),
          round(col("re"), 6).as("re"), round(col("im"), 6).as("im"))
        .orderBy("key", "k")
    }),
    "q_mean_by_window" -> ((s, dir) => {
      val centers = s.range(1, 81, 20).select(col("id").as("center")) // 1,21,41,61
      ordered(SeriesOps.meanByWindow(eventPoints(s, dir), centers, 2))
    }),
    // thunder's per-record-indices form: each key's own peak position
    // is its event center (r2 verdict next-#6)
    "q_mean_by_window_keyed" -> ((s, dir) => {
      val p = eventPoints(s, dir)
      ordered(SeriesOps.meanByWindowPerKey(p, SeriesOps.peakCenters(p), 2))
    }),
    "q_rolling_stats" -> ((s, dir) =>
      ordered(SeriesOps.rollingStats(eventPoints(s, dir), 2)
        .select(col("key"), col("ts"), col("roll_n"), col("roll_mean"),
          round(col("roll_median"), 6).as("roll_median"),
          col("roll_min"), col("roll_max")))),
    "q_crosscorr" -> ((s, dir) =>
      ordered(SeriesOps.crosscorr(eventPoints(s, dir), 3))),
    // truncated adjusted EWMA, α=0.5 (exact binary-fraction weights →
    // the term products and left-to-right sums replay bit-for-bit)
    "q_ewma" -> ((s, dir) =>
      ordered(SeriesOps.ewma(eventPoints(s, dir), k = 8)
        .select(col("key"), col("ts"), round(col("ewma"), 6).as("ewma")))),
    // thunder's GENERAL crosscorr(signal, lag): reference signal =
    // key '1's series, shifts −2..2 — exercises the broadcast
    // signal join; includes lag 0 = correlate(signal)
    "q_crosscorr_signal" -> ((s, dir) => {
      val p = eventPoints(s, dir)
      val signal = SeriesOps.withPos(p).where(col("key") === "1")
        .select(col("pos"), col("v").as("sig"))
      ordered(SeriesOps.crosscorrSignal(p, signal, 2))
    }),
    "q_normalize_window" -> ((s, dir) =>
      ordered(SeriesOps.normalizeWindow(eventPoints(s, dir), half = 3)
        .select(col("key"), col("ts"), round(col("v"), 6).as("v")))),
    "q_detrend2" -> ((s, dir) =>
      ordered(SeriesOps.detrendPoly2(eventPoints(s, dir)))),
    "q_stats_across_keys" -> ((s, dir) =>
      ordered(SeriesOps.statsAcrossKeys(eventPoints(s, dir), "hour"))),
    "q_distinct_keys" -> ((s, dir) =>
      ordered(SeriesOps.distinctKeys(eventPoints(s, dir), "hour"))),
    "q_mean_across_keys" -> ((s, dir) =>
      ordered(SeriesOps.meanAcrossKeys(eventPoints(s, dir), "hour"))),
    "q_mean_by_hod" -> ((s, dir) =>
      ordered(SeriesOps.meanByHourOfDay(eventPoints(s, dir)))),
    // thunder's multi-level stat_by_index: all prefix levels of the
    // (hour, minute) index hierarchy in ONE grouping-sets pass
    "q_stat_by_index_multi" -> ((s, dir) =>
      ordered(SeriesAlgebra.statByIndexMulti(eventPoints(s, dir),
        hour(col("ts")), minute(col("ts"))))),
  )

  private val zBody =
    s"SELECT p.key, p.ts, (p.v - $kMeanSql) / $kStdSql AS v FROM pts p JOIN ks USING (key)"

  val oracles: Map[String, String] = Map(
    "q_zscore" ->
      s"$ptsCte, $keyStatsCte $zBody ORDER BY key, ts, v",
    "q_center" ->
      s"$ptsCte, $keyStatsCte SELECT p.key, p.ts, (p.v - $kMeanSql) AS v FROM pts p JOIN ks USING (key) ORDER BY key, ts, v",
    "q_standardize" ->
      s"$ptsCte, $keyStatsCte SELECT p.key, p.ts, p.v / $kStdSql AS v FROM pts p JOIN ks USING (key) ORDER BY key, ts, v",
    "q_clip" ->
      s"$ptsCte SELECT key, ts, greatest(least(v, 100.0), 5.0) AS v FROM pts ORDER BY key, ts, v",
    "q_squelch" ->
      s"""$ptsCte SELECT key, ts,
         |  CASE WHEN MAX(v) OVER (PARTITION BY key) < 450.0 THEN 0.0 ELSE v END AS v
         |FROM pts ORDER BY key, ts, v""".stripMargin,
    "q_between" ->
      s"""$ptsCte SELECT key, ts, v FROM pts
         |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'
         |ORDER BY key, ts, v""".stripMargin,
    "q_subsample" ->
      s"$ptsCte SELECT key, ts, pos, v FROM pts WHERE pos % 7 = 0 ORDER BY key, ts, pos, v",
    "q_astype" ->
      s"$ptsCte SELECT key, ts, CAST(trunc(v) AS INT) AS v FROM pts ORDER BY key, ts, v",
    "q_fromseq" -> {
      val vals = (0 until 24).map { i =>
        f"('k${i % 3}', TIMESTAMP '2024-01-01 00:$i%02d:00', CAST(${i * 0.5} AS DOUBLE))"
      }.mkString(",\n        ")
      s"""WITH pts AS (SELECT * FROM (VALUES
         |        $vals) AS t(key, ts, v)),
         |$keyStatsCte
         |SELECT p.key, p.ts, (p.v - $kMeanSql) AS v FROM pts p JOIN ks USING (key)
         |ORDER BY key, ts, v""".stripMargin
    },
    "q_downsample" ->
      s"""$ptsCte SELECT key, CAST(floor(pos / 12) AS BIGINT) AS bin, COUNT(*) AS bin_n,
         |  CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
         |FROM pts GROUP BY 1, 2 ORDER BY key, bin, bin_n, v""".stripMargin,
    "q_mean_by_panel" ->
      s"""$ptsCte SELECT key, pos % 24 AS phase, COUNT(*) AS n,
         |  CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
         |FROM pts GROUP BY 1, 2 ORDER BY key, phase, n, v""".stripMargin,
    "q_detrend" ->
      s"""$ptsCte, ag AS (
         |  SELECT key, CAST(COUNT(*) AS DOUBLE) AS n,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sv,
         |         CAST(SUM(CAST(pos * v AS DECIMAL(27,6))) AS DOUBLE) AS siv,
         |         CAST(SUM(pos) AS DOUBLE) AS si,
         |         CAST(SUM(pos * pos) AS DOUBLE) AS sii
         |  FROM pts GROUP BY key)
         |SELECT p.key, p.ts, p.pos,
         |       p.v - ((sv / n - ((siv - si * sv / n) / (sii - si * si / n)) * (si / n))
         |              + ((siv - si * sv / n) / (sii - si * si / n)) * p.pos) + sv / n AS v
         |FROM pts p JOIN ag USING (key) ORDER BY key, ts, pos, v""".stripMargin,
    "q_percentile" ->
      s"$ptsCte SELECT key, round(quantile_cont(v, 0.2), 6) + 0.0 AS pct FROM pts GROUP BY key ORDER BY key, pct",
    "q_normalize" ->
      s"""$ptsCte, base AS (
         |  SELECT key, quantile_cont(v, 0.2) AS b FROM pts GROUP BY key)
         |SELECT p.key, p.ts, round((p.v - b) / (b + 0.1), 6) + 0.0 AS v
         |FROM pts p JOIN base USING (key) ORDER BY key, ts, v""".stripMargin,
    "q_correlate_time" ->
      s"""$ptsCte, tt AS (
         |  SELECT key, v, CAST((epoch_us(ts) - ${EPOCH0}000000) // 1000000 AS DOUBLE) / 1000.0 AS t
         |  FROM pts),
         |ag AS (
         |  SELECT key, CAST(COUNT(*) AS DOUBLE) AS n,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sv,
         |         CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE) AS st,
         |         CAST(CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(t AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS svt,
         |         CAST(CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS svv,
         |         CAST(CAST(SUM(CAST(t AS DECIMAL(19,6)) * CAST(t AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS stt
         |  FROM tt GROUP BY key)
         |SELECT key, (svt - sv * st / n) /
         |       (sqrt(svv - sv * sv / n) * sqrt(stt - st * st / n)) AS r
         |FROM ag ORDER BY key, r""".stripMargin,
    "q_autocorr" ->
      s"""$ptsCte, pr AS (
         |  SELECT key, v, lead(v, 1) OVER (PARTITION BY key ORDER BY ts) AS v2
         |  FROM pts QUALIFY v2 IS NOT NULL),
         |ag AS (
         |  SELECT key, CAST(COUNT(*) AS DOUBLE) AS n,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sa,
         |         CAST(SUM(CAST(v2 AS DECIMAL(18,6))) AS DOUBLE) AS sb,
         |         CAST(CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(v2 AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sab,
         |         CAST(CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS saa,
         |         CAST(CAST(SUM(CAST(v2 AS DECIMAL(19,6)) * CAST(v2 AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sbb
         |  FROM pr GROUP BY key)
         |SELECT key, (sab - sa * sb / n) /
         |       (sqrt(saa - sa * sa / n) * sqrt(sbb - sb * sb / n)) AS r
         |FROM ag ORDER BY key, r""".stripMargin,
    // same IEEE ops in the same left-to-right order as SeriesOps.ewma
    // (weights are exact binary fractions; ::DOUBLE keeps DuckDB's
    // decimal-literal parsing out of the arithmetic)
    "q_ewma" -> {
      def wt(i: Int) = BigDecimal(math.pow(0.5, i)).toString
      val num = (0 until 8).map(i =>
        s"COALESCE(lag(v, $i) OVER w * ${wt(i)}::DOUBLE, 0.0::DOUBLE)")
        .mkString(" + ")
      val den = (0 until 8).map(i =>
        s"COALESCE(CASE WHEN lag(v, $i) OVER w IS NOT NULL THEN ${wt(i)}::DOUBLE END, 0.0::DOUBLE)")
        .mkString(" + ")
      s"""$ptsCte SELECT key, ts, round(($num) / ($den), 6) + 0.0 AS ewma
         |FROM pts
         |WINDOW w AS (PARTITION BY key ORDER BY ts)
         |ORDER BY key, ts, ewma""".stripMargin
    },
    "q_rolling_stats" ->
      s"""$ptsCte SELECT key, ts,
         |  COUNT(*) OVER w AS roll_n,
         |  CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS roll_mean,
         |  round(quantile_cont(v, 0.5) OVER w, 6) + 0.0 AS roll_median,
         |  MIN(v) OVER w AS roll_min, MAX(v) OVER w AS roll_max
         |FROM pts
         |WINDOW w AS (PARTITION BY key ORDER BY ts ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
         |ORDER BY key, ts, roll_n, roll_mean, roll_median, roll_min, roll_max""".stripMargin,
    "q_crosscorr" -> {
      def lagSql(l: Int) =
        s"""SELECT key, $l AS lag, (sab - sa * sb / n) /
           |       (sqrt(saa - sa * sa / n) * sqrt(sbb - sb * sb / n)) AS r
           |FROM (
           |  SELECT key, CAST(COUNT(*) AS DOUBLE) AS n,
           |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sa,
           |         CAST(SUM(CAST(v2 AS DECIMAL(18,6))) AS DOUBLE) AS sb,
           |         CAST(CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(v2 AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sab,
           |         CAST(CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS saa,
           |         CAST(CAST(SUM(CAST(v2 AS DECIMAL(19,6)) * CAST(v2 AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sbb
           |  FROM (SELECT key, v, lead(v, $l) OVER (PARTITION BY key ORDER BY ts) AS v2
           |        FROM pts QUALIFY v2 IS NOT NULL)
           |  GROUP BY key)""".stripMargin
      s"""$ptsCte ${(1 to 3).map(lagSql).mkString("\n", "\nUNION ALL\n", "\n")}
         |ORDER BY key, lag, r""".stripMargin
    },
    "q_convolve" ->
      s"""$ptsCte SELECT key, ts,
         |  coalesce(lag(v, 1) OVER w, 0.0) * 0.25 + v * 0.5 +
         |  coalesce(lead(v, 1) OVER w, 0.0) * 0.25 AS v
         |FROM pts WINDOW w AS (PARTITION BY key ORDER BY ts)
         |ORDER BY key, ts, v""".stripMargin,
    "q_dft_bin" ->
      s"""$ptsCte, wn AS (
         |  SELECT key, v, pos, COUNT(*) OVER (PARTITION BY key) AS n FROM pts)
         |SELECT key,
         |  round(SUM(v * cos(-2.0 * pi() * 1 * pos / n)), 6) + 0.0 AS re,
         |  round(SUM(v * sin(-2.0 * pi() * 1 * pos / n)), 6) + 0.0 AS im
         |FROM wn GROUP BY key ORDER BY key""".stripMargin,
    "q_dft_multi" ->
      s"""$ptsCte, wn AS (
         |  SELECT key, v, pos, COUNT(*) OVER (PARTITION BY key) AS n FROM pts),
         |ex AS (SELECT key, v, pos, n, CAST(k AS INT) AS k FROM wn, range(1, 4) t(k))
         |SELECT key, k,
         |  round(SUM(v * cos(-2.0 * pi() * k * pos / n)), 6) + 0.0 AS re,
         |  round(SUM(v * sin(-2.0 * pi() * k * pos / n)), 6) + 0.0 AS im
         |FROM ex GROUP BY key, k ORDER BY key, k""".stripMargin,
    // naive O(n²) DFT ground truth over the zscored md5-class subset;
    // the (pos, k) grid comes from a self-join on key (each key's own
    // positions ARE the k range 0..n−1)
    "q_fft" ->
      s"""$ptsCte, fp AS (
         |  SELECT key, pos, v FROM pts WHERE substr(md5(key), 1, 1) < '2'),
         |ks AS (
         |  SELECT key, COUNT(*) AS n,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sv,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS svv
         |  FROM fp GROUP BY key),
         |z AS (
         |  SELECT p.key, p.pos, (p.v - $kMeanSql) / $kStdSql AS z, n
         |  FROM fp p JOIN ks USING (key))
         |SELECT a.key AS key, CAST(b.pos AS INT) AS k,
         |  round(SUM(a.z * cos(-2.0 * pi() * b.pos * a.pos / a.n)), 6) + 0.0 AS re,
         |  round(SUM(a.z * sin(-2.0 * pi() * b.pos * a.pos / a.n)), 6) + 0.0 AS im
         |FROM z a JOIN (SELECT DISTINCT key, pos FROM fp) b USING (key)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_mean_by_window" ->
      s"""$ptsCte, centers AS (
         |  SELECT CAST(unnest(generate_series(1, 80, 20)) AS BIGINT) AS center)
         |SELECT p.key, p.pos - c.center AS "offset", COUNT(*) AS n,
         |  CAST(SUM(CAST(p.v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
         |FROM pts p JOIN centers c ON p.pos >= c.center - 2 AND p.pos <= c.center + 2
         |GROUP BY 1, 2 ORDER BY key, "offset", n, v""".stripMargin,
    "q_mean_by_window_keyed" ->
      s"""$ptsCte, mx AS (
         |  SELECT key, v, pos, MAX(v) OVER (PARTITION BY key) AS m FROM pts),
         |centers AS (
         |  SELECT key, MIN(pos) AS center FROM mx WHERE v = m GROUP BY key)
         |SELECT p.key AS key, p.pos - c.center AS "offset", COUNT(*) AS n,
         |  CAST(SUM(CAST(p.v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
         |FROM pts p JOIN centers c ON p.key = c.key
         |  AND p.pos >= c.center - 2 AND p.pos <= c.center + 2
         |GROUP BY 1, 2 ORDER BY 1, 2, 3, 4""".stripMargin,
    "q_crosscorr_signal" ->
      s"""$ptsCte, sig AS (SELECT pos, v AS sig FROM pts WHERE key = '1'),
         |sl AS (SELECT CAST(l AS INT) AS lag, pos - l AS pos, sig
         |       FROM sig, range(-2, 3) t(l)),
         |pr AS (SELECT p.key, sl.lag, p.v, sl.sig FROM pts p JOIN sl USING (pos)),
         |ag AS (
         |  SELECT key, lag, CAST(COUNT(*) AS DOUBLE) AS n,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sa,
         |         CAST(SUM(CAST(sig AS DECIMAL(18,6))) AS DOUBLE) AS sb,
         |         CAST(CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(sig AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sab,
         |         CAST(CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS saa,
         |         CAST(CAST(SUM(CAST(sig AS DECIMAL(19,6)) * CAST(sig AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sbb
         |  FROM pr GROUP BY key, lag)
         |SELECT key, lag, (sab - sa * sb / n) /
         |       (sqrt(saa - sa * sa / n) * sqrt(sbb - sb * sb / n)) AS r
         |FROM ag ORDER BY key, lag, r""".stripMargin,
    "q_normalize_window" ->
      s"""$ptsCte SELECT key, ts, round((v - b) / (b + 0.1), 6) + 0.0 AS v FROM (
         |  SELECT key, ts, v,
         |         quantile_cont(v, 0.2) OVER (PARTITION BY key ORDER BY ts
         |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS b
         |  FROM pts)
         |ORDER BY key, ts, v""".stripMargin,
    "q_detrend2" ->
      s"""$ptsCte, ag AS (
         |  SELECT key, CAST(COUNT(*) AS DOUBLE) AS n,
         |         CAST(SUM(CAST(pos AS DECIMAL(10,0))) AS DOUBLE) AS s1,
         |         CAST(SUM(CAST(pos * pos AS DECIMAL(19,0))) AS DOUBLE) AS s2,
         |         CAST(SUM(CAST(pos * pos AS DECIMAL(19,0)) * CAST(pos AS DECIMAL(10,0))) AS DOUBLE) AS s3,
         |         CAST(SUM(CAST(pos * pos AS DECIMAL(19,0)) * CAST(pos * pos AS DECIMAL(19,0))) AS DOUBLE) AS s4,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS t0,
         |         CAST(SUM(CAST(pos AS DECIMAL(19,0)) * CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS t1,
         |         CAST(SUM(CAST(pos * pos AS DECIMAL(19,0)) * CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS t2
         |  FROM pts GROUP BY key),
         |co AS (
         |  SELECT key,
         |    n * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2) + s2 * (s1 * s3 - s2 * s2) AS det,
         |    t0 * (s2 * s4 - s3 * s3) - t1 * (s1 * s4 - s2 * s3) + t2 * (s1 * s3 - s2 * s2) AS da,
         |    -t0 * (s1 * s4 - s3 * s2) + t1 * (n * s4 - s2 * s2) - t2 * (n * s3 - s2 * s1) AS db,
         |    t0 * (s1 * s3 - s2 * s2) - t1 * (n * s3 - s1 * s2) + t2 * (n * s2 - s1 * s1) AS dc,
         |    t0 / n AS mean_v
         |  FROM ag)
         |SELECT p.key, p.ts, p.pos,
         |       p.v - ((da / det) + (db / det) * p.pos + (dc / det) * (p.pos * p.pos)) + mean_v AS v
         |FROM pts p JOIN co USING (key) ORDER BY key, ts, pos, v""".stripMargin,
    "q_stats_across_keys" ->
      s"""$ptsCte, ag AS (
         |  SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS n,
         |         SUM(CAST(v AS DECIMAL(18,6))) AS sum_d,
         |         SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(18,6))) AS sumsq_d,
         |         MIN(v) AS min_v, MAX(v) AS max_v
         |  FROM pts GROUP BY 1)
         |SELECT bucket, n,
         |       CAST(sum_d AS DOUBLE) AS sum_v,
         |       CAST(sum_d AS DOUBLE) / n AS mean_v,
         |       min_v, max_v,
         |       sqrt(greatest(CAST(CAST(sumsq_d AS DECIMAL(38,6)) AS DOUBLE) / n -
         |            (CAST(sum_d AS DOUBLE) / n) * (CAST(sum_d AS DOUBLE) / n), 0.0)) AS std_v
         |FROM ag ORDER BY bucket, n, sum_v, mean_v, min_v, max_v, std_v""".stripMargin,
    "q_distinct_keys" ->
      s"""$ptsCte SELECT date_trunc('hour', ts) AS bucket,
         |  COUNT(DISTINCT key) AS n_keys
         |FROM pts GROUP BY 1 ORDER BY bucket, n_keys""".stripMargin,
    "q_mean_across_keys" ->
      s"""$ptsCte SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS n,
         |  CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
         |FROM pts GROUP BY 1 ORDER BY bucket, n, v""".stripMargin,
    "q_mean_by_hod" ->
      s"""$ptsCte SELECT key, CAST(hour(ts) AS INT) AS hod, COUNT(*) AS n,
         |  CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
         |FROM pts GROUP BY 1, 2 ORDER BY key, hod, n, v""".stripMargin,
    // the four ROLLUP(key, l1, l2) grouping sets replayed as explicit
    // UNION ALL levels (gid = Spark's grouping_id: 0, 1, 3, 7), so no
    // cross-engine GROUPING_ID bit-order assumption is needed
    "q_stat_by_index_multi" ->
      s"""$ptsCte, base AS (
         |  SELECT key, CAST(hour(ts) AS INT) AS l1, CAST(minute(ts) AS INT) AS l2, v
         |  FROM pts)
         |SELECT * FROM (
         |  SELECT key, 0 AS gid, l1, l2, COUNT(*) AS n,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_v,
         |         MIN(v) AS min_v, MAX(v) AS max_v
         |  FROM base GROUP BY key, l1, l2
         |  UNION ALL
         |  SELECT key, 1 AS gid, l1, -1 AS l2, COUNT(*) AS n,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_v,
         |         MIN(v) AS min_v, MAX(v) AS max_v
         |  FROM base GROUP BY key, l1
         |  UNION ALL
         |  SELECT key, 3 AS gid, -1 AS l1, -1 AS l2, COUNT(*) AS n,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_v,
         |         MIN(v) AS min_v, MAX(v) AS max_v
         |  FROM base GROUP BY key
         |  UNION ALL
         |  SELECT '<all>' AS key, 7 AS gid, -1 AS l1, -1 AS l2, COUNT(*) AS n,
         |         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_v,
         |         MIN(v) AS min_v, MAX(v) AS max_v
         |  FROM base)
         |ORDER BY key, gid, l1, l2, n, mean_v, min_v, max_v""".stripMargin,
  )
}
