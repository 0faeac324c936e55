package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-data pipeline operators over the `documents` table: exact and
 * near deduplication, text quality/statistics, language ID, fingerprinting.
 * All are pure Column-expression plans (codegen'd, no UDFs) so they scale:
 * tokenization is `split`, shingles are `transform(sequence(...))`, joins
 * for pairwise similarity go through explode → shuffle on the shingle key.
 */
object DocQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** whitespace tokens of `text` */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** word n-gram shingles as an array column (n=3; empty if <3 tokens) */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1),
          element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array().cast("array<string>"))

  /** Document-frequency cap for near-dup self-joins (d5/d7): a key (shingle
    * or LSH band-bucket) present in k documents contributes k² join rows, so
    * a single degenerate key — a stop-phrase shingle, an all-identical
    * boilerplate bucket — turns the join quadratic at scale. Keys with
    * df > maxDf carry ~no near-dup signal (standard near-dup practice) and
    * are dropped BEFORE the join. The window count piggybacks on the join's
    * own hash(key) exchange, so the cap costs no extra shuffle. */
  val maxDf = 64

  def capByFrequency(df: DataFrame, key: Seq[String]): DataFrame =
    df.withColumn("_df",
        count(lit(1)).over(Window.partitionBy(key.map(col): _*)))
      .filter(col("_df") <= maxDf)
      .drop("_df")

  val queries: Map[String, Q] = Map(
    "d1_exact_dedup" -> ((s, d) => {
      // exact dedup by content hash: duplicate groups + survivor count
      val h = documents(s, d).select(col("doc_id"), md5(col("text")).as("h"))
      h.groupBy("h").agg(count(lit(1)).as("n"), min("doc_id").as("survivor"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") > 1, 1).otherwise(0)).as("n_dup_groups"),
          sum(col("n") - 1).as("n_removed"))
    }),

    "d2_token_stats" -> ((s, d) => {
      // tokens materialized once: an inlined split() re-executes the regex
      // for every reference (see the 25x d5/d7 finding in git history)
      documents(s, d)
        .select(col("doc_id"), length(col("text")).as("n_chars_actual"),
          tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          col("n_chars_actual"),
          size(array_distinct(col("toks"))).as("n_unique_tokens"))
        .select("doc_id", "n_tokens", "n_chars_actual", "n_unique_tokens")
        .orderBy("doc_id")
    }),

    "d3_quality_score" -> ((s, d) => {
      // heuristic quality features: stopword ratio, mean token length,
      // non-alpha ratio — the length/punct/stopword scoring family
      val toks = col("toks")
      val nTok = size(toks)
      val nStop = size(filter(toks, t =>
        t.isin("the", "a", "and", "of", "to", "in")))
      val alphaLen = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
      // zero divisors (empty doc) yield NULL ratios, not an ANSI
      // DIVIDE_BY_ZERO kill — mirrors DuckDB's null-on-zero semantics
      documents(s, d)
        .withColumn("toks", tokens(col("text")))
        .select(
        col("doc_id"),
        round(nStop.cast("double") / nullif(nTok, lit(0)), 4)
          .as("stopword_ratio"),
        round(alphaLen.cast("double") / nullif(length(col("text")), lit(0)), 4)
          .as("alpha_ratio"),
        round(length(regexp_replace(col("text"), "\\s+", ""))
          .cast("double") / nullif(nTok, lit(0)), 4).as("mean_token_len"))
        .orderBy("doc_id")
    }),

    "d4_lang_id" -> ((s, d) => {
      // stopword language heuristic with deterministic tie-break: tokenize
      // ONCE (materialized — no CSE across lambda boundaries) and count
      // stopword hits per language with array filters, instead of three
      // regexp passes over the raw text (was the slowest scalar query:
      // 1.9 s -> one split pass at sf0.1).
      val en = size(filter(col("toks"),
        t => t.isin("the", "and", "a", "of", "to")))
      val de = size(filter(col("toks"),
        t => t.isin("der", "die", "und", "das", "ist")))
      val fr = size(filter(col("toks"),
        t => t.isin("le", "la", "et", "les", "des")))
      documents(s, d)
        .select(col("doc_id"), col("lang"),
          tokens(lower(col("text"))).as("toks"))
        .select(
          col("doc_id"), col("lang").as("labeled_lang"),
          when(en >= de && en >= fr && en > 0, "en")
            .when(de >= fr && de > 0, "de")
            .when(fr > 0, "fr")
            .otherwise("und").as("predicted_lang"))
        .orderBy("doc_id")
    }),

    "d5_jaccard_topk" -> ((s, d) => {
      // n-gram Jaccard near-dup: explode distinct 3-shingles, df-cap the
      // shingles (no quadratic hot keys), self-join on the shingle key,
      // aggregate intersections, top-20 pairs.
      // (doc_id, sh) is already unique after array_distinct+explode; the
      // distinct() is NOT for semantics — its aggregate exchange becomes a
      // ReusedExchange feeding BOTH sides of the self-join, so the expensive
      // tokenize+shingle+explode runs once instead of twice (measured 2×:
      // 8.6s vs 16.6s at sf0.1). The df-cap window partitions by sh, which
      // ALSO pre-clusters both join sides on the join key.
      val sh = capByFrequency(
        documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            explode(array_distinct(shingles3(col("toks")))).as("sh"))
          .distinct(),
        Seq("sh"))
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(counts.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("n", "na"), "doc_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("n", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 4).as("jaccard"))
        .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
        .limit(20)
    }),

    "d6_fingerprint" -> ((s, d) => {
      // polynomial rolling-hash document fingerprint over tokens — a pure
      // fold expressed with `aggregate` (codegen'd, order-deterministic)
      val toks = tokens(col("text"))
      val tokVals = transform(toks, t =>
        (length(t) * 97 + ascii(t)).cast("long"))
      documents(s, d).select(
        col("doc_id"),
        aggregate(tokVals, lit(0L),
          (acc, x) => (acc * 31 + x) % 1000000007L).as("fingerprint"))
        .orderBy("doc_id")
    }),

    "d7_minhash_bands" -> ((s, d) => {
      // MinHash + LSH banding (scale path for near-dup): k=16 min-hashes
      // computed as 16 `min` aggregates over exploded shingles (ONE hash-agg
      // pass with map-side combine — the 100 TB shape), then 4 bands × 4
      // rows; candidate pairs share a band key (the 4 minhash values
      // joined verbatim). Degenerate buckets (all-identical boilerplate)
      // are df-capped before the pair join. Two-step oracle: the signature
      // table exports to parquet and DuckDB re-derives banding + pairs.
      val sh = documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(array_distinct(shingles3(col("toks")))).as("sh"))
      val minCols = (0 until 16).map(i =>
        min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
      val sig = OracleAux.export(
        sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*), "d7_sig")
      val bandCols = (0 until 4).map(b =>
        struct(lit(b).as("band"),
          concat_ws("_", (b * 4 until b * 4 + 4).map(i => col(s"h$i")): _*)
            .as("bh")))
      val banded = capByFrequency(
        sig.select(col("doc_id"), explode(array(bandCols: _*)).as("e"))
          .select(col("doc_id"), col("e.band").as("band"),
            col("e.bh").as("bh")),
        Seq("band", "bh"))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    }),

    "d8_simhash" -> ((s, d) => {
      // 64-bit SimHash via the native codegen Expression (graft.functions.
      // SimHash64): tight per-token vote loop instead of a 64-way `when`
      // array per token. Semantics cross-checked against the pure-Column
      // formulation in SimHashSpec. Two-step oracle: per-token xxhash64
      // values export to parquet and DuckDB re-derives the 64 bit votes.
      OracleAux.export(
        documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .select(col("doc_id"), xxhash64(col("tok")).as("h")),
        "d8_tokhash")
      documents(s, d)
        .select(col("doc_id"),
          graft.functions.SimHash64.simhash64(tokens(col("text")))
            .as("simhash"))
        .orderBy("doc_id")
    }),

    "m1_multimodal_meta" -> ((s, d) => {
      // multimodal plumbing: payload as opaque binary + typed metadata.
      // The "decode" is a deterministic fake (md5 digest) — the real image/
      // audio decoder would slot into the same binary→features projection.
      documents(s, d).select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text").cast("binary")).as("digest"),
        (octet_length(col("text").cast("binary")) % 10).as("fake_label"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
         g AS (SELECT h, count(*) AS n, min(doc_id) AS survivor
               FROM h GROUP BY h)
         SELECT count(*) AS n_groups,
                CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup_groups,
                CAST(sum(n - 1) AS BIGINT) AS n_removed
         FROM g""",
    "d2_token_stats" ->
      """SELECT doc_id,
                len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                length(text) AS n_chars_actual,
                len(list_distinct(string_split_regex(trim(text), '\s+')))
                  AS n_unique_tokens
         FROM documents ORDER BY doc_id""",
    "d3_quality_score" ->
      """WITH t AS (
           SELECT doc_id, text,
                  string_split_regex(trim(text), '\s+') AS toks
           FROM documents)
         SELECT doc_id,
                round(CAST(len(list_filter(toks, x -> x IN
                  ('the','a','and','of','to','in'))) AS DOUBLE)
                  / len(toks), 4) AS stopword_ratio,
                round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                  AS DOUBLE) / length(text), 4) AS alpha_ratio,
                round(CAST(length(regexp_replace(text, '\s+', '', 'g'))
                  AS DOUBLE) / len(toks), 4) AS mean_token_len
         FROM t ORDER BY doc_id""",
    "d4_lang_id" ->
      """WITH t AS (
           SELECT doc_id, lang,
                  string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, lang,
                  len(list_filter(toks,
                    x -> x IN ('the','and','a','of','to'))) AS en,
                  len(list_filter(toks,
                    x -> x IN ('der','die','und','das','ist'))) AS de,
                  len(list_filter(toks,
                    x -> x IN ('le','la','et','les','des'))) AS fr
           FROM t)
         SELECT doc_id, lang AS labeled_lang,
                CASE WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
                     WHEN de >= fr AND de > 0 THEN 'de'
                     WHEN fr > 0 THEN 'fr'
                     ELSE 'und' END AS predicted_lang
         FROM c ORDER BY doc_id""",
    "d5_jaccard_topk" ->
      raw"""WITH tok AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
           FROM documents),
         sh0 AS (
           SELECT DISTINCT doc_id,
                  unnest(list_filter(
                    list_transform(l, (x, i) -> CASE WHEN i + 2 <= len(l)
                      THEN l[CAST(i AS INT)] || ' ' || l[CAST(i+1 AS INT)]
                           || ' ' || l[CAST(i+2 AS INT)] END),
                    y -> y IS NOT NULL)) AS sh
           FROM tok),
         sh AS (
           SELECT doc_id, sh FROM (
             SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df
             FROM sh0) WHERE df <= $maxDf),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
                round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 4)
                  AS jaccard
         FROM pairs
         JOIN cnt ca ON ca.doc_id = doc_a
         JOIN cnt cb ON cb.doc_id = doc_b
         ORDER BY jaccard DESC, doc_a ASC, doc_b ASC LIMIT 20""",
    "d6_fingerprint" ->
      """SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split_regex(trim(text), '\s+'),
                      t -> CAST(length(t) * 97 + ascii(t) AS BIGINT))),
                  (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
         FROM documents ORDER BY doc_id""",
    "m1_multimodal_meta" ->
      """SELECT doc_id,
                octet_length(encode(text)) AS n_bytes,
                md5(text) AS digest,
                octet_length(encode(text)) % 10 AS fake_label
         FROM documents ORDER BY doc_id""",
    // two-step oracle: consumes the Spark-exported minhash signature table
    // and re-derives banding, the df cap, and the candidate pairs in SQL.
    "d7_minhash_bands" ->
      raw"""WITH sig AS (
           SELECT * FROM read_parquet('__AUX__/.aux/d7_sig/*.parquet')),
         banded0 AS (
           SELECT doc_id, 0 AS band,
                  h0 || '_' || h1 || '_' || h2 || '_' || h3 AS bh FROM sig
           UNION ALL
           SELECT doc_id, 1,
                  h4 || '_' || h5 || '_' || h6 || '_' || h7 FROM sig
           UNION ALL
           SELECT doc_id, 2,
                  h8 || '_' || h9 || '_' || h10 || '_' || h11 FROM sig
           UNION ALL
           SELECT doc_id, 3,
                  h12 || '_' || h13 || '_' || h14 || '_' || h15 FROM sig),
         banded AS (
           SELECT doc_id, band, bh FROM (
             SELECT doc_id, band, bh,
                    count(*) OVER (PARTITION BY band, bh) AS df
             FROM banded0) WHERE df <= $maxDf)
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         ORDER BY doc_a, doc_b""",
    // two-step oracle: consumes the Spark-exported per-token xxhash64 values
    // and re-derives the 64-bit vote fingerprint in SQL.
    "d8_simhash" ->
      """WITH th AS (
           SELECT * FROM read_parquet('__AUX__/.aux/d8_tokhash/*.parquet')),
         votes AS (
           SELECT doc_id, bit,
                  sum(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
           FROM th
           CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) bits
           GROUP BY doc_id, bit),
         sim AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN v > 0 THEN
                    CASE WHEN bit = 63 THEN -9223372036854775807 - 1
                         ELSE (CAST(1 AS BIGINT) << CAST(bit AS INT)) END
                    ELSE 0 END) AS BIGINT) AS simhash
           FROM votes GROUP BY doc_id)
         SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
         FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id
         ORDER BY d.doc_id"""
  )
}
