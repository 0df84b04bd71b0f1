package graft.ops

import graft.{Q, U}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline (SURVEY.md §2.4
  * group I + north star `BASELINE.json:6`): corpus stats, heuristic
  * language ID, quality scoring, token counting, and rolling-hash document
  * fingerprinting — all over the `documents` table.
  *
  * Everything is built-in expressions inside whole-stage codegen (no UDFs):
  * at 100 TB these are embarrassingly parallel scans whose only shuffle is
  * the final small aggregate (stats) or none at all (per-doc scores).
  */
object TextOps {

  /** Whitespace tokenization, identical in Spark and DuckDB
    * (`string_split_regex(trim(text), '\s+')`).
    */
  private def words: Column = split(trim(col("text")), "\\s+")

  private val StopEn = Seq("the", "a", "of", "and", "to")
  private val StopEs = Seq("el", "la", "de", "y", "que")
  private val StopDe = Seq("der", "die", "und", "das", "ist")
  private val StopFr = Seq("le", "la", "et", "les", "des")

  private def hits(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isin(stop: _*))).cast("long")

  private def sqlHits(stop: Seq[String]): String = {
    val lst = stop.map(s => s"'$s'").mkString(", ")
    s"CAST(len(list_filter(w, x -> list_contains([$lst], x))) AS BIGINT)"
  }

  val qs: Seq[Q] = Seq(
    // Corpus stats per language label.
    Q(
      "q_text_stats",
      """SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT source) AS n_sources,
        |  round(CAST(sum(n_chars) AS BIGINT) / count(*), 4) AS avg_chars,
        |  round(CAST(sum(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) / count(*), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      U.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          round(sum(col("n_chars")) / count(lit(1)), 4).as("avg_chars"),
          round(sum(size(words).cast("long")) / count(lit(1)), 4)
            .as("avg_tokens"))
        .orderBy("lang")
    },

    // Heuristic language ID: stopword hit counts per language, argmax with a
    // fixed tie order (en > es > de > fr > unk). The corpus vocabulary is
    // synthetic, so predictions won't match the `lang` labels — the contract
    // is determinism and Spark/oracle parity of the heuristic itself.
    Q(
      "q_text_langid",
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |h AS (SELECT doc_id,
         |  ${sqlHits(StopEn)} AS hits_en,
         |  ${sqlHits(StopEs)} AS hits_es,
         |  ${sqlHits(StopDe)} AS hits_de,
         |  ${sqlHits(StopFr)} AS hits_fr
         |FROM t)
         |SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
         |  CASE
         |    WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
         |    WHEN hits_es >= hits_de AND hits_es >= hits_fr AND hits_es > 0 THEN 'es'
         |    WHEN hits_de >= hits_fr AND hits_de > 0 THEN 'de'
         |    WHEN hits_fr > 0 THEN 'fr'
         |    ELSE 'unk' END AS pred_lang
         |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
      val base = U
        .documents(s, d)
        .select(
          col("doc_id"),
          hits(words, StopEn).as("hits_en"),
          hits(words, StopEs).as("hits_es"),
          hits(words, StopDe).as("hits_de"),
          hits(words, StopFr).as("hits_fr"))
      base
        .withColumn(
          "pred_lang",
          when(
            col("hits_en") >= col("hits_es") &&
              col("hits_en") >= col("hits_de") &&
              col("hits_en") >= col("hits_fr") && col("hits_en") > 0,
            "en")
            .when(
              col("hits_es") >= col("hits_de") &&
                col("hits_es") >= col("hits_fr") && col("hits_es") > 0,
              "es")
            .when(col("hits_de") >= col("hits_fr") && col("hits_de") > 0, "de")
            .when(col("hits_fr") > 0, "fr")
            .otherwise("unk"))
        .orderBy("doc_id")
    },

    // Quality scoring: alphabetic ratio, token-length shape, stopword
    // density. The composite score is computed in DECIMAL from the
    // already-rounded components: composing the raw double ratios in IEEE
    // arithmetic lands rows on 4-dp rounding boundaries where Spark and
    // DuckDB disagree by 1 ulp (observed at sf0.1); decimal arithmetic is
    // exact and engine-independent.
    Q(
      "q_text_quality",
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    string_split_regex(trim(text), '\\s+') AS w,
         |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
         |    CAST(length(text) AS BIGINT) AS n
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(round(n_alpha / n, 4) AS DECIMAL(18,6)) AS a4,
         |    round(n_digit / n, 4) AS digit_ratio,
         |    CAST(round(n_alpha / CAST(len(w) AS BIGINT), 4) AS DECIMAL(18,6)) AS t4,
         |    CAST(round(${sqlHits(StopEn)} / CAST(len(w) AS BIGINT), 4) AS DECIMAL(18,6)) AS s4
         |  FROM t)
         |SELECT doc_id,
         |  CAST(a4 AS DOUBLE) AS alpha_ratio,
         |  digit_ratio,
         |  CAST(t4 AS DOUBLE) AS avg_token_len,
         |  CAST(s4 AS DOUBLE) AS stop_ratio,
         |  CAST((CAST(0.4 AS DECIMAL(2,1)) * a4
         |      + CAST(0.3 AS DECIMAL(2,1)) * (1 - least(CAST(1 AS DECIMAL(18,6)), abs(t4 - 5) * CAST(0.2 AS DECIMAL(2,1))))
         |      + CAST(0.3 AS DECIMAL(2,1)) * least(CAST(1 AS DECIMAL(18,6)), s4 * 5)) * 100000000 AS BIGINT) AS quality_e8
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nAlpha =
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long")
      val nDigit = length(regexp_replace(col("text"), "[^0-9]", "")).cast("long")
      val n = length(col("text")).cast("long")
      val ntok = size(words).cast("long")
      val stopHits = hits(words, StopEn)
      val a4 = round(nAlpha / n, 4).cast(U.Dec)
      val t4 = round(nAlpha / ntok, 4).cast(U.Dec)
      val s4 = round(stopHits / ntok, 4).cast(U.Dec)
      // Literal BigDecimals infer DecimalType(38,18) in Spark, which blows
      // the 38-digit budget in products and silently rounds (precision
      // loss); pin them to minimal types so every product stays exact.
      val small = org.apache.spark.sql.types.DecimalType(2, 1)
      val w04 = lit(BigDecimal("0.4")).cast(small)
      val w03 = lit(BigDecimal("0.3")).cast(small)
      val w02 = lit(BigDecimal("0.2")).cast(small)
      val one = lit(BigDecimal(1)).cast(U.Dec)
      // The composite is exact decimal arithmetic (scale 8), emitted as the
      // integer quality * 10^8 so the scaled value is exactly integral and
      // every cross-engine cast quirk is moot. Each cheaper alternative
      // fails: ROUND(x,4) lands on half boundaries where Spark (HALF_UP)
      // and DuckDB disagree; decimal->double casts differ by 1 ulp (DuckDB
      // multiplies by the reciprocal scale); DuckDB floor(DECIMAL) detours
      // through double (exact 5590.0 -> 5589); and on fractional decimals
      // DuckDB's decimal->int cast rounds while Spark's truncates.
      val quality =
        w04 * a4 +
          w03 * (one - least(one, abs(t4 - 5) * w02)) +
          w03 * least(one, s4 * 5)
      U.documents(s, d)
        .select(
          col("doc_id"),
          a4.cast("double").as("alpha_ratio"),
          round(nDigit / n, 4).as("digit_ratio"),
          t4.cast("double").as("avg_token_len"),
          s4.cast("double").as("stop_ratio"),
          (quality * 100000000L).cast("long").as("quality_e8"))
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens and a BPE-ish regex segmentation.
    Q(
      "q_text_tokens",
      """SELECT doc_id, n_chars,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      U.documents(s, d)
        .select(
          col("doc_id"),
          col("n_chars"),
          size(words).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(
            col("text"),
            lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"),
            lit(0))).cast("long").as("n_bpe_tokens"))
        .orderBy("doc_id")
    },

    // End-to-end curation pipeline — the operators composed into the real
    // LLM-training-data use case: score quality -> drop low-quality docs ->
    // exact-dedup to canonical ids -> account the surviving token budget per
    // (lang, source). One declarative plan: Catalyst fuses the scoring into
    // the scan, the dedup is one hash-aggregate shuffle, the final rollup is
    // a second small shuffle. At 100 TB this whole chain is two exchanges.
    Q(
      "q_pipeline_curate",
      s"""WITH t AS (
         |  SELECT doc_id, lang, source, text,
         |    string_split_regex(trim(text), '\\s+') AS w,
         |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         |    CAST(length(text) AS BIGINT) AS n
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, lang, source, text,
         |    CAST(len(w) AS BIGINT) AS n_tokens,
         |    CAST((CAST(0.4 AS DECIMAL(2,1)) * CAST(round(n_alpha / n, 4) AS DECIMAL(18,6))
         |        + CAST(0.3 AS DECIMAL(2,1)) * (1 - least(CAST(1 AS DECIMAL(18,6)),
         |            abs(CAST(round(n_alpha / CAST(len(w) AS BIGINT), 4) AS DECIMAL(18,6)) - 5) * CAST(0.2 AS DECIMAL(2,1))))
         |        + CAST(0.3 AS DECIMAL(2,1)) * least(CAST(1 AS DECIMAL(18,6)),
         |            CAST(round(${sqlHits(StopEn)} / CAST(len(w) AS BIGINT), 4) AS DECIMAL(18,6)) * 5)) * 100000000 AS BIGINT) AS q_e8
         |  FROM t),
         |kept AS (SELECT * FROM scored WHERE q_e8 >= 55000000),
         |canon AS (
         |  SELECT min(doc_id) AS doc_id, min(lang) AS lang,
         |    min(source) AS source, min(n_tokens) AS n_tokens
         |  FROM kept GROUP BY text)
         |SELECT lang, source,
         |  count(*) AS n_docs,
         |  sum(n_tokens) AS total_tokens,
         |  min(doc_id) AS first_doc
         |FROM canon GROUP BY lang, source ORDER BY lang, source""".stripMargin) {
      (s, d) =>
        val nAlpha =
          length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long")
        val n = length(col("text")).cast("long")
        val ntok = size(words).cast("long")
        val a4 = round(nAlpha / n, 4).cast(U.Dec)
        val t4 = round(nAlpha / ntok, 4).cast(U.Dec)
        val s4 = round(hits(words, StopEn) / ntok, 4).cast(U.Dec)
        val small = org.apache.spark.sql.types.DecimalType(2, 1)
        val one = lit(BigDecimal(1)).cast(U.Dec)
        val qE8 =
          ((lit(BigDecimal("0.4")).cast(small) * a4 +
            lit(BigDecimal("0.3")).cast(small) *
              (one - least(one, abs(t4 - 5) * lit(BigDecimal("0.2")).cast(small))) +
            lit(BigDecimal("0.3")).cast(small) * least(one, s4 * 5)) * 100000000L)
            .cast("long")
        U.documents(s, d)
          .select(
            col("doc_id"), col("lang"), col("source"), col("text"),
            ntok.as("n_tokens"), qE8.as("q_e8"))
          .filter(col("q_e8") >= 55000000L)
          .groupBy(col("text"))
          .agg(
            min(col("doc_id")).as("doc_id"),
            min(col("lang")).as("lang"),
            min(col("source")).as("source"),
            min(col("n_tokens")).as("n_tokens"))
          .groupBy(col("lang"), col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy("lang", "source")
    },

    // Rolling polynomial hash over the token stream (order-sensitive
    // document fingerprint; same fold in both engines).
    Q(
      "q_text_fingerprint",
      """WITH t AS (
        |  SELECT doc_id,
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |                   t -> CAST(ascii(t) * 7 + length(t) AS BIGINT)) AS vals
        |  FROM documents)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), vals),
        |              (h, x) -> (h * 31 + x) % 1000000007) AS fingerprint
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      val vals =
        transform(words, t => (ascii(t) * 7 + length(t)).cast("long"))
      U.documents(s, d)
        .select(
          col("doc_id"),
          aggregate(vals, lit(0L), (h, x) => (h * 31 + x) % 1000000007L)
            .as("fingerprint"))
        .orderBy("doc_id")
    }
  )
}
