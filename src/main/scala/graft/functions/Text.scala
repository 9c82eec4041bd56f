package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

/** Text-processing column builders: tokenization, shingling,
  * normalization, fingerprinting, language/script detection, and the
  * reference's Korean-text helpers (SURVEY.md §2.8 X1–X10).
  *
  * Everything here is built from codegen'd Catalyst built-ins — no UDFs —
  * so filters/projections that use these stay inside whole-stage codegen
  * and remain pushdown/pruning-friendly at 100 TB.
  */
object Text {

  /** Whitespace tokens with empties dropped.
    * Matches DuckDB `list_filter(string_split(s, ' '), t -> t <> '')`. */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  /** Collapse all whitespace runs to single spaces and trim (X2 family,
    * notebook cell 56 generalized). */
  def normalizeWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Deterministic document fingerprint: md5 of the lowercased,
    * whitespace-normalized text. Used for exact near-normalized dedup. */
  def fingerprint(c: Column): Column =
    md5(lower(normalizeWs(c)).cast("binary"))

  /** Word n-gram shingles as space-joined strings. `toks` must be a
    * string array column. Empty array when fewer than n tokens.
    * Backed by the native [[graft.plans.WordShingles]] expression — the
    * higher-order-function formulation is interpreted and re-walks the
    * expression tree per shingle. */
  def shingles(toks: Column, n: Int): Column =
    GraftBridge.column(graft.plans.WordShingles(GraftBridge.expression(toks), n))

  /** DISTINCT character n-grams (the trigram-index build explode),
    * backed by the native [[graft.plans.CharGrams]] expression — the
    * sequence+transform+array_distinct formulation re-scans the string
    * per position (quadratic per doc) and dominated the index family's
    * one-time build cost (89 s at ×10, 510 s at ×100 in r10's decade
    * table). */
  def chargrams(text: Column, n: Int): Column =
    GraftBridge.column(graft.plans.CharGrams(GraftBridge.expression(text), n))

  /** Keep only tokens containing a run of >=3 Hangul chars, joined by
    * spaces — the reference's crawl text filter
    * (collect/consumer.py:109,112; X3+X9). */
  def hangulFilter(c: Column): Column =
    array_join(filter(tokens(c), t => t.rlike("[가-힣]{3,}")), " ")

  /** First sentence: text up to and including the first Korean sentence
    * terminator "다."; fall back to the first 40 chars
    * (dags/scripts/spark_daily_report.py:180; X10). */
  def firstSentence(c: Column): Column =
    when(c.contains("다."), concat(substring_index(c, "다.", 1), lit("다.")))
      .otherwise(substring(c, 1, 40))

  /** Script-class detector: 'hangul' | 'cjk' | 'cyrillic' | 'latin' |
    * 'other' by first matching character class. Deterministic basis for
    * language ID at scale (a real model plugs in behind the same shape). */
  def scriptClass(c: Column): Column =
    when(c.rlike("[가-힣]"), lit("hangul"))
      .when(c.rlike("[\\u4e00-\\u9fff]"), lit("cjk"))
      .when(c.rlike("[\\u0400-\\u04ff]"), lit("cyrillic"))
      .when(c.rlike("[A-Za-z]"), lit("latin"))
      .otherwise(lit("other"))

  /** Marker-stopword language vote: count hits of per-language marker
    * words among tokens; used by the langid query. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === lit(m)).reduce(_ || _)))

  /** Truncate to 255 chars (notebook cell 45; X5). */
  def truncate255(c: Column): Column = substring(c, 1, 255)
}
