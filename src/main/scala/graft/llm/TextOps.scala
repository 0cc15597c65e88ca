package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline layer:
  * tokenization, n-gram shingling, portable content hashing, document
  * fingerprinting, quality stats and a heuristic language scorer.
  *
  * Everything here is a plain Catalyst expression (higher-order array
  * functions, no UDFs), so the whole layer stays inside whole-stage
  * codegen and scales linearly per row — the per-document cost is
  * O(tokens), never O(corpus).
  *
  * The builders take COLUMN NAMES of pre-materialized intermediates
  * (tokens, token hashes) rather than nesting expressions, so each
  * stage is computed once per row instead of once per lambda element.
  *
  * Portability rule: the oracle-checked operators use only arithmetic
  * that is bit-identical across engines — integer polynomial hashes
  * mod a 30-bit prime (no overflow on either side) and IEEE double
  * division/sqrt in a fixed evaluation order. Engine-specific hashes
  * (xxhash64) are reserved for the approximate operators (MinHash,
  * SimHash, hyperplane LSH) that are property-tested in ScalaTest
  * instead of oracle-compared.
  */
object TextOps {

  /** Polynomial-hash modulus: prime < 2^30, so `acc*37 + h` stays
    * far below 2^63 on both Spark longs and DuckDB BIGINTs.
    */
  val HashPrime = 1000000007L

  /** Whitespace tokenization. */
  def tokens(textCol: String): Column = split(col(textCol), " ")

  /** Distinct word n-grams ("shingles") over a materialized
    * array<string> column. Guarded: fewer than n tokens → empty
    * (Spark's `sequence(1, 0)` would count DOWN, not return empty).
    */
  def ngrams(toksCol: String, n: Int): Column = {
    val parts = (0 until n).map(j => s"element_at($toksCol, i + $j)").mkString(", ")
    expr(
      s"""CASE WHEN size($toksCol) >= $n
         |  THEN array_distinct(transform(sequence(1, size($toksCol) - ${n - 1}),
         |         i -> concat_ws(' ', $parts)))
         |  ELSE array()
         |END""".stripMargin)
  }

  /** Portable per-token polynomial hash, as an array over a tokens
    * column: fold(chars, 7, (a, c) -> (a*31 + ascii(c)) mod P).
    * Matches the DuckDB `list_reduce` formulation exactly (value
    * 304891 for 'abc' on both engines and in a reference calc).
    */
  def tokenHashes(toksCol: String): Column = expr(
    s"""transform($toksCol, tok ->
       |  aggregate(sequence(1, length(tok)), 7L,
       |    (a, i) -> (a * 31 + ascii(substring(tok, i, 1))) % $HashPrime))""".stripMargin)

  /** Document fingerprint (winnowing-lite) over a materialized
    * token-hash array column: a second-level polynomial over every
    * window of `w` consecutive token hashes, then the minimum window
    * hash. Shift-resistant — a shared w-token run gives two documents
    * a shared window hash — and the min makes the fingerprint
    * independent of document position and partitioning.
    */
  def fingerprint(thashesCol: String, w: Int): Column = expr(
    s"""CASE WHEN size($thashesCol) >= $w
       |  THEN array_min(transform(sequence(1, size($thashesCol) - ${w - 1}),
       |         i -> aggregate(slice($thashesCol, i, $w), 11L,
       |                (a, h) -> (a * 37 + h) % $HashPrime)))
       |  ELSE aggregate($thashesCol, 11L, (a, h) -> (a * 37 + h) % $HashPrime)
       |END""".stripMargin)

  /** Stopword profiles for the heuristic language scorer. Tiny on
    * purpose: at scale this would be a broadcast dictionary; the
    * mechanism (per-language token-hit scores + deterministic argmax)
    * is what the operator contributes.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "los", "y", "es", "de"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  def langScore(toksCol: String, words: Seq[String]): Column =
    // typedLit array, not a spliced '$w' IN-list: caller-supplied words
    // containing quotes must not be able to break the expression parse
    size(filter(col(toksCol), t => array_contains(typedLit(words), t)))

  /** Deterministic argmax over per-language score COLUMN NAMES: first
    * language in alphabetical order whose score equals the maximum.
    */
  def predictedLang(scoreCols: Seq[(String, String)]): Column = {
    val greatest = s"greatest(${scoreCols.map(_._2).mkString(", ")})"
    val chain = scoreCols.map { case (lang, c) => s"WHEN $c >= $greatest THEN '$lang'" }
    expr(s"CASE ${chain.mkString(" ")} END")
  }
}
