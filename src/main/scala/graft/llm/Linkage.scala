package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.StringFunctions

/** Blocked fuzzy record linkage — entity resolution over NAME-shaped
  * strings, the tier the set-shaped (Jaccard/MinHash) and edit-shaped
  * (banded Levenshtein) dedup families don't cover: census-style
  * matching where "Jon A. Smith" and "John Smith" must pair.
  */
object Linkage {

  /** Candidate pairs by first-token blocking, verified by the compiled
    * Jaro-Winkler kernel (exact integer micro-units, pinned variant —
    * see `StringFunctions.jwMicro`), kept at ≥ thresholdMicro. Pairs
    * emit once (id_a < id_b) with their block key as the audit column
    * ("why were these ever compared").
    *
    * Scale shape: the candidate surface is the within-block pair set —
    * Σf² over block sizes BY CONTRACT, the exact-Jaccard-tier
    * contract (`Dedup.ngramJaccardPairs`): the same three valves apply
    * unchanged when a block runs hot (block-size cap + audit, a
    * second blocking key union — last name + zip is the census
    * classic — or the MinHash candidate arm, since name tokens are
    * grams). The join itself is a plain equi-join on the block key;
    * the JW verify is one compiled loop per CANDIDATE, never per
    * corpus pair. First-token blocking has one-sided error (a typo in
    * the FIRST token hides the pair — documented; multi-key unions
    * close it); everything kept is exactly verified.
    */
  def linkByName(df: DataFrame, idCol: String, nameCol: String,
                 thresholdMicro: Long): DataFrame = {
    require(thresholdMicro >= 0L && thresholdMicro <= 1000000L,
      s"linkByName: thresholdMicro in [0, 1e6], got $thresholdMicro")
    val base = df.filter(col(nameCol).isNotNull)
      .select(col(idCol).as("__id"), col(nameCol).as("__name"),
        lower(split(col(nameCol), "\\s+").getItem(0)).as("block"))
    val a = base.select(col("__id").as("id_a"), col("__name").as("name_a"),
      col("block"))
    val b = base.select(col("__id").as("id_b"), col("__name").as("name_b"),
      col("block"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw_micro",
        StringFunctions.jaroWinklerMicro(col("name_a"), col("name_b")))
      .filter(col("jw_micro") >= thresholdMicro)
      .select(col("id_a"), col("id_b"), col("jw_micro"), col("block"))
  }

  /** Best match per record — the bounded-output face of the linkage
    * tier (exactly one row per input record): each record's
    * highest-scoring in-block match at ≥ thresholdMicro with the
    * (jw DESC, match id ASC) tie-break, plus n_candidates (how many
    * verified matches it had — the review-queue size). EVERY record
    * emits: unmatched records surface with NULL match and 0
    * candidates — loud, never dropped.
    *
    * Scale shape — the DICTIONARY COLLAPSE is the whole story: the JW
    * kernel runs on DISTINCT (name, name) pairs within a block, never
    * on record pairs, because real name columns are duplicate-heavy
    * and the record-pair surface is quadratic in exactly the blocks
    * where names repeat (measured on the part fixture: 32 s record-
    * pair vs sub-second name-pair at sf0.1). The collapse is
    * OUTPUT-IDENTICAL by the exact-twin argument: a cross-NAME pair
    * can never reach 1e6 (only identical strings do), so a record
    * with a same-name twin always best-matches the twin (lowest other
    * id — min2 when the record is itself the lowest), and otherwise
    * its best is its name's best cross name (tie → that name's lowest
    * record id); n_candidates = (cnt − 1 same-name twins) + Σ cnt of
    * verified cross names. One distinct-name collapse, the name-pair
    * block join (Σf² over DISTINCT-name block sizes BY CONTRACT —
    * the linkByName valves apply), one rank window on name pairs,
    * two broadcast-friendly joins back to records.
    */
  def bestMatches(df: DataFrame, idCol: String, nameCol: String,
                  thresholdMicro: Long): DataFrame = {
    require(thresholdMicro >= 0L && thresholdMicro <= 1000000L,
      s"bestMatches: thresholdMicro in [0, 1e6], got $thresholdMicro")
    import org.apache.spark.sql.expressions.Window
    val recs = df.filter(col(nameCol).isNotNull)
      .select(col(idCol).as("__id"), col(nameCol).as("__name"),
        lower(split(col(nameCol), "\\s+").getItem(0)).as("block"))
    val byName = Window.partitionBy(col("__name")).orderBy(col("__id").asc)
    val names = recs
      .withColumn("__rk", row_number().over(byName))
      .groupBy(col("__name"), col("block"))
      .agg(count(lit(1)).as("cnt"),
        min(when(col("__rk") === 1, col("__id"))).as("min1"),
        min(when(col("__rk") === 2, col("__id"))).as("min2"))
    val a = names.select(col("__name").as("na"), col("block"))
    val b = names.select(col("__name").as("nb"), col("block"),
      col("cnt").as("cnt_b"), col("min1").as("min1_b"))
    val cross = a.join(b, Seq("block"))
      .filter(col("na") =!= col("nb"))
      .withColumn("jw_micro",
        StringFunctions.jaroWinklerMicro(col("na"), col("nb")))
      .filter(col("jw_micro") >= thresholdMicro)
    val byA = Window.partitionBy(col("na"))
    val crossBest = cross
      .withColumn("__r", row_number().over(
        byA.orderBy(col("jw_micro").desc, col("min1_b").asc)))
      .withColumn("n_cross", sum(col("cnt_b")).over(byA))
      .filter(col("__r") === 1)
      .select(col("na").as("__name"), col("nb").as("best_name"),
        col("jw_micro").as("best_jw"), col("min1_b").as("best_min1"),
        col("n_cross"))
    recs
      .join(names.select(col("__name"), col("cnt"), col("min1"),
        col("min2")), Seq("__name"))
      .join(crossBest, Seq("__name"), "left")
      .select(col("__id").as("id"),
        when(col("cnt") >= 2L,
          when(col("__id") === col("min1"), col("min2"))
            .otherwise(col("min1")))
          .otherwise(col("best_min1")).as("match_id"),
        when(col("cnt") >= 2L, lit(1000000L))
          .otherwise(col("best_jw")).as("jw_micro"),
        (col("cnt") - 1L + coalesce(col("n_cross"), lit(0L)))
          .as("n_candidates"))
  }
}
