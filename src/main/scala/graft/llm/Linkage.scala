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
    * tier (≤ one row per input record, where `linkByName`'s pair table
    * is quadratic in duplicate-heavy blocks): same blocking + compiled
    * JW verify over ORDERED pairs (a record can be another's best
    * without reciprocity), keep each record's highest-scoring match
    * at ≥ thresholdMicro with the (jw DESC, match_id ASC) tie-break,
    * and report n_candidates (how many verified matches the record
    * had — the review-queue size). EVERY record emits: unmatched
    * records ride a left join with NULL match and 0 candidates —
    * loud, never dropped.
    *
    * Scale shape: the candidate surface is linkByName's (Σf² over
    * blocks BY CONTRACT, same valves); the best-match cut is one
    * rank window on the candidate table partitioned by record id.
    */
  def bestMatches(df: DataFrame, idCol: String, nameCol: String,
                  thresholdMicro: Long): DataFrame = {
    require(thresholdMicro >= 0L && thresholdMicro <= 1000000L,
      s"bestMatches: thresholdMicro in [0, 1e6], got $thresholdMicro")
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(nameCol).isNotNull)
      .select(col(idCol).as("__id"), col(nameCol).as("__name"),
        lower(split(col(nameCol), "\\s+").getItem(0)).as("block"))
    val a = base.select(col("__id").as("id"), col("__name").as("name_a"),
      col("block"))
    val b = base.select(col("__id").as("match_id"),
      col("__name").as("name_b"), col("block"))
    val byId = Window.partitionBy(col("id"))
    val best = a.join(b, Seq("block"))
      .filter(col("id") =!= col("match_id"))
      .withColumn("jw_micro",
        StringFunctions.jaroWinklerMicro(col("name_a"), col("name_b")))
      .filter(col("jw_micro") >= thresholdMicro)
      .withColumn("__rk", row_number().over(
        byId.orderBy(col("jw_micro").desc, col("match_id").asc)))
      .withColumn("n_candidates", count(lit(1)).over(byId))
      .filter(col("__rk") === 1)
      .select(col("id"), col("match_id"), col("jw_micro"),
        col("n_candidates"))
    base.select(col("__id").as("id")).distinct()
      .join(best, Seq("id"), "left")
      .select(col("id"), col("match_id"), col("jw_micro"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
  }
}
