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
}
