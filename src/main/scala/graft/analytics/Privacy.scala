package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential-privacy release primitives — the ε-DP half of the
  * log-publication family next to L-167's k-anonymity suppression
  * (Dwork et al. 2006): k-anonymity protects against re-identification
  * by variant, the Laplace mechanism protects AGGREGATES against
  * membership inference. Noise here is DETERMINISTIC given (key, seed)
  * — drawn from a hash-derived uniform through the Laplace inverse
  * CDF — so a release is reproducible and testable; a production
  * deployment would rotate the seed per release (documented, not
  * silently random: `Date.now`-style nondeterminism would make the
  * release unauditable).
  */
object Privacy {

  /** ε-DP per-key count release via the Laplace mechanism: true count
    * + Laplace(Δ/ε) noise with sensitivity Δ = 1 (one event moves one
    * count by one). `epsilonMicro` is ε in micro-units (1e6 = ε 1.0);
    * smaller ε = more privacy = more noise, scale b = 1e6/ε_micro.
    * The uniform comes from xxhash64(key, seed)'s low 53 bits; the
    * inverse CDF −b·sign(u−½)·ln(1−2|u−½|) is clamped away from the
    * ln(0) pole (a 2^−60 floor, a once-in-2^52 key). Released counts
    * may be NEGATIVE — the unbiasedness of the mechanism is the
    * point; consumers clamp, the release itself must not (a silent
    * max(0,·) skews every downstream sum). True count, noise and the
    * released value are all emitted so the privacy/utility trade is
    * auditable in tests — a REAL release would project `released`
    * only (documented).
    *
    * Scale shape: one partial-aggregated key collapse; the noise is
    * row-local arithmetic on the collapsed table. Rows-only by design:
    * ln/hash noise is not a cross-engine-hashable surface.
    */
  def dpCounts(df: DataFrame, keyCol: String, epsilonMicro: Long,
               seed: Long): DataFrame = {
    require(epsilonMicro > 0L, s"dpCounts: epsilonMicro > 0, got $epsilonMicro")
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__u", expr(
        s"CAST((xxhash64(key, ${seed}L) & 9007199254740991L) AS DOUBLE) " +
          "/ 9007199254740992.0D"))
      .withColumn("__t", col("__u") - lit(0.5))
      .withColumn("noise",
        lit(-1e6 / epsilonMicro.toDouble) * signum(col("__t")) *
          log(greatest(lit(1.0) - lit(2.0) * abs(col("__t")),
            lit(math.pow(2.0, -60)))))
      .withColumn("released", col("n") + round(col("noise")).cast("long"))
      .select(col("key"), col("n"), col("noise"), col("released"))
  }
}
