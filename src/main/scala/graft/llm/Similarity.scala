package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two tiers:
  *  - `bruteForceTopK` — exact cosine top-k of a SMALL probe set
  *    against the full corpus. The probe side is broadcast, so the
  *    "join" is a map-side pass over the corpus with no shuffle of the
  *    big table; cost is O(|corpus| × |probes| × dims).
  *  - `annTopK` — random-hyperplane LSH: each vector gets an n-bit
  *    signature (sign of ⟨v, plane_j⟩ for n deterministic pseudo-random
  *    planes); candidates are corpus vectors whose bucket is within
  *    hamming distance `probeFlips` of the probe's bucket (multiprobe).
  *    Cost drops to the candidate fraction; recall is property-tested
  *    against the brute-force oracle in AnnSpec.
  *
  * Determinism: the oracle-checked exact tier works on QUANTIZED
  * vectors — floor(x·1000) as int64 — so dot products and norms are
  * exact integer arithmetic, and the final cosine is one IEEE divide
  * of exactly-representable doubles (|dot| ≤ 6.4e7 « 2^53, norm
  * product ≤ 3.2e14 « 2^53): bit-identical on Spark and DuckDB.
  * Hyperplane weights come from xxhash64, Spark-side only.
  */
object Similarity {

  /** floor(x·1000) per element, as exact int64s (floor, not round —
    * round's half-up/half-even convention differs across engines).
    */
  def quantize(embCol: String): Column =
    expr(s"transform($embCol, x -> CAST(floor(CAST(x AS double) * 1000) AS bigint))")

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (s, p) -> s + p)")

  /** Exact integer squared norm. */
  def normSqQ(v: String): Column =
    expr(s"aggregate(transform($v, x -> x * x), 0L, (s, p) -> s + p)")

  /** Quantized-cosine top-k: exact, deterministic, oracle-checkable.
    * Probes are the rows matching `probePred`; ranking is
    * (cosine DESC, candidate id ASC) with self-pairs excluded.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
                     probePred: Column, k: Int): DataFrame = {
    val vecs = df.select(col(idCol), quantize(embCol).as("v"))
      .withColumn("nsq", normSqQ("v"))
    val probes = broadcast(
      vecs.filter(probePred).select(
        col(idCol).as("probe_id"), col("v").as("pv"), col("nsq").as("pnsq")))
    probes.join(vecs, col("probe_id") =!= col(idCol))
      .withColumn("cos",
        dotQ("pv", "v").cast("double") /
          sqrt((col("pnsq") * col("nsq")).cast("double")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cos").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col(idCol).as("neighbor_id"), col("rank"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane j, dim d):
    * uniform in [-0.5, 0.5], derived from xxhash64 so every executor
    * materializes the same planes with no broadcast of plane data.
    */
  private def planeWeight(j: String, d: String): String =
    s"(CAST(pmod(xxhash64(concat('p', cast($j AS string), ':', cast($d AS string))), 1001) AS double) / 1000.0 - 0.5)"

  /** n-bit hyperplane signature of an array<double> column. */
  def hyperplaneSig(vecCol: String, nbits: Int): Column = expr(
    s"""aggregate(sequence(0, ${nbits - 1}), 0L, (acc, j) -> acc * 2 +
       |  (CASE WHEN aggregate(sequence(1, size($vecCol)), CAST(0.0 AS double),
       |          (s, d) -> s + element_at($vecCol, d) * ${planeWeight("j", "d")})
       |        >= 0.0 THEN 1 ELSE 0 END))""".stripMargin)

  /** ANN top-k via multiprobe hyperplane LSH. Candidates = corpus
    * vectors whose bucket equals the probe's bucket or differs in at
    * most `probeFlips` of the low `nbits` bits (enumerated buckets,
    * so the join key is exact bucket equality — a plain shuffle/
    * broadcast join, never a distance predicate).
    */
  def annTopK(df: DataFrame, idCol: String, embCol: String,
              probePred: Column, k: Int, nbits: Int = 5,
              probeFlips: Int = 1): DataFrame = {
    val vecs = df.select(col(idCol),
        expr(s"transform($embCol, x -> CAST(x AS double))").as("vd"))
      .withColumn("bucket", hyperplaneSig("vd", nbits))
      .withColumn("vq", quantize("vd")).withColumn("nsq", normSqQ("vq"))
    // enumerated multiprobe: all bucket ids within hamming <= probeFlips
    // of the probe's bucket. 2-bit probing matters at the deeper codes
    // corpus scale needs for selectivity (at nbits=8, 1-bit probing
    // visits 9/256 buckets and visibly under-recalls — AnnSpec).
    val flips1: Seq[Long] = if (probeFlips >= 1) (0 until nbits).map(1L << _) else Nil
    val flips2: Seq[Long] =
      if (probeFlips >= 2)
        for { i <- 0 until nbits; j <- (i + 1) until nbits } yield (1L << i) | (1L << j)
      else Nil
    val flips: Seq[Long] = 0L +: (flips1 ++ flips2)
    val probes = broadcast(
      vecs.filter(probePred)
        .select(col(idCol).as("probe_id"), col("bucket").as("pb"),
          col("vq").as("pv"), col("nsq").as("pnsq"))
        .withColumn("flip", explode(lit(flips.toArray)))
        .withColumn("bucket", col("flip").bitwiseXOR(col("pb")))
        .drop("flip", "pb"))
    probes.join(vecs.drop("vd"), Seq("bucket"))
      .filter(col("probe_id") =!= col(idCol))
      .dropDuplicates("probe_id", idCol)
      .withColumn("cos",
        dotQ("pv", "vq").cast("double") /
          sqrt((col("pnsq") * col("nsq")).cast("double")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cos").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col(idCol).as("neighbor_id"), col("rank"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs over the quantized grid:
    * all pairs above `threshold`, id_a < id_b. Exact and deterministic
    * (the oracle tier); `cosineNearDupPairsLsh` is the same semantics
    * with bucketed candidate generation — the corpus-scale plan.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                         threshold: Double, partitions: Int = 32): DataFrame = {
    val vecs = df.select(col(idCol), quantize(embCol).as("v"))
      .withColumn("nsq", normSqQ("v"))
    // the nested-loop join parallelizes over LEFT partitions; a small
    // parquet arrives as one partition, which would serialize the whole
    // O(n²) scan onto one core
    vecs.repartition(partitions).as("a")
      .join(vecs.as("b"), col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (dotQ("a.v", "b.v").cast("double") /
          sqrt((col("a.nsq") * col("b.nsq")).cast("double"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Seeded variant of `hyperplaneSig` for multi-table LSH: table t
    * draws its own planes from the hash stream, so tables are
    * independent and candidate recall amplifies as 1-(1-p^b)^T.
    */
  private def seededSig(vecCol: String, nbits: Int, table: Int): Column = {
    def w(j: String, d: String): String =
      s"(CAST(pmod(xxhash64(concat('t$table|', cast($j AS string), ':', cast($d AS string))), 1001) AS double) / 1000.0 - 0.5)"
    expr(
      s"""aggregate(sequence(0, ${nbits - 1}), 0L, (acc, j) -> acc * 2 +
         |  (CASE WHEN aggregate(sequence(1, size($vecCol)), CAST(0.0 AS double),
         |          (s, d) -> s + element_at($vecCol, d) * ${w("j", "d")})
         |        >= 0.0 THEN 1 ELSE 0 END))""".stripMargin)
  }

  /** Bucketed near-duplicate pairs: multi-table hyperplane-LSH
    * candidate generation + exact quantized-cosine verification. Same
    * output contract as `cosineNearDupPairs` (id_a < id_b, exact cos ≥
    * threshold) but the join is bucket-equality over (table, bucket) —
    * never an all-pairs product. Candidate volume per table is
    * Σ_bucket n_b² ≈ N²/2^nbits; total ≈ T·N²/2^nbits of the exact
    * arm's N²/2, with per-pair miss probability (1-p^b)^T where
    * p = 1-θ/π is the per-bit agreement at angle θ.
    *
    * Parameter honesty: at REAL near-dup thresholds (cos ≥ 0.9,
    * p ≈ 0.86) a deep code (nbits 16+) separates true pairs from the
    * 2^-nbits random-collision floor and the plan is genuinely
    * sub-quadratic. At this fixture's adversarial setting — isotropic
    * vectors, threshold 0.35 ⇒ p ≈ 0.61 vs the 0.5 floor — NO
    * hyperplane code separates well (0.61/0.5 per bit), so the
    * defaults below are tuned for verified completeness on the fixture
    * (the driver oracle-checks this query EQUAL to the exact arm),
    * not for speed there. The plan shape, not the fixture constants,
    * is what survives the 100× scale-up.
    */
  def cosineNearDupPairsLsh(df: DataFrame, idCol: String, embCol: String,
                            threshold: Double, nbits: Int = 3,
                            tables: Int = 32): DataFrame = {
    val vecs = df.select(col(idCol),
        expr(s"transform($embCol, x -> CAST(x AS double))").as("vd"))
      .withColumn("vq", quantize("vd")).withColumn("nsq", normSqQ("vq"))
      .repartition(col(idCol))
    val sigCols = (0 until tables).map(t => seededSig("vd", nbits, t))
    val candidates = vecs
      .select(col(idCol), posexplode(array(sigCols: _*)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
      .groupBy("table", "bucket")
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(Dedup.bucketPairs("ids"))).as("p"))
      .select(col("p.l").as("id_a"), col("p.r").as("id_b"))
      .distinct()
    val sides = vecs.select(col(idCol), col("vq"), col("nsq"))
    candidates
      .join(sides.toDF("id_a", "va", "nsqa"), "id_a")
      .join(sides.toDF("id_b", "vb", "nsqb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (dotQ("va", "vb").cast("double") /
          sqrt((col("nsqa") * col("nsqb")).cast("double"))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
