package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline layer.
  *
  * Four tiers, cheapest first — the standard large-corpus recipe:
  *  1. exact      — content-hash groupBy; one shuffle on the hash.
  *  2. normalized — same, over a canonicalized text form.
  *  3. MinHash-LSH — banded signatures; candidates come ONLY from
  *     band-bucket collisions (never an all-pairs product), then the
  *     few candidates are verified with exact Jaccard.
  *  4. SimHash    — 64-bit sketch; candidate pairs from 16-bit chunk
  *     collisions (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), then
  *     exact hamming verification via bit_count(xor).
  *
  * Scale notes (100 TB): every step is shuffle-on-key + linear work.
  * The only quadratic surface is WITHIN a bucket; band/chunk width
  * controls bucket size, and a hot bucket (boilerplate shingles) is
  * handled by salting the bucket key or capping bucket size — both
  * are data-dependent knobs, left as parameters.
  */
object Dedup {

  /** Exact duplicate groups: md5 of the raw text. One partial-agg
    * shuffle; the hash (not the text) is the shuffle key, so wide rows
    * don't travel — only (hash, id) pairs do.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Normalized duplicate groups: lowercase, collapse whitespace,
    * drop the given stop tokens, then hash. Catches trivially-edited
    * copies exact dedup misses.
    */
  def normalizedGroups(df: DataFrame, idCol: String, textCol: String,
                       dropTokens: Seq[String]): DataFrame = {
    val set = dropTokens.map(t => s"'$t'").mkString(", ")
    df.withColumn("__toks", split(lower(regexp_replace(col(textCol), "\\s+", " ")), " "))
      .withColumn("__norm", expr(s"array_join(filter(__toks, t -> t NOT IN ($set)), ' ')"))
      .select(md5(col("__norm")).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Exact n-gram Jaccard similarity over candidate pairs blocked by
    * `blockCol` (a language/source/bucket key that bounds the pair
    * count). This is the ORACLE-CHECKABLE exact tier; MinHash-LSH
    * below is the same semantics with sub-quadratic candidates and is
    * the 100 TB path.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int, threshold: Double): DataFrame = {
    val sets = df
      .withColumn("__toks", TextOps.tokens(textCol))
      .select(col(idCol), col(blockCol), TextOps.ngrams("__toks", n).as("grams"))
    val a = sets.as("a")
    val b = sets.as("b")
    a.join(b, col(s"a.$blockCol") === col(s"b.$blockCol") &&
             col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"),
        col(s"b.$idCol").as("id_b"),
        (size(array_intersect(col("a.grams"), col("b.grams"))).cast("double") /
         size(array_union(col("a.grams"), col("b.grams"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature: sig[i] = min over shingles of
    * xxhash64(i ':' shingle) — one independent 64-bit hash family per
    * signature position, no modular arithmetic to collide.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleN: Int): DataFrame =
    df.withColumn("__toks", TextOps.tokens(textCol))
      .withColumn("grams", TextOps.ngrams("__toks", shingleN))
      .filter(size(col("grams")) > 0)
      .select(col(idCol), col("grams"), expr(
        s"""transform(sequence(0, ${numHashes - 1}),
           |  i -> array_min(transform(grams, s -> xxhash64(concat(cast(i AS string), ':', s)))))"""
          .stripMargin).as("sig"))

  /** LSH banding: one row per (doc, band) with a hashed band key.
    * Docs sharing any band key are candidate duplicates. With
    * numHashes = bands × rowsPerBand, the match probability is the
    * classic S-curve 1-(1-j^r)^b.
    */
  def lshBands(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col(idCol), posexplode(expr(
      s"""transform(sequence(0, ${bands - 1}),
         |  j -> xxhash64(concat(cast(j AS string), ':',
         |         cast(slice(sig, j * $rowsPerBand + 1, $rowsPerBand) AS string))))"""
        .stripMargin)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")

  /** Banded-LSH near-duplicate pairs, verified with exact Jaccard on
    * the shingle sets. Candidates come only from band collisions —
    * the join is on (band, band_key), never a cross product.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 64,
                      bands: Int = 16, shingleN: Int = 2): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleN)
    val bandRows = lshBands(sigs, idCol, bands, numHashes / bands)
    val candidates = bandRows.as("x")
      .join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    val sets = sigs.select(col(idCol), col("grams"))
    candidates
      .join(sets.withColumnRenamed(idCol, "id_a").withColumnRenamed("grams", "ga"), "id_a")
      .join(sets.withColumnRenamed(idCol, "id_b").withColumnRenamed("grams", "gb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
         size(array_union(col("ga"), col("gb"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over a pre-hashed token multiset column
    * (array<bigint> of xxhash64(token)): bit b is the sign of
    * Σ_tokens (±1 by bit b). Frequent tokens weigh naturally (the
    * fold runs over the multiset, not the set); hashing happens once
    * per token, not once per (token, bit).
    */
  def simhash64(thashesCol: String): Column = expr(
    // shiftleft, not *2: the sign bit makes acc*2 overflow under ANSI
    s"""aggregate(sequence(0, 63), 0L, (acc, b) -> shiftleft(acc, 1) +
       |  (CASE WHEN aggregate($thashesCol, 0L,
       |          (s, h) -> s + (CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END))
       |        >= 0 THEN 1 ELSE 0 END))""".stripMargin)

  /** SimHash near-duplicate pairs: candidates from 16-bit chunk
    * equality (any pair within hamming ≤ 3 must share a chunk —
    * pigeonhole over 4 chunks), verified with exact
    * bit_count(xor) ≤ maxHamming.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int): DataFrame = {
    val hashed = df
      .withColumn("__toks", TextOps.tokens(textCol))
      .withColumn("__th", expr("transform(__toks, t -> xxhash64(t))"))
      .select(col(idCol), simhash64("__th").as("simhash"))
    val chunked = hashed.select(col(idCol), col("simhash"), posexplode(expr(
      "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)")))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.chunk_val") === col("y.chunk_val") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
