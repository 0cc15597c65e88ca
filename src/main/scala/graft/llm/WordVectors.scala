package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StringType, StructField, StructType}

/** Count-based static word embeddings: PPMI + truncated symmetric
  * eigendecomposition (Levy & Goldberg 2014, "Neural Word Embedding
  * as Implicit Matrix Factorization" — SGNS implicitly factorizes the
  * shifted PMI matrix; factorizing PPMI directly is the classic
  * count-based realization). The distributional-semantics layer a
  * curation pipeline trains FROM the corpus itself — no external
  * model, fully deterministic.
  *
  * Scale shape (the pcaTrain contract): the corpus pays one row-local
  * pair explode and ONE (term, context) shuffle that collapses to the
  * ≤ V² count table; V is REQUIRED ≤ 256, so everything collected to
  * the driver is a ≤ 64k-entry model artifact, never data. The PPMI
  * transform and the shared deterministic Jacobi eigensolve run on
  * that bounded matrix; the output embedding table is V·dims rows.
  */
object WordVectors {

  /** Output: (term, dim, value_micro) — harness-sortable scalars (the
    * q_pca_project lesson); value_micro = floor(1e6 · w[term][dim])
    * with W = U_k · Λ_k^½ on the PPMI matrix. Sign convention: each
    * eigenvector's first component of magnitude > 1e-12 is made
    * positive (eigenvectors are sign-ambiguous; floored micro-units
    * are not).
    *
    * Co-occurrence is the symmetric ±`window` token window, self
    * pairs excluded; the vocabulary is the top-`vocabSize` terms by
    * corpus count under the deterministic (count desc, term asc)
    * tie-break, derived with TakeOrdered — never a corpus-wide window.
    */
  def ppmiSvd(df: DataFrame, textCol: String, vocabSize: Int,
              window: Int, dims: Int): DataFrame = {
    require(vocabSize >= 2 && vocabSize <= 256,
      "ppmiSvd: vocabSize must be in [2, 256] — the driver matrix is V², a model artifact not data")
    require(window >= 1 && window <= 8, "ppmiSvd: window must be in [1, 8]")
    require(dims >= 1 && dims <= vocabSize, "ppmiSvd: dims must be in [1, vocabSize]")
    val spark = df.sparkSession
    val toks = df.select(split(col(textCol), " ").as("t"))
    val vocab = toks.select(explode(col("t")).as("term"))
      .where(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc).limit(vocabSize)
      .select("term").collect().map(_.getString(0))
    if (vocab.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("term", StringType),
          StructField("dim", IntegerType), StructField("value_micro", LongType))))
    val index = vocab.zipWithIndex.toMap
    // row-local symmetric-window pair explode; sequence bounds are
    // clamped into [0, size-1] so ANSI subscripts can never stray
    val pairs = toks.select(explode(expr(
        s"""flatten(transform(t, (x, i) ->
           |  transform(filter(sequence(greatest(0, i - $window),
           |                            least(size(t) - 1, i + $window)),
           |                   j -> j != i),
           |            j -> struct(x AS w, t[j] AS c))))""".stripMargin)).as("p"))
      .select(col("p.w"), col("p.c"))
      .where(col("w").isInCollection(vocab) && col("c").isInCollection(vocab))
      .groupBy("w", "c").agg(count(lit(1)).as("n"))
      .collect()
    val v = vocab.length
    val counts = Array.ofDim[Double](v, v)
    for (r <- pairs) counts(index(r.getString(0)))(index(r.getString(1))) += r.getLong(2).toDouble
    val rowSum = counts.map(_.sum)
    val total = math.max(rowSum.sum, 1e-300)
    val ppmi = Array.tabulate(v, v) { (i, j) =>
      val n = counts(i)(j)
      if (n <= 0.0 || rowSum(i) <= 0.0 || rowSum(j) <= 0.0) 0.0
      else math.max(0.0, math.log(n * total / (rowSum(i) * rowSum(j))))
    }
    val (eig, vecs) = Similarity.jacobiEig(ppmi)
    // top-dims eigenpairs, (eigenvalue desc, index asc) tie-break
    val order = eig.indices.sortBy(i => (-eig(i), i)).take(dims)
    val cols = order.map { k =>
      val column = Array.tabulate(v)(i => vecs(i)(k))
      val lead = column.find(x => math.abs(x) > 1e-12).getOrElse(1.0)
      val sign = if (lead < 0.0) -1.0 else 1.0
      val scale = math.sqrt(math.max(eig(k), 0.0))
      column.map(x => x * sign * scale)
    }
    val rows = for (i <- 0 until v; d <- cols.indices) yield
      Row(vocab(i), d, math.floor(cols(d)(i) * 1e6).toLong)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("term", StringType),
        StructField("dim", IntegerType), StructField("value_micro", LongType))))
  }

  /** Document embeddings from a trained word-vector table: the mean of
    * the known-token vectors, in exact integer micro-units (elementwise
    * sum, one truncating div by the known count — addition-order-free).
    * Closes the self-trained loop: corpus → `ppmiSvd` → doc vectors
    * that feed the existing ANN / near-dup / clustering tiers with no
    * external model anywhere.
    *
    * The vector table is a bounded model artifact (≤ 65536 rows
    * REQUIRED — V ≤ 256 × dims ≤ 256) and ships as a broadcast literal
    * map, so the operator is row-local: NO shuffle, NO join (plan-gated
    * in `WordVectorsSpec`). Lookups use try_element_at — an
    * out-of-vocabulary token is a NULL to filter, never an ANSI
    * MAP_KEY error.
    *
    * Output: (idCol, dim, value_micro, n_known). A document with NO
    * known token surfaces as one loud (dim = −1, NULL value, n_known
    * 0) row — never silently dropped, never a division error.
    */
  def docEmbeddings(df: DataFrame, idCol: String, textCol: String,
                    vectors: DataFrame): DataFrame = {
    for (c <- Seq("__t", "__vmap", "__known", "__n", "__sums")
        if df.columns.contains(c))
      require(false, s"docEmbeddings: '$c' is reserved for internal use — rename it")
    val rows = vectors.select(col("term"), col("dim").cast("int"),
      col("value_micro").cast("long")).collect()
    require(rows.nonEmpty, "docEmbeddings: empty vector table")
    require(rows.length <= 65536,
      "docEmbeddings: vector table exceeds the model-artifact bound (65536 rows)")
    val byTerm = rows.groupBy(_.getString(0))
    val dims = rows.map(_.getInt(1)).max + 1
    require(byTerm.values.forall(rs =>
        rs.length == dims && rs.map(_.getInt(1)).sorted.sameElements(0 until dims)),
      "docEmbeddings: ragged vector table — every term needs dims 0..d-1 exactly once")
    val vmap: Map[String, Seq[Long]] = byTerm.map { case (t, rs) =>
      val arr = new Array[Long](dims)
      for (r <- rs) arr(r.getInt(1)) = r.getLong(2)
      t -> (arr.toSeq: Seq[Long])
    }
    df.select(col(idCol), split(col(textCol), " ").as("__t"))
      .withColumn("__vmap", typedLit(vmap))
      .withColumn("__known", expr(
        "filter(transform(__t, x -> try_element_at(__vmap, x)), v -> v IS NOT NULL)"))
      .withColumn("__n", size(col("__known")).cast("long"))
      .withColumn("__sums", expr(
        s"""aggregate(__known, array_repeat(0L, $dims),
           |  (acc, v) -> zip_with(acc, v, (a, b) -> a + b))""".stripMargin))
      .select(col(idCol), col("__n"),
        explode(expr(
          s"""CASE WHEN __n > 0 THEN transform(sequence(0, ${dims - 1}),
             |  d -> struct(d AS dim, element_at(__sums, d + 1) div __n AS value_micro))
             |ELSE array(struct(-1 AS dim, CAST(NULL AS BIGINT) AS value_micro)) END""".stripMargin)).as("e"))
      .select(col(idCol), col("e.dim").as("dim"),
        col("e.value_micro").as("value_micro"), col("__n").as("n_known"))
  }
}
