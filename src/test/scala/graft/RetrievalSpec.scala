package graft

import org.apache.spark.sql.functions._

import graft.llm.{Retrieval, TextOps}

/** Gates for hybrid retrieval: exact RRF arithmetic, agreement
  * semantics, the by-doc BM25 arm's self-exclusion, and the fused
  * query's end-to-end laws on the real fixture tables.
  */
class RetrievalSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("rrfFuse: exact nano-unit contributions and agreement ordering") {
    import spark.implicits._
    // arm A ranks docs (10, 11, 12); arm B ranks (11, 20, 21).
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("qid", "id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 20L, 2), (1L, 21L, 3)).toDF("qid", "id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "qid", "id", "rank", k = 10)
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("rrf_micro"), r.getAs[Long]("n_arms"), r.getAs[Int]("rank")))
      .sortBy(_._4)
    // doc 11 (rank 2 + rank 1) beats every single-arm doc:
    // floor(1e9/62) + floor(1e9/61) = 16129032 + 16393442
    assert(fused.head == ((11L, 16129032L + 16393442L, 2L, 1)))
    // doc 10: single arm at rank 1 → floor(1e9/61)
    assert(fused(1) == ((10L, 16393442L, 1L, 2)))
    // ties broken by id: docs 12 and 21 both floor(1e9/63) = 15873015
    val tied = fused.filter(_._2 == 15873015L).map(_._1)
    assert(tied.toSeq == Seq(12L, 21L))
  }

  test("rrfFuse: single ranking preserves the input order") {
    import spark.implicits._
    val a = Seq((1L, 5L, 1), (1L, 9L, 2), (1L, 3L, 3)).toDF("qid", "id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a), "qid", "id", "rank", k = 2)
      .orderBy("rank").collect()
    assert(fused.map(_.getAs[Long]("id")).toSeq == Seq(5L, 9L))
    assert(fused.forall(_.getAs[Long]("n_arms") == 1L))
  }

  test("bm25TopKByDoc: probe doc is excluded from its own ranking") {
    val docs = Tables.documents(spark, Sf)
    val ranked = TextOps.bm25TopKByDoc(docs, "doc_id", "text",
      col("doc_id") < 3, k = 20)
    val rows = ranked.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("doc_id") != r.getAs[Long]("qid")),
      "a probe doc must never rank against itself")
    // ranks are 1..n contiguous per qid
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to g.length))
    }
  }

  test("hybridTopKByDoc: arms agree with their standalone tiers; a doc in both arms outranks equal-rank singles") {
    import graft.llm.Similarity
    val docs = Tables.documents(spark, Sf)
    val embeds = Tables.embeddings(spark, Sf)
    val fused = Retrieval.hybridTopKByDoc(docs, embeds,
      "doc_id", "text", "vec_id", "embedding",
      probePred = _ < 3, kArm = 20, k = 10)
    val rows = fused.collect()
    assert(rows.map(_.getAs[Long]("qid")).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, g) =>
      assert(g.length == 10)
      // fused score strictly ordered by (rrf_micro desc, doc_id asc)
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      val pairs = byRank.map(r => (r.getAs[Long]("rrf_micro"), r.getAs[Long]("doc_id")))
      assert(pairs.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
        s1 > s2 || (s1 == s2 && d1 < d2) })
    }
    // every fused member is present in at least one arm's top-20
    val lex = TextOps.bm25TopKByDoc(docs, "doc_id", "text", col("doc_id") < 3, 20)
      .select(col("qid"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val den = Similarity.bruteForceTopK(embeds, "vec_id", "embedding",
        col("vec_id") < 3, 20)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val members = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))).toSet
    assert(members.subsetOf(lex union den))
    // n_arms = 2 exactly on the intersection
    rows.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))
      val expected = (if (lex(key)) 1 else 0) + (if (den(key)) 1 else 0)
      assert(r.getAs[Long]("n_arms") == expected)
    }
  }

  test("contextPack: rank-prefix within budget; oversized top chunk kept") {
    import spark.implicits._
    val ranked = Seq(
      // probe 1: 60+50 fit in 128, 30 would overflow at rank 3? 60+50+30=140>128
      (1, 1, 100L, 60L), (1, 2, 101L, 50L), (1, 3, 102L, 30L),
      // probe 2: top chunk alone exceeds the budget — still kept
      (2, 1, 200L, 500L), (2, 2, 201L, 10L)
    ).toDF("qid", "rank", "chunk_uid", "chunk_tokens")
    val packed = Retrieval.contextPack(ranked, "qid", "rank", "chunk_tokens", 128L)
      .collect().map(r => (r.getAs[Int]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("cum_tokens"))).sortBy(t => (t._1, t._2))
    assert(packed.toSeq == Seq((1, 1, 60L), (1, 2, 110L), (2, 1, 500L)),
      s"got ${packed.toSeq}")
  }

  test("hybrid ANN arm: fused recall vs the exact hybrid; lexical ranks unharmed") {
    val docs = Tables.documents(spark, Sf)
    val embeds = Tables.embeddings(spark, Sf)
    def fusedSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))).toSet
    val exact = fusedSet(Retrieval.hybridTopKByDoc(docs, embeds,
      "doc_id", "text", "vec_id", "embedding", _ < 3, kArm = 20, k = 10))
    val ann = fusedSet(Retrieval.hybridTopKByDocAnn(docs, embeds,
      "doc_id", "text", "vec_id", "embedding", _ < 3, kArm = 20, k = 10,
      nbits = 5, probeFlips = 2))
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"fused recall $recall < 0.8 (|exact|=${exact.size})")
    // the lexical arm is EXACT inside the ANN hybrid: every fused
    // member the dense-ANN arm did not surface must carry precisely
    // its lexical RRF contribution, floor(1e9/(60+lex_rank))
    val lexRank = TextOps.bm25TopKByDoc(docs, "doc_id", "text",
      col("doc_id") < 3, 20).select("qid", "doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val annRows = Retrieval.hybridTopKByDocAnn(docs, embeds,
      "doc_id", "text", "vec_id", "embedding", _ < 3, kArm = 20, k = 10,
      nbits = 5, probeFlips = 2).collect()
    val singleArmLex = annRows.filter { r =>
      r.getAs[Long]("n_arms") == 1L &&
        lexRank.contains((r.getAs[Long]("qid"), r.getAs[Long]("doc_id")))
    }
    assert(singleArmLex.nonEmpty, "fixture should have lexical-only fused members")
    singleArmLex.foreach { r =>
      val lr = lexRank((r.getAs[Long]("qid"), r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("rrf_micro") == math.floor(1e9 / (60.0 + lr)).toLong)
    }
  }

  private val IdxQueries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("key", "row"),
    1 -> Seq("hash", "table"),
    2 -> Seq("zebra", "join")) // 'zebra' absent from the corpus on purpose

  test("lex index: postings/termDf/docLens/stats carry exact integers on a constructed corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val idx = Retrieval.buildLexIndex(docs, "doc_id", "text")
    val postings = idx.postings.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(postings == Map(
      ("a", 1L) -> ((2L, 3L)),  // tf 2, dl 3
      ("a", 2L) -> ((1L, 2L)),
      ("b", 1L) -> ((1L, 3L)),
      ("c", 2L) -> ((1L, 2L))))
    val dfm = idx.termDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfm == Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
    val lens = idx.docLens.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lens == Map(1L -> 3L, 2L -> 2L))
    val st = idx.stats.collect()
    assert(st.length == 1 && st(0).getLong(0) == 2L && st(0).getLong(1) == 5L)
  }

  test("lex index: incremental update is bit-identical to a full rebuild") {
    import spark.implicits._
    // old corpus → diff (doc 2 changed, doc 3 removed, doc 9 added) →
    // every index table AND the search must equal the from-scratch
    // rebuild on the new corpus
    val oldDocs = Seq((1L, "key row key"), (2L, "hash table scan"),
      (3L, "merge batch"), (4L, "join row")).toDF("doc_id", "text")
    val newDocs = Seq((1L, "key row key"), (2L, "hash hash join"),
      (4L, "join row"), (9L, "scan table row")).toDF("doc_id", "text")
    val removed = Seq(2L, 3L).toDF("doc_id")
    val added = newDocs.filter(col("doc_id").isin(2L, 9L))
    val inc = Retrieval.updateLexIndex(
      Retrieval.buildLexIndex(oldDocs, "doc_id", "text"),
      removed, added, "doc_id", "text")
    val full = Retrieval.buildLexIndex(newDocs, "doc_id", "text")
    assert(inc.postings.collect().toSet == full.postings.collect().toSet)
    assert(inc.termDf.collect().toSet == full.termDf.collect().toSet,
      "df deltas must drop vanished terms and add new ones exactly")
    assert(inc.docLens.collect().toSet == full.docLens.collect().toSet)
    assert(inc.stats.collect().toSet == full.stats.collect().toSet)
    val q = Seq(0 -> Seq("key", "row"), 1 -> Seq("hash", "scan"))
    assert(Retrieval.bm25TopKWith(inc, "doc_id", q, k = 4).collect().toSet ==
      Retrieval.bm25TopKWith(full, "doc_id", q, k = 4).collect().toSet)
  }

  test("lex index: indexed BM25 search is bit-equal to the from-scratch scan") {
    val docs = Tables.documents(spark, Sf)
    val idx = Retrieval.buildLexIndex(docs, "doc_id", "text")
    val fresh = TextOps.bm25TopK(docs, "doc_id", "text", IdxQueries, k = 5)
      .collect().toSet
    val indexed = Retrieval.bm25TopKWith(idx, "doc_id", IdxQueries, k = 5)
      .collect().toSet
    assert(fresh.nonEmpty && indexed == fresh,
      s"indexed search must equal the scan bit-for-bit: ${indexed.size} vs ${fresh.size}")
  }

  test("lex index: by-doc probes through the index are bit-equal to bm25TopKByDoc") {
    val docs = Tables.documents(spark, Sf)
    val idx = Retrieval.buildLexIndex(docs, "doc_id", "text")
    val scan = TextOps.bm25TopKByDoc(docs, "doc_id", "text",
      col("doc_id") < 3, k = 10).collect().toSet
    val indexed = Retrieval.bm25TopKByDocWith(idx, "doc_id",
      Seq(0L, 1L, 2L), k = 10).collect().toSet
    assert(scan.nonEmpty && indexed == scan,
      "the probe's postings ARE its distinct tokens — results must match bit-for-bit")
  }

  test("lex index: parquet round-trip searches bit-equal; foreign schema fails loud") {
    val dir = java.nio.file.Files.createTempDirectory("lexidx").toString
    val docs = Tables.documents(spark, Sf)
    val idx = Retrieval.buildLexIndex(docs, "doc_id", "text")
    Retrieval.saveLexIndex(idx, dir)
    val loaded = Retrieval.loadLexIndex(spark, "doc_id", dir)
    assert(Retrieval.bm25TopKWith(loaded, "doc_id", IdxQueries, k = 5).collect().toSet ==
      Retrieval.bm25TopKWith(idx, "doc_id", IdxQueries, k = 5).collect().toSet)
    // a directory holding some other table must not score silently
    val bad = java.nio.file.Files.createTempDirectory("lexidx-bad").toString
    docs.limit(5).write.mode("overwrite").parquet(bad + "/postings")
    idx.termDf.write.mode("overwrite").parquet(bad + "/term_df")
    idx.docLens.write.mode("overwrite").parquet(bad + "/doc_lens")
    idx.stats.write.mode("overwrite").parquet(bad + "/stats")
    val e = intercept[IllegalArgumentException] {
      Retrieval.loadLexIndex(spark, "doc_id", bad)
    }
    assert(e.getMessage.contains("unexpected postings schema"))
  }

  test("evalBinary: exact MRR/precision/recall/NDCG with pinned discounts") {
    import spark.implicits._
    // q1: rels {11,12,13}; run hits at ranks 2 and 4 →
    //   mrr 500000, p@5 = 2/5, recall 2/3,
    //   dcg = 630929 + 430676, idcg = prefix(3) = 2130929 → 498188
    // q2: rels {21,22} exactly at ranks 1,2 → all metrics perfect
    // q3: no rels at all → mrr/precision 0, recall/ndcg NULL
    val run = Seq(
      (1L, 99L, 1), (1L, 11L, 2), (1L, 98L, 3), (1L, 12L, 4), (1L, 97L, 5),
      (2L, 21L, 1), (2L, 22L, 2), (2L, 96L, 3),
      (3L, 95L, 1), (3L, 94L, 2)).toDF("qid", "doc", "rank")
    val qrels = Seq((1L, 11L), (1L, 12L), (1L, 13L), (2L, 21L), (2L, 22L))
      .toDF("qid", "doc")
    val out = graft.llm.Retrieval.evalBinary(run, qrels, "qid", "doc",
        "rank", k = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = out(1L)
    assert(q1.getLong(1) == 3L && q1.getLong(2) == 2L)
    assert(q1.getLong(3) == 500000L && q1.getLong(4) == 400000L &&
      q1.getLong(5) == 666666L)
    assert(q1.getLong(6) == 498188L, s"NDCG exact: ${q1.getLong(6)}")
    val q2 = out(2L)
    assert(q2.getLong(3) == 1000000L && q2.getLong(6) == 1000000L &&
      q2.getLong(5) == 1000000L)
    val q3 = out(3L)
    assert(q3.getLong(3) == 0L && q3.getLong(4) == 0L &&
      q3.isNullAt(5) && q3.isNullAt(6),
      "no-relevant queries report NULL recall/NDCG, zero MRR")
    intercept[IllegalArgumentException] {
      graft.llm.Retrieval.evalBinary(run, qrels, "qid", "doc", "rank", 11)
    }
  }

  test("phraseSearch: counts, 1-based first position, boundaries, repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x slow hash batch y slow hash batch"), // two occurrences
      (2L, "slow hash batch"),                     // exact-boundary doc
      (3L, "slow hash x batch"),                   // broken phrase: no match
      (4L, "hash batch slow"),                     // right terms, wrong order
      (5L, "zz yy")).toDF("doc_id", "text")
    val out = graft.llm.Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("slow", "hash", "batch"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((2L, 2L)), 2L -> ((1L, 1L))),
      "only true phrase occurrences may match; positions are 1-based")
    // a REPEATED phrase term: one token position votes for several
    // anchors — "a b a" over "a b a b a" occurs at 1 and 3, overlapping
    val rep = Seq((7L, "a b a b a")).toDF("doc_id", "text")
    val r = graft.llm.Retrieval.phraseSearch(rep, "doc_id", "text",
      Seq("a", "b", "a")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L)
    // single-term phrase degenerates to term occurrence counting
    val one = graft.llm.Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("hash")).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(one == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    intercept[IllegalArgumentException] {
      graft.llm.Retrieval.phraseSearch(docs, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      graft.llm.Retrieval.phraseSearch(docs, "doc_id", "text", Seq("a b"))
    }
  }

  test("bm25Rm3TopK: feedback expansion retrieves the synonym doc the literal query cannot") {
    import spark.implicits._
    // docs 1-3 use 'automobile'; doc 4 bridges ('car automobile');
    // doc 5 uses only 'car'. The query says 'car': pass 1 ranks the
    // bridge + doc 5, the relevance model learns 'automobile' from
    // them, and pass 2 surfaces docs 1-3 — the PRF promise. Filler
    // terms keep dl varied so the test isn't a degenerate tie.
    val docs = Seq(
      (1L, "automobile engine repair manual torque"),
      (2L, "automobile chassis rust inspection"),
      (3L, "vintage automobile auction prices"),
      (4L, "car automobile dealer showroom"),
      (5L, "car wash subscription offer"),
      (6L, "quarterly revenue forecast spreadsheet"),
      (7L, "garden soil compost rotation"),
      (8L, "chess opening theory repertoire")
    ).toDF("doc_id", "text")
    val q = Seq(0 -> Seq("car"))
    val base = TextOps.bm25TopK(docs, "doc_id", "text", q, k = 8)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(base == Set(4L, 5L),
      s"the literal query must only reach the 'car' docs, got $base")
    val rm3 = TextOps.bm25Rm3TopK(docs, "doc_id", "text", q, k = 8,
      fbDocs = 2, fbTerms = 5, origPct = 50)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(Set(1L, 2L, 3L).subsetOf(rm3),
      s"expansion must surface the automobile docs, got $rm3")
    assert(Set(4L, 5L).subsetOf(rm3),
      "the original query's docs must not be lost")
    // determinism: bit-identical rerun
    val a = TextOps.bm25Rm3TopK(docs, "doc_id", "text", q, k = 8,
      fbDocs = 2, fbTerms = 5, origPct = 50).collect().toSeq
    val b = TextOps.bm25Rm3TopK(docs.repartition(5), "doc_id", "text", q,
      k = 8, fbDocs = 2, fbTerms = 5, origPct = 50).collect().toSeq
    assert(a.sortBy(_.getAs[Int]("rank")) == b.sortBy(_.getAs[Int]("rank")),
      "RM3 must be partitioning-independent")
  }

  test("bm25Rm3TopK: origPct=100 reproduces the unweighted ranking; origPct=0 is pure feedback") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha delta"),
      (3L, "beta beta epsilon"),
      (4L, "zeta eta theta"),
      (5L, "alpha beta beta")
    ).toDF("doc_id", "text")
    val q = Seq(0 -> Seq("alpha", "beta"))
    val plain = TextOps.bm25TopK(docs, "doc_id", "text", q, k = 5)
      .collect().sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    // all-original interpolation: every surviving term weight is the
    // uniform q_micro, a per-query POSITIVE scalar — ranking invariant
    val full = TextOps.bm25Rm3TopK(docs, "doc_id", "text", q, k = 5,
      fbDocs = 2, fbTerms = 3, origPct = 100)
      .collect().sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    assert(full == plain,
      s"origPct=100 must keep the literal ranking: $full vs $plain")
    // all-feedback: the query's own terms still surface via the
    // feedback docs (they contain them), so results stay non-empty
    val fb = TextOps.bm25Rm3TopK(docs, "doc_id", "text", q, k = 5,
      fbDocs = 2, fbTerms = 3, origPct = 0).collect()
    assert(fb.nonEmpty)
    intercept[IllegalArgumentException] {
      TextOps.bm25Rm3TopK(docs, "doc_id", "text", q, k = 5, origPct = 101)
    }
  }
}
