package graft

import org.apache.spark.sql.functions._

import graft.api.ModelStore
import graft.llm.Unigram

/** Laws for the unigram-LM tokenizer: Viterbi optimality against a
  * brute-force segmentation search, conservation, deterministic
  * retraining, unseen-char fallback, kernel/canonical replay
  * equivalence, and the ModelStore round-trip.
  */
class UnigramSpec extends SparkSpec {

  // brute force: minimal cost over ALL segmentations (exponential —
  // only for short words)
  private def bruteMin(token: String, costs: Map[String, Long],
                       maxLen: Int): Long = {
    if (token.isEmpty) return 0L
    var best = Long.MaxValue
    for (l <- 1 to math.min(maxLen, token.length)) {
      val head = token.substring(0, l)
      val c = costs.getOrElse(head,
        if (l == 1) Unigram.UnkCostMicroNats else Long.MaxValue)
      if (c != Long.MaxValue) {
        val rest = bruteMin(token.substring(l), costs, maxLen)
        if (rest != Long.MaxValue && c + rest < best) best = c + rest
      }
    }
    best
  }

  private def cost(pieces: Array[String], costs: Map[String, Long]): Long =
    pieces.map(p => costs.getOrElse(p,
      if (p.length == 1) Unigram.UnkCostMicroNats else Long.MaxValue)).sum

  test("viterbi: optimal vs brute force, conservation, longer-piece ties") {
    val costs = Map("a" -> 5000000L, "b" -> 5000000L, "ab" -> 3000000L,
      "ba" -> 3000000L, "aba" -> 9000000L, "bab" -> 2000000L)
    for (tok <- Seq("ababab", "aabba", "abba", "a", "bababa", "abab")) {
      val enc = Unigram.encodeToken(tok, costs, 3)
      assert(enc.mkString("") == tok, s"conservation broke on $tok")
      assert(cost(enc, costs) == bruteMin(tok, costs, 3),
        s"suboptimal segmentation of $tok: ${enc.mkString("|")}")
    }
    // equal-cost tie prefers the longer final piece: "aa" with equal
    // piece costs could be [a,a] (10M) or... construct a true tie:
    // "ab" as [a,b] = 6M vs ["ab"] = 6M -> the single longer piece wins
    val tie = Map("a" -> 3000000L, "b" -> 3000000L, "ab" -> 6000000L)
    assert(Unigram.encodeToken("ab", tie, 2).toSeq == Seq("ab"))
  }

  test("unseen char falls back loud, never fails; empty token is empty") {
    val costs = Map("a" -> 1000000L)
    val enc = Unigram.encodeToken("axa", costs, 4)
    assert(enc.toSeq == Seq("a", "x", "a"))
    assert(cost(enc, costs) == 2000000L + Unigram.UnkCostMicroNats)
    assert(Unigram.encodeToken("", costs, 4).isEmpty)
  }

  test("training: frequent word becomes one piece; chars retained; deterministic") {
    import spark.implicits._
    val docs = (Seq.fill(50)("hello world") ++ Seq.fill(10)("held word"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val p1 = Unigram.train(docs, "text", vocabSize = 40)
    val p2 = Unigram.train(docs, "text", vocabSize = 40)
    assert(p1 == p2, "retraining must be bit-identical")
    val table = p1.toMap
    assert(table.contains("hello"), s"frequent word not a piece: $p1")
    // every char of the corpus is covered
    for (c <- "helowrd") assert(table.contains(c.toString), s"missing char $c")
    // the frequent word encodes to a single piece
    assert(Unigram.encodeToken("hello", table, 8).toSeq == Seq("hello"))
    // costs are positive (probabilities < 1) and ordered output stable
    assert(p1.forall(_._2 > 0L))
  }

  test("compiled kernel replays the canonical encoder; ModelStore round-trip") {
    import spark.implicits._
    val docs = (Seq.fill(20)("spark spark streaming") ++ Seq.fill(5)("spa"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val pieces = Unigram.train(docs, "text", vocabSize = 30)
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val viaKernel = toks
      .select(col("tok"), Unigram.encode(col("tok"), pieces).as("enc"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val table = pieces.toMap
    viaKernel.foreach { case (tok, enc) =>
      assert(enc == Unigram.encodeToken(tok, table, 8).toSeq,
        s"kernel/canonical drift on $tok")
    }
    // encode column itself is map-side only (no Exchange above the scan)
    val plan = docs.select(Unigram.encode(col("text"), pieces))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must be map-only:\n$plan")
    // ModelStore round-trip is bit-equal (costs are longs)
    val path = java.nio.file.Files.createTempDirectory("uni").toString + "/uni"
    ModelStore.saveUnigram(spark, pieces, path)
    assert(ModelStore.loadUnigram(spark, path) == pieces)
  }

  test("subwordStats: exact ledger on a constructed corpus") {
    import spark.implicits._
    val docs = Seq(("en", "aa aa b"), ("de", "aab")).toDF("source", "text")
    // fixed table: "aa" cheap single piece, chars present
    val pieces = Seq(("aa", 1000000L), ("a", 3000000L), ("b", 3000000L))
    val out = Unigram.subwordStats(docs, "source", "text", pieces)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // en: words [aa, aa, b] -> subwords 1+1+1, chars 2+2+1
    assert(out("en") == ((3L, 3L, 5L)))
    // de: "aab" -> [aa, b] = 2 subwords, 3 chars
    assert(out("de") == ((1L, 2L, 3L)))
  }
}
