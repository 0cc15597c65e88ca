package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** The co-location contract: joining two tables bucketed on the join
  * key at the same bucket count plans ZERO Exchange (both sides read
  * pre-partitioned files), while the plain-parquet twin shuffles both
  * sides — same results either way.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join is exchange-free; plain twin shuffles; results identical") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source")
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("doc_id"), col("label"))
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: a broadcast join would be trivially
    // exchange-free and prove nothing about co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(docs, "bspec_docs", "doc_id", nBuckets = 4)
      Bucketing.writeBucketed(embs, "bspec_embs", "doc_id", nBuckets = 4)
      spark.table("bspec_docs").write.mode("overwrite")
        .format("parquet").saveAsTable("bspec_docs_plain")
      spark.table("bspec_embs").write.mode("overwrite")
        .format("parquet").saveAsTable("bspec_embs_plain")

      val co = Bucketing.colocatedJoin(spark, "bspec_docs", "bspec_embs", "doc_id")
      val coPlan = co.queryExecution.executedPlan.toString
      assert(!coPlan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${coPlan.take(1500)}")

      val plain = Bucketing.colocatedJoin(spark, "bspec_docs_plain",
        "bspec_embs_plain", "doc_id")
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.linesIterator
        .count(_.contains("Exchange hashpartitioning")) == 2,
        s"plain twin must shuffle both sides:\n${plainPlan.take(1500)}")

      val a = co.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      val b = plain.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(a == b && a.nonEmpty, "co-located and plain joins must agree")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      for (t <- Seq("bspec_docs", "bspec_embs", "bspec_docs_plain",
          "bspec_embs_plain"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("bucketed aggregate on the bucket key is also exchange-free") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_chars")
    try {
      Bucketing.writeBucketed(docs, "bspec_agg", "doc_id", nBuckets = 4)
      val agg = spark.table("bspec_agg").groupBy("doc_id")
        .agg(sum("n_chars").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must ride the bucketing:\n${plan.take(1200)}")
      assert(agg.count() == docs.count())
    } finally spark.sql("DROP TABLE IF EXISTS bspec_agg")
  }
}
