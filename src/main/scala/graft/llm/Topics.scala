package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BERTopic-shaped topic modeling over the paired document/embedding
  * tables (Grootendorst 2022, minus the UMAP stage): k-means cells
  * over the embedding column become the topics, and each topic is
  * labeled by its most DISCRIMINATIVE terms — the c-TF-IDF idea,
  * realized here with the exact integer lift machinery the per-source
  * vocabulary comparison already uses (`TextOps.discriminativeTerms`
  * with cluster-as-source).
  *
  * Composition is the point: the clustering front half is the same
  * bounded-train + compiled-assignment path every clustered tier
  * shares (`Similarity.clusterAssign`), and the labeling back half is
  * the same one-corpus-shuffle lift ranking — so the capstone adds NO
  * new scale surface, just the wiring. At 100 TB: assignment is
  * map-only, the id join is an equi-join on the embedding table's own
  * key, and the term pass is the one (topic, term) shuffle
  * discriminativeTerms already pays.
  */
object Topics {

  /** Output: (topic, term, n_in_source, n_total, lift_micro, rank) —
    * one row per (cluster, top-ranked discriminative term). Topic −1
    * is the zero-norm quarantine cell: its documents surface under
    * their own label (loud), never silently folded into a real topic.
    */
  def topicModel(docs: DataFrame, embeds: DataFrame,
                 docIdCol: String, textCol: String,
                 vecIdCol: String, embCol: String,
                 nClusters: Int, topTerms: Int, minCount: Long = 2L,
                 lloydIters: Int = 5, trainSample: Int = 512): DataFrame = {
    require(nClusters > 0, "topicModel: nClusters must be positive")
    val assign = Similarity.clusterAssign(embeds, vecIdCol, embCol,
      nClusters, lloydIters, trainSample)
    val joined = docs.join(assign, col(docIdCol) === col(vecIdCol))
      .select(col("cluster").as("topic"), col(textCol))
    TextOps.discriminativeTerms(joined, "topic", textCol, topTerms, minCount)
  }
}
