package graft.similarity

import org.apache.spark.sql.DataFrame

/** Test/triage-only access to [[Similarity]]'s private quantizer
  * internals, so stage-level timing tools can replay the build
  * pipeline piece by piece (tools/GateTriage).
  */
object SimilarityTriage {
  def kmeans(v: DataFrame, kc: Int): DataFrame =
    Similarity.kmeansCentroids(v, kc)
  def assign(v: DataFrame, cents: DataFrame): DataFrame =
    Similarity.argmaxAssign(v, cents)
}
