package graft.pipeline

import org.apache.spark.sql.SparkSession

/** The governance tier's shared dispatch — one deletion request
  * propagated into every PRESENT per-document standing layout
  * (inverted index + negative stats, simhash fingerprints, IVF-PQ
  * codes, knn graph + top-k heal). The single body behind
  * `Ctl index-forget` and the HTTP shim's `POST /forget`, so the
  * layout set and the presence guards cannot drift between the two
  * operational surfaces. Aggregate-statistics layouts (daily
  * sketches, drift references) are out of scope by design: they hold
  * count partials, not per-document rows — nothing to hide — and an
  * erase-influence regime rebuilds them from the purged source.
  */
object Governance {

  /** Apply `ids` to every present layout; returns (layout → applied
    * summary) for the layouts that stand, in a fixed report order.
    * Caller contract is the union of the per-layout ones: disjoint
    * cohorts across concurrent requests, and the knn leg serializes
    * with a live knn maintainer (it is a WRITER — the heal appends
    * edge partials).
    */
  def applyForget(spark: SparkSession, sfDir: String,
      ids: Seq[Long]): Seq[(String, String)] = {
    require(ids.nonEmpty, "forget request carries no ids")
    val out = Seq.newBuilder[(String, String)]
    if (graft.operators.TextQueries.invIndexPresent(sfDir)) {
      val (dn, dt) = graft.operators.TextQueries.invIndexForget(spark, sfDir, ids)
      out += "invindex" -> s"""{"docs":$dn,"tokens":$dt}"""
    }
    if (graft.operators.DedupQueries.simhashPresent(sfDir)) {
      val dn = graft.operators.DedupQueries.simhashForget(spark, sfDir, ids)
      out += "simhash" -> s"""{"docs":$dn}"""
    }
    if (graft.operators.SimilarityQueries.ivfPqPresent(sfDir)) {
      val dn = graft.operators.SimilarityQueries.ivfPqForget(spark, sfDir, ids)
      out += "ivfpq" -> s"""{"vectors":$dn}"""
    }
    if (graft.operators.SimilarityQueries.knnPresent(sfDir,
        graft.operators.SimilarityQueries.knnProbeRadius(spark))) {
      val dn = graft.operators.SimilarityQueries.knnForget(spark, sfDir, ids)
      out += "knn" -> s"""{"vectors":$dn}"""
    }
    out.result()
  }

  /** Tombstones standing (hidden but not yet physically deleted) per
    * present layout — the review surface behind `GET /forget/pending`;
    * the next `index-compact` retires them.
    */
  def pendingForgets(spark: SparkSession,
      sfDir: String): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    if (graft.operators.TextQueries.invIndexPresent(sfDir))
      out += "invindex" ->
        graft.operators.TextQueries.invIndexPendingForgets(spark, sfDir)
    if (graft.operators.DedupQueries.simhashPresent(sfDir))
      out += "simhash" ->
        graft.operators.DedupQueries.simhashPendingForgets(spark, sfDir)
    if (graft.operators.SimilarityQueries.ivfPqPresent(sfDir))
      out += "ivfpq" ->
        graft.operators.SimilarityQueries.ivfPqPendingForgets(spark, sfDir)
    if (graft.operators.SimilarityQueries.knnPresent(sfDir,
        graft.operators.SimilarityQueries.knnProbeRadius(spark)))
      out += "knn" ->
        graft.operators.SimilarityQueries.knnPendingForgets(spark, sfDir)
    out.result()
  }
}
