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

  /** The layout-GC catalog: every CURRENT standing-layout directory
    * name, collected from the same constants the builders use — a
    * version bump anywhere automatically marks its predecessors
    * superseded here.
    */
  private def currentLayoutNames: Set[String] =
    (graft.operators.TextQueries.currentLayoutNames ++
      graft.operators.DedupQueries.currentLayoutNames ++
      graft.operators.SimilarityQueries.currentLayoutNames ++
      graft.operators.CoreQueries.currentLayoutNames).toSet

  /** Garbage-collect SUPERSEDED standing-layout generations under a
    * corpus's fixture root — every version bump (or sketch-precision
    * change) orphans the predecessor's whole tree, which on a
    * long-lived deployment is dead disk forever. A dir is superseded
    * iff its name parses as `<family>_v<digits>[...]` for a family the
    * catalog KNOWS and the full name is not current — parameter-keyed
    * caches (`kmeans_*`) and fixture outputs never match a known
    * family and are never touched; both knn radii are current by
    * design. Dry-run by default: returns (superseded, crashed-stage
    * warnings); `apply = true` deletes the superseded trees.
    * Crashed-stage leftovers (`.append_stage_*` / `.forget_stage_*`
    * inside CURRENT layouts) are REPORTED, never deleted — each is a
    * refuse-loudly marker whose delete-to-retry decision belongs to
    * the operator who owns the tag.
    */
  def gcLayouts(sfDir: String,
      apply: Boolean = false): (Seq[String], Seq[String]) = {
    val root = java.nio.file.Paths.get(graft.GraftSession.fixtureRoot(sfDir))
    if (!java.nio.file.Files.isDirectory(root)) return (Nil, Nil)
    val current = currentLayoutNames
    // family = the name up to its version suffix ("emb_by_bucket_v2"
    // → "emb_by_bucket", "knn_v4_r1" → "knn")
    val families = current.map(_.replaceAll("_v\\d.*$", ""))
    val versioned = """^([a-z_]+?)_v\d.*$""".r
    val dirs = {
      val l = java.nio.file.Files.list(root)
      try {
        val b = Seq.newBuilder[java.nio.file.Path]
        l.forEach(p => if (java.nio.file.Files.isDirectory(p)) b += p)
        b.result()
      } finally l.close()
    }
    val superseded = dirs.filter { p =>
      p.getFileName.toString match {
        case versioned(family) =>
          families.contains(family) && !current.contains(p.getFileName.toString)
        case _ => false
      }
    }
    val crashedStages = dirs
      .filter(p => current.contains(p.getFileName.toString))
      .flatMap { p =>
        val l = java.nio.file.Files.list(p)
        try {
          val b = Seq.newBuilder[String]
          l.forEach { c =>
            val n = c.getFileName.toString
            if (n.startsWith(".append_stage_") || n.startsWith(".forget_stage_"))
              b += c.toString
          }
          b.result()
        } finally l.close()
      }
    if (apply) superseded.foreach(graft.GraftSession.deleteRec)
    (superseded.map(_.toString), crashedStages)
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
