package graft.transform

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join splitting — the runtime complement to the static
  * salted join (`transform/Skew.scala`): when one join key dominates,
  * AQE splits the oversized partition into subpartitions at runtime
  * with no code changes. Thresholds here are forced tiny so the
  * sf0.001 fixture triggers the same re-plan a hot key triggers at
  * 100 TB; the final plan must carry the `skew=true` marker.
  */
class AqeSkewSpec extends SparkSpec {

  test("a dominant key triggers AQE skew-join splitting") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 50k rows of one hot key vs a uniform dimension
      val facts = spark.range(50000)
        .select(lit(7L).as("k"), col("id").as("payload"))
        .unionByName(spark.range(1000).select(pmod(col("id"), lit(100)).as("k"),
          col("id").as("payload")))
      val dim = spark.range(100).select(col("id").as("k"), lit("d").as("attr"))
      val joined = facts.join(dim, "k").groupBy("attr").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
