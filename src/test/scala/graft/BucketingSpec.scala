package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, functions => F}

/** Bucketed co-located join (SURVEY §4 / R22 "access paths"): two tables
  * bucketed on the join key join WITHOUT a shuffle exchange — the physical
  * layout replaces the reference's B-tree indexes for repeated large-scale
  * joins. */
class BucketingSpec extends SparkSpec {

  it("pre-bucketed tables join with no Exchange on the bucketed key") {
    import spark.implicits._
    // clean both catalog entries and any stale managed-table dirs
    Seq("b_users", "b_events").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }

    val users = (1L to 1000L).map(i => (i, s"u$i")).toDF("user_id", "name")
    val events = (1L to 5000L).map(i => (i % 1000 + 1, i.toDouble)).toDF("user_id", "value")

    users.write.mode(SaveMode.Overwrite)
      .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("b_users")
    events.write.mode(SaveMode.Overwrite)
      .bucketBy(8, "user_id").saveAsTable("b_events")

    // Force the sort-merge path (tiny test tables would auto-broadcast;
    // at scale both sides are large and SMJ is what bucketing accelerates).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_events").join(spark.table("b_users"), "user_id")
        .groupBy("name").agg(F.sum("value").as("total"))
      joined.collect().length shouldBe 1000

      val plan = joined.queryExecution.executedPlan.toString
      // The join must not shuffle either side: bucket layout co-locates both
      // inputs. (The aggregation's exchange is on `name`, not user_id.)
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning(user_id"
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS b_users")
    spark.sql("DROP TABLE IF EXISTS b_events")
  }
}
