package graft.operators

import graft.SparkSpec

/** Bucketing for co-located joins: two tables bucketed by the join key
  * into the same bucket count join WITHOUT a shuffle exchange — the
  * plan-level proof of the pre-partitioning strategy SCALE.md
  * prescribes for repeated large-table joins.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed by the key runs without an Exchange") {
    val s = spark
    import s.implicits._
    val dbDir = java.nio.file.Files.createTempDirectory("graft_bucketdb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_buckets LOCATION '$dbDir'")
    try {
      (1 to 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "v")
        .write.bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_buckets.t_left")
      (1 to 2000).map(i => (i.toLong % 500, s"s$i")).toDF("k", "w")
        .write.bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_buckets.t_right")

      // disable broadcast so the join must pick a shuffle-or-bucketed plan
      withSql("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = spark.table("graft_buckets.t_left")
          .join(spark.table("graft_buckets.t_right"), "k")
        val physical = joined.queryExecution.executedPlan.toString
        assert(!physical.contains("Exchange"),
          s"bucketed join should not shuffle:\n$physical")
        // and it is still correct
        val n = joined.count()
        assert(n === 10000L * 4) // each k has 20 left x 4 right rows / 500 keys
      }
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_buckets CASCADE")
    }
  }

  private def withSql[T](kvs: (String, String)*)(f: => T): T = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
