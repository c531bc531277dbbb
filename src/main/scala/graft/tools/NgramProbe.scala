package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf probe for the ngram-jaccard pipeline phases. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val grams = graft.queries.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        when(size(col("w")) < 3, array().cast("array<string>"))
          .otherwise(array_distinct(transform(
            sequence(lit(1), size(col("w")) - 2),
            (i: Column) => concat_ws(" ",
              element_at(col("w"), i),
              element_at(col("w"), i + 1),
              element_at(col("w"), i + 2))))).as("grams"))
      .where(size(col("grams")) > 0)
    time("grams.count warm") { grams.count() }
    time("grams.count again") { grams.count() }
    val inv = grams.select(col("doc_id"), explode(col("grams")).as("g")).localCheckpoint()
    time("inv checkpoint+count") { inv.count() }
    val shared = inv.as("x").join(inv.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    time("shared.count") { shared.count() }
    val full = graft.queries.DedupQueries.ngramJaccardPairs(spark, sfDir)
    time("full query") { full.count() }
    spark.stop()
  }
}
