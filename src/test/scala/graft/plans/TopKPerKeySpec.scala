package graft.plans

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the custom whole-operator tier end-to-end: semantics equal the
  * window idiom (the q77 oracle re-proves this against DuckDB), and the
  * PLAN is the partial/final bounded-heap pair — one shuffle whose
  * volume is the answer, not the input, and no sort anywhere.
  */
class TopKPerKeySpec extends SparkSpec {

  private def data = spark.range(0, 1000).select(
    (col("id") % 7).as("k"),
    ((col("id") * 37) % 23).as("v"), // heavy ties: tie-break must decide
    col("id").as("tid"))

  private def windowIdiom(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    data.withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("v").desc, col("tid").asc)))
      .where(col("rn") <= k).drop("rn")
  }

  test("exact per-key top-k matches the window idiom under ties") {
    val got = TopKPerKey.topK(data,
      Seq(col("k")), Seq(col("v").desc, col("tid").asc), 5)
    assert(got.collect().map(_.toSeq).toSet
      === windowIdiom(5).collect().map(_.toSeq).toSet)
  }

  test("groups smaller than k emit all their rows") {
    val tiny = spark.range(0, 3).select(lit(0L).as("k"), col("id").as("v"))
    val got = TopKPerKey.topK(tiny, Seq(col("k")), Seq(col("v").desc), 5)
    assert(got.collect().map(_.getLong(1)).sorted.toSeq === Seq(0L, 1L, 2L))
  }

  test("ascending order takes the smallest rows") {
    val got = TopKPerKey.topK(data, Seq(col("k")),
      Seq(col("v").asc, col("tid").asc), 2)
    val exp = {
      import org.apache.spark.sql.expressions.Window
      data.withColumn("rn", row_number().over(
          Window.partitionBy("k").orderBy(col("v").asc, col("tid").asc)))
        .where(col("rn") <= 2).drop("rn")
    }
    assert(got.collect().map(_.toSeq).toSet
      === exp.collect().map(_.toSeq).toSet)
  }

  test("float keys are normalized: -0.0/0.0 and NaN variants share a group") {
    // The NormalizeFloatingNumbers rule only sees Aggregate/Window/Join
    // keys; the custom node must normalize its own or these keys split.
    val rows = spark.range(0, 8).select(
      when(col("id") < 2, lit(-0.0))
        .when(col("id") < 4, lit(0.0))
        .when(col("id") < 6, lit(Double.NaN))
        .otherwise(sqrt(lit(-1.0))) // NaN via arithmetic
        .as("k"),
      col("id").as("v"))
    val got = TopKPerKey.topK(rows, Seq(col("k")), Seq(col("v").desc), 1)
      .collect()
    // two groups only: {±0.0} and {NaN}; top v are 3 (zero) and 7 (NaN)
    assert(got.length === 2, got.map(_.toSeq).mkString(";"))
    assert(got.map(_.getLong(1)).sorted.toSeq === Seq(3L, 7L))
    // and the same with a struct-wrapped float key (nested normalize)
    val nested = TopKPerKey.topK(
      rows.select(struct(col("k")).as("sk"), col("v")),
      Seq(col("sk")), Seq(col("v").desc), 1).collect()
    assert(nested.length === 2, nested.map(_.toSeq).mkString(";"))
  }

  test("past the per-task key bound the operator fails loudly with the " +
       "remedy, not an OOM") {
    spark.conf.set(TopKPerKey.MaxKeysConfKey, "100")
    try {
      val highCard = spark.range(0, 10000).select(
        col("id").as("k"), col("id").as("v")) // 10k distinct keys
      val e = intercept[Exception] {
        TopKPerKey.topK(highCard, Seq(col("k")), Seq(col("v").desc), 2)
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("distinct keys") &&
        m.contains("window idiom")), msgs(e).mkString("|"))
      // and under the bound the same query runs fine
      spark.conf.set(TopKPerKey.MaxKeysConfKey, "1000000")
      assert(TopKPerKey.topK(highCard, Seq(col("k")), Seq(col("v").desc), 2)
        .count() === 10000L)
    } finally spark.conf.unset(TopKPerKey.MaxKeysConfKey)
  }

  test("plan: partial/final heap pair, one shuffle, no sort, no window") {
    // executedPlan, not sparkPlan: EnsureRequirements inserts the
    // exchange only during physical preparation. AQE off so the tree
    // is directly walkable.
    val sc = spark
    sc.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = TopKPerKey.topK(data,
        Seq(col("k")), Seq(col("v").desc, col("tid").asc), 3)
      val plan = df.queryExecution.executedPlan
      val names = plan.collect { case p => p.nodeName }
      assert(names.count(_ == "TopKPerKeyPartial") === 1, names)
      assert(names.count(_ == "TopKPerKeyFinal") === 1, names)
      assert(plan.collect { case s: SortExec => s }.isEmpty, names)
      assert(names.count(_.contains("Window")) === 0, names)
      assert(plan.collect { case e: ShuffleExchangeExec => e }.size === 1, names)
    } finally sc.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("the shuffle moves at most k rows per key per map partition") {
    val sc = spark
    sc.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 4 input partitions x 1 key x k=3 -> at most 12 shuffled rows
      // (vs 1000 for the window idiom).
      val skew = spark.range(0, 1000, 1, 4)
        .select(lit(0L).as("k"), col("id").as("v"))
      val df = TopKPerKey.topK(skew, Seq(col("k")), Seq(col("v").desc), 3)
      assert(df.collect().map(_.getLong(1)).sorted.toSeq
        === Seq(997L, 998L, 999L))
      val ex = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(ex.size === 1)
      val written = ex.head.metrics("shuffleRecordsWritten").value
      assert(written <= 12L, s"partial failed to bound the shuffle: $written")
    } finally sc.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
