package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (ArrayType(FloatType), dim 64).
  *
  * - exact threshold pairs and brute-force top-k via a codegen'd
  *   higher-order dot product (`aggregate`/`zip_with`) — the correctness
  *   baseline, quadratic candidate set;
  * - random-hyperplane LSH buckets + in-bucket rerank — the scale path
  *   (candidate set shrinks by the bucket factor; at 100 TB you'd also
  *   bucket-partition the build side and broadcast the query side).
  *
  * Oracle parity: cosine is float math folded left-to-right in Spark vs
  * arbitrary order in DuckDB's SUM — outputs round to 4 decimals and
  * thresholds sit far from any data point (see check for distribution),
  * making boundary flips vanishingly unlikely.
  */
object SimilarityQueries {

  /** embedding normalized to unit length once, as double array. */
  private def normalized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), (x: Column) => x.cast("double")).as("v"))
      .select(col("vec_id"), col("v"),
        sqrt(aggregate(col("v"), lit(0.0), (acc: Column, x: Column) => acc + x * x)).as("norm"))
      .select(col("vec_id"),
        transform(col("v"), (x: Column) => x / col("norm")).as("u"))

  /** Codegen'd primitive-loop dot product (custom Catalyst expression,
    * see [[graft.functions.DotProduct]]); left-to-right accumulation
    * matches the oracle's list_sum fold bit-for-bit.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot(a, b)

  /** All pairs with cosine >= 0.4 (far above the 99.9th pct of the
    * pair distribution, far below none — a selective exact query).
    */
  def cosinePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val n = normalized(spark, sfDir)
    val a = n.toDF("a", "ua")
    val b = n.toDF("b", "ub")
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), dot(col("ua"), col("ub")).as("cos"))
      .where(col("cos") >= 0.4)
      .select(col("a"), col("b"), round(col("cos"), 4).as("cos4"))
      .orderBy("a", "b")
  }

  val cosinePairsOracle: String = """
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::double) AS v,
         sqrt(list_sum(list_transform(embedding, x -> (x::double) * (x::double)))) AS nrm
  FROM embeddings
),
u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM n),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_sum(list_transform(range(1, len(a.u) + 1), i -> a.u[i] * b.u[i])) AS cos
  FROM u a JOIN u b ON a.vec_id < b.vec_id
)
SELECT a, b, round(cos, 4) AS cos4 FROM pairs WHERE cos >= 0.4 ORDER BY a, b
"""

  /** Brute-force top-5 cosine neighbors for every 50th vector. */
  def topkBruteForce(spark: SparkSession, sfDir: String): DataFrame = {
    val n = normalized(spark, sfDir)
    val q = n.toDF("query_id", "uq").where(col("query_id") % 50 === 0)
    val c = n.toDF("neighbor_id", "uc")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              dot(col("uq"), col("uc")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("cos"), 4).as("cos4"))
      .orderBy("query_id", "rank")
  }

  val topkOracle: String = """
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::double) AS v,
         sqrt(list_sum(list_transform(embedding, x -> (x::double) * (x::double)))) AS nrm
  FROM embeddings
),
u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM n),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(q.u) + 1), i -> q.u[i] * c.u[i])) AS cos
  FROM u q JOIN u c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos4
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""

  /** ANN via random-hyperplane LSH: 8 seeded hyperplanes → 8-bit bucket;
    * top-3 exact rerank within the query's bucket. Candidates shrink
    * ~256× vs brute force; recall is checked in the test suite against
    * [[topkBruteForce]]. No SQL oracle (rows-only check) — the bucketing
    * is the point, not reproducible ANSI SQL.
    */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = 64
    val nPlanes = 8
    val rnd = new scala.util.Random(42)
    val planes: Array[Array[Double]] =
      Array.fill(nPlanes, dim)(rnd.nextGaussian())
    val n = normalized(spark, sfDir)
    val bucketBits = (0 until nPlanes).map { h =>
      val plane = array(planes(h).map(lit): _*)
      when(dot(col("u"), plane) >= 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = n.withColumn("bucket", bucketBits)
    val q = bucketed.toDF("query_id", "uq", "bucket").where(col("query_id") % 50 === 0)
    val c = bucketed.toDF("neighbor_id", "uc", "bucket")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              dot(col("uq"), col("uc")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("cos"), 4).as("cos4"))
      .orderBy("query_id", "rank")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_pairs" -> (cosinePairs _),
    "sim_topk_bruteforce" -> (topkBruteForce _),
    "sim_ann_lsh" -> (annLsh _),
  )

  val oracles: Map[String, String] = Map(
    "sim_cosine_pairs" -> cosinePairsOracle,
    "sim_topk_bruteforce" -> topkOracle,
    // sim_ann_lsh: rows-only (seeded hyperplanes not reproducible in SQL)
  )
}
