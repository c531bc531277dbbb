package graft.functions

import graft.SparkSpec

/** Custom expression surface: Column API, SQL registration, codegen vs
  * interpreted agreement, null and type-error behavior.
  */
class FunctionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 32.0)
  }

  test("Column API dot matches interpreted aggregate/zip_with fold") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(0.5, -1.25, 3.0), Array(2.0, 4.0, -0.125)))
      .toDF("a", "b")
    val custom = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    val builtin = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).collect()(0).getDouble(0)
    assert(custom === builtin)
  }

  test("TrigramHashes matches xxhash64 of the HOF-built trigram strings") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("a b c d e", "x y", "p q r p q r p q r", "")
      .toDF("text").select(split(col("text"), " ").as("w"))
    val custom = df.select(TrigramHashes(col("w")).as("g"))
      .as[Seq[Long]].collect().map(_.toSet)
    val viaHof = df.select(
      when(size(col("w")) < 3, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2)))))
        .as("gs"))
      .select(transform(col("gs"), g => xxhash64(g)).as("h"))
      .as[Seq[Long]].collect().map(_.toSet)
    assert(custom === viaHof)
    assert(custom(0).size === 3 && custom(1).isEmpty && custom(2).size === 3)
    // SQL registration path
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_trigram_hashes(array('a','b','c','d')) AS g")
      .as[Seq[Long]].collect()(0)
    // 'a b c d' has 2 trigram windows, both also present in 'a b c d e'
    assert(viaSql.length === 2)
    assert(viaSql.toSet.subsetOf(custom(0)))
  }

  test("null input propagates to null; mismatched types rejected at analysis") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1.0), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
    val bad = Seq((Array(1.0), "x")).toDF("a", "b")
    intercept[Exception] {
      bad.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    }
  }
}
