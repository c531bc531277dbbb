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
