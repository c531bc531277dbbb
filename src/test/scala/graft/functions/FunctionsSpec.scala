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

  test("PqAssign codegen matches interpreted eval and a Scala reference") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // Deterministic pseudo-codes in [-127, 127].
    val codes = Array.tabulate(64)(i => ((i * 37 + 11) % 255 - 127).toLong)
    def cb(sub: Int, c: Int, j: Int): Long =
      ((131 * sub + 37 * c + 11 * j) % 256) - 128
    val expected = (0 until 8).map { sub =>
      val (d, c) = (0 until 4).map { c =>
        ((0 until 8).map { j =>
          val t = codes(sub * 8 + j) - cb(sub, c, j); t * t
        }.sum, c)
      }.minBy { case (d, c) => (d, c) }
      d * 4 + c
    }
    val df = Seq(Tuple1(codes)).toDF("q")
    val viaColumn = df.select(PqAssign(col("q")).as("a"))
      .as[Seq[Long]].collect()(0)
    assert(viaColumn == expected, "codegen path diverges from reference")
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("pq_probe")
    val viaSql = spark.sql("SELECT graft_pq_assign(q) FROM pq_probe")
      .as[Seq[Long]].collect()(0)
    assert(viaSql == expected, "SQL registration path diverges")
    // Interpreted path (eval): force by calling nullSafeEval directly.
    val interp = graft.functions.PqAssign(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        codes.toSeq, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == expected, "interpreted eval diverges")
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

  test("FnvFold matches AuditSink.rowHash in codegen, interpreted, and SQL") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val rows = Seq((7L, 1234567890123L), (42L, 987654321L),
      (-5L, 0L), (Long.MaxValue, Long.MinValue))
    val df = rows.toDF("a", "b")
    val expected = rows.map { case (a, b) =>
      graft.sources.AuditSink.rowHash(Seq(a, b)) }
    // Column API (whole-stage codegen path)
    assert(df.select(FnvFold.fnvFold(col("a"), col("b"))).collect()
      .map(_.getLong(0)).toSeq === expected)
    // SQL registration
    df.createOrReplaceTempView("fnv_t")
    assert(spark.sql("SELECT graft_fnv_fold(a, b) FROM fnv_t").collect()
      .map(_.getLong(0)).toSeq === expected)
    // interpreted eval agrees with codegen
    val e = FnvFold(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(7L),
      org.apache.spark.sql.catalyst.expressions.Literal(1234567890123L)))
    assert(e.eval(null) === expected.head)
    // bit_xor fold over row hashes = the manifest checksum contract
    val folded = df.select(FnvFold.fnvFold(col("a"), col("b")).as("h"))
      .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    assert(folded === expected.reduce(_ ^ _))
    // null propagates
    val withNull = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
    assert(withNull.select(FnvFold.fnvFold(col("a"), col("b")))
      .collect()(0).isNullAt(0))
  }

  test("FnvFold survives a VERY wide argument list (split codegen, " +
       "ADVICE r9: no 64KB method blowup, values exact)") {
    val s = spark
    import org.apache.spark.sql.functions._
    val n = 500
    val df = s.range(0, 100).toDF("id")
    val args = (0 until n).map(i => (col("id") * (i + 1)).cast("long"))
    val got = df.select(FnvFold.fnvFold(args: _*).as("h"))
      .collect().map(_.getLong(0))
    val expected = (0L until 100L).map { id =>
      graft.sources.AuditSink.rowHash((0 until n).map(i => id * (i + 1))) }
    assert(got.toSeq === expected)
    // and the interpreted path agrees at the same arity
    val e = FnvFold((0 until n).map(i =>
      org.apache.spark.sql.catalyst.expressions.Literal(3L * (i + 1))))
    assert(e.eval(null) ===
      graft.sources.AuditSink.rowHash((0 until n).map(i => 3L * (i + 1))))
  }
}
