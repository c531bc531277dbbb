package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-provided TPC-H-ish testdata
  * (/root/repo/TESTDATA.md). Column pruning + predicate pushdown reach
  * the scan automatically because every query selects through these.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** The testdata generator has shipped `events.ts` two different ways
    * across rounds: parquet TIMESTAMP(NANOS) (Spark 4 rejects it unless
    * read as a nanosecond long) and plain timestamp[us] (Spark infers
    * TIMESTAMP_NTZ). Normalize BOTH to a session-timezone TIMESTAMP so
    * every downstream query sees one stable type. Works on batch and
    * streaming frames alike — the branch is schema-only.
    *
    * The NTZ→TIMESTAMP cast reinterprets the wall-clock value in the
    * session timezone, and the DuckDB oracle compares in UTC, so the
    * session timezone is PINNED to UTC here (not just assumed): a
    * non-UTC session would silently shift every event by the zone
    * offset. The nanos path is lossless: the generator emits µs-aligned
    * values (ns % 1000 == 0 for every row).
    */
  def normalizeTs(s: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        s.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => sys.error(
        s"events.ts: unexpected type $other — testdata regenerated with a " +
        "new schema? Extend graft.queries.Tables.normalizeTs for it.")
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    // No-op unless the file is TIMESTAMP(NANOS); required to read it then.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s, apply(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Schema-drift guard: assert the expected column -> type map for every
    * table, with an error that NAMES the table and column. The round-4
    * testdata regeneration (events.ts TIMESTAMP(NANOS) -> timestamp[us])
    * silently broke 35 queries with one opaque analysis error each; this
    * turns the next drift into a single loud diagnosis at session setup.
    * `events.ts` accepts the three shapes normalizeTs handles.
    */
  def check(s: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.types._
    val expected: Map[String, Map[String, Set[DataType]]] = Map(
      "region" -> Map("r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
      "nation" -> Map("n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
        "n_regionkey" -> Set(IntegerType)),
      "customer" -> Map("c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
        "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
        "c_mktsegment" -> Set(StringType)),
      "supplier" -> Map("s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
        "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
      "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
        "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
        "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
      "orders" -> Map("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
        "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
        "o_orderdate" -> Set(TimestampType, TimestampNTZType, DateType),
        "o_orderpriority" -> Set(StringType)),
      "lineitem" -> Map("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
        "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
        "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
        "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
        "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
        "l_shipdate" -> Set(TimestampType, TimestampNTZType, DateType)),
      "events" -> Map("event_id" -> Set(LongType),
        "ts" -> Set(LongType, TimestampType, TimestampNTZType),
        "user_id" -> Set(LongType), "event_type" -> Set(StringType),
        "value" -> Set(DoubleType), "props" -> Set(StringType)),
      "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
        "lang" -> Set(StringType), "source" -> Set(StringType),
        "n_chars" -> Set(LongType)),
      "embeddings" -> Map("vec_id" -> Set(LongType),
        "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
        "label" -> Set(IntegerType)))
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val actual = apply(s, d, table).schema
        .map(f => f.name -> f.dataType).toMap
      cols.toSeq.sortBy(_._1).flatMap { case (cName, ok) =>
        actual.get(cName) match {
          case None => Some(s"$table.$cName: MISSING (have ${actual.keys.toSeq.sorted.mkString(", ")})")
          case Some(t) if !ok.contains(t) =>
            Some(s"$table.$cName: got $t, expected one of ${ok.mkString("/")}")
          case _ => None
        }
      }
    }
    require(drift.isEmpty,
      s"testdata schema drift under $d — regenerate-aware code paths need " +
      s"updating (see Tables.normalizeTs):\n  ${drift.mkString("\n  ")}")
  }
}
