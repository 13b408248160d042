package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor directory. Reads are
  * plain `spark.read.parquet` so Catalyst's parquet source gives us column
  * pruning + predicate pushdown for free (SURVEY.md §4). At cluster scale the
  * same loaders work against a directory of many files / a partitioned layout —
  * nothing here assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across driver-generated
    * fixture generations: TIMESTAMP(NANOS) (which Spark's reader rejects
    * unless read as long via the legacy conf), TIMESTAMP(MICROS) without
    * isAdjustedToUTC (read as TIMESTAMP_NTZ), or a plain UTC timestamp.
    * Normalize all three to session-local TimestampType so every downstream
    * query sees one stable type. Under the project-wide
    * `spark.sql.session.timeZone=UTC` the NTZ→TZ cast is wall-clock
    * preserving, matching how DuckDB (the oracle) reads the same column. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos read as long; truncate toward zero like DuckDB
        raw.withColumn("ts",
          timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
