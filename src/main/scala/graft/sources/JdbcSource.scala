package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.omm.CancellationPipeline.OmmTables

/** S1: JDBC loaders for the OMM source databases (≙ the reference's
  * DriverManager connection + PreparedStatement, OmmConnector.java:34–37,
  * 72–83).
  *
  * Spark-first stance: read each table through the JDBC source and let the
  * engine do the joins natively (broadcast for the small EAV dims), instead
  * of shipping one 11-table SQL string for the database to execute. Filters
  * on key/timestamp columns still push down to the database through the
  * JDBC source (Catalyst pushdown), so the DB only streams the relevant
  * rows. `partitionColumn` options can be layered per table for parallel
  * extraction at cluster scale.
  *
  * The fixture-backed tests use the parquet loaders (CancellationPipeline
  * .loadTables); this path carries the same schema contract.
  */
object JdbcSource {

  def table(spark: SparkSession, url: String, dbtable: String,
            options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .options(options)
      .load()

  /** The 11 OMM relations from their two catalogs
    * (cancellations_current_future.sql:20–30). */
  def loadTables(spark: SparkSession, url: String,
                 options: Map[String, String] = Map.empty): OmmTables =
    OmmTables(
      dc = table(spark, url, "OMM_Community.dbo.deviation_cases", options),
      ad = table(spark, url, "OMM_Community.dbo.affected_departures", options),
      blm = table(spark, url, "OMM_Community.dbo.bulletin_localized_messages", options),
      b = table(spark, url, "OMM_Community.dbo.bulletins", options),
      dvj = table(spark, url, "ptDOI4_Community.dbo.DatedVehicleJourney", options),
      vj = table(spark, url, "ptDOI4_Community.dbo.VehicleJourney", options),
      vjt = table(spark, url, "ptDOI4_Community.dbo.VehicleJourneyTemplate", options),
      kvv = table(spark, url, "ptDOI4_Community.T.KeyVariantValue", options),
      kvt = table(spark, url, "ptDOI4_Community.dbo.KeyVariantType", options),
      kt = table(spark, url, "ptDOI4_Community.dbo.KeyType", options),
      ot = table(spark, url, "ptDOI4_Community.dbo.ObjectType", options))
}
