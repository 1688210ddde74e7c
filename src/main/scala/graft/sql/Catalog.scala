package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** SQL catalog surface (SURVEY.md §2.1 S8-S9, §3 "SQL entry"): the role of
  * hive/create_tables.hql re-expressed against the Spark catalog, so plain
  * `spark.sql("SELECT ...")` works over raw and derived tables without a
  * Hive metastore.
  */
object Catalog {

  /** S8: external table over CSV files (create_tables.hql:15-66's
    * `CREATE EXTERNAL TABLE ... ROW FORMAT DELIMITED` equivalent). */
  def createExternalCsv(spark: SparkSession, name: String, path: String,
                        schema: StructType, header: Boolean = true): Unit = {
    val ddlSchema = schema.toDDL
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name ($ddlSchema)
         |USING csv OPTIONS (header '$header', path '$path')""".stripMargin)
    ()
  }

  /** S9: managed columnar table with snappy (ORC in the reference,
    * create_tables.hql:71-100; parquet offered too — same API shape). */
  def saveAsManagedTable(df: DataFrame, name: String,
                         format: String = "orc"): Unit =
    df.write.format(format).option("compression", "snappy")
      .mode("overwrite").saveAsTable(name)

  /** Register all TESTDATA tables plus derived views; returns table names.
    * (Temp-view flavor of the warehouse — zero metastore dependency.) */
  def registerTestdata(spark: SparkSession, sfDir: String): Seq[String] = {
    graft.sources.Tables.registerAll(spark, sfDir)
    graft.sources.Tables.names
  }
}
