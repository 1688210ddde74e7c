package graft

import graft.etl.Cleaning
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class CleaningSpec extends SparkSpec {

  /** Small accidents-like frame with the dirt the reference cleans:
    * nulls, NaNs, empty strings, invalid severities, missing coords. */
  private lazy val raw = {
    val rows = Seq(
      Row("A-1", 2, Timestamp.valueOf("2022-06-01 08:30:00"), 34.1, -118.2, 1.5,
        "LA", "CA", 70.0, 40.0, 10.0, 5.0, "Clear", true, false, true, false, "Day"),
      Row("A-2", 3, Timestamp.valueOf("2022-06-02 17:10:00"), 36.2, -115.1, 0.3,
        "", "NV", Double.NaN, null, 8.0, null, null, false, true, false, true, "Night"),
      Row("A-3", 9, Timestamp.valueOf("2022-06-03 02:00:00"), 40.7, -74.0, 0.1,
        "NYC", "NY", 60.0, 55.0, 9.0, 3.0, "Rain", true, true, false, false, "Night"),
      Row("A-4", 1, Timestamp.valueOf("2022-12-24 23:59:00"), null, -96.8, 2.0,
        "Dallas", "TX", 80.0, 30.0, 7.0, 12.0, "Fair", false, false, false, false, "Day"),
      Row("A-5", 4, Timestamp.valueOf("2022-07-15 12:00:00"), 47.6, -122.3, 0.8,
        "Seattle", "WA", 65.0, 70.0, 10.0, 8.0, "Cloudy", true, false, true, true, "Day"))
    val schema = org.apache.spark.sql.types.StructType(
      Cleaning.accidentsSchema.filter(f => Seq("ID", "Severity", "Start_Time",
        "Start_Lat", "Start_Lng", "Distance_mi", "City", "State",
        "Temperature_F", "Humidity_Percent", "Visibility_mi", "Wind_Speed_mph",
        "Weather_Condition", "Amenity", "Crossing", "Junction",
        "Traffic_Signal", "Sunrise_Sunset").contains(f.name))
        .map(_.copy(nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(reorder(_, schema.fieldNames))), schema)
  }

  // rows above are authored in a fixed order; align to schema field order
  private def reorder(r: Row, names: Array[String]): Row = {
    val byAuthoredOrder = Seq("ID", "Severity", "Start_Time", "Start_Lat",
      "Start_Lng", "Distance_mi", "City", "State", "Temperature_F",
      "Humidity_Percent", "Visibility_mi", "Wind_Speed_mph",
      "Weather_Condition", "Amenity", "Crossing", "Junction",
      "Traffic_Signal", "Sunrise_Sunset").zipWithIndex.toMap
    Row.fromSeq(names.toSeq.map(n => r.get(byAuthoredOrder(n))))
  }

  test("cleanAccidents yields the canonical schema with no dirty values") {
    val cleaned = Cleaning.cleanAccidents(raw)
    assert(cleaned.columns.toSeq === Cleaning.cleanedColumns)
    // invalid severity (9) and missing-coordinate rows are dropped
    assert(cleaned.count() === 3)
    // numeric features: no nulls/NaNs after imputation
    Seq("Temperature_F", "Humidity_Percent", "Visibility_mi", "Wind_Speed_mph")
      .foreach { c =>
        assert(cleaned.filter(col(c).isNull || isnan(col(c))).count() === 0, c)
      }
    // strings: empty/null → Unknown
    val a2 = cleaned.filter(col("ID") === "A-2").head
    assert(a2.getAs[String]("City") === "Unknown")
    assert(a2.getAs[String]("Weather_Condition") === "Unknown")
    // POI flags are 0/1 ints
    Seq("Amenity", "Crossing", "Junction", "Traffic_Signal").foreach { c =>
      val vs = cleaned.select(col(c)).collect().map(_.getInt(0)).toSet
      assert(vs.subsetOf(Set(0, 1)), c)
    }
    // temporal features in range, Start_Time dropped
    assert(!cleaned.columns.contains("Start_Time"))
    val hr = cleaned.select("Hour").collect().map(_.getInt(0))
    assert(hr.forall(h => h >= 0 && h <= 23))
  }

  test("imputeMedian computes all medians in one pass and repairs NaN") {
    import spark.implicits._
    val df = Seq((1.0, 10.0), (Double.NaN, 20.0), (3.0, 30.0))
      .toDF("x", "y")
    val fixed = Cleaning.imputeMedian(df, Seq("x", "y", "absent"), 0.001)
    assert(fixed.filter(isnan(col("x"))).count() === 0)
    val xs = fixed.select("x").collect().map(_.getDouble(0)).sorted
    // NaN replaced by the median of {1,3} — GK may return either bound
    assert(xs(0) === 1.0 && xs(2) === 3.0 && (xs(1) === 1.0 || xs(1) === 3.0))
  }

  test("severityDistribution groups and orders") {
    val dist = Cleaning.severityDistribution(Cleaning.cleanAccidents(raw)).collect()
    assert(dist.map(_.getInt(0)).toSeq === dist.map(_.getInt(0)).sorted.toSeq)
    assert(dist.map(_.getLong(1)).sum === 3)
  }
}
