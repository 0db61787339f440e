package graft

import org.apache.spark.sql.functions._

import graft.functions.GeoPortable
import graft.plans.{GeoFunctions, UtmToWgs84Lat, UtmToWgs84Lon}

/** The native utm_lat/utm_lon expressions are the third backend of the
  * GeoPortable DAG — these tests pin bit-identity across all execution
  * modes and that the flagship projection stays inside codegen. */
class GeoExprSpec extends SparkSpec {

  test("codegen path is bit-identical to the interpreted DAG") {
    GeoFunctions.register(spark)
    import spark.implicits._
    val pts = (0 until 500).map(i => (167000.0 + i * 1680.5, 3590000.0 + i * 1321.25, 10 + i % 8))
    val out = pts.toDF("e", "n", "z")
      .selectExpr("e", "n", "z", "utm_lat(e, n, z) AS lat", "utm_lon(e, n, z) AS lon")
      .collect()
    out.foreach { r =>
      val (lat, lon) = GeoPortable.inverse(r.getDouble(0), r.getDouble(1), r.getInt(2))
      assert(java.lang.Double.doubleToLongBits(lat) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), r)
      assert(java.lang.Double.doubleToLongBits(lon) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)), r)
    }
  }

  test("interpreted eval (no codegen) matches too") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val lat = UtmToWgs84Lat(Literal(450000.0), Literal(3650000.0), Literal(16))
      .eval(null).asInstanceOf[Double]
    val lon = UtmToWgs84Lon(Literal(450000.0), Literal(3650000.0), Literal(16))
      .eval(null).asInstanceOf[Double]
    val (elat, elon) = GeoPortable.inverse(450000.0, 3650000.0, 16)
    assert(java.lang.Double.doubleToLongBits(lat) == java.lang.Double.doubleToLongBits(elat))
    assert(java.lang.Double.doubleToLongBits(lon) == java.lang.Double.doubleToLongBits(elon))
  }

  test("geodesy projection runs inside a WholeStageCodegen span") {
    GeoFunctions.register(spark)
    val df = spark.read.parquet(s"$sf0001/nation.parquet")
      .select((col("n_nationkey") * 5000 + 300000).cast("double").as("e"),
        lit(3650000.0).as("n"))
      .selectExpr("utm_lat(e, n, 16) AS lat")
      .filter(col("lat") > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    assert(df.count() == 25)
  }

  test("generated Java compiles under CODEGEN_ONLY (no silent fallback)") {
    // plan strings cannot reveal a runtime Janino fallback; forcing
    // factoryMode=CODEGEN_ONLY makes a compile failure throw instead.
    // Four stacked calls in one projection mirrors d4_image_chars' shape.
    GeoFunctions.register(spark)
    withConf("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      import spark.implicits._
      val out = Seq((300000.0, 3600000.0, 305000.0, 3595000.0))
        .toDF("e1", "n1", "e2", "n2")
        .selectExpr(
          "utm_lat(e1, n1, 16) AS a", "utm_lon(e1, n1, 16) AS b",
          "utm_lat(e2, n2, 16) AS c", "utm_lon(e2, n2, 16) AS d")
        .collect().head
      val (lat1, lon1) = GeoPortable.inverse(300000.0, 3600000.0, 16)
      assert(out.getDouble(0) == lat1 && out.getDouble(1) == lon1)
    }
  }

  test("udf path and native path agree bit-for-bit") {
    import spark.implicits._
    GeoFunctions.register(spark)
    val df = (0 until 100).map(i => (300000.0 + i * 997.25, 3600000.0 + i * 499.5))
      .toDF("e", "n")
    val viaUdf = df.withColumn("ll", GeoPortable.wgs84FromUtm(col("e"), col("n"), lit(16)))
      .select(col("e"), col("ll._1").as("lat"), col("ll._2").as("lon"))
    val viaExpr = df.selectExpr("e", "utm_lat(e, n, 16) AS lat", "utm_lon(e, n, 16) AS lon")
    assert(viaExpr.exceptAll(viaUdf).count() == 0 && viaUdf.exceptAll(viaExpr).count() == 0)
  }
}
