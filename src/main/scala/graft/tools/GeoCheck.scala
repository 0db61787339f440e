package graft.tools
import graft.functions.GeoPortable
/** Dev utility: dumps JVM-side transform outputs (raw bits) + the rendered
  * DuckDB SQL so tools/geo_bitcheck.py can assert cross-engine bit equality. */
object GeoCheck {
  def main(args: Array[String]): Unit = {
    val pts = for { i <- 0 until 400 } yield
      (167000.0 + i * 1680.5, 3590000.0 + i * 11321.123, 10 + (i % 8))
    val w = new java.io.PrintWriter("/tmp/geo_sql.txt")
    w.println(GeoPortable.inverseSql("SELECT * FROM pts", "e", "n", "z")); w.close()
    val out = new java.io.PrintWriter("/tmp/geo_jvm.csv")
    out.println("e,n,z,latbits,lonbits,lat,lon")
    pts.foreach { case (e, n, z) =>
      val (lat, lon) = GeoPortable.inverse(e, n, z)
      out.println(s"$e,$n,$z,${java.lang.Double.doubleToLongBits(lat)},${java.lang.Double.doubleToLongBits(lon)},$lat,$lon")
    }
    out.close()
    println("wrote /tmp/geo_jvm.csv and /tmp/geo_sql.txt")
  }
}
object GeoStageDump {
  def main(args: Array[String]): Unit = {
    val (e, n, z) = (args(0).toDouble, args(1).toDouble, args(2).toInt)
    graft.functions.GeoPortable.debugStages(e, n, z).foreach { case (k, v) =>
      println(s"$k,${java.lang.Double.doubleToLongBits(v)},$v")
    }
  }
}
