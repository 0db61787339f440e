package graft.tools
/** Dev utility: cross-checks the JVM .npy reader/writer against files
  * produced/consumed by real NumPy (driver-side python). */
object NpyCross {
  def main(args: Array[String]): Unit = {
    Seq("strs", "ints", "flts").foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"/tmp/npy_cross/$f.npy"))
      println(s"$f -> ${graft.sources.Npy.parse(bytes)}")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/npy_cross/jvm_strs.npy"),
      graft.sources.Npy.render(graft.sources.Npy.StrArr(Seq("hello", "wo", "rld_long"))))
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/npy_cross/jvm_ints.npy"),
      graft.sources.Npy.render(graft.sources.Npy.LongArr(Seq(7L, -9L))))
    println("rendered jvm_*.npy")
  }
}
