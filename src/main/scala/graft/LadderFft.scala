package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{CArr, ComplexFft, GArr}

/** Size ladder for the round-9c transform tier: times the distributed
  * four-step FFT, the batched block-local fftAxis, the sliding-window +
  * reduce composition, and fftConvolve at growing element counts
  * (arrays GENERATED grid-parallel, so the ladder measures the operators,
  * not an IO scan). `runMain graft.LadderFft [out.json]` — one JSON line +
  * file, same artifact protocol as Bench.
  */
object LadderFft {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("bench/ladder_r9c_fft.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.getOrCreate(cpus)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timeIt(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      results += label -> dt
      System.err.println(f"[ladder] $label $dt%.2f s")
      spark.catalog.clearCache()
    }
    for (lg <- Seq(20, 22, 24)) {
      val n = 1L << lg
      val sig = GArr.fromFunction(spark, Seq(n), Seq(1 << 16))(
        g => ((g(0) * 1103515245L + 12345) % 97).toDouble)
      timeIt(s"fft1d_2e$lg")(ComplexFft.fft1dC(CArr.fromReal(sig)))
      timeIt(s"slide32_sum_2e$lg")(sig.slidingWindowAxis(0, 32).sumAxis(1).blockSums)
      val rows = n / 4096
      val mat = GArr.fromFunction(spark, Seq(rows, 4096L), Seq(64, 4096))(
        g => ((g(0) * 31 + g(1)) % 13).toDouble)
      timeIt(s"fftaxis_${rows}x4096")(ComplexFft.fftArr(mat, 1).reArr.blockSums)
      val kernel = GArr.fromFunction(spark, Seq(4096L), Seq(4096))(
        g => (g(0) % 7).toDouble)
      timeIt(s"fftconvolve_2e${lg}_x4096")(
        ComplexFft.fftConvolve(sig, kernel).blockSums)
    }
    val json = results.map { case (k, v) => s""""$k":$v""" }
      .mkString("""{"metric":"ladder_r9c_fft","unit":"sec","timings":{""", ",", "}}")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    spark.stop()
  }
}
