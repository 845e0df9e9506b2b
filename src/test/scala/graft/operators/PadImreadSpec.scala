package graft.operators

import graft.SparkTestBase
import graft.sources.Images

/** numpy `pad` mode completeness (wrap/symmetric/linear_ramp/stat modes +
  * the multi-axis dispatcher) and `dask.array.image.imread` over a BMP
  * stack written by this repo's own byte-level encoder.
  */
class PadImreadSpec extends SparkTestBase {

  private def arr1d(vals: Seq[Double], chunk: Int): GArr = {
    val v = vals.toArray
    GArr.fromFunction(spark, Seq(v.length.toLong), Seq(chunk))(g => v(g(0).toInt))
  }

  private def values1d(a: GArr): Seq[Double] =
    a.toIndexedDF.collect().sortBy(_.getLong(0)).map(_.getDouble(1)).toSeq

  private def cells(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("pad wrap / symmetric on a multi-chunk 1-D array") {
    val a = arr1d(Seq(1, 2, 3, 4, 5).map(_.toDouble), 2)
    assert(values1d(a.padWrapAxis(0, 2, 3)) ==
      Seq(4, 5, 1, 2, 3, 4, 5, 1, 2, 3).map(_.toDouble))
    assert(values1d(a.padSymmetricAxis(0, 2, 3)) ==
      Seq(2, 1, 1, 2, 3, 4, 5, 5, 4, 3).map(_.toDouble))
    // reflect (no edge duplication) differs from symmetric by one plane
    assert(values1d(a.padReflectAxis(0, 2, 2)) ==
      Seq(3, 2, 1, 2, 3, 4, 5, 4, 3).map(_.toDouble))
  }

  test("pad linear_ramp matches numpy's documented example") {
    // np.pad([1,2,3,4,5], (2,3), 'linear_ramp', end_values=(5,-4))
    //   -> [5, 3, 1, 2, 3, 4, 5, 2, -1, -4]
    val a = arr1d(Seq(1, 2, 3, 4, 5).map(_.toDouble), 2)
    assert(values1d(a.padLinearRampAxis(0, 2, 3, endBefore = 5.0, endAfter = -4.0)) ==
      Seq(5, 3, 1, 2, 3, 4, 5, 2, -1, -4).map(_.toDouble))
  }

  test("pad stat modes maximum/minimum/mean/median fill with the axis statistic") {
    val a = arr1d(Seq(4, 1, 3, 2).map(_.toDouble), 2)
    assert(values1d(a.padStatAxis(0, 1, 2, "maximum")) ==
      Seq(4, 4, 1, 3, 2, 4, 4).map(_.toDouble))
    assert(values1d(a.padStatAxis(0, 2, 0, "minimum")) ==
      Seq(1, 1, 4, 1, 3, 2).map(_.toDouble))
    assert(values1d(a.padStatAxis(0, 1, 1, "mean")) ==
      Seq(2.5, 4, 1, 3, 2, 2.5))
    assert(values1d(a.padStatAxis(0, 1, 0, "median")) ==
      Seq(2.5, 4, 1, 3, 2))
  }

  test("multi-axis pad dispatcher pads axis 0 then axis 1 (corners see earlier pads)") {
    val a = GArr.fromFunction(spark, Seq(2L, 2L), Seq(1, 2))(
      g => (g(0) * 2 + g(1) + 1).toDouble) // [[1,2],[3,4]]
    val p = a.pad(Seq((1, 0), (0, 1)), mode = "edge")
    assert(p.shape == Seq(3L, 3L))
    val c = cells(p)
    // axis0 edge-pad first: row -1 copies row 0; then axis1 copies col 1
    val expect = Seq(1, 2, 2, 1, 2, 2, 3, 4, 4).map(_.toDouble)
    for (i <- 0 until 9) assert(c(i) == expect(i), s"cell $i")
    val w = a.pad(Seq((0, 0), (2, 2)), mode = "wrap")
    assert(w.shape == Seq(2L, 6L))
    val wc = cells(w)
    val wExpect = Seq(1, 2, 1, 2, 1, 2, 3, 4, 3, 4, 3, 4).map(_.toDouble)
    for (i <- 0 until 12) assert(wc(i) == wExpect(i), s"wrap cell $i")
  }

  test("imread: sorted BMP glob -> (nfiles, h, w, 3) stack, one block per file") {
    val dir = java.nio.file.Files.createTempDirectory("imread").toFile
    val h = 3; val w = 2
    // three 2x3 images, pixel (r,c) channel k = 10*i + rowcol pattern
    for (i <- 0 until 3) {
      val rgb = new Array[Byte](h * w * 3)
      for (r <- 0 until h; c <- 0 until w; k <- 0 until 3)
        rgb((r * w + c) * 3 + k) = (10 * i + r * w + c + k).toByte
      val bytes = Multimodal.encodeBmp24(w, h, rgb)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.toString, s"img$i.bmp"), bytes)
    }
    val stack = Images.imreadBmp(spark, s"${dir.toString}/*.bmp")
    assert(stack.shape == Seq(3L, 3L, 2L, 3L))
    assert(stack.chunks.head == Seq(1, 1, 1))
    val c = cells(stack)
    for (i <- 0 until 3; r <- 0 until h; cc <- 0 until w; k <- 0 until 3) {
      val idx = ((i * h + r) * w + cc) * 3L + k
      assert(c(idx) == ((10 * i + r * w + cc + k) & 0xff).toDouble, s"($i,$r,$cc,$k)")
    }
    // uniform-shape guard: a mismatched file fails loudly
    val bad = Multimodal.encodeBmp24(1, 1, Array[Byte](1, 2, 3))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir.toString, s"img9.bmp"), bad)
    val ex = intercept[org.apache.spark.SparkException] {
      Images.imreadBmp(spark, s"${dir.toString}/*.bmp").sumAll
    }
    assert(ex.getMessage != null)
  }
}
