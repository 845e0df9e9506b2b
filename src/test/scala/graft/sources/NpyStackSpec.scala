package graft.sources

import graft.SparkTestBase
import graft.operators.GArr

/** npy-stack IO: round-trips through our own writer AND decodes a stack
  * written by NumPy itself (`src/test/resources/npy_stack_fixture`,
  * `np.save` of float64 slabs) — the third-party-writer check that rules
  * out a symmetric encode/decode bug.
  */
class NpyStackSpec extends SparkTestBase {

  private def indexed(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("npy header round-trips through the codec") {
    for (shape <- Seq(Seq(5), Seq(4, 3), Seq(2, 3, 4), Seq(1000000, 7))) {
      val hdr = NpyStack.npyHeader(shape)
      assert(hdr.length % 64 == 0, s"header not 64-aligned for $shape")
      val (parsed, off) = NpyStack.parseNpyHeader(hdr ++ Array.fill(8)(0.toByte))
      assert(parsed == shape && off == hdr.length, s"$shape")
    }
  }

  test("to_npy_stack / from_npy_stack round-trip, 1-D and 2-D") {
    val dir1 = java.nio.file.Files.createTempDirectory("npy1").toString
    val v = GArr.fromFunction(spark, Seq(11L), Seq(4))(g => g(0) * 2.5 - 3)
    NpyStack.toNpyStack(v, dir1)
    val v2 = NpyStack.fromNpyStack(spark, dir1)
    assert(v2.shape == Seq(11L) && v2.chunks == Seq(Seq(4, 4, 3)))
    assert(indexed(v2) == indexed(v))

    val dir2 = java.nio.file.Files.createTempDirectory("npy2").toString
    val m = GArr.fromFunction(spark, Seq(7L, 5L), Seq(3, 5))(
      g => (g(0) * 5 + g(1)).toDouble)
    NpyStack.toNpyStack(m, dir2)
    val m2 = NpyStack.fromNpyStack(spark, dir2)
    assert(m2.shape == Seq(7L, 5L) && m2.chunks == Seq(Seq(3, 3, 1), Seq(5)))
    assert(indexed(m2) == indexed(m))
    // composes with the rest of the module after reload
    assert(indexed(m2.sumAxis(0)) == indexed(m.sumAxis(0)))
    // multi-chunk non-0 axis is rejected (dask's contract)
    val wide = GArr.fromFunction(spark, Seq(4L, 6L), Seq(2, 3))(_ => 1.0)
    intercept[IllegalArgumentException](NpyStack.toNpyStack(wide, dir2))
  }

  test("from_npy_stack decodes a stack written by NumPy itself (no info file)") {
    val a = NpyStack.fromNpyStack(spark, "src/test/resources/npy_stack_fixture")
    assert(a.shape == Seq(7L, 2L) && a.chunks == Seq(Seq(4, 3), Seq(2)))
    val got = indexed(a)
    // fixture: arange(14).reshape(7,2) * 1.5 - 3
    for (i <- 0 until 7; j <- 0 until 2)
      assert(got((i * 2 + j).toLong) == (i * 2 + j) * 1.5 - 3, s"($i,$j)")
    assert(a.sumAll == 94.5)
  }
}
