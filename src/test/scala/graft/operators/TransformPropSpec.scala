package graft.operators

import graft.SparkTestBase

/** Randomized property suite for the round-9c transform tier: random
  * lengths/chunkings/windows/pads, each checked against a driver-local
  * dense reference — pins the halo routing, pad composition, spectrum
  * scatter, and overlap-add splitting on inputs no hand-written case
  * would pick.
  */
class TransformPropSpec extends SparkTestBase {

  private def indexed(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def arr1d(vals: Array[Double], chunk: Int): GArr =
    GArr.fromFunction(spark, Seq(vals.length.toLong), Seq(chunk))(g => vals(g(0).toInt))

  test("random fft->ifft roundtrips (fftAxis and the distributed fft1dArr path)") {
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 6) {
      val n = 3 + rnd.nextInt(60)
      val chunk = 1 + rnd.nextInt(n)
      val vals = Array.fill(n)((rnd.nextInt(19) - 9).toDouble)
      val a = arr1d(vals, chunk)
      val backAxis = ComplexFft.ifftAxis(ComplexFft.fftArr(a, 0), 0).reArr
      indexed(backAxis).foreach { case (i, v) =>
        assert(math.abs(v - vals(i.toInt)) < 1e-9, s"t$trial axis[$i] n=$n chunk=$chunk")
      }
      val oc = 1 + rnd.nextInt(n)
      val spec = ComplexFft.fft1dArr(CArr.fromReal(a),
        targetElems = 1 + rnd.nextInt(32), outChunk = oc)
      val back = ComplexFft.ifft1dArr(spec,
        targetElems = 1 + rnd.nextInt(32), outChunk = 1 + rnd.nextInt(n)).reArr
      indexed(back).foreach { case (i, v) =>
        assert(math.abs(v - vals(i.toInt)) < 1e-9, s"t$trial dist[$i] n=$n oc=$oc")
      }
    }
  }

  test("random sliding windows vs dense reference") {
    val rnd = new scala.util.Random(203)
    for (trial <- 0 until 8) {
      val n = 2 + rnd.nextInt(40)
      val w = 1 + rnd.nextInt(n)
      val chunk = 1 + rnd.nextInt(n)
      val vals = Array.fill(n)((rnd.nextInt(50) - 20).toDouble)
      val sw = arr1d(vals, chunk).slidingWindowAxis(0, w)
      assert(sw.shape == Seq((n - w + 1).toLong, w.toLong), s"t$trial n=$n w=$w c=$chunk")
      val got = indexed(sw)
      for (i <- 0 until n - w + 1; q <- 0 until w)
        assert(got(i.toLong * w + q) == vals(i + q), s"t$trial ($i,$q) n=$n w=$w c=$chunk")
    }
  }

  test("random pad-mode chains vs a numpy-faithful dense reference") {
    val rnd = new scala.util.Random(411)
    def refPad(v: Array[Double], b: Int, a: Int, mode: String): Array[Double] = {
      val n = v.length
      def edge(idx: Int): Double = mode match {
        case "wrap"      => v(((idx % n) + n) % n)
        case "edge"      => v(math.max(0, math.min(n - 1, idx)))
        case "symmetric" => // reflect including the edge
          var i = idx
          while (i < 0 || i >= n) { if (i < 0) i = -1 - i; if (i >= n) i = 2 * n - 1 - i }
          v(i)
        case "reflect" =>
          var i = idx
          while (i < 0 || i >= n) { if (i < 0) i = -i; if (i >= n) i = 2 * (n - 1) - i }
          v(i)
        case "maximum" => v.max
        case "minimum" => v.min
      }
      Array.tabulate(b + n + a)(j => if (j >= b && j < b + n) v(j - b) else edge(j - b))
    }
    for (trial <- 0 until 10) {
      val n = 2 + rnd.nextInt(20)
      val chunk = 1 + rnd.nextInt(n)
      val vals = Array.fill(n)((rnd.nextInt(30) - 10).toDouble)
      val mode = Seq("wrap", "edge", "symmetric", "reflect", "maximum", "minimum")(rnd.nextInt(6))
      val before = rnd.nextInt(if (mode == "reflect") n else n + 1)
      val after = rnd.nextInt(if (mode == "reflect") n else n + 1)
      val padded = arr1d(vals, chunk).pad(Seq((before, after)), mode)
      val ref = refPad(vals, before, after, mode)
      val got = indexed(padded)
      ref.indices.foreach(i =>
        assert(got(i) == ref(i), s"t$trial $mode($before,$after) n=$n c=$chunk [$i]"))
    }
  }

  test("random overlap-add convolutions vs the dense reference") {
    val rnd = new scala.util.Random(577)
    for (trial <- 0 until 8) {
      val n = 5 + rnd.nextInt(120)
      val nb = 1 + rnd.nextInt(50)
      val chunk = 1 + rnd.nextInt(n)
      val sig = Array.fill(n)((rnd.nextInt(13) - 6).toDouble)
      val ker = Array.fill(nb)((rnd.nextInt(9) - 4).toDouble)
      val out = ComplexFft.oaConvolve(arr1d(sig, chunk), ker)
      assert(out.shape == Seq((n + nb - 1).toLong))
      val got = indexed(out)
      for (k <- 0 until n + nb - 1) {
        val expect = (0 until n).map(i =>
          if (k - i >= 0 && k - i < nb) sig(i) * ker(k - i) else 0.0).sum
        assert(math.abs(got(k) - expect) < 1e-8,
          s"t$trial conv[$k] n=$n nb=$nb c=$chunk: ${got(k)} vs $expect")
      }
    }
  }

  test("random ravel/unravel roundtrips over random dims") {
    val rnd = new scala.util.Random(701)
    for (trial <- 0 until 6) {
      val dims = Seq.fill(1 + rnd.nextInt(4))(1L + rnd.nextInt(7))
      val total = dims.product
      val k = 1 + rnd.nextInt(30)
      val idx = Array.fill(k)(math.abs(rnd.nextLong()) % total)
      val a = arr1d(idx.map(_.toDouble), 1 + rnd.nextInt(k))
      val coords = ArrayRoutines.unravelIndex(a, dims)
      val back = indexed(ArrayRoutines.ravelMultiIndex(coords, dims))
      idx.indices.foreach(i =>
        assert(back(i) == idx(i).toDouble, s"t$trial dims=$dims [$i]"))
    }
  }
}
