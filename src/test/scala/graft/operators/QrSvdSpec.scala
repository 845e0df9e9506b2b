package graft.operators

import graft.SparkTestBase

/** GArr-level qr/svd adapters (reference `dask/array/linalg.py:835,874`)
  * on tall-skinny chunked arrays: reconstruction, orthonormality,
  * triangularity, singular-value ordering — all driver-checked from
  * collected cells.
  */
class QrSvdSpec extends SparkTestBase {

  private val m = 40
  private val n = 5

  /** Deterministic full-rank tall-skinny test matrix. */
  private def buildA(chunkRows: Int, chunkCols: Int): GArr = {
    val nn = n // locals only: the closure must not capture the suite
    GArr.fromFunction(spark, Seq(m.toLong, n.toLong), Seq(chunkRows, chunkCols)) { g =>
      val i = g(0); val j = g(1)
      ((i * 31 + j * 17) % 13).toDouble + (if (i % (nn + 2) == j) 9.0 else 0.0)
    }
  }

  private def cells(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def dense(a: GArr): Array[Array[Double]] = {
    val c = cells(a)
    val rows = a.shape(0).toInt; val cols = a.shape(1).toInt
    Array.tabulate(rows, cols)((i, j) => c(i.toLong * cols + j))
  }

  test("qr: Q orthonormal, R upper-triangular, Q*R reconstructs A") {
    for (chunkRows <- Seq(40, 7)) {
      val a = buildA(chunkRows, n)
      val (qArr, rArr) = Linalg.qr(a)
      assert(qArr.shape == Seq(m.toLong, n.toLong))
      assert(rArr.shape == Seq(n.toLong, n.toLong))
      assert(qArr.chunks(0) == a.chunks(0), "Q must keep the input row chunking")
      val q = dense(qArr); val r = dense(rArr); val ad = dense(a)
      // R upper-triangular
      for (i <- 0 until n; j <- 0 until i)
        assert(math.abs(r(i)(j)) < 1e-9, s"R($i,$j)=${r(i)(j)} below the diagonal")
      // QᵀQ = I
      for (c1 <- 0 until n; c2 <- 0 until n) {
        val dot = (0 until m).map(i => q(i)(c1) * q(i)(c2)).sum
        val want = if (c1 == c2) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-8, s"QtQ($c1,$c2)=$dot")
      }
      // Q·R = A
      for (i <- 0 until m; j <- 0 until n) {
        val got = (0 until n).map(k => q(i)(k) * r(k)(j)).sum
        assert(math.abs(got - ad(i)(j)) < 1e-8, s"QR($i,$j)=$got vs ${ad(i)(j)}")
      }
    }
  }

  test("qr composes with GArr.matmul: q.matmul(r) cell-matches A") {
    val a = buildA(11, 3) // multi-chunk columns exercise the regrid bridge
    val (qArr, rArr) = Linalg.qr(a)
    val recon = cells(qArr.matmul(rArr))
    val want = cells(a)
    want.foreach { case (idx, v) =>
      assert(math.abs(recon(idx) - v) < 1e-8, s"idx $idx: ${recon(idx)} vs $v")
    }
  }

  test("GArr-level lu: P·L·U reconstructs A; factors lift back to GArr") {
    val n2 = 8; val bs = 4
    val vals = Array.tabulate(n2 * n2) { idx =>
      val i = idx / n2; val j = idx % n2
      ((i * 13 + j * 7) % 11).toDouble + (if (i == j) 20.0 else 0.0)
    }
    val a = GArr.fromFunction(spark, Seq(n2.toLong, n2.toLong), Seq(bs, bs))(
      g => vals((g(0) * n2 + g(1)).toInt))
    val r = Linalg.lu(a)
    assert(r.nBlocks == n2 / bs)
    // factors back to GArr, dense reconstruction of P·(L+I)·U
    // the factor DataFrames carry only their own triangle's blocks;
    // absent cells are structural zeros
    def dense(g: GArr): Array[Array[Double]] = {
      val c = cells(g)
      Array.tabulate(n2, n2)((i, j) => c.getOrElse(i.toLong * n2 + j, 0.0))
    }
    val l = dense(Linalg.blocksToGArr(r.l, bs, r.nBlocks)) // unit diag included
    val u = dense(Linalg.blocksToGArr(r.u, bs, r.nBlocks))
    val lu = Array.tabulate(n2, n2)((i, j) =>
      (0 until n2).map(k => l(i)(k) * u(k)(j)).sum)
    // block-diagonal permutation: row (k*bs + sigma(t)) of A equals
    // row (k*bs + t) of L·U
    for (k <- 0 until r.nBlocks; t <- 0 until bs; j <- 0 until n2) {
      val want = vals((k * bs + r.perms(k)(t)) * n2 + j)
      assert(math.abs(lu(k * bs + t)(j) - want) < 1e-9,
        s"PLU(${k * bs + t},$j)=${lu(k * bs + t)(j)} vs $want")
    }
    // U globally upper-triangular
    for (i <- 0 until n2; j <- 0 until i)
      assert(math.abs(u(i)(j)) < 1e-12, s"U($i,$j) below diagonal")
  }

  test("norms: fro / induced-1 / induced-inf match dense") {
    val a = buildA(7, 3)
    val ad = dense(a)
    val fro = math.sqrt(ad.flatten.map(x => x * x).sum)
    assert(math.abs(Linalg.norm(a, "fro") - fro) < 1e-9)
    val one = (0 until n).map(j => (0 until m).map(i => math.abs(ad(i)(j))).sum).max
    assert(math.abs(Linalg.norm(a, "1") - one) < 1e-9)
    val inf = (0 until m).map(i => (0 until n).map(j => math.abs(ad(i)(j))).sum).max
    assert(math.abs(Linalg.norm(a, "inf") - inf) < 1e-9)
    intercept[IllegalArgumentException](Linalg.norm(a, "nuc"))
  }

  test("svd: u diag(s) v reconstructs A; u orthonormal; s descending") {
    val a = buildA(13, n)
    val (uArr, sArr, vArr) = Linalg.svd(a)
    val k = sArr.shape.head.toInt
    assert(k == n, s"full-rank fixture should keep all $n singular values, got $k")
    val u = dense(uArr)
    val s = {
      val c = cells(sArr); Array.tabulate(k)(i => c(i.toLong))
    }
    val v = dense(vArr) // k×n, numpy convention (Vᵀ)
    // s nonincreasing, nonnegative
    for (i <- 1 until k) assert(s(i - 1) >= s(i) && s(i) >= 0, s.toSeq.toString)
    // UᵀU = I
    for (c1 <- 0 until k; c2 <- 0 until k) {
      val dot = (0 until m).map(i => u(i)(c1) * u(i)(c2)).sum
      val want = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-7, s"UtU($c1,$c2)=$dot")
    }
    // u·diag(s)·v = A
    val ad = dense(a)
    for (i <- 0 until m; j <- 0 until n) {
      val got = (0 until k).map(t => u(i)(t) * s(t) * v(t)(j)).sum
      assert(math.abs(got - ad(i)(j)) < 1e-7, s"USV($i,$j)=$got vs ${ad(i)(j)}")
    }
  }
}
