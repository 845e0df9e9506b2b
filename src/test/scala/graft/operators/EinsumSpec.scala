package graft.operators

import graft.SparkTestBase

/** Einsum vs a brute-force dense evaluator: every supported spec shape —
  * matmul form, batch contraction, diagonals, traces, transposes, outer
  * and inner products, Hadamard, implicit outputs, 3-operand chains —
  * on deterministic pseudo-random integral inputs, cell-exact.
  */
/** Dense operand: shape + C-order data (top-level so Spark closures do
  * not capture the suite instance).
  */
private[operators] final case class EinsumDenseOp(shape: Seq[Int], data: Array[Double])

class EinsumSpec extends SparkTestBase {

  private type D = EinsumDenseOp
  private def D(shape: Seq[Int], data: Array[Double]): D = EinsumDenseOp(shape, data)

  /** Brute-force reference: iterate every assignment of all indices and
    * accumulate products into the output cell. O(prod extents) — test
    * sizes only.
    */
  private def denseEinsum(spec: String, ops: Seq[D]): D = {
    val p = Einsum.parse(spec, ops.length)
    val extent = scala.collection.mutable.LinkedHashMap[Char, Int]()
    for ((sub, op) <- p.inputs.zip(ops); (c, d) <- sub.zipWithIndex)
      extent(c) = op.shape(d)
    val letters = extent.keys.toArray
    val outShape = p.output.map(extent).toSeq
    val out = new Array[Double](math.max(outShape.product, 1))
    val assign = scala.collection.mutable.Map[Char, Int]()
    def loop(li: Int): Unit = {
      if (li == letters.length) {
        var prod = 1.0
        for ((sub, op) <- p.inputs.zip(ops)) {
          var off = 0
          for ((c, d) <- sub.zipWithIndex) off = off * op.shape(d) + assign(c)
          prod *= op.data(off)
        }
        var oOff = 0
        for (c <- p.output) oOff = oOff * extent(c) + assign(c)
        out(oOff) += prod
      } else {
        val c = letters(li)
        var v = 0
        while (v < extent(c)) { assign(c) = v; loop(li + 1); v += 1 }
      }
    }
    loop(0)
    D(if (outShape.isEmpty) Seq(1) else outShape, out)
  }

  private def lift(d: D, rnd: scala.util.Random): GArr = {
    val chunkSizes = d.shape.map(n => 1 + rnd.nextInt(n))
    val shapeL = d.shape.toArray
    val data = d.data
    GArr.fromFunction(spark, d.shape.map(_.toLong), chunkSizes) { g =>
      var off = 0
      var i = 0
      while (i < g.length) { off = off * shapeL(i) + g(i).toInt; i += 1 }
      data(off)
    }
  }

  private def collect(a: GArr): Array[Double] = {
    val m = a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Array.tabulate(m.size)(i => m(i.toLong))
  }

  private def check(spec: String, shapes: Seq[Seq[Int]], seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val ops = shapes.map(sh =>
      D(sh, Array.fill(sh.product)(math.floor(rnd.nextDouble() * 9) - 4)))
    val want = denseEinsum(spec, ops)
    val got = Einsum.einsum(spec, ops.map(lift(_, rnd)), targetChunk = 64)
    assert(got.shape.map(_.toInt) == want.shape, s"'$spec' shape ${got.shape} vs ${want.shape}")
    val g = collect(got)
    assert(g.length == want.data.length, s"'$spec' size")
    for (i <- g.indices)
      assert(g(i) == want.data(i), s"'$spec' cell $i: ${g(i)} vs ${want.data(i)}")
  }

  test("matmul form ij,jk->ik") { check("ij,jk->ik", Seq(Seq(5, 4), Seq(4, 6)), 1) }
  test("implicit output ij,jk") { check("ij,jk", Seq(Seq(3, 4), Seq(4, 5)), 2) }
  test("batched bij,bjk->bik") { check("bij,bjk->bik", Seq(Seq(3, 4, 2), Seq(3, 2, 5)), 3) }
  test("diagonal ii->i") { check("ii->i", Seq(Seq(6, 6)), 4) }
  test("trace ii->") { check("ii->", Seq(Seq(7, 7)), 5) }
  test("triple diagonal iii->i") { check("iii->i", Seq(Seq(4, 4, 4)), 6) }
  test("transpose ij->ji") { check("ij->ji", Seq(Seq(4, 7)), 7) }
  test("full sum ij->") { check("ij->", Seq(Seq(5, 3)), 8) }
  test("row sum ij->i and col sum ij->j") {
    check("ij->i", Seq(Seq(5, 3)), 9); check("ij->j", Seq(Seq(5, 3)), 10)
  }
  test("inner product i,i->") { check("i,i->", Seq(Seq(9), Seq(9)), 11) }
  test("outer product i,j->ij") { check("i,j->ij", Seq(Seq(4), Seq(6)), 12) }
  test("hadamard ij,ij->ij") { check("ij,ij->ij", Seq(Seq(4, 5), Seq(4, 5)), 13) }
  test("matvec ij,j->i") { check("ij,j->i", Seq(Seq(5, 7), Seq(7)), 14) }
  test("diag of product ij,ji->i") { check("ij,ji->i", Seq(Seq(5, 4), Seq(4, 5)), 15) }
  test("3-operand chain ij,jk,kl->il") {
    check("ij,jk,kl->il", Seq(Seq(3, 4), Seq(4, 5), Seq(5, 2)), 16)
  }
  test("tensordot with permuted output ijk,jl->kil") {
    check("ijk,jl->kil", Seq(Seq(3, 4, 2), Seq(4, 5)), 17)
  }
  test("bilinear abc,ad,bd->cd") {
    check("abc,ad,bd->cd", Seq(Seq(3, 4, 2), Seq(3, 5), Seq(4, 5)), 18)
  }
  test("batch trace with diagonal bii->b") { check("bii->b", Seq(Seq(3, 4, 4)), 20) }
  test("shared batch kept bi,bj->bij") {
    check("bi,bj->bij", Seq(Seq(3, 4), Seq(3, 5)), 21)
  }

  test("random specs vs dense") {
    val rnd = new scala.util.Random(99)
    val specs = Seq(
      "ab,bc,cd->ad", "ab,cb->ac", "aab->b", "ab,b->a", "abc->cba",
      "ab,ab->", "abc,bcd->ad", "ab,bc->ac", "a,a->a", "ija,ja->ij")
    for ((spec, k) <- specs.zipWithIndex) {
      val p = Einsum.parse(spec, spec.split("->")(0).split(",").length)
      val ext = scala.collection.mutable.Map[Char, Int]()
      val shapes = p.inputs.map(_.map(c =>
        ext.getOrElseUpdate(c, 2 + rnd.nextInt(4))).toSeq)
      check(spec, shapes, 100 + k)
    }
  }

  test("parser rejects bad specs") {
    intercept[IllegalArgumentException](Einsum.parse("ij,jk->ik", 3))
    intercept[IllegalArgumentException](Einsum.parse("ij->ii", 1))
    intercept[IllegalArgumentException](Einsum.parse("ij->ik", 1))
    intercept[IllegalArgumentException](Einsum.parse("i2j->ij", 1))
  }

  // ---- ellipsis broadcasting ----

  /** Run the ellipsis spec through einsum, the desugared explicit spec
    * through the dense evaluator, and compare cells.
    */
  private def checkEll(spec: String, explicitSpec: String,
                       shapes: Seq[Seq[Int]], seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val ops = shapes.map(sh =>
      D(sh, Array.fill(math.max(sh.product, 1))(math.floor(rnd.nextDouble() * 9) - 4)))
    val want = denseEinsum(explicitSpec, ops)
    val got = Einsum.einsum(spec, ops.map(lift(_, rnd)), targetChunk = 64)
    assert(got.shape.map(_.toInt) == want.shape, s"'$spec' shape ${got.shape} vs ${want.shape}")
    val g = collect(got)
    for (i <- g.indices)
      assert(g(i) == want.data(i), s"'$spec' cell $i: ${g(i)} vs ${want.data(i)}")
  }

  test("ellipsis batch matmul ...ij,jk->...ik") {
    checkEll("...ij,jk->...ik", "bij,jk->bik", Seq(Seq(3, 4, 2), Seq(2, 5)), 30)
    checkEll("...ij,jk->...ik", "abij,jk->abik", Seq(Seq(2, 3, 4, 2), Seq(2, 5)), 31)
  }
  test("ellipsis reduce last ...i->...") {
    checkEll("...i->...", "bci->bc", Seq(Seq(3, 2, 5)), 32)
  }
  test("ellipsis elementwise with right-aligned ranks ...,...->...") {
    // (3,4) zip (4): the shorter operand's missing leading dim broadcasts
    checkEll("...,...->...", "ab,b->ab", Seq(Seq(3, 4), Seq(4)), 33)
  }
  test("ellipsis implicit output ...i,i") {
    checkEll("...i,i", "bi,i->b", Seq(Seq(4, 3), Seq(3)), 34)
  }
  test("ellipsis size-1 dim broadcasts by squeezing") {
    // (1,4,2) batches against (3,2,5): the 1 broadcasts to 3 (the dense
    // equivalent sums over the size-1 dim x, which is the identity)
    checkEll("...ij,...jk->...ik", "xij,bjk->bik", Seq(Seq(1, 4, 2), Seq(3, 2, 5)), 35)
  }
  test("ellipsis with explicit letter prefix i...,i->...") {
    checkEll("i...,i->...", "iab,i->ab", Seq(Seq(3, 2, 4), Seq(3)), 36)
  }
  test("ellipsis errors: missing ... in explicit output") {
    val a = GArr.ones(spark, Seq(2L, 3L, 4L), Seq(2, 3, 4))
    intercept[IllegalArgumentException](
      Einsum.einsum("...ij->ij", Seq(a)))
  }

  test("extent mismatch rejected") {
    val a = GArr.ones(spark, Seq(3L, 4L), Seq(2, 2))
    val b = GArr.ones(spark, Seq(5L, 6L), Seq(2, 2))
    intercept[IllegalArgumentException](Einsum.einsum("ij,jk->ik", Seq(a, b)))
  }
}
