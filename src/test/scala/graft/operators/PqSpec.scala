package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Product quantization: codebook training, encoding, ADC top-k — each
  * pinned against a straight driver-side recomputation on the same data,
  * and checked invariant to partition layout (the scale property: the
  * result may not depend on where rows physically live).
  */
class PqSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 4
  private val numSub = 2
  private val sub = dim / numSub
  private val k = 2

  // 20 deterministic 4-dim vectors
  private val vecs: Seq[(Long, Seq[Float])] = (0 until 20).map { i =>
    (i.toLong, Seq.tabulate(dim)(d => (((i * 7 + d * 3) % 11) - 5).toFloat / 2.0f))
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  // driver-side reference: seeded init + Lloyd with 1e-6 half-up rounding
  private def refTrain(iters: Int): Array[Array[Array[Double]]] = {
    var cents = Array.tabulate(numSub, k) { (mi, ci) =>
      vecs(ci)._2.slice(mi * sub, (mi + 1) * sub).map(_.toDouble).toArray
    }
    def assign(v: Seq[Float], cb: Array[Array[Double]], mi: Int): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (ci <- cb.indices) {
        var d = 0.0
        for (i <- 0 until sub) { val t = v(mi * sub + i) - cb(ci)(i); d += t * t }
        if (d < bestD) { bestD = d; best = ci }
      }
      best
    }
    for (_ <- 1 to iters) {
      val next = cents.map(_.map(_.clone()))
      for (mi <- 0 until numSub; ci <- 0 until k) {
        val members = vecs.filter { case (_, v) => assign(v, cents(mi), mi) == ci }
        if (members.nonEmpty)
          for (d <- 0 until sub) {
            val mu = members.map(_._2(mi * sub + d).toDouble).sum / members.size
            next(mi)(ci)(d) = math.floor(mu * 1e6 + 0.5) / 1e6
          }
      }
      cents = next
    }
    cents
  }

  test("pqTrain matches driver-side Lloyd (seeded and 2 iterations)") {
    for (iters <- Seq(0, 2)) {
      val got = Similarity.pqTrain(df, "vec_id", "embedding", numSub, k, iters)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray)).toMap
      val exp = refTrain(iters)
      for (mi <- 0 until numSub; ci <- 0 until k)
        assert(got((mi, ci)).toSeq == exp(mi)(ci).toSeq, s"iters=$iters m=$mi code=$ci")
    }
  }

  test("pqEncode assigns argmin codes; pqTopK matches driver-side ADC, any layout") {
    val cents = refTrain(2)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", numSub, k, iters = 2)

    def code(v: Seq[Float], mi: Int): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (ci <- 0 until k) {
        var d = 0.0
        for (i <- 0 until sub) { val t = v(mi * sub + i) - cents(mi)(ci)(i); d += t * t }
        if (d < bestD) { bestD = d; best = ci }
      }
      best
    }
    val expCodes = vecs.map { case (id, v) => id -> (0 until numSub).map(code(v, _)) }.toMap

    for (parts <- Seq(1, 3, 8)) {
      val d = df.repartition(parts)
      val enc = Similarity.pqEncode(d, "vec_id", "embedding", cb)
      val gotCodes = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      assert(gotCodes == expCodes.map { case (id, c) => id -> c.toSeq }, s"parts=$parts")

      // ADC expected: per query, score every corpus row by LUT sums
      val queries = df.filter(col("vec_id") < 2)
      val got = Similarity.pqTopK(enc, queries, cb, "vec_id", "embedding", k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      val exp = (0L until 2L).flatMap { qid =>
        val qv = vecs(qid.toInt)._2
        val scores = vecs.collect { case (id, _) if id != qid => // self excluded
          val s = (0 until numSub).map { mi =>
            val ci = expCodes(id)(mi)
            (0 until sub).map { i =>
              val t = qv(mi * sub + i).toDouble - cents(mi)(ci)(i); t * t
            }.sum
          }.sum
          (id, s)
        }
        scores.sortBy { case (id, s) => (s, id) }.take(4).zipWithIndex
          .map { case ((id, s), rk) => (qid, id, s, rk + 1) }
      }
      assert(got.map(x => (x._1, x._2, x._4)).toSet ==
        exp.map(x => (x._1, x._2, x._4)).toSet, s"parts=$parts")
      got.foreach { case (qid, id, s, _) =>
        val e = exp.find(x => x._1 == qid && x._2 == id).get._3
        assert(math.abs(s - e) < 1e-9, s"score mismatch q=$qid n=$id")
      }
    }
  }
}
