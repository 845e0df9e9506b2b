package graft.operators

/** Distributed einsum over [[GArr]] — the dask `dask.array.einsum` surface
  * (reference `dask/array/einsumfuncs.py:1-295`, which parses the numpy
  * subscript grammar and lowers to blockwise). This implementation keeps
  * the same spec language and lowers every contraction onto the existing
  * chunk-calculus primitives instead of per-spec task graphs:
  *
  *   - repeated index inside one operand  -> [[GArr.diagonal]]
  *   - pairwise contraction (fold left)   -> transpose + reshape-to-3D +
  *     [[GArr.bmm]] (batch, left, contract) x (batch, contract, right),
  *     so `ij,jk->ik` and `bij,bjk->bik` both run as the two-shuffle
  *     blocked matmul with map-side-combined output reduction
  *   - leftover non-output indices        -> `sumAxis`
  *   - final index order                  -> `transpose`
  *
  * Supported grammar: explicit (`ij,jk->ik`) and implicit (`ij,jk`)
  * output, single-operand views (`ij->ji`, `ii->i`, `ii->`), traces,
  * multi-operand chains, scalar results (returned as a length-1 1-D
  * array, the same convention [[GArr.tensordot]] uses), and `...`
  * ellipsis broadcasting (`...ij,jk->...ik`; right-aligned, size-1 dims
  * broadcast by squeezing — zero data movement).
  *
  * Scale shape: each pairwise step is one equi-join plus one
  * partial->final reduce, payloads bounded by the chunk size; diagonals
  * move only the output's elements. Nothing driver-side scales with the
  * arrays.
  */
object Einsum {

  /** Parsed spec: per-operand subscripts plus the resolved output
    * subscript (implicit outputs resolved by the numpy rule: indices
    * appearing exactly once across all operands, sorted).
    */
  final case class Spec(inputs: Seq[String], output: String)

  def parse(spec: String, nOperands: Int): Spec = {
    val cleaned = spec.replaceAll("\\s+", "")
    require(!cleaned.contains("..."),
      "einsum internal: '...' must be desugared before parse")
    val (lhs, out) = cleaned.split("->", -1) match {
      case Array(l)    => (l, None)
      case Array(l, r) => (l, Some(r))
      case _           => throw new IllegalArgumentException(s"einsum: bad spec '$spec'")
    }
    val inputs = lhs.split(",", -1).toSeq
    require(inputs.length == nOperands,
      s"einsum: spec '$spec' names ${inputs.length} operands, got $nOperands")
    (inputs ++ out.toSeq).foreach { sub =>
      require(sub.forall(c => c.isLetter), s"einsum: bad subscript '$sub' in '$spec'")
    }
    val counts = lhs.filter(_ != ',').groupBy(identity).view.mapValues(_.length)
    val output = out.getOrElse(counts.filter(_._2 == 1).keys.toSeq.sorted.mkString)
    output.foreach { c =>
      require(output.count(_ == c) == 1, s"einsum: output index '$c' repeats")
      require(counts.contains(c), s"einsum: output index '$c' not in inputs")
    }
    Spec(inputs, output)
  }

  /** Desugar `...` (numpy ellipsis broadcasting) into fresh explicit
    * letters: each operand's unnamed dims get right-aligned shared
    * letters; a size-1 ellipsis dim broadcast against a longer one is
    * SQUEEZED out of that operand (zero data movement — the letter is
    * simply absent from its subscript, and the contraction algebra
    * broadcasts it back, exactly like `i,ij`). Implicit outputs follow
    * the numpy rule: ellipsis dims first, then the once-occurring
    * explicit letters sorted.
    */
  private[operators] def desugarEllipsis(spec: String,
                                         operands: Seq[GArr]): (String, Seq[GArr]) = {
    val cleaned = spec.replaceAll("\\s+", "")
    if (!cleaned.contains("...")) return (cleaned, operands)
    val (lhs, outOpt) = cleaned.split("->", -1) match {
      case Array(l)    => (l, None)
      case Array(l, r) => (l, Some(r))
      case _           => throw new IllegalArgumentException(s"einsum: bad spec '$spec'")
    }
    val inSubs = lhs.split(",", -1).toSeq
    require(inSubs.length == operands.length,
      s"einsum: spec '$spec' names ${inSubs.length} operands, got ${operands.length}")
    val used = cleaned.filter(_.isLetter).toSet
    val pool = (('a' to 'z') ++ ('A' to 'Z')).filterNot(used)
    val ellCounts = inSubs.zip(operands).map { case (sub, op) =>
      require(sub.indexOf("...") == sub.lastIndexOf("..."),
        s"einsum: at most one '...' per operand ('$sub')")
      if (sub.contains("...")) {
        val k = op.ndim - sub.count(_.isLetter)
        require(k >= 0, s"einsum: '$sub' names more dims than operand has (${op.ndim})")
        k
      } else 0
    }
    val maxEll = ellCounts.max
    require(pool.length >= maxEll, "einsum: too many dimensions to desugar '...'")
    val ell = pool.take(maxEll).mkString
    // group extent per ellipsis slot (right-aligned across operands)
    val extents = Array.fill(maxEll)(1L)
    for (i <- inSubs.indices if ellCounts(i) > 0) {
      val k = ellCounts(i)
      val before = inSubs(i).takeWhile(_ != '.').count(_.isLetter)
      for (j <- 0 until k) {
        val e = operands(i).shape(before + j)
        val slot = maxEll - k + j
        if (extents(slot) == 1L) extents(slot) = e
        else require(e == 1L || e == extents(slot),
          s"einsum: ellipsis dim mismatch at slot $slot: $e vs ${extents(slot)}")
      }
    }
    val rewritten = inSubs.zip(operands).zip(ellCounts).map { case ((sub, op0), k) =>
      if (!sub.contains("...")) (sub, op0)
      else {
        val before = sub.takeWhile(_ != '.').count(_.isLetter)
        var op = op0
        val letters = new StringBuilder
        var removed = 0
        for (j <- 0 until k) {
          val slot = maxEll - k + j
          if (op0.shape(before + j) == 1L && extents(slot) > 1L) {
            op = op.squeeze(before + j - removed) // broadcast dim: drop it
            removed += 1
          } else letters += ell(slot)
        }
        (sub.replace("...", letters.result()), op)
      }
    }
    val output = outOpt match {
      case Some(o) =>
        require(o.contains("...") || maxEll == 0,
          s"einsum: inputs have ellipsis dims but output '$o' lacks '...'")
        o.replace("...", ell)
      case None =>
        val expl = lhs.filter(_.isLetter)
        val once = expl.distinct.filter(c => expl.count(_ == c) == 1).sorted
        ell + once.mkString
    }
    (rewritten.map(_._1).mkString(",") + "->" + output, rewritten.map(_._2))
  }

  /** `np.einsum(spec, operands...)` on chunked arrays. */
  def einsum(spec0: String, operands0: Seq[GArr], targetChunk: Int = 65536): GArr = {
    require(operands0.nonEmpty, "einsum needs at least one operand")
    val (spec, operands) = desugarEllipsis(spec0, operands0)
    val p = parse(spec, operands.length)

    // 1. collapse repeated within-operand indices to diagonals
    var subs = p.inputs.toBuffer
    val arrs = operands.toBuffer
    for (i <- arrs.indices) {
      var sub = subs(i)
      var a = arrs(i)
      var rep = firstRepeat(sub)
      while (rep >= 0) {
        val c = sub(rep)
        val first = sub.indexOf(c)
        a = a.diagonal(first, rep)
        sub = sub.patch(rep, "", 1)
        rep = firstRepeat(sub)
      }
      subs(i) = sub; arrs(i) = a
    }

    // validate consistent extents per index
    val extent = scala.collection.mutable.Map[Char, Long]()
    for (i <- arrs.indices; (c, d) <- subs(i).zipWithIndex) {
      require(arrs(i).ndim == subs(i).length,
        s"einsum: operand $i has ${arrs(i).ndim} dims for subscript '${subs(i)}'")
      val e = arrs(i).shape(d)
      require(extent.getOrElseUpdate(c, e) == e,
        s"einsum: index '$c' has extents ${extent(c)} and $e")
    }

    // 2. pairwise contractions onto bmm, GREEDY ordering (np.einsum's
    // optimize='greedy' idea): at each step contract the pair whose
    // RESULT has the fewest elements — for chains like ij,jk,kl->il
    // with skewed extents this keeps intermediates small, which at
    // cluster scale is the difference between shuffling a thin matrix
    // and a wide one. Left-to-right order is the tie-break, so
    // two-operand specs behave exactly as before.
    def contractPair(aSub: String, a: GArr, bSub: String, b: GArr,
                     needed: Set[Char]): (String, GArr) = {
      val shared = aSub.toSet.intersect(bSub.toSet)
      val contracted = aSub.filter(c => shared(c) && !needed(c))
      val batch = aSub.filter(c => shared(c) && needed(c))
      val leftOnly = aSub.filterNot(shared)
      val rightOnly = bSub.filterNot(shared)
      val bDims = batch.map(extent); val lDims = leftOnly.map(extent)
      val cDims = contracted.map(extent); val rDims = rightOnly.map(extent)
      val (pb, pl, pc, pr) =
        (bDims.product max 1L, lDims.product max 1L,
         cDims.product max 1L, rDims.product max 1L)
      val side = math.max(1L, math.cbrt(targetChunk.toDouble).toLong)
      def ch(n: Long): Int = math.min(n, side).toInt
      val a3 = to3D(a, aSub, batch + leftOnly + contracted,
        Seq(pb, pl, pc), Seq(ch(pb), ch(pl), ch(pc)))
      val b3 = to3D(b, bSub, batch + contracted + rightOnly,
        Seq(pb, pc, pr), Seq(ch(pb), ch(pc), ch(pr)))
      val c3 = a3.bmm(b3)
      val outSub = batch + leftOnly + rightOnly
      val outDims = bDims ++ lDims ++ rDims
      val res =
        if (outDims.isEmpty) c3.reshape(Seq(1L), Seq(1))
        else c3.reshape(outDims,
          outDims.map(n => math.min(n,
            math.max(1L, math.pow(targetChunk.toDouble,
              1.0 / outDims.length).toLong)).toInt))
      (outSub, res)
    }
    val work = scala.collection.mutable.ArrayBuffer.empty[(String, GArr)]
    subs.indices.foreach(i => work += ((subs(i), arrs(i))))
    while (work.length > 1) {
      var bi = 0; var bj = 1; var bestCost = Double.MaxValue
      for (i <- work.indices; j <- (i + 1) until work.length) {
        val others = work.indices.filter(k => k != i && k != j)
          .map(work(_)._1).mkString + p.output
        val needed = others.toSet
        val (si, sj) = (work(i)._1, work(j)._1)
        val shared = si.toSet.intersect(sj.toSet)
        val resLetters = (si + sj.filterNot(si.contains(_)))
          .filter(c => !shared(c) || needed(c))
        val cost = resLetters.map(extent(_).toDouble).product
        if (cost < bestCost) { bestCost = cost; bi = i; bj = j }
      }
      val needed = (work.indices.filter(k => k != bi && k != bj)
        .map(work(_)._1).mkString + p.output).toSet
      val (sub, arr) = contractPair(work(bi)._1, work(bi)._2,
        work(bj)._1, work(bj)._2, needed)
      work.remove(bj); work.remove(bi)
      work += ((sub, arr))
    }
    var cur = work.head._2
    var curSub = work.head._1

    // 3. sum out indices absent from the output (highest axis first)
    val toSum = curSub.zipWithIndex.filterNot { case (c, _) => p.output.contains(c) }
      .map(_._2).sorted.reverse
    for (ax <- toSum) {
      if (cur.ndim == 1) cur = cur.expandDims(0).sumAxis(1) // scalar: shape Seq(1)
      else cur = cur.sumAxis(ax)
    }
    curSub = curSub.filter(p.output.contains(_))

    // 4. permute to the requested output order
    if (curSub == p.output || curSub.isEmpty) cur
    else cur.transpose(p.output.map(curSub.indexOf(_)))
  }

  def einsum(spec: String, operands: GArr*)(implicit d: DummyImplicit): GArr =
    einsum(spec, operands.toSeq)

  /** Transpose `arr` (subscript `sub`) into letter order `order`, then
    * reshape to the given 3-D factorization. Letters in `order` but not
    * in `sub` contribute extent-1 groups, so the reshape is always
    * element-count preserving.
    */
  private def to3D(arr: GArr, sub: String, order: String,
                   dims3: Seq[Long], chunks3: Seq[Int]): GArr = {
    val present = order.filter(sub.contains(_))
    val base =
      if (present.isEmpty) arr // scalar intermediate: shape Seq(1)
      else if (present == sub) arr
      else arr.transpose(present.map(sub.indexOf(_)))
    base.reshape(dims3, chunks3)
  }

  private def firstRepeat(sub: String): Int = {
    var i = 1
    while (i < sub.length) {
      if (sub.indexOf(sub(i)) < i) return i
      i += 1
    }
    -1
  }
}
