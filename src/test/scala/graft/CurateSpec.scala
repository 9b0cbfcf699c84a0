package graft

import org.apache.spark.sql.functions._
import graft.queries.OCurate

/** Round-6 curation operators: planted-data semantics for chunk dedup and
  * repetition signals, structural invariants for packing / mixture
  * rebalancing / relational k-means (exact values are covered by the
  * DuckDB oracle; these tests pin the PROPERTIES that make the operators
  * correct curation moves).
  */
class CurateSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("chunk dedup removes a chunk shared by two docs from BOTH, keeps unique text") {
    val boiler = (1 to 8).map(i => s"boiler$i").mkString(" ")
    val a = (1 to 8).map(i => s"aword$i").mkString(" ")
    val b = (1 to 8).map(i => s"bword$i").mkString(" ")
    val docs = docsDf(Seq(
      (0L, s"$boiler $a", "en", "s0"),   // boilerplate + unique
      (1L, s"$b $boiler", "en", "s0"),   // unique + boilerplate
      (2L, a.replace("aword", "cword"), "en", "s0"))) // fully unique
    val out = OCurate.chunkDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((2L, 1L, a)), "doc 0 keeps only its unique chunk")
    assert(out(1L) == ((2L, 1L, b)), "doc 1 keeps only its unique chunk")
    assert(out(2L)._2 == 1L && out(2L)._3 == a.replace("aword", "cword"))
  }

  test("chunk dedup round-trips text when nothing is duplicated") {
    // on the real fixture: every fully-kept doc must reconstruct its text
    // verbatim (split→chunk→rejoin is the identity on space-joined tokens)
    val docs = Tables.documents(spark, sfDir)
    val joined = OCurate.chunkDedup(docs)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("n_kept") === col("n_chunks"))
    assert(joined.count() > 0, "fixture should contain fully-unique docs")
    assert(joined.filter(col("clean_text") =!= col("text")).count() == 0)
  }

  test("repetition flags a degenerate doc and passes a diverse one") {
    val looping = Seq.fill(50)("spam ham").mkString(" ")      // one bigram dominates
    val diverse = (1 to 100).map(i => s"w$i").mkString(" ")   // all grams unique
    val out = OCurate.repetition(docsDf(Seq(
        (0L, looping, "en", "s0"), (1L, diverse, "en", "s0"))))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(0L).getBoolean(4), "looping doc must be dropped")
    assert(out(0L).getDouble(2) > 0.4, "top bigram should dominate the looping doc")
    assert(out(1L).getBoolean(4), "diverse doc must be kept")
    assert(out(1L).getDouble(2) <= 0.2 && out(1L).getDouble(3) == 0.0)
  }

  test("seq packing is contiguous per stream and bins never overlap docs' spans") {
    val out = OCurate.seqPack(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    for ((_, docs) <- out.groupBy(_._1)) {
      val ordered = docs.sortBy(_._2)
      // concat-and-chunk: each doc starts exactly where the previous ended
      for (Array(p, c) <- ordered.sliding(2).map(_.toArray)) {
        assert(c._4 == p._4 + p._3, s"stream gap between docs ${p._2} and ${c._2}")
      }
      for ((_, _, n, off, bin, nBins) <- ordered) {
        assert(bin == off / 1024)
        assert(nBins == (off + n - 1) / 1024 - bin + 1 && nBins >= 1)
      }
    }
  }

  test("FFD packing keeps docs whole, respects capacity, and beats the 2x bound") {
    val docs = Tables.documents(spark, sfDir)
    val out = OCurate.packFfd(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == docs.count(), "every doc packed exactly once")
    for ((_, byBin) <- out.groupBy(r => (r._2, r._4))) {
      val fill = byBin.map(_._3).sum
      assert(byBin.forall(_._5 == fill), "bin_fill must be the bin's final sum")
      // a bin only exceeds capacity when a single oversized doc owns it
      assert(fill <= 1024 || byBin.length == 1, s"overfull shared bin: $byBin")
    }
    for ((_, stream) <- out.groupBy(_._2)) {
      val total = stream.map(_._3).sum
      val nBins = stream.map(_._4).distinct.length
      val optLb = (total + 1023) / 1024 // lower bound on OPT
      assert(nBins <= 2 * optLb + 1, s"FFD used $nBins bins vs OPT >= $optLb")
    }
  }

  test("sharded FFD bounds shard size and costs at most one bin per shard") {
    val docs = Tables.documents(spark, sfDir)
    // force multi-shard packing on the fixture with a tiny shard cap
    val cap = 64
    val sharded = OCurate.packFfd(docs, maxShardDocs = cap).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val global = OCurate.packFfd(docs).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(sharded.length == docs.count(), "every doc packed exactly once")
    for ((src, inSrc) <- sharded.groupBy(_._2)) {
      val byShard = inSrc.groupBy(_._4 / cap)
      // hash-salting concentrates shard sizes around the cap (±multinomial
      // noise) — 2x is a generous envelope that a skew regression would blow
      for ((sh, docsIn) <- byShard)
        assert(docsIn.length <= 2 * cap, s"$src shard $sh has ${docsIn.length} docs")
      val nShards = byShard.size
      val binsSharded = inSrc.map(_._4).distinct.length
      val nBinsGlobal = global.filter(_._1 == src).map(_._2).distinct.length
      assert(binsSharded <= nBinsGlobal + nShards,
        s"$src: sharded FFD used $binsSharded bins vs global $nBinsGlobal + $nShards shards")
      info(s"$src: $nShards shards, $binsSharded bins vs $nBinsGlobal global " +
        s"(overhead ${binsSharded - nBinsGlobal} bins)")
    }
  }

  test("domain mix only downsamples and moves the language mix toward uniform") {
    val docs = Tables.documents(spark, sfDir)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = OCurate.domainMix(docs).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = before.values.sum.toDouble
    val uniform = 1.0 / before.size
    for ((lang, cntB) <- before) {
      val cntA = after.getOrElse(lang, 0L)
      assert(cntA <= cntB, s"$lang upsampled")
      // under-represented languages pass whole (threshold saturates at 2^16)
      if (cntB / n <= uniform) assert(cntA == cntB, s"$lang should pass whole")
    }
    // the dominant language's share must strictly shrink toward uniform
    val (domLang, domB) = before.maxBy(_._2)
    val shareB = domB / n
    val shareA = after(domLang).toDouble / after.values.sum
    assert(shareB > uniform && shareA < shareB,
      s"dominant $domLang share $shareB -> $shareA should shrink")
  }

  test("k-means partitions all vectors and separates an obvious two-blob input") {
    import spark.implicits._
    // two well-separated blobs in 4-d; k=2, init = first vec of each blob
    val rng = new scala.util.Random(7)
    def jitter() = (rng.nextInt(21) - 10) / 1000.0f
    val blobA = (0 until 20).map(i =>
      (i.toLong * 2, Array(1f + jitter(), 0f, 0f, 0f)))
    val blobB = (0 until 20).map(i =>
      (i.toLong * 2 + 1, Array(0f, 0f, 0f, 1f + jitter())))
    val emb = (blobA ++ blobB).toDF("vec_id", "embedding")
    val out = OCurate.kmeans(emb, k = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 40 && out.map(_._1).distinct.length == 40)
    // blob membership = parity of vec_id by construction; clusters must
    // match it exactly after 2 iterations
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.size == 2)
    assert(byCluster.values.toSet ==
      Set(blobA.map(_._1).toSet, blobB.map(_._1).toSet))
    for ((v, c, nm) <- out) assert(nm == byCluster(c).size)
  }

  test("bloom-pruned join passes every true match and prunes most non-matches") {
    val s = spark; val d = sfDir
    val dim = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_orderkey")
    val bf = dim.stat.bloomFilter("o_orderkey", math.max(dim.count(), 1L), 0.01)
    val bfB = s.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContain(k))
    val li = Tables.lineitem(s, d)
    val pruned = li.filter(mightContain(col("l_orderkey")))
    // no false negatives: joining after the prune loses no matches
    val nExact = li.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    val nExactPruned =
      pruned.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(nExact == nExactPruned, "bloom prune dropped true matches")
    val (nAll, nPruned) = (li.count(), pruned.count())
    assert(nPruned >= nExact, "bloom must keep all true matches")
    // at fpp=0.01 the survivor set should hug the true-match set, far
    // below the unpruned scan
    assert(nPruned < nAll / 2,
      s"expected real pruning: $nPruned of $nAll rows survived")
  }

  test("hash-range split partitions the corpus ~80/10/10 and is exhaustive") {
    val rows = SparkEntry.queries("i_split_train")(spark, sfDir).collect()
    val bySplit = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum
    assert(total == Tables.documents(spark, sfDir).count(),
      "every doc must land in exactly one split")
    val train = bySplit("train").toDouble / total
    // 500 docs → binomial noise; cc/256 ≈ 0.797 expected
    assert(train > 0.72 && train < 0.88, s"train share $train")
    assert(bySplit.keySet == Set("train", "val", "test"))
  }

  test("entropy is bounded by ln(n_types) and zero for single-type docs") {
    import spark.implicits._
    val fixture = Seq((1L, "a a a a"), (2L, "a b c d")).toDF("doc_id", "text")
    val r = graft.queries.QCurate.entropy(fixture).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((1L, 0.0)), s"uniform single-type doc: ${r(1L)}")
    assert(math.abs(r(2L)._2 - math.log(4)) < 1e-3,
      s"uniform 4-type doc must hit ln(4): ${r(2L)}")
    val corpus = SparkEntry.queries("i_entropy")(spark, sfDir).collect()
    assert(corpus.forall(x => x.getDouble(3) >= 0 &&
      x.getDouble(3) <= math.log(x.getLong(2).toDouble) + 1e-4))
  }

  test("temperature mixing boosts tail languages, shrinks the head, sums to 1") {
    val rows = SparkEntry.queries("i_mix_temperature")(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "p_temp must sum to 1")
    val (maxN, minN) = (rows.maxBy(_._1), rows.minBy(_._1))
    if (maxN._1 > minN._1) {
      assert(maxN._4 <= 1.0 + 1e-9, s"head language must shrink: $maxN")
      assert(minN._4 >= 1.0 - 1e-9, s"tail language must grow: $minN")
    }
  }

  test("vocab OOV rates are valid and train is the best-covered split") {
    val rows = SparkEntry.queries("i_vocab_oov")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    assert(rows.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("snapshot diff classes reconcile with both snapshot cardinalities") {
    val m = SparkEntry.queries("p_snapshot_diff")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val orders = Tables.orders(spark, sfDir)
    val nOld = orders.filter(col("o_orderkey") % 97 =!= 3).count()
    val nNew = orders.filter(col("o_orderkey") % 89 =!= 5).count()
    assert(m("unchanged") + m("changed") + m("removed") == nOld,
      s"old-side accounting: $m vs $nOld")
    assert(m("unchanged") + m("changed") + m("added") == nNew,
      s"new-side accounting: $m vs $nNew")
  }

  test("BPE encoding never grows a source's token count; ratio in (0, 1]") {
    val rows = SparkEntry.queries("i_bpe_encode")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (before, after, ratio) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(after <= before, s"merges can only shrink: $r")
      assert(ratio > 0.0 && ratio <= 1.0, s"ratio out of range: $r")
    }
  }

  test("PMI pairs are canonical (u <= v) and frequent enough") {
    val rows = SparkEntry.queries("i_cooccur_pmi")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(r => r.getString(0) <= r.getString(1)))
    assert(rows.forall(_.getLong(2) >= 5))
  }

  test("substring dedup matches a brute-force reference on random corpora") {
    val rng = new scala.util.Random(11)
    val K = 5
    for (trial <- 1 to 3) {
      // tiny vocabulary forces genuine shingle collisions, both within a
      // doc (self-repetition) and across docs
      val docs = (0 until 12).map { id =>
        val n = 3 + rng.nextInt(30)
        (id.toLong, (0 until n).map(_ => s"w${rng.nextInt(6)}").mkString(" "))
      }
      val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      val shingled = docs.map { case (id, text) =>
        val ws = text.split(" ")
        val sh = (0 to ws.length - K).map(i => ws.slice(i, i + K).mkString(" "))
        sh.foreach(s => counts(s) += 1)
        (id, ws.length.toLong, sh)
      }
      val expect = shingled.map { case (id, n, sh) =>
        val cov = sh.zipWithIndex
          .collect { case (s, i) if counts(s) >= 2 => i until i + K }
          .flatten.toSet
        id -> ((n, cov.size.toLong))
      }.toMap
      val got = graft.queries.QCurate
        .substringDedup(docsDf(docs.map(t => (t._1, t._2, "en", "x"))))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      for ((id, want) <- expect)
        assert(got(id) == want, s"trial $trial doc $id: got ${got(id)}, want $want")
    }
  }

  test("overlapping chunks tile the doc: starts on the stride grid, exact spans") {
    val text = (0 until 130).map(i => s"t$i").mkString(" ")
    val d = graft.queries.OCurate.chunkOverlap(docsDf(Seq((1L, text, "en", "a"))))
      .collect()
    assert(d.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    // C=50/S=40: spans [0,49],[40,89],[80,129],[120,129] — consecutive
    // chunks overlap by exactly 10 tokens, the tail chunk is short
    assert(d.map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 49L), (40L, 89L), (80L, 129L), (120L, 129L)))
    assert(d.map(_.getLong(2)).toSeq == Seq(50L, 50L, 50L, 10L))
  }

  test("substring dedup: exact copy fully flagged, unique text untouched, shared span counted once per position") {
    val copied = (1 to 10).map(i => s"c$i").mkString(" ")
    val d = graft.queries.QCurate.substringDedup(docsDf(Seq(
      (1L, copied, "en", "a"),                        // full duplicate of 2
      (2L, copied, "en", "b"),
      (3L, (1 to 10).map(i => s"u$i").mkString(" "), "en", "c"), // all unique
      // doc 4 embeds the copied span once inside unique context: exactly
      // the 10 copied tokens (+ nothing else) are flagged — overlapping
      // dup shingles must not double-count a position
      (4L, s"x1 x2 x3 $copied y1 y2 y3", "en", "d"))))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(d(1L) == ((10L, 10L, 10000L)), s"full dup: ${d(1L)}")
    assert(d(2L) == ((10L, 10L, 10000L)))
    assert(d(3L) == ((10L, 0L, 0L)), s"unique doc flagged: ${d(3L)}")
    assert(d(4L)._1 == 16L && d(4L)._2 == 10L, s"span coverage off: ${d(4L)}")
  }
}
