package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.r4

/** Group Q — corpus-curation operators, second wave (round 6): the
  * remaining standard moves of a production training-data pipeline that
  * the earlier groups did not yet cover, each a declarative plan with an
  * exact DuckDB oracle.
  *
  *  - `i_split_train`: deterministic train/val/test corpus split by an
  *    md5 key range (~80/10/10). Hash-range splits are the production
  *    contract: the same doc lands in the same split on every engine,
  *    every rerun, and any subset of the corpus — no rand(), no state.
  *  - `i_mix_temperature`: temperature-scaled sampling weights across
  *    languages (α = 0.5, i.e. p_l ∝ √n_l), the standard multilingual
  *    rebalancing move — boosts tail languages without flattening the
  *    mix to uniform.
  *  - `i_containment`: asymmetric shingle containment C(A→B) =
  *    |A∩B| / |A| — the quote/inclusion detector that Jaccard misses
  *    (a doc pasted inside a bigger doc has high containment but low
  *    Jaccard). Candidate pairs come from a shingle equi-join, never an
  *    all-pairs product.
  *  - `i_winnowing`: winnowing fingerprint selection (Schleimer et al.
  *    2003, the MOSS algorithm): per window of `W` consecutive k-gram
  *    hashes keep the rightmost minimum. Guarantees a match of length
  *    ≥ W+K−1 is always caught while storing ~2/(W+1) of the hashes —
  *    the principled sub-document fingerprint (vs `i_fingerprint`'s
  *    whole-doc minhash).
  *  - `i_ppl_buckets`: CCNet-style quality bucketing — per-language
  *    deciles of the bigram-LM score, classed head/middle/tail. The
  *    standard "keep the head, drop the tail" curation gate.
  *  - `i_bpe_encode`: apply the 4 learned BPE merges (`i_bpe_merges`)
  *    to the whole corpus and report per-source compression — the
  *    encode side of tokenizer training.
  *  - `p_snapshot_diff`: table-snapshot reconciliation — added /
  *    removed / changed / unchanged row classes from one full outer
  *    join on the key, the audit primitive behind every incremental
  *    pipeline handoff.
  *
  * Scale posture: the split and temperature keys are one scan plus a
  * grouped aggregate (the threshold table is broadcastable); containment
  * shuffles on the shingle (linear in corpus + pair-overlap output, the
  * same class as the LSH candidate join); winnowing is two window passes
  * plus a bounded ×W position expansion — linear; the snapshot diff is
  * one shuffle on the key with partial aggregation. Nothing collects to
  * the driver.
  */
object QCurate {

  private val K = 5 // winnowing k-gram length (tokens)
  private val W = 4 // winnowing window: picks 1 fingerprint per W hashes

  /** DuckDB hex→int for the first 4 md5 hex chars (the i_simhash_port
    * recipe; DuckDB has no conv()). */
  private def duckHex4(e: String): String =
    (1 to 4).map { i =>
      val shift = math.pow(16, 4 - i).toLong
      s"(strpos('0123456789abcdef', substring($e, $i, 1)) - 1) * $shift"
    }.mkString("(", " + ", ")")

  /** Deterministic hash-range split: md5 first byte < 0xcc → train
    * (~204/256), < 0xe6 → val (~26/256), else test. Lexicographic
    * compare on lowercase hex is identical in every engine. */
  def splitAssign(docs: DataFrame): DataFrame =
    docs.withColumn("h2",
        substring(md5(col("doc_id").cast("string")), 1, 2))
      .withColumn("split",
        when(col("h2") < "cc", "train")
          .when(col("h2") < "e6", "val")
          .otherwise("test"))

  /** Per-(split, lang) docs + token volume — the split audit table. */
  def splitAudit(docs: DataFrame): DataFrame =
    splitAssign(docs)
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .orderBy("split", "lang")

  /** Temperature-scaled language sampling weights: p_l ∝ n_l^α with
    * α = 0.5 (√n — exactly portable: IEEE sqrt is correctly rounded).
    * `boost` > 1 means the language is upsampled vs its natural share. */
  def mixTemperature(docs: DataFrame): DataFrame = {
    val pl = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val tot = pl.agg(sum("n_docs").as("n"), sum(sqrt(col("n_docs"))).as("sw"))
    pl.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        r4(col("n_docs") / col("n")).as("p_raw"),
        r4(sqrt(col("n_docs")) / col("sw")).as("p_temp"),
        r4(sqrt(col("n_docs")) / col("sw") / (col("n_docs") / col("n")))
          .as("boost"))
      .orderBy("lang")
  }

  /** Asymmetric containment over 3-token shingle sets, candidates from a
    * shingle equi-join (work ∝ shared-shingle pairs, never corpus²). */
  def containment(docs: DataFrame, minCont: Double = 0.5): DataFrame = {
    val sh = NTrainOps.shingles3(docs, "doc_id")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("doc_id").as("a_id"), col("sh"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh")), "sh")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("nb")), "b_id")
      .withColumn("cont_a", r4(col("n_inter").cast("double") / col("na")))
      .withColumn("cont_b", r4(col("n_inter").cast("double") / col("nb")))
      .filter(col("cont_a") >= minCont || col("cont_b") >= minCont)
      .select("a_id", "b_id", "n_inter", "na", "nb", "cont_a", "cont_b")
      .orderBy("a_id", "b_id")
  }

  /** (doc_id, pos, h): the doc's k-gram hash sequence (first 4 md5 hex
    * digits as an integer — engine-portable). */
  private def winnowGrams(docs: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("gram", concat_ws(" ",
        (0 until K).map(i => if (i == 0) col("w") else lead("w", i).over(byDoc)): _*))
      .filter(size(split(col("gram"), " ")) === K)
      .withColumn("h", conv(substring(md5(col("gram")), 1, 4), 16, 10).cast("long"))
      .select("doc_id", "pos", "h")
  }

  /** The selected fingerprints (doc_id, fp_pos, h): per window of W
    * consecutive k-gram hashes, the RIGHTMOST minimum. Relationally:
    * window-min per start, then an equi-join of each position onto the
    * ≤ W window starts it covers picks argmax(pos) among the minima.
    * Guarantee (Schleimer et al. 2003): two docs sharing ≥ W+K−1
    * consecutive tokens share at least one selected fingerprint. */
  def winnowingFps(docs: DataFrame): DataFrame =
    fpsFromGrams(winnowGrams(docs).cutLineage())

  private def fpsFromGrams(grams: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val ng = grams.groupBy("doc_id").agg(max("pos").as("max_pos"))
    // window minimum per start position (starts need W full hashes)
    val starts = grams
      .withColumn("wm", min("h").over(byDoc.rowsBetween(0, W - 1)))
      .join(ng, "doc_id")
      .filter(col("pos") <= col("max_pos") - (W - 1))
      .select(col("doc_id"), col("pos").as("s"), col("wm"))
    // each gram position covers window starts [pos-W+1, pos]
    val cover = grams
      .select(col("doc_id"), col("pos"), col("h"),
        explode(sequence(greatest(col("pos") - (W - 1), lit(0)), col("pos"))).as("s"))
    cover.join(starts, Seq("doc_id", "s"))
      .filter(col("h") === col("wm"))
      .groupBy("doc_id", "s").agg(max("pos").as("fp_pos"), min("h").as("h"))
      .select("doc_id", "fp_pos", "h").distinct()
  }

  /** Winnowing fingerprint density per doc: k-gram hashes (first 4 md5
    * hex digits as an integer — engine-portable), then per window of W
    * consecutive hashes select the RIGHTMOST minimum. */
  def winnowing(docs: DataFrame): DataFrame = {
    // one gram pass feeds the per-doc totals AND the fingerprint
    // selection (which itself reads grams three ways) — materialize it
    val grams = winnowGrams(docs).cutLineage()
    val ng = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"),
      max("pos").as("max_pos"))
    val fp = fpsFromGrams(grams)
      .groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    ng.join(fp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        r4(coalesce(col("n_fp"), lit(0L)).cast("double") / col("n_grams"))
          .as("density"))
      .orderBy("doc_id")
  }

  /** Exact substring-level duplication (the C4/MassiveText "remove
    * duplicated spans" practice; Lee et al. 2022 measure it on token
    * 50-grams — K-grams here at fixture scale): every K-token shingle
    * occurring MORE THAN ONCE anywhere in the corpus (cross-doc or
    * self-repetition) marks its K covered positions duplicated; per doc,
    * report token count, duplicated-token count, and the duplicated
    * fraction in half-up basis points. The span-cutting rewrite is a
    * trivial projection over these flags — the measurement is the
    * expensive part and the one that must scale.
    *
    * Scale shape: shingles are counted by grouping on their md5 (bounded
    * key width regardless of K — and engine-portable); the duplicated-
    * occurrence join is an equi-join on that hash, never pairs; coverage
    * is a ×K positions explode deduped per doc. Total work ∝ corpus
    * tokens · K, one shuffle each for the count, the join, and the
    * per-doc rollup. */
  def substringDedup(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val win = Window.partitionBy("doc_id").orderBy("pos")
    // one window pass builds the K-gram (the K leads share one spec)
    val sh = tok
      .withColumn("g", concat_ws(" ",
        col("w") +: (1 until K).map(i => lead("w", i).over(win)): _*))
      .withColumn("wk", lead("w", K - 1).over(win))
      .filter(col("wk").isNotNull)
      .select(col("doc_id"), col("pos"), md5(col("g")).as("h"))
    val dup = sh.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("h")
    val cover = sh.join(dup, "h")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (K - 1))).as("p"))
      .distinct()
    val nd = cover.groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    tok.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      .join(nd, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_tokens"),
        expr("(2 * coalesce(n_dup, 0) * 10000 + n_tokens) DIV (2 * n_tokens)")
          .as("dup_bp"))
      .orderBy("doc_id")
  }

  /** Per-doc bigram-LM score (the i_bigram_lm pipeline, reused). */
  private def bigramScores(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val big = tok.withColumn("nx", lead("w", 1).over(win))
      .filter(col("nx").isNotNull).select("doc_id", "w", "nx")
    val bg = big.groupBy("w", "nx").agg(count(lit(1)).as("c_big"))
    val un = big.groupBy("w").agg(count(lit(1)).as("c_uni"))
    val model = bg.join(un, "w")
      .withColumn("ln_p", log(col("c_big") / col("c_uni")))
    big.join(model, Seq("w", "nx"))
      .groupBy("doc_id")
      .agg(r4(avg("ln_p")).as("score"))
  }

  /** CCNet-style head/middle/tail quality buckets: per-language deciles
    * of the (rounded) LM score, deciles 1–2 = head, 3–7 = middle,
    * 8–10 = tail. Ties broken by doc_id so the decile edge is exact on
    * both engines. */
  def pplBuckets(docs: DataFrame): DataFrame = {
    val scored = bigramScores(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val decile = ntile(10).over(
      Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id")))
    scored.withColumn("decile", decile)
      .withColumn("bucket",
        when(col("decile") <= 2, "head")
          .when(col("decile") <= 7, "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        max("score").as("best"), min("score").as("worst"))
      .orderBy("lang", "bucket")
  }

  /** Encode the corpus with the 4 learned BPE merges (the i_bpe_merges
    * loop) and report per-source compression. */
  def bpeEncode(docs: DataFrame): DataFrame = {
    var txt = docs.select(col("doc_id"), col("source"), col("text"),
      concat(lit(" "), col("text"), lit(" ")).as("txt"))
    for (_ <- 1 to 4) {
      // adjacent pairs via a narrow array transform (see i_bpe_merges):
      // the only shuffle per round is the pair-count aggregate
      val top = txt
        .select(split(trim(col("txt")), " ").as("tk"))
        .select(explode(expr("CASE WHEN size(tk) >= 2 THEN " +
          "transform(sequence(0, size(tk) - 2), " +
          "i -> struct(tk[i] AS w, tk[i + 1] AS nx)) " +
          "ELSE array() END")).as("p"))
        .select(col("p.w").as("w"), col("p.nx").as("nx"))
        .groupBy("w", "nx").agg(count(lit(1)).as("c"))
        // global argmax as TakeOrderedAndProject — never a one-partition
        // window over the full pair-count table
        .orderBy(col("c").desc, col("w").asc, col("nx").asc)
        .limit(1)
        .select(col("w").as("mw"), col("nx").as("mnx"))
      // cut the lineage: round i+1's pair-count branch AND the merged-text
      // branch both consume txt — without the checkpoint each round
      // replays every earlier round's window+replace chain
      txt = txt.crossJoin(broadcast(top))
        .select(col("doc_id"), col("source"), col("text"), expr(
          "replace(txt, ' ' || mw || ' ' || mnx || ' ', " +
            "' ' || mw || '_' || mnx || ' ')").as("txt"))
        .cutLineage()
    }
    txt
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("t_before"),
        size(split(trim(col("txt")), " ")).cast("long").as("t_after"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("t_before").as("tok_before"), sum("t_after").as("tok_after"),
        r4(sum("t_after") / sum("t_before").cast("double")).as("ratio"))
      .orderBy("source")
  }

  /** PMI co-occurrence (word2vec-era corpus statistics): count unordered
    * token pairs within a ±2 window (narrow array transforms — no token
    * stream shuffle), keep pairs seen ≥ `minPair` times, score
    * PMI = ln(n_uv·N / (n_u·n_v)) with marginals from the pair events,
    * and emit the top `topK`. All counts stay integral until the one ln. */
  def cooccurPmi(docs: DataFrame, minPair: Long = 5, topK: Int = 50): DataFrame = {
    val tk = docs.select(split(col("text"), " ").as("tk"))
    val prs = tk.select(explode(concat(
        expr("CASE WHEN size(tk) >= 2 THEN transform(sequence(0, size(tk) - 2), " +
          "i -> struct(least(tk[i], tk[i + 1]) AS u, " +
          "greatest(tk[i], tk[i + 1]) AS v)) ELSE array() END"),
        expr("CASE WHEN size(tk) >= 3 THEN transform(sequence(0, size(tk) - 3), " +
          "i -> struct(least(tk[i], tk[i + 2]) AS u, " +
          "greatest(tk[i], tk[i + 2]) AS v)) ELSE array() END"))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
    // materialize the pair counts once: marginals (×2), the total, and
    // the scored output all consume cnt — without the cut each branch
    // replays the corpus explode + count shuffle (5 full passes)
    val cnt = prs.groupBy("u", "v").agg(count(lit(1)).as("n_uv"))
      .cutLineage()
    val marg = cnt.select(col("u").as("w"), col("n_uv"))
      .union(cnt.select(col("v").as("w"), col("n_uv")))
      .groupBy("w").agg(sum("n_uv").as("n_w"))
    val tot = cnt.agg(sum("n_uv").as("nn"))
    cnt.filter(col("n_uv") >= minPair)
      .join(marg.select(col("w").as("u"), col("n_w").as("n_u")), "u")
      .join(marg.select(col("w").as("v"), col("n_w").as("n_v")), "v")
      .crossJoin(broadcast(tot))
      .withColumn("pmi", r4(log(col("n_uv") * col("nn") /
        (col("n_u") * col("n_v")))))
      .select("u", "v", "n_uv", "pmi")
      .orderBy(col("pmi").desc, col("u"), col("v")).limit(topK)
  }

  /** Per-doc unigram entropy H = ln(n) − Σc·ln(c)/n — the vocabulary-
    * diversity quality signal (low entropy = repetitive/templated text). */
  def entropy(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        r4(log(sum("c")) - sum(col("c") * log(col("c"))) / sum("c"))
          .as("entropy"))
      .orderBy("doc_id")

  /** Zipf fit: least-squares slope of ln(freq) vs ln(rank) over the top
    * `topN` words — natural corpora sit near slope ≈ −1; synthetic or
    * templated corpora drift. One grouped count + a 100-row regression. */
  def zipfFit(docs: DataFrame, topN: Int = 100): DataFrame = {
    val freq = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    // top-N via TakeOrderedAndProject (per-partition top-N + driver
    // merge), THEN re-rank the bounded survivors — the only window here
    // runs over topN rows, never the full vocabulary
    val ranked = freq
      .orderBy(col("f").desc, col("w")).limit(topN)
      .withColumn("r", row_number().over(
        Window.orderBy(col("f").desc, col("w"))))
      .select(log(col("r")).as("x"), log(col("f")).as("y"))
    val vocab = freq.agg(count(lit(1)).as("n_vocab"))
    ranked
      .agg(count(lit(1)).as("n_fit"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .crossJoin(broadcast(vocab))
      .select(col("n_vocab"), col("n_fit"),
        r4((col("n_fit") * col("sxy") - col("sx") * col("sy")) /
          (col("n_fit") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        r4((col("sy") - (col("n_fit") * col("sxy") - col("sx") * col("sy")) /
          (col("n_fit") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("n_fit")).as("intercept"))
  }

  /** Tokenizer-vocabulary coverage audit: learn a top-`vocabSize` word
    * vocabulary from the TRAIN split only (the [[splitAssign]] hash
    * ranges), then measure the out-of-vocabulary token rate on every
    * split — the held-out OOV check a tokenizer ships with. The vocab is
    * broadcast; scoring is one linear pass. */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 500): DataFrame = {
    val tok = splitAssign(docs)
      .select(col("split"), explode(split(col("text"), " ")).as("w"))
    val vocab = tok.filter(col("split") === "train")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("w"))))
      .filter(col("r") <= vocabSize)
      .select("w")
    tok.join(broadcast(vocab.withColumn("in_v", lit(1L))), Seq("w"), "left")
      .groupBy("split")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", r4(col("n_oov").cast("double") / col("n_tokens")))
      .orderBy("split")
  }

  /** Snapshot reconciliation: classify every key as added / removed /
    * changed / unchanged between two snapshots derived deterministically
    * from `orders` (drop key%97==3 from OLD, key%89==5 from NEW, bump
    * o_totalprice by 10 where key%11==0 in NEW). */
  def snapshotDiff(orders: DataFrame): DataFrame = {
    val old = orders.filter(col("o_orderkey") % 97 =!= 3)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v_old"))
    val nw = orders.filter(col("o_orderkey") % 89 =!= 5)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 10)
          .otherwise(col("o_totalprice")).as("v_new"))
    old.join(nw, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("v_old").isNull, "added")
          .when(col("v_new").isNull, "removed")
          .when(col("v_old") =!= col("v_new"), "changed")
          .otherwise("unchanged"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), min("k").as("min_key"), max("k").as("max_key"))
      .orderBy("status")
  }

  val m: ListMap[String, Q] = ListMap(
    "i_split_train" -> ((s, d) => splitAudit(Tables.documents(s, d))),
    "i_mix_temperature" -> ((s, d) => mixTemperature(Tables.documents(s, d))),
    // bounded candidate set like the other pairwise demonstration keys;
    // the fixture corpus has no heavy inclusions, so the key binds the
    // threshold at 0.1 (the API default 0.5 is the production gate)
    "i_containment" -> ((s, d) =>
      containment(Tables.documents(s, d).filter(col("doc_id") < 120), 0.1)),
    "i_winnowing" -> ((s, d) => winnowing(Tables.documents(s, d))),
    "i_substring_dedup" -> ((s, d) => substringDedup(Tables.documents(s, d))),
    "i_ppl_buckets" -> ((s, d) => pplBuckets(Tables.documents(s, d))),
    "i_bpe_encode" -> ((s, d) => bpeEncode(Tables.documents(s, d))),
    "p_snapshot_diff" -> ((s, d) => snapshotDiff(Tables.orders(s, d))),
    "i_cooccur_pmi" -> ((s, d) => cooccurPmi(Tables.documents(s, d))),
    "i_entropy" -> ((s, d) => entropy(Tables.documents(s, d))),
    "i_zipf" -> ((s, d) => zipfFit(Tables.documents(s, d))),
    "i_vocab_oov" -> ((s, d) => vocabCoverage(Tables.documents(s, d))),
  )

  val oracle: ListMap[String, String] = ListMap(
    "i_split_train" ->
      ("WITH s AS (SELECT lang, text, CASE " +
        "WHEN substring(md5(doc_id::VARCHAR), 1, 2) < 'cc' THEN 'train' " +
        "WHEN substring(md5(doc_id::VARCHAR), 1, 2) < 'e6' THEN 'val' " +
        "ELSE 'test' END AS split FROM documents) " +
        "SELECT split, lang, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens " +
        "FROM s GROUP BY split, lang ORDER BY split, lang"),
    "i_mix_temperature" ->
      ("WITH pl AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang), " +
        "tot AS (SELECT sum(n_docs) AS n, sum(sqrt(n_docs)) AS sw FROM pl) " +
        "SELECT lang, n_docs, round(n_docs / n, 4) AS p_raw, " +
        "round(sqrt(n_docs) / sw, 4) AS p_temp, " +
        "round(sqrt(n_docs) / sw / (n_docs / n), 4) AS boost " +
        "FROM pl CROSS JOIN tot ORDER BY lang"),
    "i_containment" ->
      ("WITH tok AS (SELECT doc_id, " +
        "generate_subscripts(string_split(text, ' '), 1) - 1 AS pos, " +
        "unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id < 120), " +
        "sh AS (SELECT DISTINCT doc_id, w || ' ' || " +
        "lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS sh FROM tok " +
        "WINDOW win AS (PARTITION BY doc_id ORDER BY pos) " +
        "QUALIFY lead(w, 2) OVER win IS NOT NULL), " +
        "sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id), " +
        "inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) n_inter " +
        "FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id " +
        "GROUP BY a.doc_id, b.doc_id) " +
        "SELECT a_id, b_id, n_inter, sa.n_sh AS na, sb.n_sh AS nb, " +
        "round(n_inter::DOUBLE / sa.n_sh, 4) AS cont_a, " +
        "round(n_inter::DOUBLE / sb.n_sh, 4) AS cont_b " +
        "FROM inter JOIN sizes sa ON sa.doc_id = a_id " +
        "JOIN sizes sb ON sb.doc_id = b_id " +
        "WHERE round(n_inter::DOUBLE / sa.n_sh, 4) >= 0.1 " +
        "OR round(n_inter::DOUBLE / sb.n_sh, 4) >= 0.1 " +
        "ORDER BY a_id, b_id"),
    "i_substring_dedup" ->
      ("WITH tok AS (SELECT doc_id, " +
        "generate_subscripts(string_split(text, ' '), 1) - 1 AS pos, " +
        "unnest(string_split(text, ' ')) AS w FROM documents), " +
        "sh0 AS (SELECT doc_id, pos, concat_ws(' ', w, " +
        (1 until K).map(i => s"lead(w, $i) OVER wd").mkString(", ") +
        s") AS g, lead(w, ${K - 1}) OVER wd AS wk FROM tok " +
        "WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)), " +
        "sh AS (SELECT doc_id, pos, md5(g) AS h FROM sh0 WHERE wk IS NOT NULL), " +
        "dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) >= 2), " +
        "cover AS (SELECT DISTINCT doc_id, p FROM (SELECT doc_id, " +
        s"unnest(generate_series(pos, pos + ${K - 1})) AS p FROM sh JOIN dup USING (h))), " +
        "nd AS (SELECT doc_id, count(*) AS n_dup FROM cover GROUP BY doc_id), " +
        "nt AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id) " +
        "SELECT t.doc_id, t.n_tokens, " +
        "CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_tokens, " +
        "CAST((2 * coalesce(d.n_dup, 0) * 10000 + t.n_tokens) // (2 * t.n_tokens) " +
        "AS BIGINT) AS dup_bp " +
        "FROM nt t LEFT JOIN nd d USING (doc_id) ORDER BY t.doc_id"),
    "i_winnowing" ->
      ("WITH tok AS (SELECT doc_id, " +
        "generate_subscripts(string_split(text, ' '), 1) - 1 AS pos, " +
        "unnest(string_split(text, ' ')) AS w FROM documents), " +
        "g0 AS (SELECT doc_id, pos, w " +
        (1 until K).map(i => s"|| ' ' || lead(w, $i) OVER win").mkString(" ") +
        " AS gram FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos) " +
        s"QUALIFY lead(w, ${K - 1}) OVER win IS NOT NULL), " +
        "grams AS (SELECT doc_id, pos, " +
        duckHex4("substring(md5(gram), 1, 4)") + " AS h FROM g0), " +
        "ng AS (SELECT doc_id, count(*) AS n_grams, max(pos) AS max_pos " +
        "FROM grams GROUP BY doc_id), " +
        "starts AS (SELECT g.doc_id, g.pos AS s, min(g.h) OVER " +
        "(PARTITION BY g.doc_id ORDER BY g.pos " +
        s"ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS wm " +
        "FROM grams g JOIN ng USING (doc_id) " +
        s"QUALIFY g.pos <= ng.max_pos - ${W - 1}), " +
        "cover AS (SELECT doc_id, pos, h, " +
        s"unnest(generate_series(greatest(pos - ${W - 1}, 0), pos)) AS s " +
        "FROM grams), " +
        "sel AS (SELECT DISTINCT doc_id, fp_pos FROM (" +
        "SELECT c.doc_id, c.s, max(c.pos) AS fp_pos " +
        "FROM cover c JOIN starts st ON st.doc_id = c.doc_id AND st.s = c.s " +
        "WHERE c.h = st.wm GROUP BY c.doc_id, c.s)), " +
        "fp AS (SELECT doc_id, count(*) AS n_fp FROM sel GROUP BY doc_id) " +
        "SELECT ng.doc_id, ng.n_grams, coalesce(fp.n_fp, 0) AS n_fp, " +
        "round(coalesce(fp.n_fp, 0)::DOUBLE / ng.n_grams, 4) AS density " +
        "FROM ng LEFT JOIN fp USING (doc_id) ORDER BY ng.doc_id"),
    "i_ppl_buckets" ->
      ("WITH tok AS (SELECT doc_id, " +
        "generate_subscripts(string_split(text, ' '), 1) - 1 AS pos, " +
        "unnest(string_split(text, ' ')) AS w FROM documents), " +
        "b2 AS (SELECT doc_id, w, nx FROM (" +
        "SELECT doc_id, w, lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) nx " +
        "FROM tok) WHERE nx IS NOT NULL), " +
        "bg AS (SELECT w, nx, count(*) c_big FROM b2 GROUP BY w, nx), " +
        "un AS (SELECT w, count(*) c_uni FROM b2 GROUP BY w), " +
        "model AS (SELECT bg.w, bg.nx, ln(c_big::DOUBLE / c_uni) ln_p " +
        "FROM bg JOIN un ON bg.w = un.w), " +
        "scored AS (SELECT doc_id, round(avg(ln_p), 4) AS score " +
        "FROM b2 JOIN model ON b2.w = model.w AND b2.nx = model.nx " +
        "GROUP BY doc_id), " +
        "dec AS (SELECT s.doc_id, d.lang, s.score, " +
        "ntile(10) OVER (PARTITION BY d.lang ORDER BY s.score DESC, s.doc_id) " +
        "AS decile FROM scored s JOIN documents d ON s.doc_id = d.doc_id) " +
        "SELECT lang, CASE WHEN decile <= 2 THEN 'head' " +
        "WHEN decile <= 7 THEN 'middle' ELSE 'tail' END AS bucket, " +
        "count(*) AS n_docs, max(score) AS best, min(score) AS worst " +
        "FROM dec GROUP BY 1, 2 ORDER BY lang, bucket"),
    "i_bpe_encode" -> {
      val rounds = (1 to 4).map { i =>
        s"tok$i AS (SELECT doc_id, " +
          "generate_subscripts(string_split(trim(txt), ' '), 1) pos, " +
          s"unnest(string_split(trim(txt), ' ')) w FROM t${i - 1}), " +
          s"pc$i AS (SELECT w, nx, count(*) c FROM (" +
          "SELECT w, lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) nx " +
          s"FROM tok$i) WHERE nx IS NOT NULL GROUP BY w, nx), " +
          s"top$i AS (SELECT w, nx, c FROM (SELECT *, " +
          "row_number() OVER (ORDER BY c DESC, w ASC, nx ASC) rn " +
          s"FROM pc$i) WHERE rn = 1), " +
          s"t$i AS (SELECT doc_id, replace(txt, ' ' || w || ' ' || nx || ' ', " +
          s"' ' || w || '_' || nx || ' ') txt FROM t${i - 1} CROSS JOIN top$i)"
      }.mkString(", ")
      "WITH t0 AS (SELECT doc_id, ' ' || text || ' ' txt FROM documents), " +
        rounds + " " +
        "SELECT d.source, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS tok_before, " +
        "CAST(sum(len(string_split(trim(t4.txt), ' '))) AS BIGINT) AS tok_after, " +
        "round(sum(len(string_split(trim(t4.txt), ' ')))::DOUBLE / " +
        "sum(len(string_split(d.text, ' '))), 4) AS ratio " +
        "FROM t4 JOIN documents d ON t4.doc_id = d.doc_id " +
        "GROUP BY d.source ORDER BY d.source"
    },
    // the oracle counts pairs by a positional self-join — a different
    // (quadratic-ish) formulation that must agree with the narrow
    // array-transform pair generation value-for-value
    "i_cooccur_pmi" ->
      ("WITH tok AS (SELECT doc_id, " +
        "generate_subscripts(string_split(text, ' '), 1) AS pos, " +
        "unnest(string_split(text, ' ')) AS w FROM documents), " +
        "pr AS (SELECT least(a.w, b.w) u, greatest(a.w, b.w) v FROM tok a " +
        "JOIN tok b ON a.doc_id = b.doc_id AND b.pos - a.pos IN (1, 2)), " +
        "cnt AS (SELECT u, v, count(*) n_uv FROM pr GROUP BY u, v), " +
        "marg AS (SELECT w, sum(n) n_w FROM (" +
        "SELECT u w, n_uv n FROM cnt UNION ALL SELECT v, n_uv FROM cnt) " +
        "GROUP BY w), " +
        "tot AS (SELECT sum(n_uv) nn FROM cnt) " +
        "SELECT u, v, n_uv, round(ln(n_uv * nn / (mu.n_w * mv.n_w)), 4) pmi " +
        "FROM cnt JOIN marg mu ON mu.w = u JOIN marg mv ON mv.w = v " +
        "CROSS JOIN tot WHERE n_uv >= 5 " +
        "ORDER BY pmi DESC, u, v LIMIT 50"),
    "i_entropy" ->
      ("SELECT doc_id, CAST(sum(c) AS BIGINT) n_tokens, " +
        "count(*) AS n_types, " +
        "round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy " +
        "FROM (SELECT doc_id, w, count(*) c FROM (" +
        "SELECT doc_id, unnest(string_split(text, ' ')) w FROM documents) " +
        "GROUP BY doc_id, w) GROUP BY doc_id ORDER BY doc_id"),
    "i_zipf" ->
      ("WITH freq AS (SELECT w, count(*) f FROM (" +
        "SELECT unnest(string_split(text, ' ')) w FROM documents) GROUP BY w), " +
        "ranked AS (SELECT ln(r) x, ln(f) y FROM (" +
        "SELECT f, row_number() OVER (ORDER BY f DESC, w) r FROM freq) " +
        "WHERE r <= 100), " +
        "s AS (SELECT count(*) n_fit, sum(x) sx, sum(y) sy, " +
        "sum(x * y) sxy, sum(x * x) sxx FROM ranked), " +
        "vc AS (SELECT count(*) n_vocab FROM freq) " +
        "SELECT n_vocab, n_fit, " +
        "round((n_fit * sxy - sx * sy) / (n_fit * sxx - sx * sx), 4) slope, " +
        "round((sy - (n_fit * sxy - sx * sy) / (n_fit * sxx - sx * sx) * sx) " +
        "/ n_fit, 4) intercept FROM s CROSS JOIN vc"),
    "i_vocab_oov" ->
      ("WITH tok AS (SELECT CASE " +
        "WHEN substring(md5(doc_id::VARCHAR), 1, 2) < 'cc' THEN 'train' " +
        "WHEN substring(md5(doc_id::VARCHAR), 1, 2) < 'e6' THEN 'val' " +
        "ELSE 'test' END AS split, unnest(string_split(text, ' ')) AS w " +
        "FROM documents), " +
        "vocab AS (SELECT w FROM (SELECT w, row_number() OVER " +
        "(ORDER BY count(*) DESC, w) r FROM tok WHERE split = 'train' " +
        "GROUP BY w) WHERE r <= 500) " +
        "SELECT split, count(*) AS n_tokens, " +
        "CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, " +
        "round(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::DOUBLE " +
        "/ count(*), 4) AS oov_rate " +
        "FROM tok t LEFT JOIN vocab v ON t.w = v.w " +
        "GROUP BY split ORDER BY split"),
    "p_snapshot_diff" ->
      ("WITH old AS (SELECT o_orderkey k, o_totalprice v_old FROM orders " +
        "WHERE o_orderkey % 97 <> 3), " +
        "nw AS (SELECT o_orderkey k, CASE WHEN o_orderkey % 11 = 0 " +
        "THEN o_totalprice + 10 ELSE o_totalprice END v_new FROM orders " +
        "WHERE o_orderkey % 89 <> 5) " +
        "SELECT CASE WHEN v_old IS NULL THEN 'added' " +
        "WHEN v_new IS NULL THEN 'removed' " +
        "WHEN v_old <> v_new THEN 'changed' ELSE 'unchanged' END AS status, " +
        "count(*) AS n, min(k) AS min_key, max(k) AS max_key " +
        "FROM old FULL OUTER JOIN nw USING (k) " +
        "GROUP BY status ORDER BY status"),
  )
}
