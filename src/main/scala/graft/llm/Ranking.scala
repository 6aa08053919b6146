package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level ranking and association scoring: BM25 document ranking
  * and PMI bigram collocations — the retrieval/statistics layer a
  * training-data pipeline runs on top of its token counts (data
  * selection by query relevance; collocation mining for tokenizer and
  * phrase vocabularies).
  *
  * Determinism contract (same as [[TextAnalysis.unigramSurprisal]]):
  * every per-item score is ONE fixed IEEE expression chain mirrored
  * verbatim in the DuckDB oracle, and anything summed across rows is
  * quantized to integer micro-units FIRST, so totals are
  * order-independent across partial-aggregation orders and engines.
  */
object Ranking {

  /** BM25 (Robertson/Lucene `+1` idf, so scores are always positive)
    * top-k documents for a fixed query term set.
    *
    * Scale shape: ONE token explode feeding one (doc, bucket)
    * aggregate — non-query terms collapse into a null bucket map-side,
    * so the shuffle carries ≤ |queryTerms|+1 rows per doc per
    * partition; tf, doc length, df, and the corpus stats all derive
    * from that aggregate (df and stats as tiny broadcasts), and the
    * final top-k is a TakeOrdered, not a global sort.
    *
    * Per-(doc, term) scores are quantized to integer micro-units before
    * the per-doc sum, so the total is exact and order-independent.
    */
  def bm25TopDocs(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // ONE corpus pass: non-query terms collapse into a null bucket, so
    // the (doc, bucket) aggregate carries BOTH the per-(doc, term) tf
    // (non-null buckets) and the doc length (sum over all buckets).
    // The bucket aggregate's exchange is shared by the dl and tf
    // branches (ReusedExchange) — the naive spelling re-scanned and
    // re-exploded the corpus four times (dl, tf, df, stats).
    // the explicit isNotNull makes every consumer branch's scan
    // predicate identical — without it, join branches push
    // IsNotNull(doc_id) and aggregate-only branches don't, the g
    // subtrees stop canonicalizing equal, and ReusedExchange can't fire
    val g = docs
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"),
        when(col("term").isin(queryTerms: _*), col("term")).as("qterm"))
      .agg(count(lit(1)).as("cnt"))
    val dl = g.groupBy("doc_id").agg(sum("cnt").as("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = g.filter(col("qterm").isNotNull)
      .select(col("doc_id"), col("qterm").as("term"), col("cnt").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val tfD = col("tf").cast("double")
    // ONE expression chain, mirrored in the oracle: idf * saturated-tf.
    val score = log((col("n_docs") - col("df") + lit(0.5))
        / (col("df") + lit(0.5)) + lit(1.0)) *
      (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double")
        / col("avgdl"))) * lit(1000000.0)
    tf.join(dl, "doc_id")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), bround(score).cast("long").as("s"))
      .groupBy("doc_id").agg(sum("s").as("score_micros"))
      .orderBy(col("score_micros").desc, col("doc_id"))
      .limit(k)
  }

  /** Interpolated bigram language-model scoring of every document
    * against a LM trained on the corpus itself — the relational core of
    * a CCNet-style perplexity quality filter (Wenzek et al. 2020):
    * documents whose token transitions are atypical for the corpus
    * (gibberish, boilerplate soup, wrong-language fragments) surface at
    * the bottom of the average-log-probability ranking.
    *
    * `p(w2|w1) = λ·c(w1 w2)/c(w1) + (1−λ)·c(w2)/N` — Jelinek-Mercer
    * interpolation with the unigram model, so no transition has zero
    * probability and ln() is total. The LM is self-trained, so every
    * document bigram is present in the count table (no OOV branch).
    *
    * Scale shape: unigram and bigram count tables are vocabulary-sized
    * map-side-combinable aggregates; per-distinct-bigram log-probs are
    * computed once on the count table (vocabulary-sized joins), and the
    * corpus-sized work is ONE equi-join of document bigrams against
    * that table (AQE broadcasts it when the vocabulary is small).
    * Per-bigram log-probs quantize to integer micro-nats before the
    * per-doc sum, so totals are order-independent across engines.
    */
  def bigramDocLogprob(docs: DataFrame, lambda: Double = 0.9,
      k: Int = 20): DataFrame = {
    val tk = docs.select(col("doc_id"),
      TextAnalysis.tokens(lower(col("text"))).as("tk"))
    // The two LM count tables materialize ONCE (localCheckpoint — the
    // pagerank_iter precedent): lazily, the unigram table is a consumer
    // of THREE branches (c1, c2, N) and the bigram explode of two, and
    // subtree canonicalization does not reuse any of them — the naive
    // plan scanned the corpus five times. Materialized counts are what
    // a production LM job persists anyway; everything downstream is
    // count-table-sized except the one corpus-sized scoring join.
    val uni = tk.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val n = uni.agg(sum("c").cast("double").as("n"))
    // per-(doc, bigram) counts, not raw bigram instances: the corpus
    // explode collapses map-side and the scoring join below carries one
    // row per DISTINCT doc bigram, weighted by k at the final sum.
    val dg = tk.filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(Dedup.tokenNgrams(col("tk"), 2)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("k"))
      .localCheckpoint()
    val bc = dg.groupBy("gram").agg(sum("k").as("c12"))
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .withColumn("w2", split(col("gram"), " ").getItem(1))
    // ONE fixed IEEE chain per distinct bigram, mirrored in the oracle,
    // then quantized — identical inputs (exact integer counts) make the
    // chain bit-deterministic across engines.
    val lp = bc
      .join(uni.select(col("w").as("w1"), col("c").cast("double").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").cast("double").as("c2")), "w2")
      .crossJoin(broadcast(n))
      .select(col("gram"),
        bround(log(lit(lambda) * (col("c12").cast("double") / col("c1"))
          + lit(1.0 - lambda) * (col("c2") / col("n"))) * lit(1000000.0))
          .cast("long").as("lp_micros"))
    dg.join(lp, Seq("gram"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        sum(col("k") * col("lp_micros")).as("sum_lp_micros"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_lp_micros"),
        round(col("sum_lp_micros").cast("double") / col("n_bigrams")
          / lit(1000000.0), 6).as("avg_logprob"))
      .orderBy(col("avg_logprob"), col("doc_id"))
      .limit(k)
  }

  /** Stupid-backoff trigram scoring (Brants, Popat, Xu, Och, Dean,
    * EMNLP 2007 — the LM smoothing DESIGNED for corpus-scale
    * distributed training: no discount normalization pass, scores are
    * raw count ratios with a fixed 0.4 back-off penalty, so the whole
    * "model" is three mergeable count tables). Counts train on the
    * non-`src0` sources; `src0` documents are scored — the held-out
    * split is what makes the back-off tiers actually fire (a model
    * scored on its own training corpus never backs off: every trigram
    * has count ≥ 1).
    *
    * S(w₃|w₁w₂) = c₃/c₂(w₁w₂) when the trigram was seen; else
    * 0.4·c₂(w₂w₃)/c₁(w₂); else 0.4·0.4·(c₁(w₃)+1)/(N+V) — an add-one
    * floor at the unigram base so OOV tokens score finitely (Brants
    * leaves the base case open; the floor is the standard choice).
    * Per-tier hit counts ride along, so the result also measures
    * train/eval n-gram coverage.
    *
    * Scale shape: three map-side-combinable count aggregates keyed by
    * vocabulary terms, one distinct-gram table, five vocabulary-sized
    * left joins (Zipf-hot heads are AQE skew-join territory), one
    * corpus-sized scoring join carrying per-(doc, gram) multiplicities.
    * Same determinism recipe as [[bigramDocLogprob]]: ONE fixed IEEE
    * chain per distinct gram over exact integer counts, quantized to
    * micro-units (0.4·(0.4·x) stays NESTED — a pre-folded 0.16 literal
    * would differ from the oracle's decimal product in the last ulp);
    * doc sums are integer.
    */
  def stupidBackoffScore(docs: DataFrame, k: Int = 30): DataFrame = {
    val tk = docs.select(col("doc_id"), col("source"),
      TextAnalysis.tokens(lower(col("text"))).as("tk"))
    val train = tk.filter(col("source") =!= "src0")
    val evalD = tk.filter(col("source") === "src0")
    val uni = train.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    val nv = uni.agg(sum("c1").cast("double").as("n"),
      count(lit(1)).cast("double").as("v"))
    val bi = train.filter(size(col("tk")) >= 2)
      .select(explode(Dedup.tokenNgrams(col("tk"), 2)).as("g2"))
      .groupBy("g2").agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val tri = train.filter(size(col("tk")) >= 3)
      .select(explode(Dedup.tokenNgrams(col("tk"), 3)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c3"))
    val dt = evalD.filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(Dedup.tokenNgrams(col("tk"), 3)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("k"))
      .localCheckpoint()
    val grams = dt.select("g").distinct()
      .withColumn("ws", split(col("g"), " "))
      .select(col("g"),
        concat_ws(" ", col("ws").getItem(0), col("ws").getItem(1)).as("ctx"),
        concat_ws(" ", col("ws").getItem(1), col("ws").getItem(2)).as("g23"),
        col("ws").getItem(1).as("w2"), col("ws").getItem(2).as("w3"))
    // seen-trigram ⇒ its context bigram is a train bigram, and
    // seen-right-bigram ⇒ w2 is train vocabulary: the tier guards make
    // every division's denominator non-null by construction
    val scored = grams
      .join(tri, Seq("g"), "left")
      .join(bi.select(col("g2").as("ctx"), col("c2").as("c2ctx")),
        Seq("ctx"), "left")
      .join(bi.select(col("g2").as("g23"), col("c2").as("c2r")),
        Seq("g23"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1ctx")),
        Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("c1w")),
        Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .select(col("g"),
        when(col("c3").isNotNull, lit(3))
          .when(col("c2r").isNotNull, lit(2))
          .otherwise(lit(1)).as("tier"),
        bround(log(
          when(col("c3").isNotNull,
            col("c3").cast("double") / col("c2ctx").cast("double"))
            .when(col("c2r").isNotNull,
              lit(0.4) * (col("c2r").cast("double") /
                col("c1ctx").cast("double")))
            .otherwise(lit(0.4) * (lit(0.4) *
              ((coalesce(col("c1w"), lit(0L)).cast("double") + lit(1.0)) /
                (col("n") + col("v")))))
        ) * lit(1000000.0)).cast("long").as("lp_micros"))
    dt.join(scored, Seq("g"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_trigrams"),
        sum(col("k") * col("lp_micros")).as("sum_lp_micros"),
        sum(when(col("tier") === 3, col("k")).otherwise(lit(0L))).as("hits3"),
        sum(when(col("tier") === 2, col("k")).otherwise(lit(0L))).as("hits2"),
        sum(when(col("tier") === 1, col("k")).otherwise(lit(0L))).as("hits1"))
      .select(col("doc_id"), col("n_trigrams"), col("sum_lp_micros"),
        col("hits3"), col("hits2"), col("hits1"),
        round(col("sum_lp_micros").cast("double") / col("n_trigrams")
          / lit(1000000.0), 6).as("avg_logprob"))
      .orderBy(col("avg_logprob"), col("doc_id"))
      .limit(k)
  }

  /** Pointwise mutual information of adjacent-token bigrams over the
    * whole corpus: PMI = ln(p(xy) / (p(x)·p(y))), keeping pairs seen at
    * least `minCount` times, top-k by PMI.
    *
    * Scale shape: the bigram and unigram counts are each ONE
    * map-side-combinable aggregate keyed by vocabulary (not corpus)
    * terms; the two scalar totals broadcast; the unigram joins onto the
    * bigram table are vocabulary-sized (Zipf-hot heads are AQE
    * skew-join territory). PMI itself is a single IEEE chain per
    * surviving bigram — no cross-row float summation anywhere.
    */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5, k: Int = 20): DataFrame = {
    val tk = docs.select(TextAnalysis.tokens(lower(col("text"))).as("tk"))
    val uc = tk.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val nu = uc.agg(sum("c").cast("double").as("nu"))
    val bc = tk.filter(size(col("tk")) >= 2)
      .select(explode(Dedup.tokenNgrams(col("tk"), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("pc"))
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .withColumn("w2", split(col("gram"), " ").getItem(1))
    val nb = bc.agg(sum("pc").cast("double").as("nb"))
    val pmi = bround(
      log((col("pc").cast("double") / col("nb"))
        / ((col("c1") / col("nu")) * (col("c2") / col("nu")))), 6)
    bc.filter(col("pc") >= minCount)
      .join(uc.select(col("w").as("w1"), col("c").cast("double").as("c1")), "w1")
      .join(uc.select(col("w").as("w2"), col("c").cast("double").as("c2")), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("gram"), col("pc").as("pair_cnt"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("gram"))
      .limit(k)
  }

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every RAW-pool document by its hashed-n-gram importance
    * weight against a target domain, ln w(d) = Σ_b c_d(b)·(ln p̂(b) −
    * ln q̂(b)), where b ranges over `m` hash buckets of the doc's
    * unigrams+bigrams, p̂/q̂ are add-one-smoothed bucket distributions
    * of the target (`source = targetSource`) and raw (everything else)
    * pools, and c_d are the doc's bucket counts. Top-k by weight is
    * the deterministic analog of the paper's Gumbel resampling.
    *
    * Scale shape: ONE feature explode feeds both the m-bucket
    * pool-count aggregate (m rows total — a broadcast) and the
    * per-(doc, bucket) count aggregate (≤ m rows per doc, map-side
    * combined); the log-ratio join onto per-doc counts is a broadcast
    * of the m-row table, and the final score is one keyed sum of exact
    * long products. Nothing corpus-sized crosses the wire twice, and
    * the top-k is a TakeOrdered.
    *
    * Determinism: bucket ids are md5-derived (the shared 28-bit-prefix
    * recipe), counts are exact integers, and each bucket's log-ratio
    * quantizes to integer micro-nats (one fixed IEEE chain, mirrored
    * verbatim in the oracle) before the per-doc sum — so the sum is
    * order-independent and engine-exact.
    */
  def dsirWeights(docs: DataFrame, targetSource: String = "src0",
      m: Int = 1024, k: Int = 50): DataFrame = {
    // project the token array FIRST so the regexp runs once per doc,
    // not once per reference inside the feature construction
    val tk = docs.select(col("doc_id"), col("source"),
      TextAnalysis.tokens(lower(col("text"))).as("tk"))
    val feats = tk.select(col("doc_id"), col("source"),
        explode(concat(col("tk"), Dedup.tokenNgrams(col("tk"), 2)))
          .as("gram"))
      .select(col("doc_id"), col("source"),
        Dedup.hashBucket(col("gram"), m).as("b"))
    val isTarget = col("source") === targetSource
    val bc = feats.groupBy("b").agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("ct"),
      sum(when(isTarget, 0L).otherwise(1L)).as("cr"))
    val tot = bc.agg(sum("ct").cast("double").as("nt"),
      sum("cr").cast("double").as("nr"))
    // add-one smoothing over the m buckets; ln p̂ − ln q̂ in micro-nats
    val lr = bc.crossJoin(broadcast(tot))
      .select(col("b"),
        bround((log((col("ct").cast("double") + lit(1.0))
            / (col("nt") + lit(m.toDouble)))
          - log((col("cr").cast("double") + lit(1.0))
            / (col("nr") + lit(m.toDouble)))) * lit(1000000.0))
          .cast("long").as("lr_micros"))
    val dc = feats.filter(!isTarget)
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    dc.join(broadcast(lr), "b")
      .groupBy("doc_id").agg(
        sum("c").as("n_feats"),
        sum(col("c") * col("lr_micros")).as("logw_micros"))
      .select(col("doc_id"), col("n_feats"), col("logw_micros"),
        round(col("logw_micros").cast("double") / lit(1000000.0), 6)
          .as("logw"))
      .orderBy(col("logw_micros").desc, col("doc_id"))
      .limit(k)
  }

  /** TF-IDF query scorer — the second, deliberately different lexical
    * ranker [[rrfFusion]] fuses with BM25: score(d) = Σ_t tf·ln²(N/df)
    * (raw tf, squared-idf ltc-style weighting, no length
    * normalization — so it disagrees with BM25 exactly where BM25's
    * saturation and dl-normalization bite, which is what makes the
    * fusion non-trivial). Same one-pass scale shape as
    * [[bm25TopDocs]]: the explode feeds one (doc, query-term)
    * aggregate (non-query terms are filtered BEFORE the shuffle —
    * tf-idf needs no doc length, so the null bucket isn't carried),
    * df and N broadcast, top-k is a TakeOrdered. Per-(doc, term)
    * micros quantize before the per-doc sum.
    */
  def tfidfTopDocs(docs: DataFrame, queryTerms: Seq[String], k: Int = 20)
      : DataFrame = {
    val nd = docs.filter(col("doc_id").isNotNull)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val tf = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(col("n_docs") / col("df"))
    val score = col("tf").cast("double") * idf * idf * lit(1000000.0)
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nd))
      .select(col("doc_id"), bround(score).cast("long").as("s"))
      .groupBy("doc_id").agg(sum("s").as("score_micros"))
      .orderBy(col("score_micros").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of the
    * BM25 and TF-IDF top-`n` lists: rrf(d) = Σ_lists 1/(k₀+rank_d),
    * the standard hybrid-retrieval combiner (in production usually
    * lexical ⊕ dense; here both constituent rankers are
    * oracle-replayable, so the FUSION arithmetic itself is under the
    * hash gate). Each 1/(k₀+r) term quantizes to integer micros
    * before the sum. Scale shape: both constituent rankers end in a
    * TakeOrdered top-n, so ranking and fusing happen on two bounded
    * n-row lists — the row_number windows and the full-outer join
    * never see table-scale data.
    */
  def rrfFusion(docs: DataFrame, queryTerms: Seq[String], n: Int = 50,
      k0: Int = 60, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(list: DataFrame, rankCol: String) = list.select(
      col("doc_id"),
      row_number().over( // bounded: input is the post-limit n-row list
        Window.orderBy(col("score_micros").desc, col("doc_id")))
        .cast("long").as(rankCol))
    val a = ranked(bm25TopDocs(docs, queryTerms, k = n), "rank_bm25")
    val b = ranked(tfidfTopDocs(docs, queryTerms, k = n), "rank_tfidf")
    val contrib = (r: org.apache.spark.sql.Column) =>
      when(r.isNull, lit(0L)).otherwise(
        bround(lit(1000000.0) / (lit(k0.toDouble) + r.cast("double")))
          .cast("long"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_bm25"), col("rank_tfidf"),
        (contrib(col("rank_bm25")) + contrib(col("rank_tfidf")))
          .as("rrf_micros"))
      .orderBy(col("rrf_micros").desc, col("doc_id"))
      .limit(k)
  }
}
