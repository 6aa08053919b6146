package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial naive Bayes over document tokens — the relational core
  * of the fastText-style classifier every curation pipeline trains for
  * language ID and quality filtering (CCNet, RedPajama, FineWeb all
  * gate on one). Training IS aggregation — per-(class, term) counts,
  * per-class totals, a vocabulary size — so the "model" is three
  * count tables and the whole fit is one shuffle over the exploded
  * corpus with map-side combine; scoring is one equi-join of document
  * tokens against the (broadcastable, vocabulary-sized) count table.
  * No driver-side math, no iteration.
  *
  * Determinism contract (the [[Ranking]] convention): every log is ONE
  * fixed IEEE expression mirrored verbatim in the DuckDB oracle, and
  * per-term log-probs quantize to integer micro-nats BEFORE any
  * per-document or per-class summation, so totals are partitioning-
  * and order-independent across engines.
  */
object NaiveBayes {

  /** (class, term) counts, per-class token totals, corpus total, and
    * vocabulary size for `labelCol` — the sufficient statistics of the
    * multinomial model. One explode, one aggregate.
    */
  private def counts(docs: DataFrame, labelCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val tok = docs.filter(col("doc_id").isNotNull)
      .select(col(labelCol).as("cls"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
    val cc = tok.groupBy("cls", "term").agg(count(lit(1)).as("c"))
    val nc = cc.groupBy("cls").agg(sum("c").as("nc"))
    val tot = cc.agg(sum("c").as("ntot"),
      count_distinct(col("term")).as("v"))
    (cc, nc, tot)
  }

  /** Train-time readout: the top-`k` most DISCRIMINATIVE tokens per
    * class by Laplace-smoothed log-likelihood ratio
    * ln P(t|c) − ln P(t|¬c) — the vocabulary a curation team actually
    * inspects to sanity-check a classifier. The rank window partitions
    * by class over the (class, term) count table, so its input is
    * vocabulary-sized, never corpus-sized.
    */
  def trainTopTerms(docs: DataFrame, labelCol: String = "lang",
      k: Int = 5): DataFrame = {
    val (cc, nc, tot) = counts(docs, labelCol)
    val tc = cc.groupBy("term").agg(sum("c").as("tc"))
    val dd = (x: org.apache.spark.sql.Column) => x.cast("double")
    val lnp = log(dd(col("c") + lit(1L)) / dd(col("nc") + col("v")))
    val lnq = log(dd(col("tc") - col("c") + lit(1L))
      / dd(col("ntot") - col("nc") + col("v")))
    val llr = cc.join(broadcast(nc), "cls")
      .join(tc, "term")
      .crossJoin(broadcast(tot))
      .select(col("cls"), col("term"), col("c"),
        bround((lnp - lnq) * lit(1000000.0)).cast("long").as("llr_micros"))
    val w = Window.partitionBy("cls")
      .orderBy(col("llr_micros").desc, col("term"))
    llr.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .orderBy(col("cls"), col("llr_micros").desc, col("term"))
  }

  /** Apply the self-trained model back over the corpus and emit the
    * confusion matrix (true class, argmax predicted class, docs) —
    * resubstitution accuracy, the first diagnostic after any fit.
    * score(d, c) = prior_micros(c) + Σ_t tf·lp_micros(t, c) with
    * unseen-in-class terms taking the smoothed zero count; argmax
    * ties break to the lexicographically first class via a per-doc
    * rank window (per-doc partitions of |classes| rows). The scoring
    * join fans each distinct (doc, term) out |classes| ways against
    * the vocabulary-sized count table — corpus × small-constant, the
    * scalable shape.
    */
  def confusion(docs: DataFrame, labelCol: String = "lang"): DataFrame = {
    val (cc, nc, tot) = counts(docs, labelCol)
    val dd = (x: org.apache.spark.sql.Column) => x.cast("double")
    val base = docs.filter(col("doc_id").isNotNull)
    val priors = base.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("dc"))
    val ndocs = base.agg(count(lit(1)).as("nd"))
    val pri = priors.crossJoin(broadcast(ndocs))
      .select(col("cls"),
        bround(log(dd(col("dc")) / dd(col("nd"))) * lit(1000000.0))
          .cast("long").as("prior_micros"))
    // per-(class, term) smoothed log-prob INCLUDING the per-class
    // vocabulary miss: the model table holds seen pairs; misses fall
    // back to lp0(c) = ln(1/(nc+v)) at join time
    val lp = cc.join(broadcast(nc), "cls").crossJoin(broadcast(tot))
      .select(col("cls"), col("term"),
        bround(log(dd(col("c") + lit(1L)) / dd(col("nc") + col("v")))
          * lit(1000000.0)).cast("long").as("lp_micros"))
    val lp0 = nc.crossJoin(broadcast(tot))
      .select(col("cls"),
        bround(log(lit(1.0) / dd(col("nc") + col("v")))
          * lit(1000000.0)).cast("long").as("lp0_micros"))
    val dt = base.select(col("doc_id"), col(labelCol).as("truth"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "truth", "term").agg(count(lit(1)).as("tf"))
    val scored = dt
      .crossJoin(broadcast(lp0.select(col("cls"), col("lp0_micros"))))
      .join(lp, Seq("cls", "term"), "left")
      .select(col("doc_id"), col("truth"), col("cls"),
        (col("tf") * coalesce(col("lp_micros"), col("lp0_micros")))
          .as("m"))
      .groupBy("doc_id", "truth", "cls").agg(sum("m").as("s"))
      .join(broadcast(pri), "cls")
      .select(col("doc_id"), col("truth"), col("cls"),
        (col("s") + col("prior_micros")).as("score_micros"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_micros").desc, col("cls"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("truth"), col("cls").as("pred"))
      .agg(count(lit(1)).as("docs"))
      .orderBy("truth", "pred")
  }
}
