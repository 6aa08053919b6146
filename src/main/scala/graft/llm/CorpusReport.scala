package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-row corpus health report — the summary a pipeline operator reads
  * before training on a crawl: volume, language spread, duplication
  * rate, token budget, quality keep-rate, PII incidence. One scan, one
  * aggregate (count_distinct adds its own expand), every measure a
  * portable built-in so the DuckDB oracle verifies the whole card.
  */
object CorpusReport {

  private def ratio(num: Column, den: Column): Column =
    num.cast("double") / den.cast("double")

  def report(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokenCount(col("text"))
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(TextAnalysis.fingerprint(col("text"))).as("distinct_docs"),
      sum(toks.cast("long")).as("total_tokens"),
      sum(col("n_chars")).as("total_chars"),
      count(when(toks >= 5 && toks <= 10000, 1)).as("quality_keep"),
      count(when(TextAnalysis.piiCount(col("text")) > 0, 1)).as("pii_docs")
    ).select(
      col("n_docs"), col("n_langs"), col("distinct_docs"),
      (lit(1.0) - ratio(col("distinct_docs"), col("n_docs"))).as("dup_rate"),
      col("total_tokens"), col("total_chars"),
      ratio(col("quality_keep"), col("n_docs")).as("keep_rate"),
      col("pii_docs"))
  }
}
