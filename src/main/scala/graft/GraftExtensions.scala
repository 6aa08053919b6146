package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.{ArrayCosineSimilarity, ArrayDotProduct, HashBucket, HashFingerprint, JaroWinkler}

/** Session extension point: injects the engine's native expressions so
  * `array_dot` / `array_cosine` are callable from SQL and
  * `call_function`. Activated by
  * `spark.sql.extensions=graft.GraftExtensions` (set by
  * [[GraftSession.builder]]); host applications can add it to their own
  * builder the same way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      ArrayDotProduct.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "array_dot takes exactly 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_cosine"),
      ArrayCosineSimilarity.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "array_cosine takes exactly 2 arguments")
        ArrayCosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      JaroWinkler.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "jaro_winkler takes exactly 2 arguments")
        JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hash_bucket"),
      HashBucket.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "hash_bucket takes exactly 2 arguments")
        HashBucket(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hash_fp60"),
      HashFingerprint.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "hash_fp60 takes exactly 1 argument")
        HashFingerprint(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      graft.functions.HilbertIndex.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "hilbert_index takes exactly 2 arguments")
        graft.functions.HilbertIndex(children.head, children(1))
      }))
    // optimizer: fuse the composed aggregate(zip_with(*)) dot-product
    // spelling into the native codegen'd strict expression
    ext.injectOptimizerRule(_ => graft.plans.FuseArrayDot)
  }
}
