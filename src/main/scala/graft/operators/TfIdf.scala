package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF keyword extraction — top-k characteristic terms per document.
  *
  * tf = term occurrences within the document (raw count);
  * idf = ln(N / df) with df = number of documents containing the term;
  * score = tf * idf, ranked per document with a term-name tiebreak.
  *
  * Shuffle profile: one explode + (doc, term) aggregation, one term-level
  * df aggregation (broadcast back — vocabulary is small relative to the
  * corpus), one per-doc top-k window. At 100 TB the df table is the only
  * broadcast risk; for open-ended vocabularies swap the window for
  * TopKAggregator to keep per-doc state bounded map-side.
  */
object TfIdf {

  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(split(TextFunctions.normalize(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(col(idCol)).distinct().count()
    val scored = tf.join(broadcast(df), Seq("term"))
      .withColumn("tfidf",
        col("tf").cast("double") * log(lit(n.toDouble) / col("df").cast("double")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }
}
