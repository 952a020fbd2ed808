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
  * df aggregation joined back on term, one per-doc top-k window. The
  * df join is a plain shuffle join — the vocabulary is unbounded at
  * 100 TB, so nothing forces it driver- or broadcast-side; AQE still
  * converts it to a broadcast join at runtime when the df table turns
  * out small. The corpus size N enters as a broadcast one-row scalar
  * aggregate, keeping the whole operator a single lazy plan with no
  * driver-side action. For open-ended vocabularies the per-doc window
  * can be swapped for TopKAggregator to keep top-k state bounded
  * map-side.
  */
object TfIdf {

  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(split(TextFunctions.normalize(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count_distinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .drop("n_docs")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }
}
