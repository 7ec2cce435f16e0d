package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Persisted product-quantization artifact — the compressed sibling of
  * [[IvfIndexStore]]: training the per-subspace codebooks and encoding
  * every corpus vector are index-BUILD work, so this store runs them
  * once and persists:
  *
  *   - `<table>`       — (j, c, codeword array<double>): the m×k
  *                       codebooks (k·d doubles total — driver-trivial)
  *   - `<table>_codes` — (vec_id, codes array<int>): m small codes per
  *                       vector — the 4d/m-fold-smaller scan the ADC
  *                       stage reads INSTEAD of raw embeddings
  *
  * `search` serves query batches from the saved codes (raw vectors are
  * touched only for the queries × rerank·k shortlisted rows the exact
  * re-rank needs); `extend` encodes an arriving batch under the FROZEN
  * codebooks and appends — same staleness contract as the IVF
  * quantizer: codebooks drift as the corpus does, rebuild periodically,
  * and an exact copy of an indexed vector encodes to the identical
  * codes, so duplicate recall survives extension.
  */
object PqStore {

  def codesTable(table: String): String = s"${table}_codes"

  def build(
      emb: DataFrame, m: Int, codewords: Int, table: String,
      path: String, iters: Int = 2): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${codesTable(table)}")
    val base = emb.select("vec_id", "embedding")
    val books = Similarity.pqTrain(base, m, codewords, iters)
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cw, c) => (j, c, cw.toSeq) }
    }.toSeq.toDF("j", "c", "codeword")
      .write.option("path", path).mode("overwrite")
      .format("parquet").saveAsTable(table)
    Similarity.pqEncode(base, books)
      .write.option("path", s"${path}_codes").mode("overwrite")
      .format("parquet").saveAsTable(codesTable(table))
  }

  /** The saved codebooks as Array(m)(k)(d/m). */
  def loadBooks(spark: SparkSession, table: String)
      : Array[Array[Array[Double]]] = {
    val rows = spark.table(table).orderBy("j", "c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
  }

  /** Encode `batch` under the frozen codebooks and append its codes. */
  def extend(batch: DataFrame, table: String): Unit = {
    val spark = batch.sparkSession
    Similarity.pqEncode(batch.select("vec_id", "embedding"),
        loadBooks(spark, table))
      .write.mode("append").format("parquet")
      .saveAsTable(codesTable(table))
  }

  /** Two-stage search served from the artifact: ADC over the saved
    * codes, exact re-rank joining `corpusVecs` for shortlist rows only.
    * Codes with no row in `corpusVecs` (an extended index searched
    * against a stale raw-vector frame) are semi-joined OUT before the
    * shortlist — letting them through would burn bounded shortlist
    * slots on candidates the re-rank can never return, silently
    * costing recall instead of erroring or degrading gracefully.
    */
  def search(spark: SparkSession, table: String, corpusVecs: DataFrame,
      queryFilter: Column, k: Int, rerank: Int = 8): DataFrame =
    Similarity.pqSearchFromCodes(
      loadBooks(spark, table),
      spark.table(codesTable(table))
        .join(corpusVecs.select("vec_id"), Seq("vec_id"), "left_semi"),
      corpusVecs.filter(queryFilter).select("vec_id", "embedding"),
      corpusVecs, k, rerank)
}
