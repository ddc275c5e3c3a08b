package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining — the concat-and-chunk step:
  * documents are concatenated in a deterministic total order and the
  * resulting token stream is sliced into fixed `chunkTokens` windows.
  * Each document is tagged with its global token start offset, the
  * chunk containing its first token, and the offset within that
  * chunk — the index a packed-dataset loader needs to locate any
  * document, and the grouping key for assembling full chunks.
  *
  * 100 TB shape: the global offset is [[Ranking.withRunningTotal]] —
  * a range shuffle + per-partition partials + broadcast offsets, the
  * data shuffled exactly once and every stage fully parallel. The
  * naive spelling (`sum(tok).over(Window.orderBy(...))`) moves the
  * entire corpus through ONE task. The chunk arithmetic is integer
  * `div`/`%` on the offset — reproducible on any engine.
  */
object Packing {

  /** Tag every row with `startCol` (global exclusive token offset
    * under `orderCols`), `chunkCol` (= start div chunkTokens) and
    * `offCol` (= start mod chunkTokens). `tokCol` must be an int/long
    * per-document token count; `orderCols` must be a total order
    * (include a unique tie-break) for the offsets to be
    * reproducible. */
  def packed(df: DataFrame, orderCols: Seq[Column], tokCol: String,
      chunkTokens: Long, startCol: String = "tok_start",
      chunkCol: String = "chunk_id", offCol: String = "chunk_off"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive (got $chunkTokens)")
    Ranking.withRunningTotal(df, orderCols, tokCol, startCol)
      .withColumn(chunkCol, expr(s"$startCol div ${chunkTokens}L"))
      .withColumn(offCol, col(startCol) % chunkTokens)
  }

  /** Sequence-length histogram with padding waste — the batch-shape
    * planning report for the pad-to-bucket serving path (the
    * alternative to [[packed]]'s concat-and-chunk): documents land
    * in power-of-two token-length buckets (the padded batch shapes a
    * length-bucketed loader would allocate), and per bucket the
    * report gives docs, real tokens, padded tokens (n_docs·bucket)
    * and `waste_ppm = 1e6·(padded − real) div padded` — the fraction
    * of compute a bucketed batcher would burn on pad tokens. The
    * decision this feeds: waste_ppm high in fat buckets → switch to
    * packing; high only in the tail bucket → cap sequence length.
    *
    * The bucket ceiling is integer-exact via the bin()-length trick
    * (2^bits(L−1), L=1 → 1 — same `bin` parity as the HLL rho), so
    * any engine reproduces the histogram bit-for-bit. Zero-token
    * docs are excluded: they never enter a batch. One scan, one
    * map-side-combined agg over ≤ ~40 bucket rows. */
  def lengthHistogram(df: DataFrame, textCol: String,
      unicode: Boolean = false): DataFrame = {
    val n = size(TextAnalysis.alphaTokens(col(textCol), unicode))
      .cast("long")
    df.select(n.as("__n")).filter(col("__n") >= 1)
      .withColumn("bucket", expr("CASE WHEN __n <= 1 THEN 1L" +
        " ELSE shiftleft(1L, length(bin(__n - 1))) END"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("sum_tokens"))
      .withColumn("padded_tokens", col("bucket") * col("n_docs"))
      .withColumn("waste_ppm",
        expr("((padded_tokens - sum_tokens) * 1000000) div padded_tokens"))
  }
}
