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
}
