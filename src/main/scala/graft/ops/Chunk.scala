package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-token-budget document chunking with overlap — the standard
  * pre-tokenization split for context-window-bounded training and
  * embedding pipelines (long documents become overlapping windows of
  * at most `chunkSize` tokens, stride `chunkSize - overlap`).
  *
  * Scale shape: pure scan work — tokenize once, `sequence`+`explode`
  * the chunk start positions, slice the token array per chunk. No
  * shuffle at all; the output multiplier is ~1/stride chunks per
  * token, known up front. The token array materializes once per row
  * behind the projection boundary (the [[TextAnalysis]] rule), so a
  * 100-chunk document tokenizes once, not 100 times. Tokenization is
  * [[TextAnalysis.alphaTokens]] — the same deterministic lowercase
  * alphanumeric stream the dedup/shingle family uses, reproducible
  * in any engine.
  *
  * Output: one row per chunk — (idCol, chunk_idx, n_tokens,
  * chunk_text) with `chunk_idx` dense from 0 in document order and
  * `chunk_text` the space-joined token slice. Documents with zero
  * tokens emit no chunks. The final chunk may be shorter than
  * `chunkSize` (the tail); a tail consisting only of already-seen
  * overlap tokens is still emitted when its start position is a
  * stride multiple inside the document — chunk boundaries are a pure
  * function of token count, so readers can compute them without
  * scanning.
  */
object Chunk {

  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0, unicode: Boolean = false): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive (got $chunkSize)")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap ($overlap) must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    df.select(col(idCol),
        TextAnalysis.alphaTokens(col(textCol), unicode).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("__s"))
      .select(col(idCol),
        (col("__s") / stride).cast("int").as("chunk_idx"),
        size(slice(col("__t"), col("__s") + 1, lit(chunkSize))).as("n_tokens"),
        concat_ws(" ", slice(col("__t"), col("__s") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }
}
