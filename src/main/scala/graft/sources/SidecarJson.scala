package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared parsing for the one-object JSON sidecars the view layer
  * writes (`_mv.json`, `_dv.json`, `_joinview.json`). These files
  * are SELF-AUTHORED by this package — keys and string values are
  * require-guarded against quotes at write time — so a positional
  * parse is exact, and a missing key is a loud error rather than a
  * silent mis-parse (indexOf = −1 arithmetic). */
private[sources] object SidecarJson {

  def slurp(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var k = in.read(buf)
      while (k >= 0) { bytes.write(buf, 0, k); k = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }

  /** `"k":"<value>"` — quote-free by the writers' contract. */
  def str(json: String, k: String): String = {
    val tag = "\"" + k + "\":\""
    val at = json.indexOf(tag)
    require(at >= 0, s"sidecar missing string field '$k': $json")
    json.drop(at + tag.length).takeWhile(_ != '"')
  }

  /** `"k":<digits>` — non-negative integers only (the writers emit
    * versions, bucket counts, precisions). */
  def num(json: String, k: String): Long = {
    val tag = "\"" + k + "\":"
    val at = json.indexOf(tag)
    require(at >= 0, s"sidecar missing numeric field '$k': $json")
    val digits = json.drop(at + tag.length).takeWhile(_.isDigit)
    require(digits.nonEmpty, s"sidecar field '$k' not numeric: $json")
    digits.toLong
  }

  /** `"k":["a","b",...]` — flat string arrays. */
  def arr(json: String, k: String): Seq[String] = {
    val tag = "\"" + k + "\":["
    val at = json.indexOf(tag)
    require(at >= 0, s"sidecar missing array field '$k': $json")
    val body = json.substring(json.indexOf('[', at) + 1,
      json.indexOf(']', at))
    if (body.trim.isEmpty) Seq.empty
    else body.split(",").toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }
}
