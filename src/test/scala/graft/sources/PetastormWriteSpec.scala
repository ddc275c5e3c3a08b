package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.{GraftFunctions => GF}
import graft.schema.{CodecSpec, FieldSpec, GraftSchema}

/** Write-side petastorm interop: the pickled Unischema is valid
  * protocol-0 ASCII with the exact GLOBALs petastorm unpickles, the
  * `_common_metadata` footer carries both reference keys, tensor
  * cells round-trip through the np.save layout, and images stay
  * genuine png. The cross-LANGUAGE leg (reference classes unpickling
  * the blob, petastorm's NdarrayCodec decoding the cells) is
  * exercised by `tools/check_petastorm_store.py` against any store
  * this spec's shape produces. */
class PetastormWriteSpec extends SparkSpec {
  import spark.implicits._

  private val schema = GraftSchema("InteropSchema", Seq(
    FieldSpec("id", LongType, codec = Some(CodecSpec("scalar"))),
    FieldSpec("name", StringType, codec = Some(CodecSpec("scalar")),
      nullable = true),
    FieldSpec("emb", FloatType, shape = Seq(4, 2),
      codec = Some(CodecSpec("ndarray"))),
    FieldSpec("counts", ShortType, shape = Seq(3),
      codec = Some(CodecSpec("ndarray"))),
    FieldSpec("img", ShortType, shape = Seq(8, 8),
      codec = Some(CodecSpec("png")))))

  private def mkStore(url: String): Unit = {
    val src = spark.range(20).map { i =>
      (i, s"row$i",
        Array.tabulate(8)(j => (i + j).toFloat / 4f),
        Array.tabulate(3)(j => (i * 10 + j).toShort),
        Array.tabulate(64)(j => ((i * 7 + j) % 256).toShort))
    }.toDF("id", "name", "emb", "counts", "img")
    Materialize.materializePetastorm(src, url, schema,
      partitions = Some(2))
  }

  test("pickle is protocol-0 ASCII with the petastorm GLOBALs") {
    val bytes = UnischemaPickle.pickle(schema)
    assert(bytes.forall(b => b >= 0 && b < 128), "pickle must be ASCII")
    val s = new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
    assert(s.startsWith("ccopyreg\n_reconstructor\n"))
    assert(s.contains("cpetastorm.unischema\nUnischema\n"))
    assert(s.contains("cpetastorm.unischema\nUnischemaField\n"))
    assert(s.contains("cpetastorm.codecs\nScalarCodec\n"))
    assert(s.contains("cpetastorm.codecs\nNdarrayCodec\n"))
    assert(s.contains("cpetastorm.codecs\nCompressedImageCodec\n"))
    assert(s.contains("cpyspark.sql.types\nLongType\n"))
    assert(s.contains("cnumpy\nfloat32\n"))
    assert(s.contains("cnumpy\nuint8\n"), "image dtype must be uint8")
    assert(s.endsWith("."))
    // compressed_ndarray pickles to the reference's codec class
    // (r15: cells are genuine np.savez_compressed zips — NpzCodec)
    val z = new String(UnischemaPickle.pickle(GraftSchema("x",
      Seq(FieldSpec("t", LongType, Seq(2),
        Some(CodecSpec("compressed_ndarray")))))),
      java.nio.charset.StandardCharsets.US_ASCII)
    assert(z.contains("cpetastorm.codecs\nCompressedNdarrayCodec\n"))
    // a codec with no petastorm counterpart still refuses
    intercept[IllegalArgumentException] {
      UnischemaPickle.pickle(GraftSchema("x", Seq(FieldSpec("t",
        LongType, Seq(2), Some(CodecSpec("no_such_codec"))))))
    }
  }

  test("materializePetastorm: _common_metadata keys + npy round-trip " +
      "+ genuine png") {
    val url = scratch("ps_interop_store")
    mkStore(url)
    // footer keys petastorm's get_schema/load_row_groups read
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(url + "/_common_metadata"), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData
      finally r.close()
    assert(kv.containsKey("dataset-toolkit.unischema.v1"))
    assert(kv.containsKey("dataset-toolkit.num_row_groups_per_file.v1"))
    assert(kv.get("dataset-toolkit.unischema.v1")
      .forall(c => c < 128), "stored pickle must survive UTF-8")
    val rg = kv.get("dataset-toolkit.num_row_groups_per_file.v1")
    assert(rg.startsWith("{") && rg.contains("part-"), rg)
    // cells decode through OUR npy reader (the q269 path) with the
    // original values — i.e. the store is its own fixture
    val back = spark.read.parquet(url)
    val row = back.filter(col("id") === 3L)
      .select(GF.npyDescr(col("emb")).as("ed"),
        GF.npyShape(col("emb")).as("es"),
        GF.npyDoubles(col("emb")).as("ev"),
        GF.npyLongs(col("counts")).as("cv"),
        col("img"))
      .head()
    assert(row.getString(0) == "<f4")
    assert(row.getSeq[Int](1) == Seq(4, 2))
    assert(row.getSeq[Double](2).head == 0.75)
    assert(row.getSeq[Long](3) == Seq(30L, 31L, 32L))
    val png = row.getAs[Array[Byte]](4)
    assert(png.take(8).sameElements(Array(0x89, 'P', 'N', 'G', '\r',
      '\n', 0x1a, '\n').map(_.toByte)), "genuine png magic")
    // no graft sidecar: this store's metadata is petastorm's
    assert(!new java.io.File(url, Materialize.SidecarName).exists())
  }
}
