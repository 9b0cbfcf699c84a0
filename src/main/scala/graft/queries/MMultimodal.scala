package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.r4

/** Group M — multimodal columns (north-star mandated): image/audio/video
  * modeled as opaque `binary` columns with typed metadata, plus the
  * operators a training-data pipeline runs over them: metadata extraction,
  * decode → feature vectors, resize planning, frame sampling.
  *
  * The test fixtures carry no real media, so the MEDIA BYTES are derived
  * deterministically from `documents.text` (md5 → 16-byte blob) and the
  * DECODE step is an explicitly-marked STUB (deterministic fake features
  * from the bytes). Everything around the stub — binary schema, metadata
  * struct, mapPartitions batch shape, per-partition decoder init, array
  * output schema — is real Spark plumbing that would be unchanged with a
  * real codec on a real cluster.
  *
  * Scale posture: decode runs via mapPartitions so a real decoder is
  * initialized once per partition (not per row); frame sampling is a
  * generator (`explode(sequence(...))`) so no driver-side loops; all
  * metadata derivations are codegen'd column expressions.
  */
object MMultimodal {

  /** The synthetic media table: doc_id, media BINARY, typed metadata. */
  private def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      unhex(md5(col("text"))).as("media"), // 16-byte deterministic blob
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
      (lit(48) + (col("doc_id") % 5) * 16).cast("int").as("height"),
      (lit(24) + (col("doc_id") % 10) * 8).cast("int").as("n_frames"))

  val m: ListMap[String, Q] = ListMap(
    "m_media_meta" -> ((s, d) =>
      media(s, d).select(
        col("doc_id"),
        octet_length(col("media")).cast("long").as("n_bytes"),
        col("media_type"), col("width"), col("height"))
        .orderBy("doc_id")),

    "m_modality_card" -> ((s, d) =>
      // the modality card: per-media-type volume/shape summary a
      // multimodal dataset publishes next to the data — one grouped pass
      // over the (metadata-projected) media table, no bytes decoded
      media(s, d).groupBy("media_type")
        .agg(count(lit(1)).as("n_items"),
          sum(octet_length(col("media")).cast("long")).as("total_bytes"),
          r4(avg("width")).as("avg_w"), r4(avg("height")).as("avg_h"),
          max("n_frames").as("max_frames"))
        .orderBy("media_type")),

    "m_resize_plan" -> ((s, d) =>
      // resize planning: fit into 224x224 preserving aspect ratio — pure
      // integer/double arithmetic, identical on both engines
      media(s, d)
        .withColumn("scale",
          least(lit(224.0) / col("width"), lit(224.0) / col("height")))
        .select(col("doc_id"), col("width"), col("height"),
          floor(col("width") * col("scale")).cast("long").as("out_w"),
          floor(col("height") * col("scale")).cast("long").as("out_h"))
        .orderBy("doc_id")),

    "m_frame_sample" -> ((s, d) =>
      // frame sampling: every 8th frame of each "video" — a generator
      // expression, one output row per sampled frame
      media(s, d).filter(col("media_type") === "video/mp4")
        .select(col("doc_id"),
          explode(expr("sequence(0L, CAST(n_frames AS LONG) - 1, 8L)")).as("frame_idx"))
        .orderBy("doc_id", "frame_idx")),

    "m_binary_txn" -> ((s, d) => {
      // the binary MEDIA path end to end through the LAKEHOUSE spine
      // (r12 verdict missing #6): media blobs land in the transactional
      // table as a parquet BINARY column (batch commit v0), a streaming
      // query tails the commit log (TxnStreamSource), the decode seam
      // runs INSIDE the micro-batch via the same once-per-partition
      // mapPartitions shape as m_decode_features, and a mid-stream
      // second append arrives as its own batch — so binary columns are
      // proven through format write, log-schema bind, stream read, and
      // the codec seam in one pipeline. The oracle reconstructs the stub
      // decode relationally over ALL docs: a dropped batch, corrupted
      // bytes, or a misbound binary column all break the hash.
      import s.implicits._
      val root = scratch("m_binary_txn")
      val t = graft.sources.TxnTable.fresh(s, root)
      val blobs = media(s, d).select(col("doc_id"), col("media"))
      t.append(blobs.filter(col("doc_id") % 2 === 0))           // v0
      val name = "m_binary_txn_sink"
      if (s.catalog.tableExists(name)) s.catalog.dropTempView(name)
      val q = s.readStream.format("graft.sources.TxnStreamSource")
        .option("path", root).load()
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val decoder = StubDecoder.init() // once per partition, as ever
          it.map { case (id, bytes) => (id, decoder.decodeBatch(bytes)) }
        }
        .toDF("doc_id", "features")
        .select(col("doc_id"),
          size(col("features")).cast("long").as("dim"),
          expr("array_join(transform(features, x -> " +
            "cast(cast(round(cast(x AS double) * 10000) AS int) AS string)), ',')")
            .as("features_bp"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable()                                   // batch 1
      t.append(blobs.filter(col("doc_id") % 2 === 1))           // v1
      q.processAllAvailable()                                   // batch 2
      q.stop()
      s.table(name).orderBy("doc_id")
    }),

    "m_decode_png" -> ((s, d) => {
      // a REAL image codec through the decode seam (closing the "decoder
      // is still a stub" honesty gap): per doc, a gray8 image with pixel
      // (doc_id * 31 + idx) % 256 is ENCODED to actual PNG bytes and
      // DECODED back via javax.imageio, both inside the same
      // once-per-partition mapPartitions seam as the stub — the full
      // binary-media round trip with a production-shaped codec (stateful,
      // natively-backed, init-once). PNG is lossless, so the decoded
      // width/height/pixel-sum equal the generator's closed form, which
      // the oracle computes in SQL: a codec losing, reordering, or
      // re-quantizing pixels breaks the hash. Partition-count invariance
      // and the init-once discipline are InferSpec's pins.
      import s.implicits._
      val rows = Tables.documents(s, d).select("doc_id").as[Long]
      rows.mapPartitions { it =>
        val codec = PngCodec.init() // once per partition, like a real codec
        it.map { id =>
          val w = (8 + id % 5).toInt; val h = (6 + id % 4).toInt
          val png = codec.encodeGray(w, h, idx => ((id * 31 + idx) % 256).toInt)
          val (dw, dh, sum) = codec.decodeSum(png)
          (id, dw, dh, sum)
        }
      }.toDF("doc_id", "width", "height", "pixel_sum").orderBy("doc_id")
    }),

    // STUB decode — scalatest-only key. The feature extraction is a
    // deterministic fake (byte value / 255); a real image/audio codec slots
    // into `decodeBatch` below with no change to the Spark plumbing.
    "m_decode_features" -> ((s, d) => {
      import s.implicits._
      val rows = media(s, d).select("doc_id", "media").as[(Long, Array[Byte])]
      rows.mapPartitions { it =>
        // real-world shape: initialize the (expensive) decoder ONCE per
        // partition, then stream the rows through it
        val decoder = StubDecoder.init()
        it.map { case (id, bytes) => (id, decoder.decodeBatch(bytes)) }
      }.toDF("doc_id", "features")
        // feature vector serialized to integer basis points (CSV) so the
        // driver differ can hash it; the float array itself stays the
        // mapPartitions output schema
        .select(col("doc_id"),
          size(col("features")).cast("long").as("dim"),
          r4(element_at(col("features"), 1).cast("double")).as("f0"),
          expr("array_join(transform(features, x -> " +
            "cast(cast(round(cast(x AS double) * 10000) AS int) AS string)), ',')")
            .as("features_bp"))
        .orderBy("doc_id")
    }),
  )

  val oracle: ListMap[String, String] = ListMap(
    "m_media_meta" ->
      ("SELECT doc_id, octet_length(unhex(md5(text))) AS n_bytes, " +
        "['image/png','audio/wav','video/mp4'][(doc_id % 3 + 1)::INT] AS media_type, " +
        "(64 + (doc_id % 8) * 16)::INT AS width, " +
        "(48 + (doc_id % 5) * 16)::INT AS height " +
        "FROM documents ORDER BY doc_id"),
    "m_modality_card" ->
      ("SELECT ['image/png','audio/wav','video/mp4'][(doc_id % 3 + 1)::INT] " +
        "AS media_type, count(*) AS n_items, " +
        "CAST(sum(octet_length(unhex(md5(text)))) AS BIGINT) AS total_bytes, " +
        "round(avg((64 + (doc_id % 8) * 16)::INT), 4) AS avg_w, " +
        "round(avg((48 + (doc_id % 5) * 16)::INT), 4) AS avg_h, " +
        "(24 + max(doc_id % 10) * 8)::INT AS max_frames " +
        "FROM documents GROUP BY media_type ORDER BY media_type"),
    "m_resize_plan" ->
      ("SELECT doc_id, width, height, " +
        "CAST(floor(width * scale) AS BIGINT) AS out_w, " +
        "CAST(floor(height * scale) AS BIGINT) AS out_h FROM (" +
        "SELECT doc_id, (64 + (doc_id % 8) * 16)::INT AS width, " +
        "(48 + (doc_id % 5) * 16)::INT AS height, " +
        "least(224.0::DOUBLE / ((64 + (doc_id % 8) * 16)::INT), " +
        "224.0::DOUBLE / ((48 + (doc_id % 5) * 16)::INT)) AS scale " +
        "FROM documents) ORDER BY doc_id"),
    "m_frame_sample" ->
      ("SELECT doc_id, unnest(generate_series(0, (24 + (doc_id % 10) * 8) - 1, 8)) " +
        "AS frame_idx FROM documents WHERE doc_id % 3 = 2 " +
        "ORDER BY doc_id, frame_idx"),
    // every doc arrives exactly once across the two batches, decoded by
    // the same stub-reconstruction as m_decode_features
    "m_binary_txn" ->
      ("WITH b AS (SELECT doc_id, list_transform(range(0, 8), i -> " +
        "(strpos('0123456789abcdef', substring(md5(text), 2*i + 1, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substring(md5(text), 2*i + 2, 1)) - 1)) AS bytes " +
        "FROM documents) " +
        "SELECT doc_id, len(bytes) AS dim, " +
        "array_to_string(list_transform(bytes, x -> " +
        "CAST(round(x / 255.0 * 10000) AS INT)), ',') AS features_bp " +
        "FROM b ORDER BY doc_id"),
    // the decoded pixel sum in CLOSED FORM: pixels are (s + i) % 256 for
    // i in [0, n) with s = (doc_id*31) % 256 and n = w*h ≤ 108 < 256, so
    // the mod wraps at most once — sum = arithmetic series, split at the
    // wrap. PNG is lossless, so the real decode must reproduce it exactly.
    "m_decode_png" ->
      ("WITH p AS (SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h, " +
        "(doc_id * 31) % 256 AS s, (8 + doc_id % 5) * (6 + doc_id % 4) AS n " +
        "FROM documents) " +
        "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
        "CAST(CASE WHEN s + n <= 256 THEN n * s + (n * (n - 1)) // 2 " +
        "ELSE (256 - s) * s + ((256 - s) * (256 - s - 1)) // 2 " +
        "  + ((n - (256 - s)) * (n - (256 - s) - 1)) // 2 END AS BIGINT) " +
        "AS pixel_sum FROM p ORDER BY doc_id"),
    // reconstructs the stub decode relationally: byte i of unhex(md5(text))
    // = hex pair i of md5(text) parsed via strpos; feature = byte/255
    "m_decode_features" ->
      ("WITH b AS (SELECT doc_id, list_transform(range(0, 8), i -> " +
        "(strpos('0123456789abcdef', substring(md5(text), 2*i + 1, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substring(md5(text), 2*i + 2, 1)) - 1)) AS bytes " +
        "FROM documents) " +
        "SELECT doc_id, len(bytes) AS dim, round(bytes[1] / 255.0, 4) AS f0, " +
        "array_to_string(list_transform(bytes, x -> " +
        "CAST(round(x / 255.0 * 10000) AS INT)), ',') AS features_bp " +
        "FROM b ORDER BY doc_id"),
  )
}

/** STUB: stands in for a real media decoder (image/audio libs are not in
  * this environment). Deterministic: features are the first 8 bytes scaled
  * to [0,1]. The init()/decodeBatch() split mirrors how a real codec would
  * be held per-partition.
  */
class StubDecoder private () extends Serializable {
  def decodeBatch(bytes: Array[Byte]): Array[Float] =
    bytes.take(8).map(b => (b & 0xFF) / 255.0f)
}
object StubDecoder {
  def init(): StubDecoder = new StubDecoder()
}

/** A REAL image codec behind the decode seam: the JDK's PNG support
  * (`javax.imageio` + `BufferedImage`) — the closest thing to a
  * production media codec available offline. Encode writes genuine PNG
  * bytes (IHDR/IDAT/zlib, via the native-backed ImageIO writer); decode
  * reads them back. PNG is LOSSLESS, so decoded pixels equal the
  * generator's closed form exactly — what makes a cross-engine oracle
  * possible for a real codec (`m_decode_png`). Construction cost and
  * statefulness mirror a real decoder: init once per partition (the
  * counter is InferSpec's probe), headless + uncached ImageIO configured
  * at init, instances never serialized. */
class PngCodec private () {
  PngCodec.inits.incrementAndGet()
  /** Gray8 w×h image from a row-major pixel generator → real PNG bytes. */
  def encodeGray(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var idx = 0
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) { raster.setSample(c, r, 0, pix(idx)); idx += 1; c += 1 }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  /** Decode PNG bytes → (width, height, sum of gray samples). */
  def decodeSum(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) { sum += raster.getSample(c, r, 0); c += 1 }
      r += 1
    }
    (w, h, sum)
  }
}
object PngCodec {
  /** Per-JVM init counter — InferSpec's once-per-partition probe. */
  val inits = new java.util.concurrent.atomic.AtomicInteger(0)
  def init(): PngCodec = {
    // executor-safe ImageIO posture: no AWT display, no temp-file cache
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
    new PngCodec()
  }
}

/** A REAL library behind the same seam shape (r11): the JDK's zlib
  * bindings. `Deflater` and `CRC32` are stateful, natively-backed, and
  * NOT serializable — exactly the properties of a production codec or
  * model runtime — so holding one per partition only works if the seam
  * truly initializes inside `mapPartitions` (a closure-captured instance
  * would fail serialization) and only yields row-independent output if
  * the per-row reset discipline is right (leaked deflater/crc state
  * changes the numbers). InferSpec pins both: init count == partition
  * count, and output invariant to the partition count. Features:
  * [deflate ratio, crc16 of the payload scaled to [0,1]] — deterministic
  * across JVMs (zlib BEST_SPEED output is fixed for a given input). */
class ZlibDecoder private () {
  ZlibDecoder.inits.incrementAndGet()
  private val deflater =
    new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
  private val crc = new java.util.zip.CRC32()
  def decodeBatch(bytes: Array[Byte]): Array[Float] = {
    deflater.reset(); crc.reset()
    deflater.setInput(bytes); deflater.finish()
    val buf = new Array[Byte](bytes.length * 2 + 64)
    var n = 0
    while (!deflater.finished() && n < buf.length)
      n += deflater.deflate(buf, n, buf.length - n)
    crc.update(bytes)
    Array(n.toFloat / math.max(1, bytes.length),
      (crc.getValue & 0xFFFFL).toFloat / 65535.0f)
  }
}
object ZlibDecoder {
  /** Per-JVM init counter — the spec's probe that the seam constructs
    * the codec once per partition, never per row. */
  val inits = new java.util.concurrent.atomic.AtomicInteger(0)
  def init(): ZlibDecoder = new ZlibDecoder()
}
