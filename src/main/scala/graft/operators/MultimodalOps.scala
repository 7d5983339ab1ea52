package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded batch-wise per partition.
  *
  * The container has no image/audio codecs, so `fakeDecode` is a
  * clearly-marked deterministic stand-in for a real decoder (it derives
  * "dimensions" from the byte length alone). Everything around it —
  * binary column handling, the Dataset[T] encoder schema, the
  * partition-wise batch shape, zero driver materialization — is the
  * real 100 TB plumbing: swap `fakeDecode` for an actual codec and the
  * pipeline is unchanged.
  */
object MultimodalOps {

  /** Decoded-media metadata row. */
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int,
      height: Int, n_frames: Int)

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg:
    * real implementation would parse the container header here. */
  private def fakeDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    MediaMeta(docId, n, 320 + n % 320, 240 + (n * 7) % 240, 1 + n % 30)
  }

  /** Treat each document's text bytes as an opaque media blob and run
    * the partition-wise decode. mapPartitions keeps the decoder's
    * (potentially expensive) per-batch setup amortized across rows —
    * the pattern a real codec needs. */
  def mediaDecode(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    Engine.table(sp, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (real codec handle)
        it.map { case (id, blob) => fakeDecode(id, blob) }
      }
      .toDF()
  }

  val mediaDecodeOracle: String = """
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS INT) AS byte_len,
      CAST(320 + octet_length(encode(text)) % 320 AS INT) AS width,
      CAST(240 + (octet_length(encode(text)) * 7) % 240 AS INT) AS height,
      CAST(1 + octet_length(encode(text)) % 30 AS INT) AS n_frames
    FROM documents"""

  /** Frame-sampling shape: explode a decoded clip into every 10th
    * "frame" row — the schema/partitioning pattern for video pipelines
    * (frame index domain derived deterministically from the blob). */
  def frameSample(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    Engine.table(sp, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          val meta = fakeDecode(id, blob)
          (0 until meta.n_frames by 10).map(f => (id, f, meta.width, meta.height))
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height")
  }

  val frameSampleOracle: String = """
    WITH m AS (
      SELECT doc_id,
        CAST(320 + octet_length(encode(text)) % 320 AS INT) AS width,
        CAST(240 + (octet_length(encode(text)) * 7) % 240 AS INT) AS height,
        CAST(1 + octet_length(encode(text)) % 30 AS INT) AS n_frames
      FROM documents)
    SELECT doc_id, CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx,
      width, height
    FROM m"""

  /** Container type sniffing by magic bytes — a REAL (codec-free)
    * multimodal stage every ingest pipeline runs before routing blobs
    * to decoders. Pure declarative prefix matching on the binary
    * column: whole-stage-codegen'd, pushdown-friendly, oracled. */
  def sniffType(sp: SparkSession, dir: String): DataFrame = {
    // prefix compare on hex(blob): both engines hex the same UTF-8
    // bytes (DuckDB lacks substring over BLOB, hex is the common
    // denominator); still codegen'd on the Spark side
    val hx = upper(hex(col("blob")))
    Engine.table(sp, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .select(col("doc_id"),
        when(substring(hx, 1, 4) === "FFD8", "jpeg")
          .when(substring(hx, 1, 8) === "89504E47", "png")
          .when(substring(hx, 1, 8) === "47494638", "gif")
          .when(substring(hx, 1, 8) === "52494646", "riff")
          .when(substring(hx, 1, 8) === "25504446", "pdf")
          .otherwise("unknown").as("sniffed"))
  }

  val sniffTypeOracle: String = """
    SELECT doc_id,
      CASE
        WHEN substring(upper(hex(text::BLOB)), 1, 4) = 'FFD8' THEN 'jpeg'
        WHEN substring(upper(hex(text::BLOB)), 1, 8) = '89504E47' THEN 'png'
        WHEN substring(upper(hex(text::BLOB)), 1, 8) = '47494638' THEN 'gif'
        WHEN substring(upper(hex(text::BLOB)), 1, 8) = '52494646' THEN 'riff'
        WHEN substring(upper(hex(text::BLOB)), 1, 8) = '25504446' THEN 'pdf'
        ELSE 'unknown'
      END AS sniffed
    FROM documents"""

  /** Shannon byte entropy per blob — a real data-quality feature
    * (corruption / already-compressed detection before decode). The
    * per-byte histogram loop is genuine partition-local compute in the
    * decoder slot (no codecs needed); validated by recomputation in
    * MultimodalSpec, rows-only in the oracle gate (256-bin byte
    * histograms aren't SQL-expressible). */
  def byteEntropy(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    Engine.table(sp, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val hist = new Array[Long](256)
          var i = 0
          while (i < blob.length) { hist(blob(i) & 0xff) += 1; i += 1 }
          var h = 0.0
          val n = blob.length.toDouble
          var b = 0
          while (b < 256) {
            if (hist(b) > 0) { val p = hist(b) / n; h -= p * math.log(p) }
            b += 1
          }
          (id, blob.length, h / math.log(2.0))
        }
      }
      .toDF("doc_id", "byte_len", "entropy_bits")
  }

  /** Deterministic dimensions encoded in the synthesized headers —
    * chosen coprime so (width, height) walks the full grid as doc_id
    * grows; both fit u16 so every container can carry them. */
  private def dimsOf(docId: Long): (Int, Int) =
    ((16 + docId % 1009).toInt, (16 + (docId * 7) % 1013).toInt)

  /** A VALID image container header for doc_id (format rotates
    * png/gif/bmp): the stand-in for reading real blobs off storage.
    * Only the pixel data is absent — every header field is laid out
    * exactly per spec (PNG IHDR big-endian, GIF89a logical screen
    * little-endian u16, BMP BITMAPINFOHEADER little-endian i32), so a
    * real header parser must get endianness and offsets right. */
  private def synthHeader(docId: Long): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val (w, h) = dimsOf(docId)
    (docId % 3) match {
      case 0 => // PNG signature + IHDR chunk (len, type, 13-byte data, CRC)
        val b = ByteBuffer.allocate(33)
        b.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
        b.putInt(13).put("IHDR".getBytes("US-ASCII"))
        b.putInt(w).putInt(h)
        // bit depth 8, truecolor, deflate, adaptive filter, no interlace
        b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        b.putInt(0) // CRC slot (not validated by the dims parse)
        b.array()
      case 1 => // GIF89a header + logical screen descriptor
        val b = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
        b.put("GIF89a".getBytes("US-ASCII"))
        b.putShort(w.toShort).putShort(h.toShort)
        b.put(0xF7.toByte).put(0.toByte).put(0.toByte) // GCT flags, bg, aspect
        b.array()
      case _ => // BMP file header + BITMAPINFOHEADER
        val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte)
        b.putInt(54).putShort(0.toShort).putShort(0.toShort).putInt(54)
        b.putInt(40).putInt(w).putInt(h)
        b.putShort(1.toShort).putShort(24.toShort) // planes, bpp
        b.putInt(0).putInt(0).putInt(2835).putInt(2835).putInt(0).putInt(0)
        b.array()
    }
  }

  /** REAL container-header parsing — PNG IHDR (big-endian u32), GIF
    * logical screen (little-endian u16), BMP BITMAPINFOHEADER
    * (little-endian i32). Only the blob SYNTHESIS is a stand-in for
    * reading real files; the parse is the genuine article: declarative
    * byte-slice expressions (hex + conv) that whole-stage-codegen and
    * dispatch per row on the MAGIC BYTES, never on how the blob was
    * made. The oracle independently recomputes the dims each header
    * encodes from doc_id alone, so any offset or endianness mistake in
    * the parser hash-mismatches. Scale: header synthesis+parse is
    * partition-local projection work — no shuffle at all. */
  def imageDims(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    val blobs = Engine.table(sp, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, synthHeader(id))))
      .toDF("doc_id", "blob")
    val hx = upper(hex(col("blob")))
    // byte positions are 1-based; hex has two chars per byte
    def be(pos: Int, nBytes: Int): Column =
      conv(substring(hx, (pos - 1) * 2 + 1, nBytes * 2), 16, 10).cast("int")
    def le(pos: Int, nBytes: Int): Column =
      conv(concat((0 until nBytes).reverse.map(i =>
        substring(hx, (pos - 1 + i) * 2 + 1, 2)): _*), 16, 10).cast("int")
    val isPng = substring(hx, 1, 16) === "89504E470D0A1A0A"
    val isGif = substring(hx, 1, 12) === "474946383961"
    val isBmp = substring(hx, 1, 4) === "424D"
    blobs.select(col("doc_id"),
      when(isPng, "png").when(isGif, "gif").when(isBmp, "bmp")
        .otherwise("unknown").as("fmt"),
      when(isPng, be(17, 4)).when(isGif, le(7, 2)).when(isBmp, le(19, 4))
        .as("width"),
      when(isPng, be(21, 4)).when(isGif, le(9, 2)).when(isBmp, le(23, 4))
        .as("height"))
  }

  val imageDimsOracle: String = """
    SELECT doc_id,
      CASE CAST(doc_id % 3 AS INT)
        WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'bmp' END AS fmt,
      CAST(16 + doc_id % 1009 AS INT) AS width,
      CAST(16 + (doc_id * 7) % 1013 AS INT) AS height
    FROM documents"""

  /** Deterministic audio parameters encoded in the synthesized WAV
    * headers — rates from the real standard ladder, moduli coprime so
    * the parameter grid is walked fully. */
  private val WavRates = Array(8000, 16000, 22050, 44100, 48000)
  private def wavParamsOf(docId: Long): (Int, Int, Int, Long) = {
    val channels = 1 + (docId % 2).toInt
    val rate = WavRates(((docId % 5) + 5).toInt % 5)
    val bits = 16 + 8 * ((docId % 3) % 2).toInt
    val nSamples = 1000L + (docId * 13) % 99991L
    (channels, rate, bits, nSamples)
  }

  /** A spec-valid 44-byte PCM WAV header (RIFF container, fmt chunk,
    * data chunk header) for doc_id: canonical WAVEFORMAT layout —
    * every derived field (byte rate, block align, chunk sizes) is
    * computed exactly as an encoder would, so a parser that reads the
    * wrong offset or endianness sees inconsistent values and fails the
    * oracle. */
  private def synthWavHeader(docId: Long): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val (channels, rate, bits, nSamples) = wavParamsOf(docId)
    val blockAlign = channels * bits / 8
    val dataSize = (nSamples * blockAlign).toInt
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1.toShort).putShort(channels.toShort) // PCM, channels
    b.putInt(rate).putInt(rate * blockAlign)         // rate, byte rate
    b.putShort(blockAlign.toShort).putShort(bits.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.array()
  }

  /** REAL WAV header parsing — the audio twin of [[imageDims]]:
    * RIFF/WAVE magic sniff, then little-endian field reads at the
    * canonical PCM offsets (channels u16@23, sample rate u32@25,
    * bits u16@35, data size u32@41), sample count recovered from
    * data size / block align and duration derived by integer
    * division — all declarative hex-slice expressions inside
    * whole-stage codegen, no UDF. The oracle recomputes every field
    * from doc_id through the encoder's arithmetic, so parse offsets,
    * endianness, and the div chain are all checked. Scale: row-local
    * projection, no shuffle. */
  def wavMeta(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    val blobs = Engine.table(sp, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, synthWavHeader(id))))
      .toDF("doc_id", "blob")
    val hx = upper(hex(col("blob")))
    def le(pos: Int, nBytes: Int): Column =
      conv(concat((0 until nBytes).reverse.map(i =>
        substring(hx, (pos - 1 + i) * 2 + 1, 2)): _*), 16, 10).cast("long")
    val isWav = substring(hx, 1, 8) === "52494646" && // "RIFF"
      substring(hx, 17, 8) === "57415645"             // "WAVE"
    // integer division throughout (`div`, not `/` — Column `/` is
    // DOUBLE division and its floor can disagree with the exact
    // quotient's floor at the boundary)
    blobs.select(col("doc_id"), isWav.as("ok"),
        le(23, 2).as("ch"), le(25, 4).as("rate"), le(35, 2).as("bits"),
        le(41, 4).as("ds"))
      .select(col("doc_id"),
        when(col("ok"), lit("wav")).otherwise(lit("unknown")).as("fmt"),
        when(col("ok"), col("ch")).as("channels"),
        when(col("ok"), col("rate")).as("sample_rate"),
        when(col("ok"), col("bits")).as("bits"),
        when(col("ok"), expr("ds div (ch * bits div 8)")).as("n_samples"),
        when(col("ok"),
          expr("(ds div (ch * bits div 8)) * 1000 div rate"))
          .as("duration_ms"))
  }

  val wavMetaOracle: String = """
    SELECT doc_id, 'wav' AS fmt,
      CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      CAST(CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS BIGINT)
        AS sample_rate,
      CAST(16 + 8 * ((doc_id % 3) % 2) AS BIGINT) AS bits,
      CAST(1000 + (doc_id * 13) % 99991 AS BIGINT) AS n_samples,
      CAST((1000 + (doc_id * 13) % 99991) * 1000
        // (CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
            WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END)
        AS BIGINT) AS duration_ms
    FROM documents"""

  /** Spec-valid JPEG header stream for doc_id: SOI, an APP0/JFIF
    * segment whose length VARIES with doc_id (emulating thumbnail
    * payloads), for even ids a COM segment of a second
    * doc_id-dependent length, a DQT segment, then SOF0 carrying the
    * dimensions, EOI. Every segment length field is written exactly
    * as an encoder would — a parser that hops wrong offsets lands
    * off a marker boundary and fails. */
  private def jpegDimsOf(docId: Long): (Int, Int) =
    ((16 + docId % 997).toInt, (16 + (docId * 11) % 1009).toInt)

  private def synthJpeg(docId: Long): Array[Byte] = {
    import java.nio.ByteBuffer
    val (w, h) = jpegDimsOf(docId)
    val pad0 = (docId % 23).toInt          // APP0 thumbnail filler
    val pad1 = ((docId * 3) % 17).toInt    // COM payload
    val hasCom = docId % 2 == 0
    val size = 2 + (2 + 16 + pad0) + (if (hasCom) 2 + 2 + pad1 else 0) +
      (2 + 2 + 65) + (2 + 2 + 9) + 2
    val b = ByteBuffer.allocate(size)
    b.putShort(0xffd8.toShort)                       // SOI
    b.putShort(0xffe0.toShort).putShort((16 + pad0).toShort)
    b.put("JFIF".getBytes("US-ASCII")).put(0.toByte) // identifier
    b.putShort(0x0101.toShort).put(0.toByte)         // version, units
    b.putShort(1.toShort).putShort(1.toShort)        // densities
    b.put(0.toByte).put(0.toByte)                    // thumb w/h
    (0 until pad0).foreach(i => b.put((i % 251).toByte))
    if (hasCom) {
      b.putShort(0xfffe.toShort).putShort((2 + pad1).toShort)
      (0 until pad1).foreach(i => b.put(('a' + i % 26).toByte))
    }
    b.putShort(0xffdb.toShort).putShort(67.toShort)  // DQT
    (0 until 65).foreach(i => b.put((1 + i % 255).toByte))
    b.putShort(0xffc0.toShort).putShort(11.toShort)  // SOF0, len
    b.put(8.toByte)                                   // precision
    b.putShort(h.toShort).putShort(w.toShort)
    b.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte) // 1 comp
    b.putShort(0xffd9.toShort)                       // EOI
    b.array()
  }

  /** JPEG dimensions via [[graft.functions.JpegDims]] — the
    * VARIABLE-offset parse the fixed-offset PNG/GIF/BMP hex slices
    * can't express: SOF hides behind APP0/COM/DQT segments of
    * data-dependent length, so the custom codegen'd expression walks
    * the marker chain (`2 + be16` per hop). The oracle recomputes
    * width/height from doc_id through the encoder's arithmetic, so a
    * wrong hop, wrong endianness, or an off-by-one against any of the
    * varying pad lengths mismatches. Scale: row-local, inside
    * whole-stage codegen, no shuffle. */
  def jpegDims(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    val blobs = Engine.table(sp, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, synthJpeg(id))))
      .toDF("doc_id", "blob")
    val d = graft.functions.functions.jpeg_dims(col("blob"))
    blobs.select(col("doc_id"),
      shiftright(d, 32).cast("int").as("width"),
      (d.bitwiseAND(lit(0xffffffffL))).cast("int").as("height"))
  }

  val jpegDimsOracle: String = """
    SELECT doc_id,
      CAST(16 + doc_id % 997 AS INT) AS width,
      CAST(16 + (doc_id * 11) % 1009 AS INT) AS height
    FROM documents"""

  /** A COMPLETE chunked PNG for doc_id — signature, IHDR, a
    * variable-length tEXt chunk, IEND — with spec-correct CRC32 over
    * (type ‖ data) for every chunk. Docs with doc_id % 7 == 3 get one
    * tEXt payload byte flipped AFTER the CRC was computed: a
    * bit-rotted blob whose envelope still parses — exactly what an
    * integrity scan must catch (truncation checks and dimension
    * parsers both miss it). */
  private def synthPngChunked(docId: Long): Array[Byte] = {
    import java.nio.ByteBuffer
    import java.util.zip.CRC32
    val (w, h) = dimsOf(docId)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new CRC32
      crc.update(t); crc.update(data)
      val b = ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val txt = (0 until (1 + docId % 13).toInt)
      .map(i => ('a' + (docId + i) % 26).toByte).toArray
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val blob = sig ++ chunk("IHDR", ihdr) ++ chunk("tEXt", txt) ++
      chunk("IEND", Array.empty[Byte])
    if (docId % 7 == 3) {
      // flip one payload byte of tEXt (offset: sig 8 + IHDR chunk 25
      // + tEXt len/type 8) — CRC now mismatches
      val off = 8 + 25 + 8
      blob(off) = (blob(off) ^ 0x40).toByte
    }
    blob
  }

  /** PNG chunk-CRC integrity scan — the ingest-time bit-rot detector:
    * walk every chunk ([len u32][type][data][crc u32]), recompute
    * CRC32 over type‖data, and flag blobs whose stored CRC disagrees
    * (a corrupt blob often still "parses" — lengths and magics
    * intact — so dimension parsers and size checks sail past it).
    * The synth corpus plants corruption by the doc_id % 7 == 3 rule,
    * so the oracle can state the expected verdicts arithmetically and
    * a parser that walks chunks wrong, checksums the wrong span, or
    * misses the flipped byte mismatches. Scale: row-local CRC pass,
    * no shuffle. */
  def crcCheck(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    import java.util.zip.CRC32
    Engine.table(sp, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        val crc = new CRC32
        it.map { id =>
          val b = synthPngChunked(id)
          var pos = 8
          var n = 0L
          var ok = true
          while (pos + 12 <= b.length) {
            val len = ((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
              ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
            if (pos + 12 + len > b.length) { ok = false; pos = b.length }
            else {
              crc.reset()
              crc.update(b, pos + 4, 4 + len)
              val stored = ((b(pos + 8 + len) & 0xffL) << 24) |
                ((b(pos + 9 + len) & 0xffL) << 16) |
                ((b(pos + 10 + len) & 0xffL) << 8) |
                (b(pos + 11 + len) & 0xffL)
              if (crc.getValue != stored) ok = false
              n += 1
              pos += 12 + len
            }
          }
          (id, n, ok)
        }
      }
      .toDF("doc_id", "n_chunks", "crc_ok")
  }

  val crcCheckOracle: String = """
    SELECT doc_id, CAST(3 AS BIGINT) AS n_chunks,
      (doc_id % 7 <> 3) AS crc_ok
    FROM documents"""

  private def mp4ParamsOf(docId: Long): (Long, Long) =
    (600 + (docId * 37) % 46000, 1 + (docId * 7919) % 100000000L)

  /** A VALID ISO-BMFF (MP4) file skeleton for doc_id: ftyp with a
    * doc_id-varying brand list, a variable-size free box, an mdat box
    * with variable fake payload, THEN moov — so the parser must hop
    * three data-dependent top-level boxes before descending — and
    * inside moov a variable-size udta filler BEFORE mvhd, so the
    * child offset is data-dependent too. mvhd alternates version 0
    * (u32 times/duration, 108-byte box per spec) and version 1 (u64
    * times/duration, 120 bytes) with doc_id parity, exercising both
    * parse paths. Every size field is written exactly as a muxer
    * would. */
  private def synthMp4(docId: Long): Array[Byte] = {
    import java.nio.ByteBuffer
    val (ts, dur) = mp4ParamsOf(docId)
    val v1 = docId % 2 == 1
    val nBrands = (docId % 4).toInt
    val freePad = (docId % 29).toInt
    val mdatPad = ((docId * 5) % 101).toInt
    val udtaPad = ((docId * 3) % 19).toInt
    val ftypSz = 16 + 4 * nBrands
    val mvhdSz = if (v1) 120 else 108
    val moovSz = 8 + (8 + udtaPad) + mvhdSz
    val b = ByteBuffer.allocate(ftypSz + (8 + freePad) + (8 + mdatPad) + moovSz)
    b.putInt(ftypSz).put("ftyp".getBytes("US-ASCII"))
    b.put("isom".getBytes("US-ASCII")).putInt(0x200)
    (0 until nBrands).foreach(_ => b.put("mp41".getBytes("US-ASCII")))
    b.putInt(8 + freePad).put("free".getBytes("US-ASCII"))
    (0 until freePad).foreach(i => b.put((i % 251).toByte))
    b.putInt(8 + mdatPad).put("mdat".getBytes("US-ASCII"))
    (0 until mdatPad).foreach(i => b.put((i % 253).toByte))
    b.putInt(moovSz).put("moov".getBytes("US-ASCII"))
    b.putInt(8 + udtaPad).put("udta".getBytes("US-ASCII"))
    (0 until udtaPad).foreach(i => b.put((i % 249).toByte))
    b.putInt(mvhdSz).put("mvhd".getBytes("US-ASCII"))
    if (v1) {
      b.putInt(0x01000000)                      // version 1, flags 0
      b.putLong(0L).putLong(0L)                 // creation/modification
      b.putInt(ts.toInt).putLong(dur)           // timescale u32, duration u64
    } else {
      b.putInt(0)                               // version 0, flags 0
      b.putInt(0).putInt(0)                     // creation/modification
      b.putInt(ts.toInt).putInt(dur.toInt)      // timescale, duration u32
    }
    b.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
    b.putShort(0).putLong(0L)                     // reserved u16 + u32[2]
    // unity matrix (9 × u32)
    b.putInt(0x10000).putInt(0).putInt(0)
    b.putInt(0).putInt(0x10000).putInt(0)
    b.putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => b.putInt(0))         // pre_defined
    b.putInt(docId.toInt + 2)                     // next_track_ID
    b.array()
  }

  /** MP4 movie metadata via [[graft.functions.Mp4Meta]] — the NESTED
    * box walk (top-level ftyp/free/mdat hops to moov, then a child
    * walk to mvhd, version-dependent field offsets) that the flat
    * JPEG marker chain doesn't exercise. The oracle recomputes
    * timescale/duration from doc_id through the muxer's arithmetic,
    * so a wrong hop, wrong largesize handling, or a version-offset
    * slip mismatches; duration_ms is floor(1000·dur/ts) in exact
    * integer arithmetic on both engines. Scale: row-local, inside
    * whole-stage codegen, no shuffle. */
  def mp4Meta(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    val blobs = Engine.table(sp, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, synthMp4(id))))
      .toDF("doc_id", "blob")
    val m = graft.functions.functions.mp4_meta(col("blob"))
    blobs.select(col("doc_id"),
        shiftright(m, 32).cast("int").as("timescale"),
        m.bitwiseAND(lit(0xffffffffL)).as("duration"))
      .select(col("doc_id"), col("timescale"), col("duration"),
        expr("(1000 * duration) div timescale").as("duration_ms"))
  }

  val mp4MetaOracle: String = """
    SELECT doc_id,
      CAST(600 + (doc_id * 37) % 46000 AS INT) AS timescale,
      CAST(1 + (doc_id * 7919) % 100000000 AS BIGINT) AS duration,
      (1000 * (1 + (doc_id * 7919) % 100000000))
        // (600 + (doc_id * 37) % 46000) AS duration_ms
    FROM documents"""

  /** Deterministic FLAC stream parameters for doc_id — rates from the
    * real FLAC ladder; total samples modulo 2³⁴ so the 36-bit field's
    * high nibble (the part that lives ABOVE the 32-bit boundary) is
    * nonzero for ids past ~430, exercising the cross-word split. */
  private val FlacRates =
    Array(8000, 16000, 22050, 24000, 32000, 44100, 48000, 88200, 96000)
  private def flacParamsOf(docId: Long): (Int, Int, Int, Long) = {
    val rate = FlacRates(((docId % 9) + 9).toInt % 9)
    val channels = 1 + (docId % 8).toInt
    val bps = 16 + 8 * (docId % 2).toInt
    val total = 1000L + (docId * 10000019L) % (1L << 34)
    (rate, channels, bps, total)
  }

  /** A spec-valid 42-byte FLAC prefix for doc_id: "fLaC" marker + a
    * last-block STREAMINFO METADATA_BLOCK (header byte 0x80, 3-byte
    * length 34) laid out exactly per the FLAC format spec — the
    * interesting part being the BIT-PACKED region at offsets 18-25:
    * sample rate (20 bits), channels−1 (3), bits-per-sample−1 (5),
    * total samples (36) share bytes with no alignment, unlike every
    * other container this family synthesizes. Min/max frame sizes vary
    * with doc_id so a parser that drifts an offset lands in moving
    * data. MD5 left zero (integrity is [[crcCheck]]'s concern). */
  private def synthFlac(docId: Long): Array[Byte] = {
    val (rate, ch, bps, total) = flacParamsOf(docId)
    val b = java.nio.ByteBuffer.allocate(42)
    b.put("fLaC".getBytes("US-ASCII"))
    b.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    b.putShort(4096.toShort).putShort(4096.toShort) // min/max block size
    val minFrame = 1000 + (docId * 17) % 4000
    val maxFrame = minFrame + (docId * 29) % 3000
    def u24(v: Long): Unit =
      b.put((v >> 16).toByte).put((v >> 8).toByte).put(v.toByte)
    u24(minFrame); u24(maxFrame)
    b.put((rate >> 12).toByte)
    b.put(((rate >> 4) & 0xFF).toByte)
    b.put((((rate & 0xF) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)).toByte)
    b.put(((((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF).toInt).toByte)
    b.putInt((total & 0xFFFFFFFFL).toInt)
    b.array() // remaining 16 MD5 bytes stay zero
  }

  /** FLAC STREAMINFO parsing — the first BIT-level parse in the media
    * family: every other container ([[imageDims]], [[wavMeta]],
    * [[mp4Meta]]) reads byte-aligned fields, while STREAMINFO packs
    * sample rate / channels / bits-per-sample / a 36-bit sample count
    * across byte boundaries, so the parse is shift-and-mask arithmetic
    * on hex-sliced bytes (div/%, still declarative and codegen'd — no
    * UDF). The 36-bit total-samples field spans the 32-bit word
    * boundary: its high nibble joins a 4-byte big-endian read, and the
    * synth corpus plants totals > 2³² so a parser that drops the high
    * nibble hash-mismatches. The oracle recomputes every field from
    * doc_id through the encoder's arithmetic. Scale: row-local
    * projection, no shuffle. */
  def flacMeta(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    val blobs = Engine.table(sp, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, synthFlac(id))))
      .toDF("doc_id", "blob")
    val hx = upper(hex(col("blob")))
    // 1-based byte position n (two hex chars per byte), as BIGINT —
    // be(23,4) reads the low 32 bits of the sample count, which
    // overflows the imageDims-style int cast
    def u(pos: Int): Column =
      conv(substring(hx, (pos - 1) * 2 + 1, 2), 16, 10).cast("long")
    def be(pos: Int, nBytes: Int): Column =
      conv(substring(hx, (pos - 1) * 2 + 1, nBytes * 2), 16, 10).cast("long")
    val isFlac = substring(hx, 1, 8) === "664C6143"
    blobs.select(col("doc_id"),
        when(isFlac, lit("flac")).otherwise(lit("unknown")).as("fmt"),
        // rate = top 20 bits of bytes 18-20 (pos 19, 3 bytes)
        (be(19, 3) / 16).cast("long").as("sample_rate"),
        // channels-1 = bits 3-1 of byte 20 (pos 21)
        ((u(21) / 2).cast("long") % 8 + 1).as("channels"),
        // bps-1 = lowest bit of byte 20 ‖ top nibble of byte 21
        ((u(21) % 2) * 16 + (u(22) / 16).cast("long") + 1).as("bits"),
        // 36-bit total: low nibble of byte 21 is bits 35-32
        ((u(22) % 16) * lit(4294967296L) + be(23, 4)).as("n_samples"))
      .withColumn("duration_ms",
        expr("n_samples * 1000 div sample_rate"))
  }

  val flacMetaOracle: String = """
    SELECT doc_id, 'flac' AS fmt,
      CAST(CASE doc_id % 9 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        WHEN 2 THEN 22050 WHEN 3 THEN 24000 WHEN 4 THEN 32000
        WHEN 5 THEN 44100 WHEN 6 THEN 48000 WHEN 7 THEN 88200
        ELSE 96000 END AS BIGINT) AS sample_rate,
      CAST(1 + doc_id % 8 AS BIGINT) AS channels,
      CAST(16 + 8 * (doc_id % 2) AS BIGINT) AS bits,
      CAST(1000 + (doc_id * 10000019) % 17179869184 AS BIGINT) AS n_samples,
      CAST((1000 + (doc_id * 10000019) % 17179869184) * 1000
        // (CASE doc_id % 9 WHEN 0 THEN 8000 WHEN 1 THEN 16000
            WHEN 2 THEN 22050 WHEN 3 THEN 24000 WHEN 4 THEN 32000
            WHEN 5 THEN 44100 WHEN 6 THEN 48000 WHEN 7 THEN 88200
            ELSE 96000 END) AS BIGINT) AS duration_ms
    FROM documents"""

  /** MPEG-1 Layer III bitrate ladder (kbps), indexed by the header's
    * 4-bit bitrate field (index 0 = "free" is never synthesized;
    * index 15 is forbidden by the spec). */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)
  private def mp3ParamsOf(docId: Long): (Int, Int, Int, Int, Int) = (
    ((docId * 97) % 20000).toInt, // ID3v2 tag payload bytes
    1 + (docId % 14).toInt,       // bitrate index 1..14
    (docId % 3).toInt,            // sample-rate index
    (docId % 2).toInt,            // padding bit
    (docId % 4).toInt)            // channel mode

  /** An ID3v2.4 tag (10-byte header + doc_id-varying payload) followed
    * by a spec-valid MPEG-1 Layer III frame header. The tag size is
    * written SYNCSAFE (7 bits per byte, high bit clear — the ID3 quirk
    * real MP3 parsers trip on) and ranges to ~20 000, so one, two and
    * three syncsafe bytes are all exercised. */
  private def synthMp3(docId: Long): Array[Byte] = {
    val (tagPad, bIdx, srIdx, pad, mode) = mp3ParamsOf(docId)
    val b = java.nio.ByteBuffer.allocate(10 + tagPad + 4)
    b.put("ID3".getBytes("US-ASCII"))
    b.put(4.toByte).put(0.toByte).put(0.toByte) // v2.4.0, no flags
    b.put(((tagPad >> 21) & 0x7f).toByte).put(((tagPad >> 14) & 0x7f).toByte)
    b.put(((tagPad >> 7) & 0x7f).toByte).put((tagPad & 0x7f).toByte)
    var i = 0
    while (i < tagPad) { b.put((i % 247).toByte); i += 1 }
    // frame sync + MPEG-1 + Layer III + no CRC = FF FB
    b.put(0xFF.toByte).put(0xFB.toByte)
    b.put(((bIdx << 4) | (srIdx << 2) | (pad << 1)).toByte)
    b.put((mode << 6).toByte)
    b.array()
  }

  /** MP3 metadata — the DATA-DEPENDENT-offset hex parse ([[jpegDims]]
    * walks markers in a custom expression; here the single hop is
    * expressible declaratively): decode the ID3v2 SYNCSAFE tag size
    * (7 bits per byte — a straight be32 read is wrong whenever any
    * size byte ≥ 0x80, which the ≥128-byte tags the corpus plants
    * guarantee), jump over the tag with a dynamic-position substring,
    * then decode the frame header's packed fields and the derived
    * frame length (144·bitrate/rate + padding — the real decoder
    * formula, integer div). The oracle recomputes everything from
    * doc_id. Scale: row-local projection, no shuffle. */
  def mp3Meta(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    val blobs = Engine.table(sp, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, synthMp3(id))))
      .toDF("doc_id", "blob")
    // hex only the bytes the parse READS (round 13): the 10-byte ID3
    // header and the 4-byte frame header after the tag hop — hexing
    // the whole blob materialized a ~2× tag-sized string per row
    // (tags run to 20 000 B) that the parse then probed 14 bytes of;
    // binary substring keeps the dynamic offset, the decoded fields
    // are byte-identical
    blobs.select(col("doc_id"),
        upper(hex(substring(col("blob"), 1, 10))).as("hx"),
        col("blob"))
      .withColumn("is_id3", expr("substring(hx, 1, 6) = '494433'"))
      .withColumn("tag_size", expr(
        "(cast(conv(substring(hx,13,2),16,10) as bigint) % 128) * 2097152 + " +
        "(cast(conv(substring(hx,15,2),16,10) as bigint) % 128) * 16384 + " +
        "(cast(conv(substring(hx,17,2),16,10) as bigint) % 128) * 128 + " +
        " cast(conv(substring(hx,19,2),16,10) as bigint) % 128"))
      .withColumn("fh",
        expr("upper(hex(substring(blob, cast(10 + tag_size + 1 as int), 4)))"))
      .withColumn("ok",
        expr("is_id3 and substring(fh, 1, 4) = 'FFFB'"))
      .withColumn("b2", expr("cast(conv(substring(fh,5,2),16,10) as int)"))
      .withColumn("b3", expr("cast(conv(substring(fh,7,2),16,10) as int)"))
      .select(col("doc_id"),
        when(col("ok"), lit("mp3")).otherwise(lit("unknown")).as("fmt"),
        col("tag_size"),
        when(col("ok"), element_at(
            lit(Mp3Bitrates), expr("cast(b2 div 16 as int) + 1")).cast("long"))
          .as("bitrate_kbps"),
        when(col("ok"), element_at(
            lit(Mp3Rates), expr("cast((b2 div 4) % 4 as int) + 1")).cast("long"))
          .as("sample_rate"),
        when(col("ok"), expr(
            "CASE b3 div 64 WHEN 0 THEN 'stereo' WHEN 1 THEN 'joint_stereo' " +
            "WHEN 2 THEN 'dual_channel' ELSE 'mono' END"))
          .as("channel_mode"),
        expr("(b2 div 2) % 2").cast("long").as("pad"))
      .withColumn("frame_bytes",
        expr("144 * bitrate_kbps * 1000 div sample_rate + pad"))
      .drop("pad")
  }

  val mp3MetaOracle: String = """
    WITH p AS (
      SELECT doc_id,
        CASE 1 + doc_id % 14
          WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56
          WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
          WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
          WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS kbps,
        CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
          ELSE 32000 END AS rate
      FROM documents)
    SELECT doc_id, 'mp3' AS fmt,
      CAST((doc_id * 97) % 20000 AS BIGINT) AS tag_size,
      CAST(kbps AS BIGINT) AS bitrate_kbps,
      CAST(rate AS BIGINT) AS sample_rate,
      CASE doc_id % 4 WHEN 0 THEN 'stereo' WHEN 1 THEN 'joint_stereo'
        WHEN 2 THEN 'dual_channel' ELSE 'mono' END AS channel_mode,
      CAST(144 * kbps * 1000 // rate + doc_id % 2 AS BIGINT) AS frame_bytes
    FROM p"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_flac_meta" -> (flacMeta _),
    "media_mp3_meta" -> (mp3Meta _),
    "media_crc_check" -> (crcCheck _),
    "media_mp4_meta" -> (mp4Meta _),
    "media_jpeg_dims" -> (jpegDims _),
    "media_wav_meta" -> (wavMeta _),
    "media_decode" -> (mediaDecode _),
    "media_frame_sample" -> (frameSample _),
    "media_sniff_type" -> (sniffType _),
    "media_byte_entropy" -> (byteEntropy _),
    "media_image_dims" -> (imageDims _))

  val oracles: Map[String, String] = Map(
    "media_flac_meta" -> flacMetaOracle,
    "media_mp3_meta" -> mp3MetaOracle,
    "media_crc_check" -> crcCheckOracle,
    "media_mp4_meta" -> mp4MetaOracle,
    "media_jpeg_dims" -> jpegDimsOracle,
    "media_wav_meta" -> wavMetaOracle,
    "media_decode" -> mediaDecodeOracle,
    "media_frame_sample" -> frameSampleOracle,
    "media_sniff_type" -> sniffTypeOracle,
    "media_image_dims" -> imageDimsOracle)
}
