package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * extension). Media payloads are opaque `binary` columns with a typed
  * metadata struct; decode/feature-extract/resize/frame-sample run as
  * partition-local transforms over the bytes.
  *
  * All three media kinds have REAL pure-JVM decoders for their
  * header-described public formats: 24-bit BMP ([[bmpDecode]], q67),
  * PCM16 RIFF/WAVE ([[wavDecode]], q88), and uncompressed 24-bit AVI
  * ([[aviDecode]], q90) — each differentially oracle-checked against
  * DuckDB recomputing the expected bytes from the source text. The
  * byte-histogram path ([[extractFeatures]]) remains as the generic
  * seam where codec-library formats (JPEG/MP3/H.264 — no such libs in
  * this container) would plug in: binary in, fixed-width features out,
  * partition-local and batched. In PySpark the same seam would be
  * `mapInPandas` batches; the JVM analog used here is a codegen'd
  * expression over BinaryType / an explode of fixed-offset slices.
  */
object Multimodal {

  /** Synthesize a media table from `documents`: payload = utf-8 bytes of
    * the text, kind cycles image/audio/video, metadata struct typed. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.ops.Tables.documents(spark, sfDir)
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        // byte length of the PAYLOAD, not the character count — they
        // differ for any non-ASCII text
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("origin")).as("meta"))
  }

  /** The one stubbed "decode": 16-bin byte-count histogram (high nibble).
    * Shared by the per-row and batched paths so the stub cannot diverge.
    * Counts, not normalized ratios, deliberately: integer-exact, so the
    * whole multimodal extract is DuckDB-oracle-checkable (q50) instead of
    * trusting float formatting parity. */
  private[llm] def byteHistogram(bytes: Array[Byte]): Array[Int] = {
    val h = new Array[Int](16)
    if (bytes != null) bytes.foreach(b => h((b & 0xFF) >> 4) += 1)
    h
  }

  /** STUB decode → byte histogram as the "feature vector". Real decoders
    * plug in at this exact seam (binary in, fixed-width array out,
    * partition-local). */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload",
      out: String = "features"): DataFrame = {
    val f = udf((bytes: Array[Byte]) => byteHistogram(bytes))
    df.withColumn(out, f(col(payloadCol)))
  }

  /** Partition-batched variant of [[extractFeatures]]: rows flow through
    * `mapPartitions` in fixed-size chunks (64 — the reference's GPU batch
    * size, run_training_batch.py:57-61), the JVM analog of `mapInPandas`
    * batch shape. A real decoder would initialize once per partition
    * (before the iterator) and process each chunk as one batch call. */
  def extractFeaturesBatched(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // <- per-partition decoder init would go here (once, not per row)
        rows.grouped(batchSize).flatMap { batch =>
          // <- one batched "decode" call per chunk (STUB: byte histogram)
          batch.iterator.map { case (id, bytes) =>
            (id, byteHistogram(bytes))
          }
        }
      }
      .toDF(idCol, "features")
  }

  // ---------------- Real decode: BMP (pure JVM, public format) ---------
  //
  // One media kind gets a REAL decoder: 24-bit uncompressed BMP — a
  // public, header-described format parseable with zero codec libraries.
  // The stub byte-histogram path stays for the other kinds; this is the
  // "plug a real decoder into the seam" proof, exercised end-to-end by
  // q67 (decoded pixels differentially oracle-checked against DuckDB
  // computing the expected bytes straight from the source text).

  /** Encode raw pixel bytes as a 24-bit uncompressed BMP. `content` must
    * be exactly width*height*3 bytes, laid into the file's bottom-up rows
    * in order (file row 0 = bottom image row, per the BMP spec). Rows are
    * padded to a 4-byte stride — pick a width with w*3 % 4 != 0 and the
    * decoder's padding handling is actually exercised. */
  def bmpEncode(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(content.length == width * height * 3,
      s"content must be ${width * height * 3} bytes, got ${content.length}")
    val stride = ((width * 3) + 3) / 4 * 4
    val imageSize = stride * height
    val fileSize = 54 + imageSize
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)          // pixel data offset
    out.putInt(40).putInt(width).putInt(height)    // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0)          // planes, bpp, BI_RGB
      .putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = 0
    while (row < height) {
      out.put(content, row * width * 3, width * 3)
      var p = width * 3
      while (p < stride) { out.put(0: Byte); p += 1 }
      row += 1
    }
    out.array()
  }

  /** Decode a 24-bit uncompressed bottom-up BMP: parse the header (magic,
    * pixel offset, dimensions, bpp, compression), skip per-row stride
    * padding, and return (width, height, pixels) with pixels in TOP-DOWN
    * scan order (row 0 = top image row — the order every consumer
    * expects). Fails loudly on anything outside the supported subset. */
  def bmpDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes != null && bytes.length >= 54 &&
      bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "not a BMP payload")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = bb.getInt(10)
    val width = bb.getInt(18)
    val height = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    require(bpp == 24 && compression == 0 && width > 0 && height > 0,
      s"unsupported BMP variant: bpp=$bpp compression=$compression " +
        s"${width}x$height (only 24-bit uncompressed bottom-up)")
    val stride = ((width * 3) + 3) / 4 * 4
    // Long arithmetic: a hostile header (huge height, negative offset)
    // must hit THIS require, not wrap Int and surface as an array error
    require(pixelOffset >= 54 &&
      bytes.length.toLong >= pixelOffset.toLong + stride.toLong * height &&
      3L * width * height <= Int.MaxValue,
      "BMP payload truncated")
    val pixels = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      // file stores rows bottom-up: file row `row` is image row
      // height-1-row of the top-down output
      System.arraycopy(bytes, pixelOffset + row * stride,
        pixels, (height - 1 - row) * width * 3, width * 3)
      row += 1
    }
    (width, height, pixels)
  }

  /** [[mediaTable]] with REAL payloads for the image kind: docs that map
    * to kind=image (doc_id % 3 == 0) and carry ≥ width*height*3 payload
    * bytes become genuine 5x4 24-bit BMPs whose pixel content is the
    * leading text bytes (w=5 → 15-byte rows padded to a 16-byte stride,
    * so decode must handle real padding). Other kinds keep the opaque
    * payload. */
  def mediaTableBmp(spark: SparkSession, sfDir: String,
      width: Int = 5, height: Int = 4): DataFrame = {
    val need = width * height * 3
    val enc = udf { (bytes: Array[Byte]) =>
      bmpEncode(bytes.take(need), width, height)
    }
    mediaTable(spark, sfDir)
      .withColumn("payload",
        when(col("meta.kind") === "image" && col("meta.n_bytes") >= need,
          enc(col("payload"))).otherwise(col("payload")))
  }

  /** Real decode over the BMP rows: parse each payload, emit decoded
    * dimensions (from the header, proving the parse), the top-down pixel
    * bytes' md5, and the 16-bin high-nibble pixel histogram (same feature
    * shape as the stub path). Partition-local, batched like
    * [[extractFeaturesBatched]]. */
  def decodeBmpFeatures(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder state would initialize here, once per partition
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val (w, h, pixels) = bmpDecode(bytes)
            (id, w, h, pixels, byteHistogram(pixels))
          }
        }
      }
      .toDF(idCol, "width", "height", "pixels", "pixel_hist")
  }

  /** Canonical RIFF/WAVE encoder (PCM16LE mono, public format): each
    * content byte becomes one sample `(b−128)·256`. A LIST chunk sits
    * between `fmt ` and `data` ON PURPOSE, so a decoder that hardcodes
    * the 44-byte canonical layout instead of walking chunks reads
    * garbage and fails the differential oracle (q88). */
  def wavEncode(content: Array[Byte], sampleRate: Int = 8000): Array[Byte] =
    wavEncodeSamples(
      content.map(b => (((b & 0xFF) - 128) * 256).toShort), sampleRate)

  /** [[wavEncode]] at the sample level (PCM16LE mono, same container
    * byte-for-byte): the seam ops that transform decoded samples
    * ([[wavDecimate]]) re-encode through. */
  def wavEncodeSamples(samples: Array[Short],
      sampleRate: Int): Array[Byte] = {
    val listPayload = "INFOgraft-wav-fixture.".getBytes("US-ASCII") // 22B even
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + listPayload.length) + (8 + dataLen)
    val out = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                // PCM
      .putShort(1)                // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)     // byte rate
      .putShort(2)                // block align
      .putShort(16)               // bits per sample
    out.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length)
      .put(listPayload)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort(_))
    out.array()
  }

  /** REAL audio downsample for a PCM16 WAV payload: decode, keep every
    * k-th sample (plain decimation — the deterministic baseline;
    * anti-aliasing filters are a DSP-library concern, the documented
    * seam), re-encode at rate/k. The q102 oracle roundtrips it: decode
    * of the decimated payload must yield exactly the strided samples. */
  def wavDecimate(bytes: Array[Byte], k: Int): Array[Byte] = {
    require(k > 0, s"wav: decimation factor must be positive, got $k")
    val (rate, ss) = wavDecode(bytes)
    require(rate % k == 0,
      s"wav: rate $rate not divisible by decimation factor $k")
    wavEncodeSamples(Array.range(0, ss.length, k).map(ss(_)), rate / k)
  }

  /** Decode a PCM16LE mono RIFF/WAVE payload by genuinely walking the
    * chunk list (unknown chunks skipped with the RIFF even-byte padding
    * rule; `fmt ` validated before `data` is accepted). Returns
    * (sampleRate, samples). Fails loudly outside the supported subset —
    * same contract style as [[bmpDecode]]. */
  def wavDecode(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes != null && bytes.length >= 12, "not a WAV payload")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    require(tag() == "RIFF", "wav: missing RIFF magic")
    buf.getInt() // declared riff length; the chunk walk is authoritative
    require(tag() == "WAVE", "wav: not a WAVE form")
    var rate = 0
    var samples: Array[Short] = null
    while (samples == null) {
      require(buf.remaining >= 8, "wav: no data chunk")
      val id = tag()
      val len = buf.getInt()
      require(len >= 0 && len <= buf.remaining, s"wav: bad chunk length $len")
      id match {
        case "fmt " =>
          require(len >= 16, "wav: short fmt chunk")
          val fmt = buf.getShort(); val channels = buf.getShort()
          rate = buf.getInt(); buf.getInt(); buf.getShort()
          val bits = buf.getShort()
          require(fmt == 1 && channels == 1 && bits == 16,
            s"wav: unsupported format (fmt=$fmt ch=$channels bits=$bits; " +
              "only PCM16 mono)")
          buf.position(buf.position() + (len - 16) + (len & 1))
        case "data" =>
          require(rate > 0, "wav: data chunk before fmt")
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort(); i += 1 }
          samples = out
        case _ =>
          buf.position(buf.position() + len + (len & 1)) // skip + pad
      }
    }
    (rate, samples)
  }

  /** [[mediaTable]] with REAL payloads for the audio kind: docs mapping
    * to kind=audio (doc_id % 3 == 1) with ≥ `nSamples` payload bytes
    * become genuine RIFF/WAVE files whose PCM samples encode the leading
    * text bytes. Other kinds keep the opaque payload. */
  def mediaTableWav(spark: SparkSession, sfDir: String,
      nSamples: Int = 40, sampleRate: Int = 8000): DataFrame = {
    val enc = udf { (bytes: Array[Byte]) =>
      wavEncode(bytes.take(nSamples), sampleRate)
    }
    mediaTable(spark, sfDir)
      .withColumn("payload",
        when(col("meta.kind") === "audio" && col("meta.n_bytes") >= nSamples,
          enc(col("payload"))).otherwise(col("payload")))
  }

  /** Real audio decode → integer amplitude features (exact, so q88 can
    * hash-match DuckDB): sample rate and count from the parsed header,
    * sum/max/min amplitude over the PCM samples. Batched like
    * [[decodeBmpFeatures]]. */
  def decodeWavFeatures(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder state would initialize here, once per partition
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val (rate, ss) = wavDecode(bytes)
            var sum = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
            ss.foreach { v =>
              sum += v
              if (v > mx) mx = v
              if (v < mn) mn = v
            }
            (id, rate, ss.length, sum, mx, mn)
          }
        }
      }
      .toDF(idCol, "sample_rate", "n_samples", "amp_sum", "amp_max",
        "amp_min")
  }

  // ---------------- Real decode: AVI (pure JVM, public format) ---------
  //
  // The third media kind gets a REAL decoder too: uncompressed AVI — a
  // RIFF container (the same chunk grammar [[wavDecode]] walks) whose
  // movi frames are DIB bitmaps (the same bottom-up stride-padded pixel
  // layout [[bmpDecode]] un-flips). Frame geometry comes from the strf
  // BITMAPINFOHEADER inside LIST hdrl → LIST strl, found by genuinely
  // recursing the chunk tree; a JUNK chunk sits between hdrl and movi ON
  // PURPOSE so a reader that hardcodes offsets fails the differential
  // oracle (q90), exactly like the WAV fixture's LIST chunk.

  /** Encode raw pixel bytes as an uncompressed 24-bit AVI. `content` must
    * be width*height*3*nFrames bytes; frame f's pixels are the f-th slice,
    * laid bottom-up with 4-byte row stride (DIB convention — pick a width
    * with w*3 % 4 != 0 and decoders must handle real padding). */
  def aviEncode(content: Array[Byte], width: Int, height: Int,
      nFrames: Int): Array[Byte] = {
    // fail-loudly bounds, matching the decoder's contract: rcFrame in
    // strh is 16-bit so width/height past Short.MaxValue would silently
    // truncate, and the stride/buffer arithmetic below is Int — check
    // the total in Long BEFORE any Int multiply can wrap into a
    // plausible-looking (corrupt) file
    require(width > 0 && height > 0 && nFrames > 0,
      s"avi: non-positive geometry ${width}x$height x$nFrames frames")
    require(width <= Short.MaxValue && height <= Short.MaxValue,
      s"avi: geometry ${width}x$height exceeds the strh rcFrame range " +
        "(max 32767) — refusing to emit a silently-truncated header")
    val strideL = ((width.toLong * 3) + 3) / 4 * 4
    require((strideL * height + 8) * nFrames + 1024 <= Int.MaxValue,
      s"avi: total size for ${width}x$height x$nFrames frames overflows " +
        "a RIFF Int chunk length")
    val frameContent = width * height * 3
    require(content.length == frameContent * nFrames,
      s"content must be ${frameContent * nFrames} bytes, got ${content.length}")
    val stride = strideL.toInt
    val frameSize = stride * height // multiple of 4, no odd-chunk pad
    val junk = "graft-avi-fixture.".getBytes("US-ASCII") // 18 B, even
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nFrames * (8 + frameSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + junk.length) + (8 + moviSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    tag("RIFF"); out.putInt(riffSize); tag("AVI ")
    tag("LIST"); out.putInt(hdrlSize); tag("hdrl")
    tag("avih"); out.putInt(56)
    out.putInt(100000)            // µs per frame (10 fps)
      .putInt(frameSize * 10)     // max bytes per second
      .putInt(0).putInt(0)        // padding granularity, flags
      .putInt(nFrames).putInt(0)  // total frames, initial frames
      .putInt(1)                  // streams
      .putInt(frameSize)          // suggested buffer size
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    tag("LIST"); out.putInt(strlSize); tag("strl")
    tag("strh"); out.putInt(56)
    tag("vids"); tag("DIB ")
    out.putInt(0)                 // flags
      .putShort(0).putShort(0)    // priority, language
      .putInt(0)                  // initial frames
      .putInt(1).putInt(10)       // scale, rate (10 fps)
      .putInt(0).putInt(nFrames)  // start, length
      .putInt(frameSize)          // suggested buffer size
      .putInt(-1)                 // quality (driver default)
      .putInt(frameSize)          // sample size
      .putShort(0).putShort(0)    // rcFrame
      .putShort(width.toShort).putShort(height.toShort)
    tag("strf"); out.putInt(40)   // BITMAPINFOHEADER, as in [[bmpEncode]]
    out.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(frameSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    tag("JUNK"); out.putInt(junk.length); out.put(junk)
    tag("LIST"); out.putInt(moviSize); tag("movi")
    var f = 0
    while (f < nFrames) {
      tag("00db"); out.putInt(frameSize)
      var row = 0
      while (row < height) {
        out.put(content, f * frameContent + row * width * 3, width * 3)
        var p = width * 3
        while (p < stride) { out.put(0: Byte); p += 1 }
        row += 1
      }
      f += 1
    }
    out.array()
  }

  /** True if the payload is a RIFF AVI form (magic check only — the full
    * parse is [[aviDecode]]'s job). */
  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'A' && bytes(9) == 'V' &&
      bytes(10) == 'I' && bytes(11) == ' '

  /** Decode an uncompressed 24-bit AVI by walking the RIFF chunk tree:
    * recurse into LISTs until the strf BITMAPINFOHEADER yields the frame
    * geometry, collect every `##db`/`##dc` frame inside LIST movi, then
    * un-flip each DIB frame's bottom-up stride-padded rows into TOP-DOWN
    * pixel bytes (the [[bmpDecode]] pixel math). Unknown chunks (JUNK,
    * idx1, …) are skipped with the RIFF even-byte padding rule. Returns
    * (width, height, frames). Fails loudly outside the supported
    * subset — same contract style as [[bmpDecode]]/[[wavDecode]]. */
  def aviDecode(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    require(bytes != null && bytes.length >= 12, "not an AVI payload")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    require(tag() == "RIFF", "avi: missing RIFF magic")
    buf.getInt() // declared riff length; the chunk walk is authoritative
    require(tag() == "AVI ", "avi: not an AVI form")
    var width = 0
    var height = 0
    val raw = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk the chunks of [buf.position, end): recurse into LISTs, parse
    // strf where found, collect movi frame chunks
    def walk(end: Int, inMovi: Boolean): Unit = {
      while (buf.position() + 8 <= end) {
        val id = tag()
        val len = buf.getInt()
        // Long arithmetic: a hostile length must hit THIS require, not
        // wrap Int and surface as a buffer error (the bmpDecode rule)
        require(len >= 0 && buf.position().toLong + len <= end,
          s"avi: bad chunk length $len")
        val next = math.min(buf.position() + len + (len & 1), end)
        id match {
          case "LIST" =>
            require(len >= 4, "avi: short LIST chunk")
            val listType = tag()
            walk(next, inMovi || listType == "movi")
          case "strf" =>
            require(len >= 40, "avi: short strf chunk")
            buf.getInt() // biSize
            width = buf.getInt(); height = buf.getInt()
            val planes = buf.getShort()
            val bpp = buf.getShort()
            val compression = buf.getInt()
            require(planes == 1 && bpp == 24 && compression == 0 &&
              width > 0 && height > 0,
              s"avi: unsupported variant: bpp=$bpp " +
                s"compression=$compression ${width}x$height " +
                "(only 24-bit uncompressed DIB frames)")
          case c if inMovi && (c.endsWith("db") || c.endsWith("dc")) =>
            val fb = new Array[Byte](len)
            buf.get(fb)
            raw += fb
          case _ => () // JUNK / idx1 / strh / avih / unknown: skip
        }
        buf.position(next)
      }
    }
    walk(bytes.length, inMovi = false)
    require(width > 0, "avi: no strf header found")
    require(raw.nonEmpty, "avi: no movi frames found")
    val stride = ((width * 3) + 3) / 4 * 4
    val frames = raw.map { fb =>
      require(fb.length == stride * height,
        s"avi: frame is ${fb.length} bytes, expected ${stride * height}")
      val px = new Array[Byte](width * height * 3)
      var row = 0
      while (row < height) {
        // DIB frames store rows bottom-up, exactly like [[bmpDecode]]
        System.arraycopy(fb, row * stride,
          px, (height - 1 - row) * width * 3, width * 3)
        row += 1
      }
      px
    }.toArray
    (width, height, frames)
  }

  /** REAL temporal downsample for an AVI payload (the video analog of
    * [[bmpResize]]/[[wavDecimate]]): decode, keep every k-th frame, and
    * re-encode — decoded frames are top-down, so each kept frame's rows
    * are re-flipped into the encoder's bottom-up per-frame content (the
    * orientation contract q100 pinned for stills). The q103 oracle
    * roundtrips the result through [[aviDecode]]. */
  def aviFrameDecimate(bytes: Array[Byte], k: Int): Array[Byte] = {
    require(k > 0, s"avi: decimation factor must be positive, got $k")
    val (w, h, frames) = aviDecode(bytes)
    val kept = Array.range(0, frames.length, k).map(frames(_))
    val content = new Array[Byte](kept.length * w * h * 3)
    for ((px, f) <- kept.zipWithIndex; r <- 0 until h)
      System.arraycopy(px, r * w * 3,
        content, f * w * h * 3 + (h - 1 - r) * w * 3, w * 3)
    aviEncode(content, w, h, kept.length)
  }

  /** [[mediaTable]] with REAL payloads for the video kind: docs mapping
    * to kind=video (doc_id % 3 == 2) with ≥ width*height*3*nFrames
    * payload bytes become genuine uncompressed AVIs whose frame pixels
    * are consecutive slices of the leading text bytes (w=5 → 15-byte
    * rows padded to a 16-byte stride, so real padding is exercised).
    * Other kinds keep the opaque payload. */
  def mediaTableAvi(spark: SparkSession, sfDir: String, width: Int = 5,
      height: Int = 2, nFrames: Int = 2): DataFrame = {
    val need = width * height * 3 * nFrames
    val enc = udf { (bytes: Array[Byte]) =>
      aviEncode(bytes.take(need), width, height, nFrames)
    }
    mediaTable(spark, sfDir)
      .withColumn("payload",
        when(col("meta.kind") === "video" && col("meta.n_bytes") >= need,
          enc(col("payload"))).otherwise(col("payload")))
  }

  /** Real video decode → one row per frame: decoded geometry from the
    * header (proving the parse), the frame's top-down pixel bytes, and
    * the 16-bin pixel histogram. Partition-local, batched like
    * [[decodeBmpFeatures]]. */
  def decodeAviFrames(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder state would initialize here, once per partition
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            val (w, h, frames) = aviDecode(bytes)
            frames.iterator.zipWithIndex.map { case (px, i) =>
              (id, i.toLong, w, h, px, byteHistogram(px))
            }
          }
        }
      }
      .toDF(idCol, "frame_id", "width", "height", "pixels", "pixel_hist")
  }

  /** STUB resize: truncate/pad payload to `size` bytes (stands in for a
    * real resample; keeps the binary-in/binary-out contract). Remains
    * only as the generic seam for codec-library formats — the image kind
    * has the REAL path, [[resizeDecoded]]. */
  def resizeStub(df: DataFrame, size: Int,
      payloadCol: String = "payload"): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      val out = new Array[Byte](size)
      if (bytes != null)
        System.arraycopy(bytes, 0, out, 0, math.min(bytes.length, size))
      out
    }
    df.withColumn("resized", f(col(payloadCol)))
  }

  /** REAL nearest-neighbor resize for a 24-bit BMP payload: decode,
    * resample on the top-down pixel grid — source pixel for output
    * (x, y) is (x·w/W, y·h/H) with integer floor, the textbook NN rule —
    * and re-encode. Both codec directions are exercised, so a roundtrip
    * through [[bmpDecode]] pins encode AND resample (q100's oracle does
    * exactly that). */
  def bmpResize(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0, s"bmp resize to ${outW}x$outH")
    val (w, h, px) = bmpDecode(bytes)
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * w / outW).toInt
        var c = 0
        while (c < 3) {
          // px is top-down (bmpDecode's contract) but bmpEncode expects
          // FILE row order (row 0 = bottom image row) — write flipped,
          // so a decode of the result returns the top-down resample
          out(((outH - 1 - y) * outW + x) * 3 + c) =
            px((sy * w + sx) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    bmpEncode(out, outW, outH)
  }

  /** [[resizeStub]] with the real image path plugged in (the same move
    * [[frameSampleDecoded]] makes for video): BMP payloads are decoded,
    * nearest-neighbor resampled to `outW`×`outH` and re-encoded as a
    * genuine BMP; non-BMP payloads (and BMP-magic payloads that fail the
    * parse) keep the stub's truncate/pad semantics over `outW·outH·3`
    * bytes. Never-throwing best-effort, like the frame sampler. */
  def resizeDecoded(df: DataFrame, outW: Int, outH: Int,
      payloadCol: String = "payload"): DataFrame = {
    val size = outW * outH * 3
    val f = udf { (bytes: Array[Byte]) =>
      def stub: Array[Byte] = {
        val out = new Array[Byte](size)
        if (bytes != null)
          System.arraycopy(bytes, 0, out, 0, math.min(bytes.length, size))
        out
      }
      if (bytes != null && bytes.length >= 2 &&
          bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
        scala.util.Try(bmpResize(bytes, outW, outH)).getOrElse(stub)
      else stub
    }
    df.withColumn("resized", f(col(payloadCol)))
  }

  /** Frame sampling: split the payload into `n` fixed-offset chunks and
    * explode to one row per frame — the row-multiplying shape a video
    * pipeline needs (frame_id ordering deterministic). */
  def frameSample(df: DataFrame, n: Int,
      payloadCol: String = "payload"): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.isEmpty) Seq.empty[Array[Byte]]
      else {
        val step = math.max(1, bytes.length / n)
        (0 until math.min(n, bytes.length))
          .map(i => bytes.slice(i * step, math.min(i * step + step, bytes.length)))
      }
    }
    df.select(col("*"), posexplode(f(col(payloadCol))))
      .withColumnRenamed("pos", "frame_id")
      .withColumnRenamed("col", "frame_bytes")
      .withColumn("frame_hash", md5(col("frame_bytes")))
      .drop(payloadCol)
  }

  /** [[frameSample]] with the real video path plugged in: an AVI
    * payload's frames are its genuinely DECODED top-down frame pixels
    * (one row per movi frame, via [[aviDecode]]); non-AVI payloads keep
    * the fixed-offset chunk sampling. Same output shape, so consumers
    * switch decoders without a schema change. */
  def frameSampleDecoded(df: DataFrame, n: Int,
      payloadCol: String = "payload"): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      def chunks: Seq[Array[Byte]] = {
        val step = math.max(1, bytes.length / n)
        (0 until math.min(n, bytes.length))
          .map(i => bytes.slice(i * step, math.min(i * step + step, bytes.length)))
      }
      if (bytes == null || bytes.isEmpty) Seq.empty[Array[Byte]]
      // the sample budget `n` bounds the decoded path too (a long video
      // must not fan out unboundedly just because it decoded); the first
      // n movi frames are the deterministic sample. A payload that wears
      // the AVI magic but fails the parse falls back to chunk sampling —
      // this operator's contract is never-throwing best-effort sampling,
      // unlike decodeAviFrames' fail-loudly decode
      else if (isAvi(bytes))
        scala.util.Try(aviDecode(bytes)._3.take(n).toSeq).getOrElse(chunks)
      else chunks
    }
    df.select(col("*"), posexplode(f(col(payloadCol))))
      .withColumnRenamed("pos", "frame_id")
      .withColumnRenamed("col", "frame_bytes")
      .withColumn("frame_hash", md5(col("frame_bytes")))
      .drop(payloadCol)
  }

  /** Average-hash (aHash) over decoded top-down pixels — the classic
    * perceptual image fingerprint (one bit per pixel: is its gray level
    * above the image mean?), the signature LAION-style image dedup
    * pipelines bucket on. All-integer by construction: gray is the
    * channel-sum DIV 3, the mean is the gray-sum DIV pixel count, so
    * the hash replays exactly in any engine — no float luminance
    * weights, no resize interpolation to disagree about. The fixture's
    * 5×4 BMPs give 20-bit hashes; a production 8×8 aHash is the same
    * arithmetic with 64 bits. Bit p corresponds to top-down pixel p
    * (row-major), so the SQL replay is pure substring math over q67's
    * pixel string. */
  def aHash(pixels: Array[Byte], nPixels: Int): Long = {
    require(nPixels > 0 && nPixels <= 64,
      s"aHash needs 1..64 pixels for a long hash, got $nPixels")
    require(pixels.length >= nPixels * 3,
      s"aHash: ${pixels.length} pixel bytes < ${nPixels * 3}")
    val gray = new Array[Long](nPixels)
    var sum = 0L
    var p = 0
    while (p < nPixels) {
      val g = ((pixels(p * 3) & 0xFF) + (pixels(p * 3 + 1) & 0xFF) +
        (pixels(p * 3 + 2) & 0xFF)) / 3
      gray(p) = g
      sum += g
      p += 1
    }
    val mean = sum / nPixels
    var hash = 0L
    p = 0
    while (p < nPixels) {
      if (gray(p) > mean) hash |= 1L << p
      p += 1
    }
    hash
  }

  /** Average-hash over decoded PCM samples — [[aHash]]'s audio twin
    * (one bit per sample: above the clip's integer mean?), the
    * signature an audio dedup pipeline bands on exactly like the image
    * one. `Math.floorDiv` for the mean, NOT `/`: sample sums go
    * negative and Java truncates toward zero where the SQL replay's
    * `//` floors — the one place the two would disagree. */
  def audioHash(samples: Array[Short], nBits: Int): Long = {
    require(nBits > 0 && nBits <= 64,
      s"audioHash needs 1..64 bits for a long hash, got $nBits")
    require(samples.length >= nBits,
      s"audioHash: ${samples.length} samples < $nBits")
    var sum = 0L
    var i = 0
    while (i < nBits) { sum += samples(i); i += 1 }
    val mean = Math.floorDiv(sum, nBits.toLong)
    var hash = 0L
    i = 0
    while (i < nBits) {
      if (samples(i) > mean) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Decode WAV payloads and emit each clip's [[audioHash]] over its
    * first `nBits` samples — `(media_id, ahash)`, the audio feed for
    * [[graft.llm.Dedup.phashBandPairs]]. */
  def wavHashFeatures(df: DataFrame, nBits: Int,
      idCol: String = "media_id", payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val (_, samples) = wavDecode(bytes)
            (id, audioHash(samples, nBits))
          }
        }
      }
      .toDF(idCol, "ahash")
  }

  /** Decode BMP payloads and emit each image's [[aHash]] —
    * `(media_id, phash)`. One map-only pass in the same batched
    * decode shape as [[decodeBmpFeatures]]; the byte-level codec+hash
    * work is the UDF-space this module owns (measured precedent:
    * builtin HOF pipelines lose to a scalar pass on byte work). */
  def aHashFeatures(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val (w, h, pixels) = bmpDecode(bytes)
            (id, aHash(pixels, w * h))
          }
        }
      }
      .toDF(idCol, "phash")
  }

  /** Per-frame aHash features for video clips — the named video twin of
    * [[aHashFeatures]]/[[wavHashFeatures]]: decode each AVI's frames
    * ([[decodeAviFrames]]) and hash every frame's pixels at `nBits`
    * bits. ONE definition for the three call sites (q182, the q191
    * manifest, the PlanAuditSpec pin) so the bit width cannot drift
    * between the pair search and its consumers. Emits
    * `(idCol, fhash)` — one row per frame, duplicates preserved (the
    * downstream [[Dedup.frameSetReps]] collapse owns dedup). */
  def aviFrameHashFeatures(df: DataFrame, nBits: Int = 10,
      idCol: String = "media_id"): DataFrame =
    decodeAviFrames(df, idCol)
      .select(col(idCol), udf((b: Array[Byte]) => aHash(b, nBits))
        .apply(col("pixels")).as("fhash"))
}
