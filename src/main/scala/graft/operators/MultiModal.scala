package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §7.6): image/audio/video content is
  * carried as an opaque `binary` column with typed metadata, exactly like
  * the reference carries geometry as an opaque column it never computes on
  * (/root/reference/src/wins_transform_staging.py — geometry flows through
  * copies/appends untouched, SURVEY §0).
  *
  * The decode step is a REAL pure-JVM container-header parser ([[Codec]]):
  * PNG IHDR, JPEG SOF, GIF logical-screen, and WAV/RIFF fmt+data chunks are
  * public formats whose dimensions/frame counts live in fixed header fields
  * — no native codec library needed to extract them. Payloads in none of
  * those formats (e.g. the text-bytes fixtures) decode honestly to
  * `format = "unknown"` with zero dimensions, never to fabricated numbers.
  * Full pixel/sample decode (resize, frame extraction) would swap in a real
  * JNI codec behind the same [[extractFeatures]] partition loop; nothing
  * else changes.
  */
object MultiModal {

  /** One media row: opaque payload + routing metadata. */
  case class Media(media_id: Long, modality: String, content: Array[Byte])

  /** Extracted features per item. `format` is the container detected from
    * the payload ("png" / "jpeg" / "gif" / "wav" / "unknown") — independent
    * of the caller-asserted `modality`, so a mislabeled column surfaces as
    * a modality/format mismatch instead of silent nonsense. `n_frames` is
    * 1 for a decodable still image and the sample-frame count for WAV;
    * undecodable payloads report 0 dimensions and 0 frames. */
  case class MediaFeatures(
      media_id: Long, modality: String, format: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Long, checksum: Long)

  /** Pure-JVM header parsers for the public container formats. Each returns
    * None (never throws) on anything that is not a well-formed header —
    * corrupt and truncated payloads are data, not exceptions, in a corpus
    * pipeline. */
  object Codec {
    /** 64-bit FNV-1a payload checksum (integrity/versioning field). */
    def checksum(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }

    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def le32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
      * width/height are the big-endian ints at offsets 16/20. The spec
      * caps both at 2³¹−1 and forbids 0, so a non-positive reading is a
      * corrupt header and decodes to None, not a fabricated number. */
    def parsePng(b: Array[Byte]): Option[(Int, Int)] =
      if (b.length >= 24 && b.startsWith(PngSig) &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16)
        val h = be32(b, 20)
        if (w > 0 && h > 0) Some((w, h)) else None
      } else None

    /** JPEG: SOI then a marker-segment walk to the first SOFn frame header
      * (C0–CF minus C4 DHT / C8 JPG / CC DAC), whose payload is
      * precision(1), height(2 BE), width(2 BE). Standalone markers
      * (TEM, RSTn, SOI, EOI) carry no length field; fill 0xFF bytes before
      * a marker are legal padding. */
    def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // lost marker sync
        val m = b(i + 1) & 0xff
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone
        else {
          val len = be16(b, i + 2)
          if (len < 2) return None
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 8 >= b.length) return None
            return Some((be16(b, i + 7), be16(b, i + 5))) // (width, height)
          }
          i += 2 + len
        }
      }
      None
    }

    /** GIF: "GIF87a"/"GIF89a" signature, then the logical screen
      * width/height as little-endian uint16 at offsets 6/8. */
    def parseGif(b: Array[Byte]): Option[(Int, Int)] = {
      val sig = b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'
      if (sig) Some((le16(b, 6), le16(b, 8))) else None
    }

    /** WAV/RIFF: walk the chunk list for "fmt " (block align = bytes per
      * sample frame) and "data" (payload size); the sample-frame count is
      * dataSize / blockAlign. Chunks are word-aligned (odd sizes pad). */
    def parseWavFrames(b: Array[Byte]): Option[Long] = {
      val sig = b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
      if (!sig) return None
      // the cursor is a Long and chunk sizes stay UNSIGNED (le32 returns
      // 0..2³²−1): the step 8 + size + pad is then always >= 8, so a
      // corrupt giant size walks PAST the buffer end and the loop exits —
      // int-truncating the size could make the step 0 and stall the task
      var i = 12L
      var blockAlign = 0
      var dataSize = -1L
      while (i + 8 <= b.length && (blockAlign == 0 || dataSize < 0)) {
        val ii = i.toInt
        val id = new String(b.slice(ii, ii + 4), java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(b, ii + 4)
        if (id == "fmt " && i + 8 + 14 <= b.length) blockAlign = le16(b, ii + 8 + 12)
        if (id == "data") dataSize = size
        i += 8L + size + (size & 1L)
      }
      if (blockAlign > 0 && dataSize >= 0) Some(dataSize / blockAlign) else None
    }

    /** Header decode: try each known container, report honestly. */
    def decode(m: Media): MediaFeatures = {
      val cs = checksum(m.content)
      def img(fmt: String, wh: (Int, Int)) =
        MediaFeatures(m.media_id, m.modality, fmt, m.content.length,
          wh._1, wh._2, 1L, cs)
      parsePng(m.content).map(img("png", _))
        .orElse(parseJpeg(m.content).map(img("jpeg", _)))
        .orElse(parseGif(m.content).map(img("gif", _)))
        .orElse(parseWavFrames(m.content).map(frames =>
          MediaFeatures(m.media_id, m.modality, "wav", m.content.length,
            0, 0, frames, cs)))
        .getOrElse(MediaFeatures(m.media_id, m.modality, "unknown",
          m.content.length, 0, 0, 0L, cs))
    }
  }

  /** Feature extraction over partitions: the decode loop runs once per
    * partition (codec init amortized across the batch — the expensive part
    * with a full pixel decoder), never on the driver. Repartition upstream
    * by media_id if payload sizes are skewed. */
  def extractFeatures(ds: Dataset[Media]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // a full codec would init its context here, reused across the partition
      it.map(Codec.decode)
    }
  }

  /** Frame sampling plan for media with frames: every `stride`-th frame
    * index, as an exploded (media_id, frame_idx) table — the shape a real
    * frame extractor consumes. Pure column expressions; zero-frame rows
    * (undecodable payloads) produce no frames. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("modality") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))

  /** Exact payload dedup over a media table — [[graft.operators.Dedup
    * .exactGroups]] keyed on the BINARY column (one grouping contract,
    * not a copy): identical byte payloads (the same image re-crawled
    * under new ids — the bulk of media duplication) collapse to one group
    * with the min id as keeper. Returns
    * (content_hash, keep_id, n_dups, n_bytes); NULL payloads drop
    * (nothing to hash). Scale shape: one groupBy shuffling 16-byte hashes
    * — the payload bytes never cross the wire. For the re-encoded /
    * re-wrapped / trimmed copies an exact hash provably misses, pair with
    * [[mediaNearDup]] (CTPH locality-sensitive byte signatures). */
  def mediaDedup(df: DataFrame, idCol: String, binCol: String): DataFrame =
    graft.operators.Dedup.exactGroups(df, idCol, binCol,
      extraAggs = Seq(min(length(col(binCol))).cast("long").as("n_bytes")),
      dropNull = true)

  /** Context-triggered piecewise hashing (CTPH — the public ssdeep/
    * spamsum construction, Kornblum DFRWS'06, reimplemented): a 7-byte
    * rolling hash walks the payload; whenever it hits a trigger value
    * (`roll % blockSize == blockSize − 1`) the bytes since the previous
    * trigger form a PIECE, and the piece's FNV-1a hash contributes one
    * base64 character to the signature. Trigger positions depend only on
    * the LOCAL 7-byte context, so two payloads sharing a long byte run
    * produce the same piece boundaries and the same signature characters
    * for that run regardless of what surrounds it — which is exactly what
    * a whole-payload digest (md5) cannot give: a re-encoded, re-wrapped,
    * or trimmed copy shares most signature characters while its md5
    * shares nothing. Fixed `blockSize` (ssdeep adapts it per file and
    * compares only equal-block-size signatures; a corpus operator needs
    * corpus-comparable signatures, so the caller picks the size class —
    * bucket payloads by magnitude and run per bucket at scale).
    * Empty/NULL payloads signature to the empty string. */
  object Ctph {
    private val Alphabet =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

    /** ssdeep's rolling window hash: three mixers over the last 7 bytes
      * (sum, position-weighted sum, shift-xor), summed. Pure function of
      * the window, which is the locality property everything rests on. */
    private final class Roll {
      private val win = new Array[Int](7)
      private var h1, h2, h3 = 0
      private var n = 0
      def update(b: Int): Int = {
        h2 -= h1
        h2 += 7 * b
        h1 += b
        h1 -= win(n % 7)
        win(n % 7) = b
        n += 1
        h3 = (h3 << 5) ^ b
        h1 + h2 + h3
      }
    }

    /** The ONE content-defined chunking walk both emitters share —
      * [[signature]] and [[pieces]] differ only in what they keep of each
      * piece hash, so the boundary rule (rolling hash, blockSize trigger,
      * tail flush) CANNOT desynchronize between the candidate stage and
      * the verify stage; `emit` receives the full 32-bit FNV-1a of every
      * piece. */
    private def walk(bytes: Array[Byte], blockSize: Int)
        (emit: Int => Unit): Unit = {
      require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
      if (bytes == null) return
      val roll = new Roll
      var piece = 0x811c9dc5 // FNV-1a 32-bit offset basis
      var inPiece = false
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        piece = (piece ^ b) * 0x01000193
        inPiece = true
        val r = roll.update(b)
        if (java.lang.Integer.remainderUnsigned(r, blockSize) == blockSize - 1) {
          emit(piece)
          piece = 0x811c9dc5
          inPiece = false
        }
        i += 1
      }
      if (inPiece) emit(piece)
    }

    def signature(bytes: Array[Byte], blockSize: Int): String = {
      val sb = new java.lang.StringBuilder
      walk(bytes, blockSize)(p => sb.append(Alphabet.charAt(p & 63)))
      sb.toString
    }

    /** The FULL 32-bit FNV-1a hash of every content-defined piece — the
      * exact-verify companion to [[signature]]: identical boundary rule
      * by construction (the shared [[walk]]), but each piece keeps all
      * 32 bits instead of the signature's 6-bit base64 alias, so a
      * shared piece here means the underlying byte runs hashed equal,
      * not that two runs collided in a 64-symbol alphabet. Returned
      * unsigned-widened to Long. Empty/NULL payloads yield no pieces. */
    def pieces(bytes: Array[Byte], blockSize: Int): Array[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      walk(bytes, blockSize)(p => out += java.lang.Integer.toUnsignedLong(p))
      out.toArray
    }
  }

  /** CTPH signature column (sketch-wrapper UDF — the Bloom/CMS precedent:
    * no built-in equivalent, and the per-row cost is the linear byte walk
    * itself, not the UDF bridge). */
  def ctphSignature(binCol: org.apache.spark.sql.Column, blockSize: Int): org.apache.spark.sql.Column = {
    val f = udf((b: Array[Byte]) => Ctph.signature(b, blockSize))
    f(binCol)
  }

  /** Fuzzy media near-duplicate candidates — the locality-sensitive
    * byte-signature pairing [[mediaDedup]] (exact md5) cannot do: a
    * re-encoded / re-wrapped / trimmed payload keeps most of its CTPH
    * signature, so payloads sharing ≥ `minShared` distinct `gramLen`-char
    * signature substrings pair as (a_id, b_id, n_shared), a_id < b_id.
    * Payloads whose signature is shorter than `gramLen` (tiny or NULL
    * payloads) cannot pair — too little structure to match fuzzily;
    * [[mediaDedup]] still catches their exact copies.
    *
    * Built BY COMPOSITION on the winnowing pair stage: the signature is a
    * string, and "share ≥ m distinct k-grams of a string" is exactly
    * [[graft.operators.Dedup.substringDupPairs]] with w = 1 (every gram
    * selected) — so this inherits the single-shuffle capped-aggregate
    * pair plan, the `maxGramDf` fan-out cap (signature grams shared by
    * more than that many payloads are boilerplate — e.g. runs of zero
    * bytes — and only lower n_shared when dropped), and the exact-integer
    * oracle discipline. Scale shape: signatures are computed map-side in
    * one linear pass per payload (bytes never shuffle; the ~64-char
    * signature does), then one exchange pairs them. Survivor pairs can be
    * exact-verified downstream by joining payloads on the candidate frame
    * (the [[graft.operators.Dedup.substringExtentFromPairs]] shape). */
  def mediaNearDup(
      df: DataFrame, idCol: String, binCol: String,
      blockSize: Int = 8, gramLen: Int = 7, minShared: Int = 2,
      maxGramDf: Int = 20): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    // FENCE the signature column (graft.plans.EvalOnce): the winnowing
    // stage's length filter would otherwise be pushed down with the CTPH
    // expression substituted — the whole-payload rolling hash evaluated
    // twice (the corpus-pipeline lesson). Deliberately NOT fanned: the
    // signature is a payload→small-string REDUCTION, so computing it in
    // the scan task keeps the heavy bytes off the network (guide §8 —
    // measured: fanning shipped the blobs through the exchange and made
    // the key slower).
    val sigs = df.select(col(idCol),
      graft.plans.EvalOnce.once(
        ctphSignature(col(binCol), blockSize)).as("__sig"))
    graft.operators.Dedup.substringDupPairs(sigs, idCol, "__sig",
      k = gramLen, w = 1, minShared = minShared, maxFingerprintDf = maxGramDf)
  }

  /** Build-once CTPH signature-gram index over a stored media corpus —
    * the [[graft.operators.Dedup.capFingerprintIndex]] contract for the
    * media family: signatures are computed map-side in one pass over the
    * payloads, exploded to distinct (id, gram-hash) rows, and df-capped at
    * BUILD time (grams present in more than `maxGramDf` payloads are
    * boilerplate — zero-byte runs, shared container padding — and would
    * fan the candidate join). Materialize this once and query many via
    * [[mediaNearDupAgainst]]; arriving batches never re-hash the corpus. */
  def mediaSignatureIndex(
      df: DataFrame, idCol: String, binCol: String,
      blockSize: Int = 8, gramLen: Int = 7, maxGramDf: Int = 20): DataFrame = {
    // fence (not fan): the mediaNearDup rationale
    val sigs = df.select(col(idCol),
      graft.plans.EvalOnce.once(
        ctphSignature(col(binCol), blockSize)).as("__sig"))
    graft.operators.Dedup.capFingerprintIndex(
      graft.operators.Dedup.winnowFingerprints(sigs, idCol, "__sig",
        k = gramLen, w = 1),
      maxGramDf)
  }

  /** Incremental [[mediaNearDup]]: fuzzy near-dup candidates of a NEW
    * media batch against a STORED signature-gram index
    * ([[mediaSignatureIndex]]) — (new_id, corpus_id, n_shared). The batch
    * is signed map-side and the candidate join is hash-keyed against the
    * capped index ([[graft.operators.Dedup.substringDupPairsAgainst]]
    * with the signature as the text and w = 1); the stored corpus is
    * never re-signed or re-scanned. Build/sign parameters must match the
    * index's (`blockSize`, `gramLen`) or candidates are silently empty —
    * the signature spaces don't intersect. */
  def mediaNearDupAgainst(
      batch: DataFrame, cappedIndex: DataFrame, idCol: String, binCol: String,
      blockSize: Int = 8, gramLen: Int = 7, minShared: Int = 2): DataFrame = {
    // fence (not fan): the mediaNearDup rationale (batch side)
    val sigs = batch.select(col(idCol),
      graft.plans.EvalOnce.once(
        ctphSignature(col(binCol), blockSize)).as("__sig"))
    graft.operators.Dedup.substringDupPairsAgainst(sigs, cappedIndex,
      idCol, "__sig", k = gramLen, w = 1, minShared = minShared)
  }

  /** Exact-verify payoff stage for [[mediaNearDup]] /
    * [[mediaNearDupAgainst]] candidates: join the PAYLOADS back over the
    * candidate pair frame and emit a verified similarity — the
    * distinct-piece overlap under the full 32-bit content-defined
    * chunking ([[Ctph.pieces]]: same boundaries the signature used, but
    * no 64-symbol aliasing, so a shared piece certifies equal-hashing
    * byte runs). Emits (a_id, b_id, n_pieces_a, n_pieces_b,
    * n_shared_pieces, overlap_ratio) where overlap_ratio =
    * shared / min(|a|, |b|) over DISTINCT pieces (containment-style:
    * a payload fully embedded in a larger one verifies at ~1.0), NULL
    * when either side has no piece (empty/NULL payload — nothing to
    * certify). A candidate that matched on signature grams but shares
    * few full-hash pieces was an alias coincidence and scores low —
    * that's the verification.
    *
    * Scale shape: the byte walk runs ONCE per payload that actually
    * appears in a pair (left-semi cut on the union of pair ids before
    * the UDF — the corpus's untouched payloads are never re-read), the
    * pair frame then hash-joins the bounded piece arrays twice; payload
    * bytes never shuffle, piece arrays (|payload|/blockSize entries —
    * the caller's blockSize picks the sketch size) do. One division per
    * pair, round-4. */
  def mediaNearDupVerify(
      df: DataFrame, idCol: String, binCol: String, pairs: DataFrame,
      blockSize: Int = 8): DataFrame = {
    require(Seq("a_id", "b_id").forall(pairs.columns.contains),
      s"pairs must carry (a_id, b_id); got (${pairs.columns.mkString(", ")})")
    val piecesUdf = udf((b: Array[Byte]) => Ctph.pieces(b, blockSize))
    val ids = pairs.select(col("a_id").as(idCol))
      .unionByName(pairs.select(col("b_id").as(idCol))).distinct()
    // semi-cut first, then fan the single-split payload scan before the
    // per-payload CTPH piece kernel (exact bytes — layout-independent)
    val pieces = graft.engine.Fan.out(df.join(ids, Seq(idCol), "left_semi"))
      .select(col(idCol),
        array_distinct(piecesUdf(col(binCol))).as("__pieces"))
    pairs.select(col("a_id"), col("b_id"))
      .join(pieces.select(col(idCol).as("a_id"), col("__pieces").as("__pa")),
        Seq("a_id"))
      .join(pieces.select(col(idCol).as("b_id"), col("__pieces").as("__pb")),
        Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        size(col("__pa")).cast("long").as("n_pieces_a"),
        size(col("__pb")).cast("long").as("n_pieces_b"),
        size(array_intersect(col("__pa"), col("__pb"))).cast("long")
          .as("n_shared_pieces"))
      .withColumn("overlap_ratio",
        when(least(col("n_pieces_a"), col("n_pieces_b")) > 0,
          round(col("n_shared_pieces").cast("double") /
            least(col("n_pieces_a"), col("n_pieces_b")).cast("double"), 4)))
  }

  /** Build a Media dataset from any table with an id and a string payload —
    * used by tests and the fixture-backed verification query (text bytes
    * stand in for image bytes; the plumbing is identical). */
  def fromText(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      modality: String = "image"): Dataset[Media] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), lit(modality), col(textCol).cast("binary"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, m, b) => Media(id, m, b) }
  }
}
