package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar building blocks re-expressing the reference's expression surface
  * with codegen'd Spark builtins — no UDFs anywhere (SURVEY.md §7.2).
  */
object Masking {
  /** Email masking with the exact semantics of the reference policy
    * (reference sql/05_masking_policy.sql:10-16):
    * NULL -> NULL; no '@' -> '***'; else first char + "***" + from-'@'.
    * e.g. alice@ex.com -> a***@ex.com
    */
  def maskEmail(v: Column): Column =
    when(v.isNull, lit(null).cast("string"))
      .when(instr(v, "@") === 0, lit("***"))
      .otherwise(concat(substring(v, 1, 1), lit("***"),
        v.substr(instr(v, "@"), length(v))))

  /** Privileged roles that bypass masking
    * (reference sql/05_masking_policy.sql:12).
    */
  val PrivilegedRoles: Set[String] =
    Set("ACCOUNTADMIN", "R_TRANSFORM", "R_INGEST")
}

object SyntheticEmail {
  /** Deterministic synthetic email, exact parity with the reference
    * (reference ingestion/utils.py:8-11):
    * "user_" + sha1(utf8(name or "unknown")).hexdigest()[:10] + "@" + domain.
    * Spark's `sha1` is the same hex digest as Python hashlib — builtin only.
    */
  def syntheticEmail(name: Column, domain: String = "example.com"): Column =
    concat(lit("user_"),
      substring(sha1(coalesce(name, lit("unknown")).cast("string")), 1, 10),
      lit("@" + domain))
}

object VectorOps {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Element-wise ops over ArrayType(Double) columns. The hot kernel is a
    * custom codegen'd Catalyst expression ([[DotProduct]]); the HOF
    * formulation it replaced is kept as `dotHof` for the parity spec.
    */
  def toDoubleArray(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via the codegen'd [[DotProduct]] kernel. NULL input,
    * length mismatch, or a NULL element degrade a malformed vector to a
    * NULL similarity instead of failing the job (the zip_with padding
    * semantics, now enforced natively). The casts pin the kernel's
    * ARRAY<DOUBLE> input contract; on already-double inputs they are
    * optimized away.
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** The interpreted higher-order-function twin of [[dot]] — ~1000× slower
    * per pair (judge r3 measurement); retained ONLY as the independent
    * oracle for VectorKernelSpec. The index-sequence formulation
    * (aggregate over sequence(1, size) with element_at) is NOT safe here:
    * sequence(1, 0) on an empty array yields the DESCENDING [1, 0] and
    * element_at(_, 0) throws, and ANSI element_at throws on any length
    * mismatch — whereas zip_with pads with nulls.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** In-bucket near-dup pair enumeration via the [[BucketDupPairs]]
    * kernel over `array<struct<vec_id bigint, v array<double>, nrm
    * double>>` — one native i<j loop per bucket replacing the dense-
    * regime HOF projection (PairKernelSpec pins set equality against
    * the retained `Dedup.denseHofPairs` twin).
    */
  def bucketDupPairs(ms: Column, threshold: Double): Column =
    ColumnBridge.column(BucketDupPairs(
      ColumnBridge.expression(ms),
      ColumnBridge.expression(lit(threshold))))

  /** Random-hyperplane LSH signature ('0'/'1' chars, one per plane) via
    * the codegen'd [[LshBits]] kernel — bit-for-bit the HOF formulation
    * it replaced (see LshKernelSpec), ~100× cheaper per row.
    */
  def lshBits(v: Column, planes: Int): Column =
    ColumnBridge.column(LshBits(
      ColumnBridge.expression(v.cast("array<double>")), planes))

  /** The interpreted HOF twin of [[lshBits]] — retained ONLY as the
    * independent oracle for LshKernelSpec (it is the exact expression
    * bandAssignments shipped through round 6). Returns array<string>
    * of single bits; the spec concatenates for comparison.
    */
  def lshBitsHof(v: Column, planes: Int): Column =
    transform(sequence(lit(0), lit(planes - 1)), p => {
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => when(pmod(hash(p, i), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    })

  /** Cosine similarity; matches DuckDB list_cosine_similarity shape
    * dot/(|a|*|b|).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Symmetric per-vector int8 quantization: the max-|x| lane maps to
    * ±127. Cosine is scale-invariant, so the per-vector scale cancels and
    * quantized cosine needs NO dequantization — only the int8 vectors and
    * their integer self-norms are kept (8× less memory than doubles). A
    * zero vector quantizes to zeros; its quantized cosine is NULL via
    * zero division, same as the double path.
    */
  def quantizeI8(v: Column): Column = {
    val maxabs = array_max(transform(v, x => abs(x.cast("double"))))
    transform(v, x =>
      when(maxabs === 0.0, lit(0))
        .otherwise(round(x.cast("double") * 127.0 / maxabs)).cast("byte"))
  }

  /** Integer dot product via the codegen'd [[DotProductI8]] kernel; same
    * NULL contract as [[dot]].
    */
  def dotI8(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductI8(
      ColumnBridge.expression(a.cast("array<tinyint>")),
      ColumnBridge.expression(b.cast("array<tinyint>"))))

  /** PQ asymmetric-distance accumulation via the codegen'd [[PqAdc]]
    * kernel: m flat-LUT loads addressed by the packed codeword long.
    */
  def pqAdc(lut: Column, packed: Column, m: Int, ks: Int): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(lut.cast("array<double>")),
      ColumnBridge.expression(packed.cast("long")), m, ks))

  /** The interpreted HOF twin of [[pqAdc]] — retained ONLY as the
    * independent oracle for VectorKernelSpec (it is the exact expression
    * q73's ADC stage shipped before kernelization; 6.9 s vs sub-second
    * for the sf0.001 sweep). element_at over ARRAY is 1-based.
    */
  def pqAdcHof(lut: Column, packed: Column, m: Int, ks: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
      acc + element_at(lut,
        (s * ks + pmod(floor(packed / pow(lit(ks.toDouble), s)), lit(ks)))
          .cast("int") + 1))
}

object ImageOps {
  import org.apache.spark.sql.graft.ColumnBridge

  /** JPEG frame dimensions as `(width << 32) | height` via the codegen'd
    * marker-segment scan ([[JpegDims]]); NULL when the payload is not a
    * JPEG or carries no SOF segment. Callers split the packed long with
    * codegen'd bit ops (shiftright / bitwiseAND).
    */
  def jpegDims(bin: Column): Column =
    ColumnBridge.column(JpegDims(ColumnBridge.expression(bin.cast("binary"))))

  /** MP4 video-track dimensions as `(width << 32) | height` via the
    * codegen'd ISO-BMFF box walk ([[Mp4Dims]]); NULL when no video `tkhd`
    * is found. Same packed-long contract as [[jpegDims]].
    */
  def mp4Dims(bin: Column): Column =
    ColumnBridge.column(Mp4Dims(ColumnBridge.expression(bin.cast("binary"))))

  /** BMP pixel-luma statistics as `(sumLuma << 16) | (maxLuma << 8) |
    * minLuma` via the codegen'd pixel-array walk ([[BmpLuma]]) — the
    * multimodal family's first PIXEL-level decode (uncompressed BI_RGB
    * 24/32bpp; no codec needed). NULL when the payload is not such a BMP
    * or its pixel array is truncated. Callers split the packed long with
    * codegen'd bit ops; pixel count comes from the header dims.
    */
  def bmpLuma(bin: Column): Column =
    ColumnBridge.column(BmpLuma(ColumnBridge.expression(bin.cast("binary"))))

  /** EXECUTED aspect-preserving resize of a BI_RGB BMP to `maxEdge`
    * ([[BmpResize]] — nearest-neighbor, never upscales, normalizes to
    * 24bpp bottom-up; the runtime twin of the `resizeDims` planner).
    * Output is itself a decodable BMP; NULL on undecodable input.
    */
  def bmpResize(bin: Column, maxEdge: Column): Column =
    ColumnBridge.column(BmpResize(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(maxEdge.cast("int"))))

  /** 64-bit perceptual average-hash of a BI_RGB BMP ([[BmpAHash]]) —
    * orientation-normalized image-space sampling, so the same picture in
    * bottom-up and top-down containers hashes identically. NULL on
    * undecodable input.
    */
  def bmpAHash(bin: Column): Column =
    ColumnBridge.column(BmpAHash(ColumnBridge.expression(bin.cast("binary"))))
}

object AudioOps {
  import org.apache.spark.sql.graft.ColumnBridge

  /** WAV PCM parameters as `(rate << 32) | (channels << 16) | bits` via
    * the codegen'd RIFF chunk walk ([[WavFmt]]) — reaches a `fmt ` chunk
    * behind LIST/JUNK prefixes, which fixed offsets cannot. NULL when the
    * payload is not RIFF/WAVE or carries no `fmt `.
    */
  def wavFmt(bin: Column): Column =
    ColumnBridge.column(WavFmt(ColumnBridge.expression(bin.cast("binary"))))

  /** PCM sample-magnitude statistics as `(sumAbs << 17) | peakAbs` via
    * the RIFF walk + sample fold ([[WavPcmStats]]) — REAL audio decode
    * (8/16-bit PCM `data` chunks; NULL on non-PCM, other depths, or a
    * truncated chunk). Callers split the packed long with codegen'd bit
    * ops; sample count derives from the fmt/data sizes.
    */
  def wavPcmStats(bin: Column): Column =
    ColumnBridge.column(WavPcmStats(ColumnBridge.expression(bin.cast("binary"))))
}

object VideoOps {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Y4M stream metadata as `(width << 40) | (height << 20) | nFrames`
    * via the frame-sequence walk ([[Y4mMeta]]); NULL when the payload is
    * not a supported YUV4MPEG2 stream or its tail is truncated.
    */
  def y4mMeta(bin: Column): Column =
    ColumnBridge.column(Y4mMeta(ColumnBridge.expression(bin.cast("binary"))))

  /** REAL pixel statistics of one Y4M frame's luma plane —
    * `(sumLuma << 16) | (maxLuma << 8) | minLuma`, [[BmpLuma]]'s packed
    * contract for moving pictures ([[Y4mFrameLuma]]). NULL when the
    * payload is not a supported Y4M or the frame is absent/truncated.
    */
  def y4mFrameLuma(bin: Column, frameIdx: Column): Column =
    ColumnBridge.column(Y4mFrameLuma(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(frameIdx.cast("int"))))

  /** MP4 uncompressed-video sample-table metadata as
    * `(width << 40) | (height << 20) | nSamples` via the
    * `stsd`/`stsz`/`stsc`/`stco` walk ([[Mp4SampleInfo]]); NULL when no
    * supported (`'raw '` depth-8) trak exists or any declared sample
    * fails bounds/size validation — the truncated-file gate.
    */
  def mp4SampleInfo(bin: Column): Column =
    ColumnBridge.column(Mp4SampleInfo(ColumnBridge.expression(bin.cast("binary"))))

  /** REAL pixel statistics of one MP4 raw-gray sample —
    * `(sumLuma << 16) | (maxLuma << 8) | minLuma`, [[Y4mFrameLuma]]'s
    * packed contract resolved through the sample table
    * ([[Mp4FrameLuma]]).
    */
  def mp4FrameLuma(bin: Column, frameIdx: Column): Column =
    ColumnBridge.column(Mp4FrameLuma(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(frameIdx.cast("int"))))
}

object WarcOps {
  import org.apache.spark.sql.graft.ColumnBridge

  /** WARC stream verdict `(nValidRecords << 1) | truncated` via the
    * Content-Length-driven record walk ([[WarcMeta]]); NULL when the
    * payload has no `WARC/` magic at all.
    */
  def warcMeta(bin: Column): Column =
    ColumnBridge.column(WarcMeta(ColumnBridge.expression(bin.cast("binary"))))

  /** Valid-record byte offsets from ONE linear walk ([[WarcOffsets]]),
    * with the `(nRecords << 1) | truncated` verdict as the LAST element —
    * the iteration table: slice off the trailer, explode, and hand each
    * offset to the accessors below, so per-stream parsing (verdict
    * included) stays one O(bytes) pass.
    */
  def warcOffsets(bin: Column): Column =
    ColumnBridge.column(WarcOffsets(ColumnBridge.expression(bin.cast("binary"))))

  /** Header field of the record at byte offset `off`: code 0 =
    * WARC-Type, 1 = WARC-Target-URI, 2 = WARC-Record-ID ([[WarcHeader]]).
    */
  def warcHeader(bin: Column, off: Column, code: Int): Column =
    ColumnBridge.column(WarcHeader(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(off.cast("int")), code))

  /** The exact Content-Length payload at byte offset `off` ([[WarcPayload]]). */
  def warcPayload(bin: Column, off: Column): Column =
    ColumnBridge.column(WarcPayload(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(off.cast("int"))))
}

object TextOps {
  /** Lower-cased alphanumeric word tokens (empty strings filtered). */
  def words(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => w =!= "")

  /** Unicode NFC canonical composition ([[NfcNormalize]] — codegen'd,
    * identity-fast on already-normalized/ASCII rows).
    */
  def nfc(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NfcNormalize(
      ColumnBridge.expression(text.cast("string"))))
  }

  /** Whitespace-normalized md5 content fingerprint — q30's exact-dup key,
    * shared with the streaming landing's opt-in content dedup so the two
    * notions of "same document" cannot drift.
    */
  def contentFingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Count of non-overlapping occurrences of literal `pat` in `s` via the
    * length-difference trick — identical semantics in any SQL engine, so it
    * doubles as the oracle formula.
    */
  def occurrences(s: Column, pat: String): Column =
    (length(s) - length(replace(s, lit(pat), lit("")))) / pat.length
}

/** Compression plumbing: the [[DeflateLen]] kernel behind the
  * compression-ratio quality signal.
  */
object CompressOps {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Deflated byte length (zlib level 6, raw stream) of a binary/string
    * column via the codegen'd [[DeflateLen]] kernel; NULL in, NULL out.
    */
  def deflateLen(c: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(c.cast("binary"))))
}

/** Bloom-filter sketch plumbing over Spark's own `util.sketch.BloomFilter`
  * Catalyst expressions (the pair behind runtime row-level filtering,
  * public Spark source: `BloomFilterAggregate` / `BloomFilterMightContain`).
  * Values are hashed with `xxhash64` BY THE CALLER on both the build and
  * probe sides — the aggregate folds longs, so a build/probe hash mismatch
  * is impossible to express.
  */
object SketchOps {
  import org.apache.spark.sql.graft.ColumnBridge
  import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
  import org.apache.spark.sql.types.BinaryType

  /** Distributed bloom-filter build: per-partition filters OR-merged by the
    * aggregate; the result column is ONE serialized-filter binary. Bounds
    * (`estItems`, `numBits`) are plan-time literals, checked by the
    * expression against the runtime-filter conf ceilings.
    */
  def bloomFilterAgg(hashed: Column, estItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashed), Literal(estItems), Literal(numBits))
      .toAggregateExpression())

  /** Membership probe against a driver-held serialized filter (embedded as
    * a binary literal — the scalar-subquery substitution model, shipped to
    * executors once with the task closure, never per row).
    */
  def mightContain(filter: Array[Byte], hashed: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType), ColumnBridge.expression(hashed)))
}

/** Column surface for the RFC 1952 gzip member codec ([[GzipEval]]) —
  * encode/decode/list, each a codegen'd expression over the shared
  * thread-local-native eval body.
  */
object GzipOps {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Deterministic gzip member; empty `name` omits the FNAME field. */
  def gzip(bin: Column, name: Column): Column =
    ColumnBridge.column(GzipMember(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(name.cast("string"))))

  /** Strict decode: NULL on any header/body/trailer defect. */
  def gunzip(bin: Column): Column =
    ColumnBridge.column(GunzipBytes(ColumnBridge.expression(bin.cast("binary"))))

  /** Concatenated multi-member decode — the `.warc.gz` layout. */
  def gunzipConcat(bin: Column): Column =
    ColumnBridge.column(GunzipConcatBytes(ColumnBridge.expression(bin.cast("binary"))))

  /** FNAME from the header alone (no decompression); NULL when absent. */
  def gzipName(bin: Column): Column =
    ColumnBridge.column(GzipFileName(ColumnBridge.expression(bin.cast("binary"))))
}
