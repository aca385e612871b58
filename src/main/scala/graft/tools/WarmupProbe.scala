package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{AudioOps, CompressOps, ImageOps, TextOps, VideoOps, WarcOps}

/** Cold-session kernel warmup probe (round-11 verdict item #7).
  *
  * BENCH_NOTES has repeatedly observed that SINGLE-query sessions pay a
  * first-call cost the full bench sweep amortizes (q56 0.25 s in-sweep vs
  * 0.5-0.66 s solo). This tool decomposes that cost for the custom-kernel
  * family: for each kernel it times a 1-row query's FIRST execution and an
  * immediately repeated IDENTICAL execution in a fresh JVM, in forward or
  * reversed order (`reverse` arg). Whatever the first probe pays and the
  * rest do not is SHARED infrastructure (janino/codegen framework JIT,
  * classloading) — order inversion shows it travels with position, not
  * with any kernel. With the `warm` arg, [[graft.Bootstrap.warmKernels]]
  * runs first, so the delta between warm/unwarmed runs is exactly what a
  * deployment buys by warming at session init.
  *
  * Output: one JSON line per probe `{"kernel":…,"first_ms":…,"second_ms":…}`
  * plus a `{"warm_ms":…}` line when warming ran.
  */
object WarmupProbe {
  def main(args: Array[String]): Unit = {
    val reverse = args.contains("reverse")
    val warm = args.contains("warm")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (warm) {
      val t0 = System.nanoTime()
      graft.Bootstrap.warmKernels(spark)
      println(f"""{"warm_ms":${(System.nanoTime() - t0) / 1e6}%.1f}""")
    }

    val bytes = "graft warmup probe payload".getBytes("UTF-8")
    val vec = array((0 until 8).map(i => lit(i * 0.25f)): _*)
    def probes: Seq[(String, () => DataFrame)] = Seq(
      "jpeg_dims" -> (() => spark.range(1).select(ImageOps.jpegDims(lit(bytes)))),
      "mp4_dims" -> (() => spark.range(1).select(ImageOps.mp4Dims(lit(bytes)))),
      "bmp_luma" -> (() => spark.range(1).select(ImageOps.bmpLuma(lit(bytes)))),
      "bmp_resize" -> (() => spark.range(1).select(ImageOps.bmpResize(lit(bytes), lit(8)))),
      "wav_fmt" -> (() => spark.range(1).select(AudioOps.wavFmt(lit(bytes)))),
      "wav_pcm_stats" -> (() => spark.range(1).select(AudioOps.wavPcmStats(lit(bytes)))),
      "y4m_meta" -> (() => spark.range(1).select(VideoOps.y4mMeta(lit(bytes)))),
      "y4m_frame_luma" -> (() => spark.range(1).select(VideoOps.y4mFrameLuma(lit(bytes), lit(0)))),
      "mp4_sample_info" -> (() => spark.range(1).select(VideoOps.mp4SampleInfo(lit(bytes)))),
      "mp4_frame_luma" -> (() => spark.range(1).select(VideoOps.mp4FrameLuma(lit(bytes), lit(0)))),
      "warc_meta" -> (() => spark.range(1).select(WarcOps.warcMeta(lit(bytes)))),
      "warc_offsets" -> (() => spark.range(1).select(WarcOps.warcOffsets(lit(bytes)))),
      "lsh_bits" -> (() => spark.range(1).select(graft.functions.VectorOps.lshBits(vec, 8))),
      "deflate_len" -> (() => spark.range(1).select(CompressOps.deflateLen(lit("abc")))),
      "content_fp" -> (() => spark.range(1).select(TextOps.contentFingerprint(lit("abc")))),
    )
    val order = if (reverse) probes.reverse else probes
    order.foreach { case (name, mk) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t0) / 1e6
      }
      val first = once()
      val second = once()
      println(f"""{"kernel":"$name","first_ms":$first%.1f,"second_ms":$second%.1f}""")
    }
    spark.stop()
  }
}
