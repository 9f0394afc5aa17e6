package graft.streaming

import graft.SparkTestSession
import graft.llm.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingMediaDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import StreamingMediaDedup.MediaEvent

  private var runNo = 0

  private def runStream(
      batches: Seq[Seq[MediaEvent]],
      audio: Boolean = false,
      rocks: Boolean = false,
      phash: Boolean = false): Seq[Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(): Seq[Long] = {
      val source = MemoryStream[MediaEvent]
      val stream =
        if (audio) StreamingMediaDedup.audioDedupStream(source.toDF())
        else if (phash) StreamingMediaDedup.imagePHashDedupStream(source.toDF())
        else StreamingMediaDedup.imageDedupStream(source.toDF())
      runNo += 1
      val name = s"media_dedup_out_$runNo"
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => source.addData(b); q.processAllAvailable() }
        spark.table(name).select("media_id").as[Long].collect().toSeq.sorted
      } finally q.stop()
    }
    if (rocks) StateBackends.withRocksDb(spark)(run()) else run()
  }

  private val base = 1700000000L * 1000000L
  private val sec = 1000000L

  test("a brightness-shifted re-render deduplicates across batches (perceptual key)") {
    // id 2 is id 1 uniformly brightened: DIFFERENT payload bytes, same
    // dHash — a byte-hash key would let it through
    def png(shift: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        12, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 10; x <- 0 until 12) {
        val v = math.min(10 * x + 3 * y + 7 * seed + shift, 255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(!java.util.Arrays.equals(png(0, 1), png(40, 1)), "payload bytes must differ")
    val out = runStream(Seq(
      Seq(MediaEvent(1, png(0, 1), "image/png", 12, 10, base),
          MediaEvent(4, Multimodal.syntheticPngBlocks(9, 12, 10), "image/png", 12, 10, base + sec)),
      Seq(MediaEvent(2, png(40, 1), "image/png", 12, 10, base + 2 * sec), // brightened dup of 1
          MediaEvent(5, Array[Byte](1, 2), "image/png", 2, 1, base + 3 * sec)))) // undecodable
    assert(out === Seq(1L, 4L))
  }

  test("RocksDB state backend produces the same keep-set (parity)") {
    def png(pid: Int) = Multimodal.syntheticPngBlocks(pid, 12, 10)
    val batches = Seq(
      Seq(MediaEvent(1, png(3), "image/png", 12, 10, base),
          MediaEvent(2, png(7), "image/png", 12, 10, base + sec)),
      Seq(MediaEvent(3, png(3), "image/png", 12, 10, base + 2 * sec),
          MediaEvent(4, png(11), "image/png", 12, 10, base + 3 * sec)))
    assert(runStream(batches, rocks = true) === runStream(batches))
  }

  test("a gain-doubled copy of the same clip deduplicates (perceptual, not byte, key)") {
    def wav(pid: Int, n: Int, gain: Int): Array[Byte] = {
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val m = (i.toLong * 16L) / n
        val loud = if ((m * 7L + pid) % 16L < 5L) 4000 else 0
        val v = ((((31L * i + 17L * pid) % 2001L) + loud) * gain).toInt
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val out = runStream(Seq(
      Seq(MediaEvent(1, wav(5, 200, 1), "audio/wav", 200, 1, base)),
      Seq(MediaEvent(2, wav(5, 200, 2), "audio/wav", 200, 1, base + sec), // gain x2: same envelope hash
          MediaEvent(3, wav(8, 200, 1), "audio/wav", 200, 1, base + 2 * sec))),
      audio = true)
    assert(out === Seq(1L, 3L))
  }

  test("pHash stream deduplicates a brightness-shifted copy via an IDENTICAL hash") {
    // a uniform +30 shift on a gray image (no clipping) is EXACTLY
    // pHash-invariant: the shift lands only in the unused DC
    // coefficient (the rounded basis rows sum to zero), so the stream
    // key — exact (b0..b3) equality — deduplicates the re-post
    def png(shift: Int, seed: Int, w: Int = 36, h: Int = 34): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = 20 + (7 * x + 13 * y + 11 * seed) % 120 + shift
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(!java.util.Arrays.equals(png(0, 1), png(30, 1)))
    val out = runStream(Seq(
      Seq(MediaEvent(1, png(0, 1), "image/png", 36, 34, base)),
      Seq(MediaEvent(2, png(30, 1), "image/png", 36, 34, base + sec), // brightened dup of 1
          MediaEvent(3, png(0, 2), "image/png", 36, 34, base + 2 * sec))),
      phash = true)
    assert(out === Seq(1L, 3L))
  }
}
