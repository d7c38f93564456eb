package graft

import graft.ingest.Sources
import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Multimodal plumbing + structured-log source formats. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("extractMeta: deterministic, length-faithful, stubbed dims in range") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "hello world".getBytes(StandardCharsets.UTF_8)),
      Multimodal.MediaRecord(2L, Array[Byte](0, 1, 2, 3, 4)))
      .toDS()
    val out1 = Multimodal.extractMeta(recs).collect().sortBy(_.doc_id)
    val out2 = Multimodal.extractMeta(recs).collect().sortBy(_.doc_id)
    assert(out1.toSeq == out2.toSeq) // deterministic stub
    assert(out1(0).byte_len == 11L && out1(1).byte_len == 5L)
    out1.foreach { m =>
      assert(m.width >= 64 && m.height >= 64)
      assert(Set("png", "jpeg", "webp").contains(m.format))
    }
  }

  test("media_frames: frames tile the payload, crc varies per frame") {
    val got = Multimodal.mediaFrames(spark, "/root/testdata/sf0.001")
    val first = got.filter(col("doc_id") === 0).collect()
    assert(first.nonEmpty && first.length <= 3)
    assert(first.map(_.getAs[Long]("frame_idx")).toSeq == first.indices.map(_.toLong))
    assert(first.init.forall(_.getAs[Long]("frame_len") == Multimodal.FrameBytes.toLong))
  }

  test("real image payloads decode via the JDK codec: exact dims + format") {
    import graft.ops.Multimodal
    import graft.ops.Multimodal.MediaRecord
    import spark.implicits._
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF8040)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val recs = Seq(
      MediaRecord(1L, imageBytes("png", 320, 200)),
      MediaRecord(2L, imageBytes("jpeg", 64, 48)),
      MediaRecord(3L, imageBytes("gif", 17, 5)),
      MediaRecord(4L, "not an image at all".getBytes(StandardCharsets.UTF_8)))
    val metas = Multimodal.extractMeta(recs.toDS()).collect()
      .map(m => m.doc_id -> m).toMap
    assert((metas(1L).width, metas(1L).height, metas(1L).format) === ((320, 200, "png")))
    assert((metas(2L).width, metas(2L).height, metas(2L).format) === ((64, 48, "jpeg")))
    assert((metas(3L).width, metas(3L).height, metas(3L).format) === ((17, 5, "gif")))
    // unrecognized payload falls back to the deterministic stub
    assert(Set("png", "jpeg", "webp").contains(metas(4L).format))
    assert(metas(4L).byte_len === 19L)
  }

  test("near-miss codec magic on TEXT payloads stays on the stub path — the media_meta oracle's precondition") {
    import graft.ops.Multimodal.MediaRecord
    import graft.functions.CrossHash
    // texts whose UTF-8 bytes START with real magic (GIF89a/GIF87a/BM)
    // are claimed by a JDK reader but throw on the garbage body; the
    // engine must fall back to the stub so text-fixture oracle parity
    // holds (these exact shapes ride in tools/make_hostile_fixture.py)
    val texts = Seq(
      11L -> "GIF89a d15w15x0 d15w22x1 d15w29x2",
      13L -> "GIF87a12 34 d17w17x0 d17w24x1",
      17L -> "BM d19w19x0 d19w26x1 d19w33x2")
    val recs = texts.map { case (id, t) =>
      MediaRecord(id, t.getBytes(StandardCharsets.UTF_8)) }
    val metas = Multimodal.extractMeta(recs.toDS()).collect()
      .map(m => m.doc_id -> m).toMap
    texts.foreach { case (id, t) =>
      val h = CrossHash.md5Hash60(t.getBytes(StandardCharsets.UTF_8))
      val m = metas(id)
      assert(m.width == 64 + (h % 1857L).toInt, s"doc $id took the real-codec path")
      assert(m.height == 64 + ((h >> 17) % 1017L).toInt)
      assert(m.format == Array("png", "jpeg", "webp").apply(((h >> 41) % 3L).toInt))
    }
  }

  test("a fully-VALID pure-ASCII GIF takes the REAL codec path — the documented oracle-parity hazard") {
    import graft.ops.Multimodal.MediaRecord
    // printable ASCII that is ALSO a structurally valid GIF header +
    // image descriptor: magic, LSD w="AB" h="CD", packed '0' (no
    // global color table), ',' image separator (0x2C), left/top "00",
    // image w="ab" (0x6261=25185) h="cd" (0x6463=25699), packed '0'.
    // Such bytes CAN occur inside a scraped text corpus; media_meta
    // then reports the real header dims while the stub-path oracle
    // would not — which is why the hostile fixture plants only
    // NEAR-MISS magic and this case is pinned here instead.
    val asciiGif = "GIF89a" + "AB" + "CD" + "000" + "," + "0000" + "ab" + "cd" + "0"
    assert(asciiGif.forall(c => c >= ' ' && c <= '~'))
    val metas = Multimodal.extractMeta(
      Seq(MediaRecord(1L, asciiGif.getBytes(StandardCharsets.UTF_8))).toDS())
      .collect()
    assert(metas.head.format == "gif")
    assert(metas.head.width == 0x6261 && metas.head.height == 0x6463)
  }

  test("resize: real thumbnails preserve aspect, never upscale, drop non-images") {
    import graft.ops.Multimodal
    import graft.ops.Multimodal.MediaRecord
    import spark.implicits._
    def imageBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val recs = Seq(
      MediaRecord(1L, imageBytes(320, 200)),
      MediaRecord(2L, imageBytes(16, 8)), // already small → untouched dims
      MediaRecord(3L, "definitely not an image".getBytes))
    val thumbs = Multimodal.resizeThumbnails(recs.toDS(), maxDim = 32).collect()
      .map(t => t.doc_id -> t).toMap
    assert(thumbs.keySet === Set(1L, 2L), "non-image dropped")
    assert((thumbs(1L).width, thumbs(1L).height) === ((32, 20)), "long edge 32, aspect kept")
    assert((thumbs(2L).width, thumbs(2L).height) === ((16, 8)), "no upscale")
    // the thumbnail is itself a decodable image with the claimed dims
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(thumbs(1L).thumb))
    assert((back.getWidth, back.getHeight) === ((32, 20)))
  }

  test("phash dedup: a resized copy pairs with its original; distinct images do not") {
    // low-frequency patterns survive downsampling: a horizontal ramp
    // (brighter to the right) keeps its dHash under resize, its
    // inverse flips every bit
    def rampBytes(w: Int, h: Int, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v0 = (x * 255) / math.max(1, w - 1)
        val v = if (invert) 255 - v0 else v0
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val original = rampBytes(64, 64, invert = false)
    val resizedCopy = rampBytes(48, 48, invert = false) // same scene, new size
    val distinct = rampBytes(64, 64, invert = true)
    // hash-level: copy within the banding radius, distinct far outside
    val Seq(hOrig, hCopy, hDist) = Seq(original, resizedCopy, distinct)
      .map(p => Multimodal.dHash60(p).get)
    assert(java.lang.Long.bitCount(hOrig ^ hCopy) <= 3,
      s"resized copy drifted ${java.lang.Long.bitCount(hOrig ^ hCopy)} bits")
    assert(java.lang.Long.bitCount(hOrig ^ hDist) > 3,
      s"distinct image too close: ${java.lang.Long.bitCount(hOrig ^ hDist)} bits")
    // pipeline-level over real binary payloads
    val pays = Seq((1L, original), (2L, resizedCopy), (3L, distinct))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.phashPairs(pays).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"exactly the original/resized pair must surface: $pairs")
  }

  test("byte-family media ops: non-ASCII text takes the MIRRORED skip (both engines drop the same rows), never a divergence or a crash") {
    val dir = Files.createTempDirectory("graft-media-ascii").toString
    // doc 1/3 duplicate ASCII bodies (a real frame-dup pair); doc 2
    // is mojibake (multi-byte chars: char length != byte length)
    val body = "plain ascii body words here padded out to frames " * 4
    Seq((1L, body, "a"), (2L, "naïve café body " * 10, "a"), (3L, body, "a"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    // phash pairs still surface among the ASCII docs; doc 2 is inert
    val pairs = Multimodal.mediaPhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), s"ASCII dup pair survives the skip: $pairs")
    // frames: doc 2 contributes NO rows (skipped, not sliced wrong)
    val frameDocs = Multimodal.mediaFrames(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(frameDocs == Set(1L, 3L), s"non-ASCII doc must not emit frames: $frameDocs")
    // keyframes and audio dedup run without raising
    assert(Multimodal.mediaKeyframes(spark, dir).collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    Multimodal.mediaAudioDedup(spark, dir).collect()
    // the ALIGNMENT family has no bridge: the payload decodes back to
    // the exact string, so the non-ASCII doc still audits (totality)
    val align = Multimodal.mediaTextAlign(spark, dir).collect()
      .map(r => r.getLong(0)).toSet
    assert(align == Set(1L, 2L, 3L), s"alignment stays TOTAL: $align")
  }

  test("jsonl and csv log sources: schema-first read with pruning") {
    val root = Files.createTempDirectory("graft-logs")
    Files.createDirectories(root.resolve("node_modules"))
    Files.write(root.resolve("a.jsonl"),
      "{\"level\":\"ERROR\",\"msg\":\"boom\"}\n{\"level\":\"INFO\",\"msg\":\"ok\"}\n"
        .getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("node_modules/skip.jsonl"),
      "{\"level\":\"X\",\"msg\":\"pruned\"}\n".getBytes(StandardCharsets.UTF_8))
    val jschema = StructType(Seq(
      StructField("level", StringType), StructField("msg", StringType)))
    val j = Sources.readJsonLines(spark, root.toString, jschema)
    assert(j.count() == 2)
    assert(j.filter(col("level") === "ERROR").count() == 1)

    val croot = Files.createTempDirectory("graft-csv")
    Files.write(croot.resolve("b.csv"),
      "ts,code\n2024-01-01,200\n2024-01-02,500\n".getBytes(StandardCharsets.UTF_8))
    val cschema = StructType(Seq(
      StructField("ts", StringType), StructField("code", IntegerType)))
    val c = Sources.readCsvLogs(spark, croot.toString, cschema)
    assert(c.count() == 2)
    assert(c.agg(sum(col("code"))).head.getLong(0) == 700L)
  }

  test("xml log source: rowTag elements with schema, pruning applies") {
    val root = Files.createTempDirectory("graft-xml")
    Files.createDirectories(root.resolve(".git"))
    Files.write(root.resolve("audit.xml"),
      ("<log><event><user>alice</user><code>200</code></event>" +
        "<event><user>bob</user><code>500</code></event></log>")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve(".git/skip.xml"),
      "<log><event><user>x</user><code>1</code></event></log>"
        .getBytes(StandardCharsets.UTF_8))
    val xschema = StructType(Seq(
      StructField("user", StringType), StructField("code", IntegerType)))
    val x = Sources.readXmlLogs(spark, root.toString, "event", xschema)
    assert(x.count() == 2, "pruned dir must not contribute rows")
    assert(x.filter(col("code") === 500).select("user").head.getString(0) == "bob")
  }

  test("media_dedup: planted shared-prefix payloads pair up; disjoint ones do not") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = Files.createTempDirectory("graft-mediadedup").toString
    // two DISTINCT shared frames (identical frames collapse to one fp)
    val shared = "x" * Multimodal.FrameBytes + "y" * Multimodal.FrameBytes
    val rows = Seq(
      Row(0L, shared + "tailA"),
      Row(1L, shared + "completely different tail content here"),
      Row(2L, "z" * (Multimodal.FrameBytes * 3)))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.mediaDedup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.keySet == Set((0L, 1L)), s"only the shared-prefix pair: $got")
    // both share the two full 'x' frames; doc 2's 'z' frames pair with nobody
    assert(got((0L, 1L)) == 2L, s"shared frame count: $got")
  }

  test("media_audio_dedup: per-frame jitter defeats exact frame dedup but not the energy signature") {
    import spark.implicits._
    // A: strong alternating band energies (4x'z' then 4x'a', gap >= 100
    // per band) over 300 bytes. B: A with ONE byte nudged by one code
    // point in EVERY 64-byte frame (positions 10, 74, 138, 202, 266)
    // — every exact frame fingerprint differs, but each band energy
    // moves by 1 against a 100-point gap, so the comparison bits are
    // untouched. C: the inverse pattern (far Hamming).
    val a = (0 until 300).map(i => if ((i / 4) % 2 == 0) 'z' else 'a').toArray
    val b = a.clone()
    Seq(10, 74, 138, 202, 266).foreach(i => b(i) = (b(i) - 1).toChar)
    val c = (0 until 300).map(i => if ((i / 4) % 2 == 0) 'a' else 'z').toArray
    val dir = Files.createTempDirectory("graft-audio").toString
    Seq((0L, new String(a)), (1L, new String(b)), (2L, new String(c)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val audio = Multimodal.mediaAudioDedup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(audio.keySet == Set((0L, 1L)), s"only the jittered copy pairs: $audio")
    assert(audio((0L, 1L)) == 0L, s"comparison bits must survive the jitter: $audio")
    // the exact-frame detector sees nothing: every frame of B differs
    val exact = Multimodal.mediaDedup(spark, dir).collect()
    assert(exact.isEmpty, s"exact frame dedup must be blind to per-frame jitter: ${exact.toSeq}")
  }

  test("media_keyframes: jittered repeats stay in-scene; a content cut opens a keyframe") {
    import spark.implicits._
    // four 64-byte frames: ascending gradient, two jittered copies of
    // it (one byte bumped — ≤ 2 signature bits move), then a full
    // reversal (every comparison flips — Hamming 59 > τ)
    val up = (0 until 64).map(i => (48 + i).toChar).mkString
    def jitter(at: Int) = up.updated(at, (up(at) + 1).toChar)
    val down = up.reverse
    val dir2 = java.nio.file.Files.createTempDirectory("graft-keyframe").toString
    Seq((0L, up + jitter(20) + jitter(45) + down))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val got = Multimodal.mediaKeyframes(spark, dir2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.length == 4, s"four frames: ${got.toSeq}")
    assert(got(0) == ((0L, 60L, 1)), s"a first frame always opens a scene: ${got.toSeq}")
    Seq(got(1), got(2)).foreach { case (_, ham, kf) =>
      assert(ham <= 2L && kf == 0,
        s"one-byte jitter must stay inside the scene: ${got.toSeq}")
    }
    assert(got(3)._2 > Multimodal.KeyframeTau && got(3)._3 == 1,
      s"the reversal is a content cut: ${got.toSeq}")
  }

  test("media_text_align: a swapped caption flags where BOTH per-modality dedups are blind") {
    import spark.implicits._
    // four docs with disjoint vocabularies; doc 3 (the % 11 = 3
    // pairing rule) gets doc 4's caption — a wrong-caption pair whose
    // image is pristine and whose caption is pristine, so neither
    // image dedup nor text dedup can catch it
    val physics = ("quark boson lepton hadron gluon photon meson " +
      "quark boson lepton hadron gluon photon meson quark boson lepton")
    val baking = ("butter flour sugar yeast dough oven whisk " +
      "butter flour sugar yeast dough oven whisk butter flour sugar")
    val garden = ("tulip orchid fern moss petal stem root " +
      "tulip orchid fern moss petal stem root tulip orchid fern")
    val sailing = ("mast rudder keel jib anchor bow stern " +
      "mast rudder keel jib anchor bow stern mast rudder keel")
    val dir = java.nio.file.Files.createTempDirectory("graft-mta").toString
    Seq((1L, physics), (2L, baking), (3L, garden), (4L, sailing))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.mediaTextAlign(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
    // aligned pairs keep (caption is a prefix of the doc itself)
    Seq(1L, 2L, 4L).foreach { id =>
      val (cid, a, keep) = got(id)
      assert(cid == id && keep == 1 && a >= Multimodal.MediaAlignTau,
        s"aligned pair $id must keep: ${got(id)}")
    }
    // the swapped pair (garden media, sailing caption) must drop
    val (cid3, a3, keep3) = got(3L)
    assert(cid3 == 4L && keep3 == 0 && a3 < Multimodal.MediaAlignTau,
      s"swapped-caption pair must flag: ${got(3L)}")
    // the blindness claim, asserted not assumed: per-modality dedup
    // sees NOTHING here — all payloads distinct, all texts distinct
    assert(Multimodal.mediaPhashDedup(spark, dir).collect().isEmpty,
      "image-side dedup must be blind to a caption swap")
    assert(graft.ops.Dedup.dedupExact(spark, dir).count() == 4L,
      "text-side exact dedup must be blind to a caption swap")
  }

  test("media_text_align: a media whose paired caption doc is missing flags keep=0, never vanishes") {
    import spark.implicits._
    // largest doc_id ≡ 3 (mod 11): the pairing rule maps it past the
    // id space — the audit must still emit the row
    val dir = java.nio.file.Files.createTempDirectory("graft-mta-total").toString
    Seq((1L, ("alpha beta gamma delta " * 4).trim),
        (3L, ("omega sigma theta kappa " * 4).trim))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.mediaTextAlign(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3)))
      .toMap
    assert(got.keySet == Set(1L, 3L), s"every media must surface: $got")
    assert(got(3L) == ((4L, None, 0)),
      s"missing caption doc => unscored keep=0 row, not a silent drop: $got")
    assert(got(1L)._3 == 1, s"the aligned pair still keeps: $got")
  }

  test("alignPairs: scores an ARBITRARY pairs relation, total over every degenerate shape") {
    import spark.implicits._
    // the operator proper takes any (media_id, payload, caption_id,
    // caption) relation — no fixture pairing rule involved
    val story = "falcon talon feather wing glide soar nest prey hover dive"
    val other = "piston valve crank shaft torque bore stroke cam rod gear"
    val pairs = Seq[(Long, Option[Array[Byte]], Option[Long], Option[String])](
      // aligned: caption IS the decoded payload's prefix
      (10L, Some(story.getBytes("UTF-8")), Some(20L),
        Some("falcon talon feather wing")),
      // misaligned: unrelated caption
      (11L, Some(story.getBytes("UTF-8")), Some(21L), Some(other)),
      // missing caption (harvest failed): audits keep=0, NULL score
      (12L, Some(story.getBytes("UTF-8")), Some(22L), None),
      // missing payload (asset fetch failed): same contract
      (13L, None, Some(23L), Some(story)),
      // zero-norm media (whitespace-only payload): keep=0 NULL align,
      // mirroring the missing-caption convention — never vanishes
      (14L, Some("   ".getBytes("UTF-8")), Some(24L), Some(story)),
      // zero-norm caption
      (15L, Some(story.getBytes("UTF-8")), Some(25L), Some(" ")))
      .toDF("media_id", "payload", "caption_id", "caption")
    val got = Multimodal.alignPairs(pairs).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3))).toMap
    assert(got.keySet == Set(10L, 11L, 12L, 13L, 14L, 15L),
      s"every input pair must emit exactly one audited row: $got")
    assert(got(10L)._2 == 1 && got(10L)._1.exists(_ >= Multimodal.MediaAlignTau),
      s"aligned pair keeps: ${got(10L)}")
    assert(got(11L)._2 == 0 && got(11L)._1.exists(_ < Multimodal.MediaAlignTau),
      s"misaligned pair drops WITH a score: ${got(11L)}")
    Seq(12L, 13L, 14L, 15L).foreach { id =>
      assert(got(id) == ((None, 0)),
        s"unscorable pair $id must audit as keep=0/NULL, not vanish: ${got(id)}")
    }
  }

  test("media_align_report: the source whose captions are swapped craters its keep-rate") {
    import spark.implicits._
    val tech = "circuit diode resistor anode cathode wafer " * 4
    val food = "noodle broth garlic ginger scallion sesame " * 4
    val dir = java.nio.file.Files.createTempDirectory("graft-mar").toString
    // src_b's media (doc 3) carries doc 4's caption via the % 11 = 3
    // rule; src_a's pairs are all aligned
    Seq((1L, tech.trim, "src_a"), (2L, food.trim, "src_a"),
        (3L, tech.trim + " extra word tail", "src_b"),
        (4L, food.trim + " other tail words", "src_b"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.mediaAlignReport(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("src_a") == ((2L, 2L, 1.0)), s"aligned source keeps everything: $got")
    val (nb, kb, rb) = got("src_b")
    assert(nb == 2L && kb == 1L && rb == 0.5,
      s"the swapped pair must halve src_b's keep-rate: $got")
  }
}
