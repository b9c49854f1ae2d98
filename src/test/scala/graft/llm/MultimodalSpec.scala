package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash: identical payloads collide, small edits stay near, distinct differ") {
    val base = Array.tabulate[Byte](640)(i => ((i * 37 + 11) % 251).toByte)
    val same = base.clone()
    assert(Multimodal.aHash(base) === Multimodal.aHash(same))

    // one flipped byte perturbs at most a couple of grid cells
    val nearDup = base.clone()
    nearDup(300) = (nearDup(300) ^ 0x7f).toByte
    assert(hamming(Multimodal.aHash(base), Multimodal.aHash(nearDup)) <= 8)

    // structurally different payload lands far away
    val other = Array.tabulate[Byte](640)(i => ((i * i * 13 + 7) % 251).toByte)
    assert(hamming(Multimodal.aHash(base), Multimodal.aHash(other)) > 8)

    // degenerate inputs don't throw
    assert(Multimodal.aHash(Array.empty[Byte]) === 0L)
    assert(Multimodal.aHash(Array[Byte](42)) === Multimodal.aHash(Array[Byte](42)))
  }

  private def golden(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/llm/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("real image codec: golden PNG bytes decode, hash and resize to pinned values") {
    // checked-in bytes — a JDK ImageIO regression (or any change to the
    // luma-grid / fit-to-box kernels) fails these exact pins
    val a = golden("golden_24x16_seed5.png")
    val b = golden("golden_48x20_seed11.png")
    assert(Multimodal.decodeLumaGrid(a)._1 === 24)
    assert(Multimodal.decodeLumaGrid(a)._2 === 16)
    assert(Multimodal.aHashImage(a) === -3110627432037297068L)
    assert(Multimodal.aHashImage(b) === -3906369333256140343L)
    assert(Multimodal.resizeImage(a, 32) === ((24, 16, 24, 16))) // fits: untouched
    assert(Multimodal.resizeImage(b, 32) === ((48, 20, 32, 13))) // 48x20 -> 32x13
    // the synthesizer is byte-deterministic: regenerating the golden
    // seeds reproduces the checked-in files exactly
    assert(Multimodal.encodePng(24, 16, 5L).toSeq === a.toSeq)
    assert(Multimodal.encodePng(48, 20, 11L).toSeq === b.toSeq)
  }

  test("real image codec: identical rasters collide, pixel edits move the hash only slightly") {
    val base = Multimodal.encodePng(24, 16, 7L)
    assert(Multimodal.aHashImage(base) === Multimodal.aHashImage(Multimodal.encodePng(24, 16, 7L)))
    // different seed = structurally different raster, far-away hash
    val other = Multimodal.encodePng(24, 16, 8L)
    assert(Multimodal.aHashImage(base) !== Multimodal.aHashImage(other))
    // a small LOCAL pixel edit (re-encode with one corner cell biased)
    // flips at most a couple of grid bits — the perceptual property
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    img.setRGB(0, 0, 0xffffff)
    img.setRGB(1, 0, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(hamming(Multimodal.aHashImage(base), Multimodal.aHashImage(bos.toByteArray)) <= 6)
  }

  test("real audio codec: golden WAV bytes decode to pinned samples, round trip is exact") {
    // checked-in bytes — a JDK javax.sound.sampled regression (or any
    // change to the PCM16 synth/decode kernels) fails these exact pins
    val wav = golden("golden_96_seed5.wav")
    val dec = Multimodal.decodePcm16(wav)
    assert(dec.length === 96)
    assert(dec.take(8).toSeq === Seq(6, -450, -907, -1363, -1820, 1820, 1363, 907))
    // frame-0 energy (sum of squares over the first 16 samples) — the
    // exact integer the board row's oracle replays
    assert(dec.take(16).map(s => s.toLong * s).sum === 23789688L)
    // the synthesizer is byte-deterministic: regenerating the golden
    // (n, seed) reproduces the checked-in file exactly
    assert(Multimodal.encodeWav(96, 5L).toSeq === wav.toSeq)
    // every sample survives the encode+decode round trip bit-exactly
    assert(dec.toSeq === (0 until 96).map(i => Multimodal.pcmSample(5L, i)))
  }

  test("real audio codec: decode is loud on payloads that aren't PCM16 mono") {
    // a stereo/8-bit container must fail the named contract, not
    // silently mis-frame — payloads without a registered codec stay
    // the opaque-byte rows' case
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 2, true, false)
    val raw = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 32L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodePcm16(bos.toByteArray)
    }
    assert(e.getMessage.contains("PCM16 mono"), e.getMessage)
  }

  test("real video path: frames round-trip the codec, cuts land exactly on scene boundaries") {
    // doc 22: nFrames = 4 + 22%4 = 6, sceneLen = 2 + 22%3 = 3 — scenes
    // [0,1,2][3,4,5], one boundary at frame 3
    val lumas = Multimodal.decodeVideoLumas(Multimodal.encodeVideo(22L, 6, 3))
    assert(lumas.length === 6)
    // within-scene frames are byte-identical → codec-exact equal lumas
    assert(lumas(0) === lumas(1))
    assert(lumas(1) === lumas(2))
    assert(lumas(3) === lumas(4))
    // the scene boundary moves the mean by the ±160 gray base (±16 texture)
    assert(math.abs(lumas(3) - lumas(2)) > 128.0 - 1e-9)
    // the container is byte-deterministic
    assert(Multimodal.encodeVideo(22L, 6, 3).toSeq === Multimodal.encodeVideo(22L, 6, 3).toSeq)
  }

  test("real video path: corrupt frame length fails loudly") {
    val ok = Multimodal.encodeVideo(7L, 4, 2)
    val bad = ok.clone()
    bad(0) = 0x7f.toByte // frame-0 length now absurdly larger than the container
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeVideoLumas(bad)
    }
    assert(e.getMessage.contains("corrupt frame length"), e.getMessage)
    // a container truncated mid-frame must fail the length check
    val cut = ok.take(ok.length - 2)
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.decodeVideoLumas(cut)
    }
    assert(e2.getMessage.contains("corrupt frame length"), e2.getMessage)
    // and 1-3 stray bytes where the next length prefix should start
    // must fail loudly too, not silently decode as a shorter video
    val stray = ok ++ Array[Byte](0, 1)
    val e3 = intercept[IllegalArgumentException] {
      Multimodal.decodeVideoLumas(stray)
    }
    assert(e3.getMessage.contains("truncated prefix"), e3.getMessage)
  }

  test("phash dedup query finds exactly the injected twins") {
    val out = graft.SparkEntry.queries("x_mm_phash_dedup")(spark, sf001)
      .collect()
    assert(out.nonEmpty, "injected twins should produce dup groups")
    assert(out.forall(_.getAs[Long]("n_dups") >= 2))
    val keepers = out.map(_.getAs[Long]("keeper"))
    assert(keepers.forall(_ < 20000000L), "keeper must be the original, not the twin")
  }
}
