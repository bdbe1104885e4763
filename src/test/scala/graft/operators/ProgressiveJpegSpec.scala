package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Progressive (SOF2, T.81 Annex G) JPEG decode. The load-bearing proof is
  * CROSS-PATH PARITY: the same quantized coefficient blocks encoded
  * baseline and progressive must decode to IDENTICAL pixels — the baseline
  * path is already oracle-proven (q83–q85), so parity transfers that proof
  * to every progressive scan kind (DC bit-split, AC spectral bands,
  * successive-approximation refinement, EOB runs, ZRL-in-refine,
  * correction bits, restarts) without a self-consistent-but-wrong loop.
  */
class ProgressiveJpegSpec extends AnyFunSuite {

  private def check(prop: org.scalacheck.Prop, minSuccessful: Int = 100): Unit = {
    import org.scalacheck.{Test => SCTest}
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private def randomBlocks(
      rnd: scala.util.Random, n: Int, acCount: Int, acMag: Int): Seq[Array[Int]] =
    Seq.fill(n) {
      val c = new Array[Int](64)
      c(0) = rnd.nextInt(200) - 100
      for (_ <- 0 until rnd.nextInt(acCount + 1))
        c(1 + rnd.nextInt(63)) = rnd.nextInt(2 * acMag + 1) - acMag
      c
    }

  test("gray parity: progressive decode == baseline decode on random blocks") {
    import org.scalacheck.{Gen, Prop}
    val prop = Prop.forAll(
      Gen.chooseNum(1, 4), Gen.chooseNum(1, 4), Gen.chooseNum(0, 4), Gen.long) {
      (wB, hB, ri, seed) =>
        val rnd = new scala.util.Random(seed)
        val blocks = randomBlocks(rnd, wB * hB, 12, 20)
        val quant = Array.fill(64)(1 + rnd.nextInt(30))
        val base = Jpeg.decodeJpeg(Jpeg.encodeJpegCoeffsGray(wB, hB, blocks, quant))
        val prog = Jpeg.decodeJpeg(Jpeg.encodeJpegProgGray(
          wB * 8, hB * 8, blocks, quant, restartInterval = ri))
        base.isDefined && prog.isDefined &&
          base.get.pixels.sameElements(prog.get.pixels)
    }
    check(prop)
  }

  test("gray parity holds on non-multiple-of-8 dims (SOF crop)") {
    val rnd = new scala.util.Random(7)
    for (w <- Seq(9, 15, 17); h <- Seq(10, 23)) {
      val wB = (w + 7) / 8; val hB = (h + 7) / 8
      val blocks = randomBlocks(rnd, wB * hB, 8, 15)
      val quant = Array.fill(64)(2)
      // baseline with true dims via the real-image encoder path is
      // lossy; instead compare against a baseline stream built from the
      // same blocks with padded dims and crop manually
      val basePad = Jpeg.decodeJpeg(
        Jpeg.encodeJpegCoeffsGray(wB, hB, blocks, quant)).get
      val prog = Jpeg.decodeJpeg(
        Jpeg.encodeJpegProgGray(w, h, blocks, quant)).get
      assert(prog.width == w && prog.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(prog.pixels((y * w + x) * 3) ==
          basePad.pixels((y * wB * 8 + x) * 3), s"($x,$y) w=$w h=$h")
    }
  }

  test("coefficient recovery: the accumulated store equals the encoded blocks") {
    // the scan script reassembles each coefficient from its bit planes —
    // the store must land on EXACTLY the quantized inputs, pinning the
    // successive-approximation arithmetic (incl. negative coefficients)
    val rnd = new scala.util.Random(99)
    val wB = 3; val hB = 2
    val blocks = randomBlocks(rnd, wB * hB, 16, 25)
    val quant = Array.fill(64)(3)
    val prog = Jpeg.encodeJpegProgGray(wB * 8, hB * 8, blocks, quant)
    val got = Jpeg.decodeJpegCoefficients(prog).get
    assert(got.length == blocks.length)
    for ((g, w0) <- got.zip(blocks)) assert(g.sameElements(w0))
  }

  test("color 4:2:0 parity: interleaved DC + per-component EOB-run AC scans") {
    for (trial <- 0 until 6) {
      val wM = 1 + trial % 3
      val hM = 1 + (trial * 2) % 3
      def ycc(mx: Int, my: Int) = (
        (trial * 3 + 17 * mx + 29 * my) % 256,
        (trial * 5 + 23 * mx + 7 * my) % 256,
        (trial * 11 + 19 * mx + 37 * my) % 256)
      val base = Jpeg.decodeJpeg(Jpeg.encodeJpeg420Mcus(wM, hM, ycc)).get
      val prog = Jpeg.decodeJpeg(Jpeg.encodeJpegProg420Mcus(wM, hM, ycc)).get
      assert(base.pixels.sameElements(prog.pixels), s"trial $trial")
    }
  }

  test("EOB runs spanning many blocks decode (the n>1 EOBn arm)") {
    // one coefficient in the first block, then 11 all-zero blocks: the
    // AC-first scan carries one (run,size) then a single EOBn covering
    // the remaining blocks; refinement scans are pure EOB-run streams
    val blocks = ({ val c = new Array[Int](64); c(0) = 10; c(1) = 5; c }) +:
      Seq.fill(11)(new Array[Int](64))
    val quant = Array.fill(64)(8)
    val base = Jpeg.decodeJpeg(Jpeg.encodeJpegCoeffsGray(12, 1, blocks, quant)).get
    val prog = Jpeg.decodeJpeg(Jpeg.encodeJpegProgGray(96, 8, blocks, quant)).get
    assert(base.pixels.sameElements(prog.pixels))
  }

  test("corruption never throws: truncation and bit flips degrade to None") {
    val rnd = new scala.util.Random(3)
    val blocks = randomBlocks(rnd, 4, 10, 20)
    val good = Jpeg.encodeJpegProgGray(16, 16, blocks, Array.fill(64)(4),
      restartInterval = 2)
    assert(Jpeg.decodeJpeg(good).isDefined)
    (0 until good.length).foreach { n =>
      Jpeg.decodeJpeg(good.take(n)) // Option out, never a throw
      assert(MultimodalOps.decodeBytes(good.take(n)).length == 16)
    }
    (0 until good.length).foreach { i =>
      val c = good.clone(); c(i) = (c(i) ^ 0x5A).toByte
      Jpeg.decodeJpeg(c)
      assert(MultimodalOps.decodeBytes(c).length == 16)
    }
  }

  test("decodeBytes dispatches progressive JPEG to the real image path") {
    val f = MultimodalOps.decodeBytes(Jpeg.encodeJpegProgGray(
      16, 8,
      Seq({ val c = new Array[Int](64); c(0) = 100 - 128; c },
        { val c = new Array[Int](64); c(0) = 120 - 128; c }),
      Array.tabulate(64)(i => if (i == 0) 8 else 16)))
    assert(f(0) == 16f && f(1) == 8f, "dims did not come from the real decode")
    assert(math.abs(f(2) * 255f - 110f) < 1e-3 && f(2) == f(3) && f(3) == f(4))
  }
}
