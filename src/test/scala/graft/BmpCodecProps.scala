package graft

import graft.operators.Multimodal.{BmpCodec, RleCodec}
import org.scalacheck.{Gen, Prop, Properties}

/** Structural properties of the two non-identity codecs behind the
  * multimodal [[graft.operators.Multimodal.PayloadDecoder]] seam on
  * RANDOM payloads (scalacheck, no Spark session) — the example-based
  * MultimodalSpec cases cover the corpus and hand-pinned headers;
  * these cover the byte-value and length space: round-trip identity
  * at every size (0, row boundaries, multi-row), header invariants
  * the BMP spec mandates, and size accounting.
  */
object BmpCodecProps extends Properties("BmpCodec") {

  private val payloads: Gen[Array[Byte]] = Gen.frequency(
    // uniform random bytes at sizes around the codec's row boundaries
    // (width 61, logical prefix 4 → one row holds 57 payload bytes)
    3 -> Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)),
    1 -> Gen.oneOf(0, 1, 56, 57, 58, 60, 61, 62, 121, 122).map(n => Array.tabulate[Byte](n)(i => ((i * 7 + 3) & 0xff).toByte)),
    // long runs: RLE's >255-run chunking path
    1 -> Gen.chooseNum(0, 1200).map(n => Array.fill[Byte](n)(42))
  )

  private def u16(b: Array[Byte], off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int) = u16(b, off) | (u16(b, off + 2) << 16)

  property("BMP round-trip is identity") = Prop.forAll(payloads) { raw =>
    BmpCodec.decode(BmpCodec.encode(raw)).sameElements(raw)
  }

  property("BMP headers are spec-conformant at every size") = Prop.forAll(payloads) { raw =>
    val bmp    = BmpCodec.encode(raw)
    val height = (4 + raw.length + 60) / 61 max 1
    Prop.all(
      Prop(bmp(0) == 'B' && bmp(1) == 'M') :| "magic",
      Prop(u32(bmp, 2) == bmp.length) :| "file size field",
      Prop(u32(bmp, 10) == 1078) :| "pixel offset",
      Prop(u32(bmp, 14) == 40) :| "info header size",
      Prop(u32(bmp, 18) == 61 && u32(bmp, 22) == height) :| "dims",
      Prop(u16(bmp, 28) == 8 && u32(bmp, 30) == 0) :| "8bpp BI_RGB",
      Prop(u32(bmp, 34) == 64 * height) :| "biSizeImage",
      Prop(bmp.length == 1078 + 64 * height) :| "total = offset + stride*height"
    )
  }

  property("RLE round-trip is identity") = Prop.forAll(payloads) { raw =>
    RleCodec.decode(RleCodec.encode(raw)).sameElements(raw)
  }

  property("RLE never emits a zero-count pair and compresses runs") =
    Prop.forAll(Gen.chooseNum(1, 900)) { n =>
      val run = Array.fill[Byte](n)(7)
      val enc = RleCodec.encode(run)
      // ceil(n/255) pairs for a single-value run
      enc.length == ((n + 254) / 255) * 2 &&
      enc.grouped(2).forall(p => (p(0) & 0xff) > 0)
    }
}
