package graft.ops

import graft.ops.Multimodal.{MediaAsset, MediaMeta}

/** Deterministic multimodal payload synthesis — REAL container bytes
  * (BMP / RIFF-WAVE PCM / RIFF-AVI MJPEG-shaped) derived purely from a
  * document id, so the decode → metadata round-trip is arithmetic of
  * the id and therefore expressible as a DuckDB oracle (q98). This is
  * how the multimodal plumbing earns a HASH gate without binary
  * columns in the testdata: the bytes are built here, the metadata is
  * recovered exclusively by the real codec walks
  * ([[ImageCodecs.decodeBmp]], [[RiffCodecs.decodeWav]] /
  * [[RiffCodecs.wavPcmWindows]], [[RiffCodecs.decodeAvi]] +
  * [[Multimodal.sampleFrames]] demux slices), and any drift between
  * writer and walker breaks the hash.
  *
  * Layout constants the oracle mirrors (all chunk sizes even, so RIFF
  * pad bytes never enter the arithmetic):
  *   - BMP: 14-byte file header + 40-byte info header + w·h pixel
  *     bytes → n_bytes = 54 + w·h.
  *   - WAV: RIFF(12) + fmt(8+16) + data(8 + 2·n) → n_bytes = 44 + 2n;
  *     PCM16 mono at 8 kHz, samples alternate ±M → Σ|s| = n·M.
  *   - AVI: RIFF(12) + LIST hdrl(12 + avih(8+56)) + LIST movi(12 +
  *     nf·(8+L)) → n_bytes = 100 + nf·(8+L), frame clock 40 ms.
  *
  * reference analog: none (engine-side training-data surface); the
  * synthesized-bytes idea is the standard codec-conformance fixture
  * pattern (a writer the reader must invert).
  */
object MediaSynth {

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def chunk(id: String, payload: Array[Byte]): Array[Byte] =
    cc(id) ++ le32(payload.length) ++ payload
  private def list(listType: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(listType) ++ payload)
  private def riff(form: String, payload: Array[Byte]): Array[Byte] =
    cc("RIFF") ++ le32(4 + payload.length) ++ cc(form) ++ payload

  /** Minimal BITMAPINFOHEADER BMP: dims in the real header fields,
    * pixel bytes deterministic from the id. */
  def bmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val pixels = Array.tabulate(w * h)(j => ((id + j) % 256).toByte)
    cc("BM") ++ le32(54 + pixels.length) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(8) ++      // info header
      le32(0) ++ le32(pixels.length) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      pixels
  }

  /** PCM16 mono WAV at `rate`: n samples alternating +mag/−mag (so the
    * window features are closed-form: Σ|s| = n·mag). */
  def wavPcm16(rate: Int, n: Int, mag: Int): Array[Byte] = {
    val data = Array.tabulate(n)(i => if (i % 2 == 0) mag else -mag)
      .flatMap(v => le16(v & 0xffff))
    riff("WAVE",
      chunk("fmt ", le16(1) ++ le16(1) ++ le32(rate) ++ le32(rate * 2) ++
        le16(2) ++ le16(16)) ++
      chunk("data", data))
  }

  /** Minimal AVI: avih (frame clock, count, dims) + movi with nf `00dc`
    * frame chunks of `frameLen` bytes each (frameLen must be even —
    * keeps RIFF padding out of the size arithmetic). */
  def avi(id: Long, usPerFrame: Int, nf: Int, w: Int, h: Int,
      frameLen: Int): Array[Byte] = {
    require(frameLen % 2 == 0, "frameLen must be even (RIFF pad-free)")
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nf) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val movi = (0 until nf).map { f =>
      chunk("00dc", Array.tabulate(frameLen)(j => ((id + f + j) % 256).toByte))
    }.reduce(_ ++ _)
    riff("AVI ", list("hdrl", chunk("avih", avih)) ++ list("movi", movi))
  }

  /** The q98 asset for one document id — kind by id mod 3, every
    * parameter a small modulus of the id (the oracle restates these
    * same formulas in SQL):
    *   - id≡0: BMP, w = 1+id%31, h = 1+id%17;
    *   - id≡1: WAV, 8 kHz PCM16 mono, n = 8+id%33 samples of
    *     magnitude 50+id%50;
    *   - id≡2: AVI, 40 ms/frame, nf = 1+id%5 frames of
    *     64+2·(id%32) bytes, w = 16+id%9, h = 9+id%7. */
  def assetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    (id % 3).toInt match {
      case 0 => MediaAsset(id, "image",
        bmp(id, 1 + (id % 31).toInt, 1 + (id % 17).toInt), empty)
      case 1 => MediaAsset(id, "audio",
        wavPcm16(8000, 8 + (id % 33).toInt, 50 + (id % 50).toInt), empty)
      case _ => MediaAsset(id, "video",
        avi(id, 40000, 1 + (id % 5).toInt, 16 + (id % 9).toInt,
          9 + (id % 7).toInt, 64 + 2 * (id % 32).toInt), empty)
    }
  }
}
