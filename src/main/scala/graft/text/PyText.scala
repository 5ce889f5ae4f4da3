package graft.text

/** Python-string-semantics primitives.
  *
  * The reference is Python 3.9; the north rule demands byte-identical
  * extracted text per url, so the few Python string ops on the extraction
  * path (`str.strip`, `str.split`, `str.find`, `str.title`) are ported with
  * Python's exact semantics rather than approximated with JVM `trim`/`split`
  * (which differ on Unicode whitespace and empty-token handling).
  */
object PyText {

  /** Python str.isspace characters = Unicode whitespace plus the file/group/
    * record/unit separators and NEL/NBSP-family that Java's
    * Character.isWhitespace excludes.
    */
  @inline def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u0085' || c == '\u00a0' || c == '\u2007' || c == '\u202f'

  /** Python re \s as an explicit Java character-class body, built from
    * isPySpace so both engines agree on NBSP/NEL/FS..US — Java's default
    * ASCII \s excludes them and UNICODE_CHARACTER_CLASS \s excludes
    * \x1c-\x1f. Use as "[" + pySpaceClass + "]".
    */
  lazy val pySpaceClass: String = {
    val sb = new StringBuilder
    var c = 0
    while (c <= 0xFFFF) {
      if (isPySpace(c.toChar)) sb.append(f"\\u$c%04x")
      c += 1
    }
    sb.toString
  }

  /** Python str.strip() — strips leading/trailing Python-whitespace. */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** Python str.split() with no args — split on whitespace runs, no empty
    * tokens, leading/trailing whitespace ignored.
    */
  def split(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isPySpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isPySpace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** Python len(s.split()) without materializing tokens. */
  def wordCount(s: String): Int = {
    var count = 0
    var i = 0
    val n = s.length
    var inTok = false
    while (i < n) {
      val sp = isPySpace(s.charAt(i))
      if (!sp && !inTok) { count += 1; inTok = true }
      else if (sp) inTok = false
      i += 1
    }
    count
  }

  /** Python str.split(sep) — keeps empty tokens (unlike JVM String.split). */
  def splitSep(s: String, sep: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    var idx = s.indexOf(sep, from)
    while (idx >= 0) {
      out += s.substring(from, idx)
      from = idx + sep.length
      idx = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.toArray
  }

  /** Python str.title() — first alpha of each run uppercased, rest lowered. */
  def title(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevAlpha = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        sb.append(if (prevAlpha) Character.toLowerCase(c) else Character.toUpperCase(c))
        prevAlpha = true
      } else { sb.append(c); prevAlpha = false }
      i += 1
    }
    sb.toString
  }

  /** Python-compatible lowercase (simple mapping; corpus is de/en text). */
  @inline def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** Python f"{x:.2f}" formatting (round-half-even like CPython format). */
  def f2(x: Double): String = {
    val bd = new java.math.BigDecimal(x).setScale(2, java.math.RoundingMode.HALF_EVEN)
    bd.toPlainString
  }

  // MessageDigest.getInstance takes a JVM-global provider lock on JDK 17
  // (JDK-7092821, only fixed in 18) — at 32 executor threads with ~20 hashes
  // per document that lock serializes the whole narrow stage. Thread-local
  // reusable digests keep the transform lock-free.
  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val sha256Local = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("SHA-256"))
  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = HexChars((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def md5Hex(s: String): String = {
    val d = md5Local.get(); d.reset()
    hex(d.digest(s.getBytes("UTF-8")))
  }

  /** First 64 bits of md5(s) as a big-endian long — bit-identical to
    * `java.lang.Long.parseUnsignedLong(md5Hex(s).take(16), 16)` without the
    * hex-string round trip (the simhash hot path runs this once per token).
    */
  def md5Top64(s: String): Long = {
    val d = md5Local.get(); d.reset()
    val b = d.digest(s.getBytes("UTF-8"))
    ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) | ((b(2) & 0xffL) << 40) |
      ((b(3) & 0xffL) << 32) | ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
  }

  def sha256Hex(s: String): String = {
    val d = sha256Local.get(); d.reset()
    hex(d.digest(s.getBytes("UTF-8")))
  }
}
