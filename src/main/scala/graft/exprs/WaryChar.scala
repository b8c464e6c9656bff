package graft.exprs

/** Character-class predicates matching the reference's Rust semantics
  * exactly (SURVEY.md §7.4 item 1 — JVM built-ins diverge from Rust's
  * Unicode derived properties, so each class is spelled out explicitly).
  *
  * Reference semantics:
  *  - whitespace  = Unicode `White_Space` (wary trim,
  *    reference: wary/src/options/transformer/trim.rs:48-61)
  *  - lowercase   = Unicode `Lowercase` derived property
  *    (wary/src/options/lowercase.rs:99-117)
  *  - uppercase   = Unicode `Uppercase` (options/uppercase.rs:100-118)
  *  - alphanumeric = Alphabetic | Nd | Nl | No
  *    (options/rule/alphanumeric.rs:79-94)
  *
  * All functions are static and branch-free enough to sit inside
  * whole-stage codegen via a generated static call.
  */
object WaryChar {

  /** Unicode White_Space — the exact Rust `char::is_whitespace` set. */
  def isWhitespace(cp: Int): Boolean = cp match {
    case 0x09 | 0x0A | 0x0B | 0x0C | 0x0D | 0x20 | 0x85 | 0xA0 | 0x1680 |
        0x2028 | 0x2029 | 0x202F | 0x205F | 0x3000 =>
      true
    case c => c >= 0x2000 && c <= 0x200A
  }

  def isAsciiWhitespace(cp: Int): Boolean =
    // Rust u8::is_ascii_whitespace: space, \t, \n, \x0C, \r (NOT \x0B)
    cp == 0x20 || cp == 0x09 || cp == 0x0A || cp == 0x0C || cp == 0x0D

  /** Rust char::is_lowercase = Ll + Other_Lowercase; Java's isLowerCase
    * implements the same derived property on code points.
    */
  def isLowercase(cp: Int): Boolean = Character.isLowerCase(cp)

  def isUppercase(cp: Int): Boolean = Character.isUpperCase(cp)

  /** Rust char::is_alphanumeric = Alphabetic | Nd | Nl | No.
    * Java isAlphabetic = Lu Ll Lt Lm Lo + Nl + Other_Alphabetic
    * (the Unicode Alphabetic property), so we add Nd and No.
    */
  def isAlphanumeric(cp: Int): Boolean =
    Character.isAlphabetic(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.OTHER_NUMBER ||
      t == Character.LETTER_NUMBER
    }

  // --- per-string scans used by rules; return the index (in Unicode scalar
  // values, matching Rust char_indices-based positions… NOTE the reference
  // reports .chars() enumerate positions) of the first violating char, or
  // -1 when the whole string passes.

  private def firstBad(s: String, ok: Int => Boolean): Int = {
    var i = 0 // code-point index (Rust char position)
    var j = 0 // UTF-16 index
    val n = s.length
    while (j < n) {
      val cp = s.codePointAt(j)
      if (!ok(cp)) return i
      i += 1
      j += Character.charCount(cp)
    }
    -1
  }

  /** Lowercase rule: every char lowercase OR whitespace. */
  def firstNonLower(s: String): Int =
    firstBad(s, cp => isLowercase(cp) || isWhitespace(cp))

  def firstNonLowerAscii(s: String): Int =
    firstBad(
      s,
      cp => (cp >= 'a' && cp <= 'z') || (cp < 128 && isWhitespace(cp))
    )

  def firstNonUpper(s: String): Int =
    firstBad(s, cp => isUppercase(cp) || isWhitespace(cp))

  def firstNonUpperAscii(s: String): Int =
    firstBad(
      s,
      cp => (cp >= 'A' && cp <= 'Z') || (cp < 128 && isWhitespace(cp))
    )

  def firstNonAlnum(s: String): Int = firstBad(s, isAlphanumeric)

  def firstNonAlnumAscii(s: String): Int =
    firstBad(
      s,
      cp =>
        (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
          (cp >= '0' && cp <= '9')
    )

  def dispatchFirstBad(mode: String, s: String): Int = mode match {
    case "lower"       => firstNonLower(s)
    case "lower_ascii" => firstNonLowerAscii(s)
    case "upper"       => firstNonUpper(s)
    case "upper_ascii" => firstNonUpperAscii(s)
    case "alnum"       => firstNonAlnum(s)
    case "alnum_ascii" => firstNonAlnumAscii(s)
    case m             => throw new IllegalArgumentException(s"mode $m")
  }

  /** Exact-Rust trim: strip leading+trailing Unicode White_Space. */
  def trim(s: String): String = {
    var start = 0
    var end = s.length
    while (start < end && {
        val cp = s.codePointAt(start)
        if (isWhitespace(cp)) { start += Character.charCount(cp); true }
        else false
      }) {}
    while (end > start && {
        val cp = s.codePointBefore(end)
        if (isWhitespace(cp)) { end -= Character.charCount(cp); true }
        else false
      }) {}
    s.substring(start, end)
  }

  def trimAscii(s: String): String = {
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) < 128 &&
      isAsciiWhitespace(s.charAt(start))) start += 1
    while (end > start && s.charAt(end - 1) < 128 &&
      isAsciiWhitespace(s.charAt(end - 1))) end -= 1
    s.substring(start, end)
  }

  /** Grapheme-cluster count (wary length(graphemes),
    * reference: wary/src/options/rule/length.rs:370-381).
    *
    * The reference counts UAX #29 *extended* grapheme clusters
    * (unicode-segmentation `graphemes(true)`). `java.text.BreakIterator`
    * implements legacy clusters and splits ZWJ emoji sequences and
    * regional-indicator flags; `\X` in java.util.regex matches extended
    * clusters and agrees with Rust on ZWJ families ("👨‍👩‍👧" → 1) and
    * flags ("🇺🇸" → 1).
    */
  private val graphemePattern = java.util.regex.Pattern.compile("\\X")

  def graphemeCount(s: String): Int = {
    val m = graphemePattern.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** UTF-16 code-unit count (length(code_units), length.rs:360-368). */
  def utf16Count(s: String): Int = s.length
}
