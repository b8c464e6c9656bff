package graft.exprs

/** Rust-`regex`-dialect → java.util.regex translation for the `regex`
  * rule (reference: wary/src/options/rule/regex.rs:88-106 matches with the
  * Rust `regex` crate; Spark's `rlike` is Java regex).
  *
  * Translated constructs (the ones that differ and appear in practice):
  *
  *  - `\d` / `\w` / `\s` (and uppercase negations) are Unicode-aware by
  *    DEFAULT in Rust but ASCII-only in Java — fixed by prepending the
  *    `(?U)` (UNICODE_CHARACTER_CLASS) flag, under which Java's classes
  *    match Rust's definitions (`\d`=\p{Nd}, `\s`=White_Space, `\w`=
  *    Alphabetic+M+Nd+Pc+Join_Control).
  *  - `.` excludes ONLY `\n` in Rust, but all of `\n \r U+0085 U+2028 U+2029` in
  *    Java — fixed by the `(?d)` (UNIX_LINES) flag, under which Java's
  *    `.` (and multiline `^`/`$`) recognize only `\n`.
  *  - `$` means end-of-haystack (`\z`) in Rust but before-final-newline
  *    (`\Z`) in Java — EVERY unescaped `$` outside a character class is
  *    rewritten to `\z` when the pattern has no positive `m` flag group
  *    (so `(a$|b$)` keeps Rust semantics on inputs with a trailing
  *    newline, not just a trailing `$`).
  *  - POSIX ASCII classes `[[:alpha:]]`, `[[:digit:]]`, … are Rust-only
  *    syntax; expanded to explicit ASCII ranges (NOT `\p{Alpha}`, which
  *    `(?U)` would silently widen to Unicode — Rust's are strictly ASCII).
  *    Negated forms `[[:^name:]]` become NESTED negated classes
  *    (`[^ranges]` inside the enclosing class — Java nested classes
  *    union, matching Rust's complement-set semantics).
  *  - Python-style named groups `(?P<name>…)` → Java `(?<name>…)`.
  *
  * Rejected constructs (no Java equivalent with the same meaning):
  *
  *  - a `U` flag anywhere in a flag group (`(?U)`, `(?sU)`, `(?-U)`,
  *    `(?U:…)`) means swap-greed in Rust but UNICODE_CHARACTER_CLASS in
  *    Java — translation throws rather than silently diverge. Flag groups
  *    are detected by scanning (escape- and character-class-aware), not
  *    substring matching, so combined groups like `(?sU)` are caught.
  *
  * Rust `regex` has no lookarounds or backreferences, so every remaining
  * Rust-valid pattern is also Java-valid with identical semantics.
  */
object RegexDialect {

  private val posix = Map(
    "alnum" -> "0-9A-Za-z",
    "alpha" -> "A-Za-z",
    "ascii" -> "\\x00-\\x7F",
    "blank" -> " \\t",
    "cntrl" -> "\\x00-\\x1F\\x7F",
    "digit" -> "0-9",
    "graph" -> "!-~",
    "lower" -> "a-z",
    "print" -> " -~",
    "punct" -> "!-/:-@\\[-`\\{-~",
    "space" -> " \\t\\n\\x0B\\f\\r",
    "upper" -> "A-Z",
    "word" -> "0-9A-Za-z_",
    "xdigit" -> "0-9A-Fa-f"
  )

  private val flagChars = "idmsuxU"

  /** Scan flag groups `(?flags)` / `(?flags-flags:` outside character
    * classes and escapes. Returns (any `U` flag present, any POSITIVE `m`
    * flag present). Non-flag groups ((?<name>…), (?P<…), (?:…)) stop the
    * flag scan at the first non-flag char and are ignored.
    */
  private def scanFlags(p: String): (Boolean, Boolean) = {
    var i = 0
    // class NESTING DEPTH, not a boolean: Java allows nested classes
    // ([x[^0-9]]) and the POSIX expansion above emits them — a boolean
    // would flip "outside" at the inner ']' while still inside the outer
    var depth = 0
    var hasU = false
    var posM = false
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\') i += 2
      else if (depth > 0) {
        if (c == '[') depth += 1 else if (c == ']') depth -= 1
        i += 1
      }
      else if (c == '[') { depth = 1; i += 1 }
      else if (c == '(' && i + 1 < p.length && p.charAt(i + 1) == '?') {
        var j = i + 2
        var neg = false
        var isFlags = true
        while (isFlags && j < p.length &&
          p.charAt(j) != ')' && p.charAt(j) != ':') {
          val f = p.charAt(j)
          if (f == '-') neg = true
          else if (flagChars.indexOf(f.toInt) >= 0) {
            if (f == 'U') hasU = true
            if (f == 'm' && !neg) posM = true
          } else isFlags = false // (?<name>, (?P<, (?=… — not a flag group
          j += 1
        }
        i += 2 // group contents are scanned normally
      } else i += 1
    }
    (hasU, posM)
  }

  /** Rewrite every unescaped `$` outside character classes to `\z`. */
  private def rewriteDollars(p: String): String = {
    val sb = new StringBuilder(p.length + 8)
    var i = 0
    var depth = 0 // class nesting depth (see scanFlags)
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < p.length) {
        sb.append(c).append(p.charAt(i + 1)); i += 2
      } else {
        if (depth > 0) {
          if (c == '[') depth += 1 else if (c == ']') depth -= 1
          sb.append(c)
        }
        else if (c == '[') { depth = 1; sb.append(c) }
        else if (c == '$') sb.append("\\z")
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Translate a Rust-`regex` pattern to an equivalent Java pattern. */
  def toJava(pat: String): String = {
    val (hasU, multiline) = scanFlags(pat)
    require(!hasU,
      s"Rust swap-greed flag U has no Java equivalent " +
        s"(Java (?U) means unicode character classes): $pat")
    var p = pat.replace("(?P<", "(?<")
    posix.foreach { case (name, expansion) =>
      // Negated POSIX class: Rust's [:^name:] denotes the complement SET
      // inside a class; Java expresses the same via a NESTED negated
      // class ([x[^0-9]] = x ∪ non-digit — nested classes union). Both
      // complements are over all of Unicode (Rust POSIX sets are ASCII,
      // so their complements are not) — semantics align exactly.
      p = p.replace(s"[:^$name:]", s"[^$expansion]")
      p = p.replace(s"[:$name:]", expansion)
    }
    if (!multiline) p = rewriteDollars(p)
    "(?dU)" + p
  }
}
