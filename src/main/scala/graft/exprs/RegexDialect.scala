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
  *  - a TRAILING `$` means end-of-haystack (`\z`) in Rust but
  *    before-final-newline (`\Z`) in Java — rewritten to `\z` when the
  *    pattern is not multiline. (A non-trailing `$` in an alternation
  *    keeps Java `\Z` semantics — a documented residual divergence on
  *    inputs with a trailing newline.)
  *  - POSIX ASCII classes `[[:alpha:]]`, `[[:digit:]]`, … are Rust-only
  *    syntax; expanded to explicit ASCII ranges (NOT `\p{Alpha}`, which
  *    `(?U)` would silently widen to Unicode — Rust's are strictly ASCII).
  *  - Python-style named groups `(?P<name>…)` → Java `(?<name>…)`.
  *
  * Rejected constructs (no Java equivalent with the same meaning):
  *
  *  - `(?U)` in the INPUT means swap-greed in Rust but
  *    UNICODE_CHARACTER_CLASS in Java — translation throws rather than
  *    silently diverge.
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

  /** Translate a Rust-`regex` pattern to an equivalent Java pattern. */
  def toJava(pat: String): String = {
    require(!pat.contains("(?U"),
      s"Rust swap-greed flag (?U) has no Java equivalent " +
        s"(Java (?U) means unicode character classes): $pat")
    require(!pat.contains("[:^"),
      s"negated POSIX classes ([[:^name:]]) are not translated: $pat")
    var p = pat.replace("(?P<", "(?<")
    posix.foreach { case (name, expansion) =>
      p = p.replace(s"[:$name:]", expansion)
    }
    // trailing unescaped $ -> \z (Rust end-of-haystack; Java $ would also
    // match before a final newline). Unescaped = even number of trailing
    // backslashes before it.
    val multiline = p.contains("(?m")
    if (!multiline && p.endsWith("$") &&
      p.dropRight(1).reverse.takeWhile(_ == '\\').length % 2 == 0)
      p = p.dropRight(1) + "\\z"
    "(?dU)" + p
  }
}
