package graft.exprs

/** Pure-JVM validators mirroring the reference's parser-backed rules.
  * Each returns the wary error `code` string, or "" when the value passes
  * ("" instead of null keeps the generated code null-free so the
  * expressions stay inside whole-stage codegen).
  *
  * Reference semantics (behavioral spec only — implementations are new):
  *  - addr:        Rust std IpAddr/Ipv4Addr/Ipv6Addr parsers
  *                 (wary/src/options/rule/addr.rs:104-153)
  *  - uuid:        uuid crate parse_str — simple/hyphenated/urn/braced
  *                 (options/rule/uuid.rs:66-79)
  *  - semver:      SemVer 2.0 strict (options/rule/semver.rs:64-81)
  *  - credit_card: charset+issuer+length+Luhn (options/rule/credit_card.rs)
  *  - email:       email_address crate checks (options/rule/email.rs)
  *  - url:         WHATWG-ish absolute-URL parse (options/rule/url.rs)
  */
object Validators {

  def check(kind: String, s: String): String = kind match {
    case "ip"   => if (isIpv4(s) || isIpv6(s)) "" else "invalid_ip"
    case "ipv4" => if (isIpv4(s)) "" else "invalid_ipv4"
    case "ipv6" => if (isIpv6(s)) "" else "invalid_ipv6"
    case "uuid" => if (isUuid(s)) "" else "uuid"
    case "semver"      => if (isSemver(s)) "" else "semver"
    case "credit_card" => creditCard(s)
    case "email"       => email(s)
    case "url"         => url(s)
    case k => throw new IllegalArgumentException(s"validator $k")
  }

  // ---------------------------------------------------------------- IPv4
  /** Rust std parser: exactly 4 decimal octets, 0-255, no leading zeros. */
  def isIpv4(s: String): Boolean = {
    var i = 0
    val n = s.length
    var octet = 0
    while (octet < 4) {
      if (octet > 0) {
        if (i >= n || s.charAt(i) != '.') return false
        i += 1
      }
      var v = 0
      var digits = 0
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9' && digits < 4) {
        v = v * 10 + (s.charAt(i) - '0')
        digits += 1
        i += 1
      }
      if (digits == 0 || digits > 3 || v > 255) return false
      if (digits > 1 && s.charAt(i - digits) == '0') return false // no leading 0
      octet += 1
    }
    i == n
  }

  // ---------------------------------------------------------------- IPv6
  /** Rust std parser: 8 hex16 groups, one optional "::", optional trailing
    * embedded IPv4; no zone index.
    */
  def isIpv6(s: String): Boolean = {
    if (s.isEmpty) return false
    val parts = s.split("::", -1)
    if (parts.length > 2) return false
    def groups(p: String, allowV4Tail: Boolean): Int = {
      // returns group count (v4 tail counts as 2), or -1 on error
      if (p.isEmpty) return 0
      val segs = p.split(":", -1)
      var count = 0
      var i = 0
      while (i < segs.length) {
        val seg = segs(i)
        val last = i == segs.length - 1
        if (seg.isEmpty) return -1
        if (last && allowV4Tail && seg.contains('.')) {
          if (!isIpv4(seg)) return -1
          count += 2
        } else {
          if (seg.length > 4) return -1
          var j = 0
          while (j < seg.length) {
            val c = seg.charAt(j)
            val hex = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
              (c >= 'A' && c <= 'F')
            if (!hex) return -1
            j += 1
          }
          count += 1
        }
        i += 1
      }
      count
    }
    if (parts.length == 1) {
      groups(parts(0), allowV4Tail = true) == 8
    } else {
      val a = groups(parts(0), allowV4Tail = false)
      val b = groups(parts(1), allowV4Tail = true)
      a >= 0 && b >= 0 && a + b <= 7
    }
  }

  // ---------------------------------------------------------------- UUID
  def isUuid(s: String): Boolean = {
    def hyphenated(h: String): Boolean = {
      if (h.length != 36) return false
      var i = 0
      while (i < 36) {
        val c = h.charAt(i)
        if (i == 8 || i == 13 || i == 18 || i == 23) {
          if (c != '-') return false
        } else if (!isHex(c)) return false
        i += 1
      }
      true
    }
    s.length match {
      case 32 => s.forall(isHex)
      case 36 => hyphenated(s)
      case 38 =>
        s.charAt(0) == '{' && s.charAt(37) == '}' &&
          hyphenated(s.substring(1, 37))
      case 45 =>
        s.regionMatches(true, 0, "urn:uuid:", 0, 9) &&
          hyphenated(s.substring(9))
      case _ => false
    }
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  // -------------------------------------------------------------- SemVer
  def isSemver(s: String): Boolean = {
    val plus = s.indexOf('+')
    val (beforeBuild, build) =
      if (plus >= 0) (s.substring(0, plus), Some(s.substring(plus + 1)))
      else (s, None)
    val dash = beforeBuild.indexOf('-')
    val (core, pre) =
      if (dash >= 0)
        (beforeBuild.substring(0, dash), Some(beforeBuild.substring(dash + 1)))
      else (beforeBuild, None)
    val nums = core.split("\\.", -1)
    if (nums.length != 3 || !nums.forall(isNumericNoLeadingZero)) return false
    def alnumHyphen(id: String) =
      id.nonEmpty && id.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
          (c >= 'A' && c <= 'Z') || c == '-'
      )
    val preOk = pre.forall(_.split("\\.", -1).forall { id =>
      alnumHyphen(id) &&
      (!id.forall(_.isDigit) || isNumericNoLeadingZero(id))
    })
    val buildOk = build.forall(_.split("\\.", -1).forall(alnumHyphen))
    preOk && buildOk
  }

  private def isNumericNoLeadingZero(p: String): Boolean =
    p.nonEmpty && p.forall(c => c >= '0' && c <= '9') &&
      (p.length == 1 || p.charAt(0) != '0')

  // --------------------------------------------------------- credit card
  def creditCard(s: String): String = {
    if (s.isEmpty || !s.forall(c => c >= '0' && c <= '9'))
      return "invalid_card_format"
    val issuerLengths: Seq[(Boolean, Range)] = Seq(
      (s.startsWith("4"), 13 to 19), // visa
      (prefixIn(s, 51 to 55) || prefixIn4(s, 2221 to 2720), 16 to 16),
      (s.startsWith("34") || s.startsWith("37"), 15 to 15), // amex
      (s.startsWith("6011") || s.startsWith("65") ||
        prefixIn3(s, 644 to 649), 16 to 19), // discover
      (prefixIn3(s, 300 to 305) || s.startsWith("36") ||
        s.startsWith("38"), 14 to 19), // diners
      (prefixIn4(s, 3528 to 3589), 16 to 19), // jcb
      (s.startsWith("62"), 16 to 19) // unionpay
    )
    val matched = issuerLengths.filter(_._1)
    if (matched.isEmpty) return "unknown_card_type"
    if (!matched.exists(_._2.contains(s.length))) return "invalid_card_length"
    if (!luhnOk(s)) return "invalid_card_luhn"
    ""
  }

  private def prefixIn(s: String, r: Range): Boolean =
    s.length >= 2 && { val p = s.substring(0, 2).toInt; r.contains(p) }
  private def prefixIn3(s: String, r: Range): Boolean =
    s.length >= 3 && { val p = s.substring(0, 3).toInt; r.contains(p) }
  private def prefixIn4(s: String, r: Range): Boolean =
    s.length >= 4 && { val p = s.substring(0, 4).toInt; r.contains(p) }

  def luhnOk(s: String): Boolean = {
    var sum = 0
    var dbl = false
    var i = s.length - 1
    while (i >= 0) {
      var d = s.charAt(i) - '0'
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      dbl = !dbl
      i -= 1
    }
    sum % 10 == 0
  }

  // --------------------------------------------------------------- email
  private val atext = "!#$%&'*+-/=?^_`{|}~"
  def email(s: String): String = {
    val at = s.lastIndexOf('@')
    if (at < 0) return "missing_separator"
    val local = s.substring(0, at)
    val domain = s.substring(at + 1)
    if (local.isEmpty) return "local_part_empty"
    if (local.length > 64) return "local_part_too_long"
    if (local.startsWith("\"")) {
      if (local.length < 2 || !local.endsWith("\"")) return "unbalanced_quotes"
    } else {
      if (local.startsWith(".") || local.endsWith(".") ||
        local.contains("..")) return "invalid_character"
      val badLocal = local.exists { c =>
        val ok = c.isLetterOrDigit || c == '.' || atext.indexOf(c.toInt) >= 0
        !ok || c > 127
      }
      if (badLocal) return "invalid_character"
    }
    if (domain.isEmpty) return "domain_empty"
    if (domain.length > 253) return "domain_too_long"
    if (domain.startsWith("[")) { // address literal
      if (!domain.endsWith("]")) return "invalid_character"
      val inner = domain.substring(1, domain.length - 1)
      val ok =
        if (inner.startsWith("IPv6:")) isIpv6(inner.substring(5))
        else isIpv4(inner)
      return if (ok) "" else "invalid_character"
    }
    val labels = domain.split("\\.", -1)
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l.isEmpty) return "sub_domain_empty"
      if (l.length > 63) return "sub_domain_too_long"
      val bad = l.exists(c => !(c.isLetterOrDigit && c < 128) && c != '-')
      if (bad || l.startsWith("-") || l.endsWith("-"))
        return "invalid_character"
      i += 1
    }
    ""
  }

  // ----------------------------------------------------------------- url
  private val specialSchemes =
    Set("http", "https", "ws", "wss", "ftp", "file")
  def url(s: String): String = {
    val colon = s.indexOf(':')
    if (colon <= 0) return "relative_url_without_base"
    val scheme = s.substring(0, colon)
    if (!scheme.head.isLetter ||
      !scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return "relative_url_without_base"
    val rest = s.substring(colon + 1)
    val sch = scheme.toLowerCase(java.util.Locale.ROOT)
    if (!specialSchemes.contains(sch)) return "" // opaque / cannot-be-a-base
    if (!rest.startsWith("//") && sch != "file")
      return "relative_url_without_base"
    val afterSlashes = rest.dropWhile(_ == '/')
    val authority = afterSlashes.takeWhile(c => c != '/' && c != '?' && c != '#')
    val hostPort = authority.substring(authority.lastIndexOf('@') + 1)
    if (hostPort.isEmpty) return if (sch == "file") "" else "empty_host"
    val (host, port) =
      if (hostPort.startsWith("[")) {
        val close = hostPort.indexOf(']')
        if (close < 0) return "invalid_ipv6_address"
        val p = hostPort.substring(close + 1)
        (hostPort.substring(0, close + 1),
          if (p.startsWith(":")) p.substring(1) else "")
      } else {
        val c = hostPort.lastIndexOf(':')
        if (c >= 0) (hostPort.substring(0, c), hostPort.substring(c + 1))
        else (hostPort, "")
      }
    if (port.nonEmpty) {
      if (!port.forall(_.isDigit) || port.length > 5 || port.toInt > 65535)
        return "invalid_port"
    }
    if (host.startsWith("[")) {
      if (!isIpv6(host.substring(1, host.length - 1)))
        return "invalid_ipv6_address"
      return ""
    }
    if (host.isEmpty) return "empty_host"
    // trailing-numeric host ⇒ must be a valid ipv4
    val lastLabel = host.substring(host.lastIndexOf('.') + 1)
    if (lastLabel.nonEmpty && lastLabel.forall(_.isDigit)) {
      if (!isIpv4(host)) return "invalid_ipv4_address"
      return ""
    }
    val badDomain = host.exists(c =>
      c <= 0x20 || "#%/:?@[\\]^|<>\"".indexOf(c.toInt) >= 0)
    if (badDomain) return "invalid_domain_character"
    ""
  }
}
