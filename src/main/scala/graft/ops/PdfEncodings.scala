package graft.ops

/**
 * The three predefined simple-font encodings of ISO 32000-1 Annex D
 * (StandardEncoding, WinAnsiEncoding, MacRomanEncoding) plus the
 * Adobe-Glyph-List subset needed to resolve `/Differences` arrays —
 * the fallback [[Archives]] uses for fonts that carry `/Encoding`
 * but no `/ToUnicode` CMap (most pre-2000 and many generated PDFs).
 *
 * Coverage is deliberately scoped: codes a table doesn't define
 * claim nothing (the repo's bytes-prove-no-text rule), and
 * `/Differences` names outside [[glyphUni]] likewise claim nothing
 * rather than guessing. The 0xF0 MacRoman position (the Apple logo,
 * which has no Unicode mapping) is left undefined on purpose.
 *
 * The reference engine has no PDF surface — this family is
 * pipeline-beyond-reference scope; tables transcribed from the
 * public ISO 32000-1 Annex D / Adobe Glyph List.
 */
object PdfEncodings {

  /** ASCII 0x20–0x7E mapped to themselves. */
  private val asciiRange: Map[Int, String] =
    (0x20 to 0x7E).map(c => c -> c.toChar.toString).toMap

  /** CP1252's 0x80–0x9F specials (the WinAnsi block Latin-1 lacks);
   * 0x81/0x8D/0x8F/0x90/0x9D are undefined. */
  private val winSpecials: Map[Int, String] = Map(
    0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„",
    0x85 -> "…", 0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ",
    0x89 -> "‰", 0x8A -> "Š", 0x8B -> "‹", 0x8C -> "Œ",
    0x8E -> "Ž", 0x91 -> "‘", 0x92 -> "’", 0x93 -> "“",
    0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
    0x98 -> "˜", 0x99 -> "™", 0x9A -> "š", 0x9B -> "›",
    0x9C -> "œ", 0x9E -> "ž", 0x9F -> "Ÿ")

  /** WinAnsiEncoding: ASCII + CP1252 specials + Latin-1 upper half
   * (0xA0–0xFF are the same code points in Unicode). */
  val winAnsi: Map[Int, String] =
    asciiRange ++ winSpecials ++
      (0xA0 to 0xFF).map(c => c -> c.toChar.toString).toMap

  /** MacRomanEncoding's upper half 0x80–0xFF in code order (Annex D
   * variant: 0xDB is `currency`, not the Mac OS euro). Position 0x70
   * (= code 0xF0) is the Apple logo — excluded below. */
  private val macHigh: String =
    "ÄÅÇÉÑÖÜá" + // 80-87
      "àâäãåçéè" + // 88-8F
      "êëíìîïñó" + // 90-97
      "òôöõúùûü" + // 98-9F
      "†°¢£§•¶ß" + // A0-A7
      "®©™´¨≠ÆØ" + // A8-AF
      "∞±≤≥¥µ∂∑" + // B0-B7
      "∏π∫ªºΩæø" + // B8-BF
      "¿¡¬√ƒ≈∆«" + // C0-C7
      "»…\u00A0ÀÃÕŒœ" + // C8-CF (CA = no-break space)
      "–—“”‘’÷◊" + // D0-D7
      "ÿŸ⁄¤‹›ﬁﬂ" + // D8-DF
      "‡·‚„‰ÂÊÁ" + // E0-E7
      "ËÈÍÎÏÌÓÔ" + // E8-EF
      "\u0000ÒÚÛÙıˆ˜" + // F0-F7 (F0 = apple, NUL placeholder)
      "¯˘˙˚¸˝˛ˇ" //   F8-FF

  /** MacRomanEncoding: ASCII + the upper-half table. */
  val macRoman: Map[Int, String] =
    asciiRange ++ (0x80 to 0xFF).flatMap { c =>
      val ch = macHigh.charAt(c - 0x80)
      if (ch == '\u0000') None else Some(c -> ch.toString)
    }.toMap

  /** StandardEncoding: ASCII with the two typographic-quote
   * substitutions, plus its scattered upper half. */
  val standard: Map[Int, String] =
    asciiRange ++ Map(
      0x27 -> "’", 0x60 -> "‘", // quoteright / quoteleft
      0xA1 -> "¡", 0xA2 -> "¢", 0xA3 -> "£", 0xA4 -> "⁄",
      0xA5 -> "¥", 0xA6 -> "ƒ", 0xA7 -> "§", 0xA8 -> "¤",
      0xA9 -> "'", 0xAA -> "“", 0xAB -> "«", 0xAC -> "‹",
      0xAD -> "›", 0xAE -> "ﬁ", 0xAF -> "ﬂ",
      0xB1 -> "–", 0xB2 -> "†", 0xB3 -> "‡", 0xB4 -> "·",
      0xB6 -> "¶", 0xB7 -> "•", 0xB8 -> "‚", 0xB9 -> "„",
      0xBA -> "”", 0xBB -> "»", 0xBC -> "…", 0xBD -> "‰",
      0xBF -> "¿",
      0xC1 -> "`", 0xC2 -> "´", 0xC3 -> "ˆ", 0xC4 -> "˜",
      0xC5 -> "¯", 0xC6 -> "˘", 0xC7 -> "˙", 0xC8 -> "¨",
      0xCA -> "˚", 0xCB -> "¸", 0xCD -> "˝", 0xCE -> "˛",
      0xCF -> "ˇ", 0xD0 -> "—",
      0xE1 -> "Æ", 0xE3 -> "ª", 0xE8 -> "Ł", 0xE9 -> "Ø",
      0xEA -> "Œ", 0xEB -> "º",
      0xF1 -> "æ", 0xF5 -> "ı", 0xF8 -> "ł", 0xF9 -> "ø",
      0xFA -> "œ", 0xFB -> "ß")

  /** Predefined encoding by Annex D name. */
  def byName(name: String): Option[Map[Int, String]] = name match {
    case "WinAnsiEncoding" => Some(winAnsi)
    case "MacRomanEncoding" => Some(macRoman)
    case "StandardEncoding" => Some(standard)
    case _ => None
  }

  /** The ASCII glyph names (space … asciitilde) in code order — the
   * /Differences resolver needs name→char for the printable range
   * too. */
  private val asciiNames: Seq[String] = Seq(
    "space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
    "ampersand", "quotesingle", "parenleft", "parenright", "asterisk",
    "plus", "comma", "hyphen", "period", "slash",
    "zero", "one", "two", "three", "four", "five", "six", "seven",
    "eight", "nine", "colon", "semicolon", "less", "equal", "greater",
    "question", "at") ++
    ('A' to 'Z').map(_.toString) ++ Seq(
    "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "grave") ++
    ('a' to 'z').map(_.toString) ++ Seq(
    "braceleft", "bar", "braceright", "asciitilde")

  /** Accented-Latin names composed systematically (Aacute … ydieresis
   * and friends) — the bulk of what real /Differences arrays carry. */
  private val accented: Map[String, String] = {
    val marks = Seq(
      "grave" -> "̀", "acute" -> "́", "circumflex" -> "̂",
      "tilde" -> "̃", "dieresis" -> "̈", "ring" -> "̊",
      "cedilla" -> "̧")
    val out = scala.collection.mutable.Map.empty[String, String]
    for (base <- "AEIOUNCYaeiouncy"; (mn, mark) <- marks) {
      val composed = java.text.Normalizer.normalize(
        base.toString + mark, java.text.Normalizer.Form.NFC)
      // keep only combinations that compose to one precomposed char
      if (composed.length == 1) out(s"$base$mn") = composed
    }
    out.toMap
  }

  /** AGL subset: glyph name → Unicode string, for /Differences.
   * `uniXXXX` names resolve arithmetically in [[glyphToUnicode]]. */
  val glyphUni: Map[String, String] =
    asciiNames.zipWithIndex.map { case (n, i) =>
      n -> (0x20 + i).toChar.toString }.toMap ++ accented ++ Map(
      "quoteright" -> "’", "quoteleft" -> "‘",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "quotesinglbase" -> "‚", "quotedblbase" -> "„",
      "guilsinglleft" -> "‹", "guilsinglright" -> "›",
      "guillemotleft" -> "«", "guillemotright" -> "»",
      "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
      "dagger" -> "†", "daggerdbl" -> "‡",
      "ellipsis" -> "…", "perthousand" -> "‰",
      "fraction" -> "⁄", "florin" -> "ƒ", "Euro" -> "€",
      "trademark" -> "™", "copyright" -> "©",
      "registered" -> "®", "degree" -> "°",
      "periodcentered" -> "·", "section" -> "§",
      "paragraph" -> "¶", "cent" -> "¢", "sterling" -> "£",
      "yen" -> "¥", "currency" -> "¤", "brokenbar" -> "¦",
      "exclamdown" -> "¡", "questiondown" -> "¿",
      "logicalnot" -> "¬", "macron" -> "¯", "mu" -> "µ",
      "plusminus" -> "±", "multiply" -> "×",
      "divide" -> "÷", "onehalf" -> "½",
      "onequarter" -> "¼", "threequarters" -> "¾",
      "onesuperior" -> "¹", "twosuperior" -> "²",
      "threesuperior" -> "³", "ordfeminine" -> "ª",
      "ordmasculine" -> "º", "dotaccent" -> "˙",
      "hungarumlaut" -> "˝", "ogonek" -> "˛",
      "caron" -> "ˇ", "breve" -> "˘",
      "acute" -> "´", "dieresis" -> "¨", "tilde" -> "˜",
      "circumflex" -> "ˆ", "ringabove" -> "˚",
      "AE" -> "Æ", "ae" -> "æ", "OE" -> "Œ",
      "oe" -> "œ", "Oslash" -> "Ø", "oslash" -> "ø",
      "Thorn" -> "Þ", "thorn" -> "þ", "Eth" -> "Ð",
      "eth" -> "ð", "germandbls" -> "ß",
      "Lslash" -> "Ł", "lslash" -> "ł",
      "Scaron" -> "Š", "scaron" -> "š",
      "Zcaron" -> "Ž", "zcaron" -> "ž",
      "Ydieresis" -> "Ÿ", "dotlessi" -> "ı",
      "fi" -> "ﬁ", "fl" -> "ﬂ",
      "nbspace" -> " ", "sfthyphen" -> "­",
      "minus" -> "−", "lozenge" -> "◊",
      "pi" -> "π", "Omega" -> "Ω", "Delta" -> "∆",
      "infinity" -> "∞", "notequal" -> "≠",
      "lessequal" -> "≤", "greaterequal" -> "≥",
      "partialdiff" -> "∂", "summation" -> "∑",
      "product" -> "∏", "integral" -> "∫",
      "radical" -> "√", "approxequal" -> "≈")

  private val uniRe = "uni([0-9A-Fa-f]{4})".r

  /** Resolve one /Differences glyph name: the AGL subset, or the
   * arithmetic `uniXXXX` form. Unknown names claim nothing. */
  def glyphToUnicode(name: String): Option[String] = name match {
    case uniRe(h) => Some(Integer.parseInt(h, 16).toChar.toString)
    case n => glyphUni.get(n)
  }
}
