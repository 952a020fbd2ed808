package graft.functions

/** Driver-side string utilities from the reference's notification path —
  * pure functions, no data-path involvement (they format email bodies):
  *  - HTML-entity encoding of accented letters (encode_html.py:6-20)
  *  - vocative first-name list from emails (string_formatting.py:44-63)
  */
object StringUtils {

  // Accented letter -> HTML5 entity (the letters category subset the
  // reference iterates from html.entities.html5, most-common Portuguese
  // set spelled out explicitly here).
  private val Entities: Seq[(Char, String)] = Seq(
    'á' -> "aacute", 'à' -> "agrave", 'â' -> "acirc", 'ã' -> "atilde",
    'ä' -> "auml", 'é' -> "eacute", 'è' -> "egrave", 'ê' -> "ecirc",
    'ë' -> "euml", 'í' -> "iacute", 'ì' -> "igrave", 'î' -> "icirc",
    'ï' -> "iuml", 'ó' -> "oacute", 'ò' -> "ograve", 'ô' -> "ocirc",
    'õ' -> "otilde", 'ö' -> "ouml", 'ú' -> "uacute", 'ù' -> "ugrave",
    'û' -> "ucirc", 'ü' -> "uuml", 'ç' -> "ccedil", 'ñ' -> "ntilde",
    'Á' -> "Aacute", 'À' -> "Agrave", 'Â' -> "Acirc", 'Ã' -> "Atilde",
    'É' -> "Eacute", 'Ê' -> "Ecirc", 'Í' -> "Iacute", 'Ó' -> "Oacute",
    'Ô' -> "Ocirc", 'Õ' -> "Otilde", 'Ú' -> "Uacute", 'Ç' -> "Ccedil",
    '§' -> "sect", 'ª' -> "ordf", '°' -> "deg", 'º' -> "ordm")

  def htmlEncode(text: String): String =
    Entities.foldLeft(text) { case (t, (c, e)) =>
      t.replace(c.toString, s"&$e;")
    }

  /** "Fulano, Sicrano e Beltrano" from name.lastname@host emails.
    * The local part is isolated before splitting on '.' so dotless local
    * parts ("ana@example.com") don't leak the domain into the name. */
  def vocativeNames(emails: Seq[String]): String = {
    val names = emails.map(
      _.split("@")(0).split("\\.")(0).toLowerCase.capitalize)
    names match {
      case Seq(only) => only
      case init :+ last => init.mkString(", ") + " e " + last
      case _ => ""
    }
  }
}
