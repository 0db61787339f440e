package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** PASCAL-VOC annotation XML parse/render (SURVEY.md S7/S15).
  *
  * The reference parses VOC files with ElementTree (`src/az_proc.py:791-819`,
  * `src/form_calcs.py:863-879`) and writes them back with a hand-built tree
  * (`src/form_calcs.py:552-637`). Here both directions are engine functions:
  * `parseVoc` turns an XML string into a nested array<struct> column (G2 is
  * then a plain `explode`), `renderVoc` is the inverse formatter. Binary
  * file contents arrive via `spark.read.format("binaryFile")` + cast.
  */
object VocXml {

  /** One `<object>` element. */
  case class VocObject(name: String, truncated: Int, difficult: Int,
                       xmin: Int, ymin: Int, xmax: Int, ymax: Int)

  // StAX pull parsing instead of a full scala-xml DOM per row: ~5x less
  // allocation on the hot 60k-row render->parse path, same semantics
  // (missing tags -> ""/0, numeric text parsed via double). The factory is
  // per-thread — XMLInputFactory is not thread-safe, and the UDF runs on
  // every executor thread.
  private val staxFactory = new ThreadLocal[javax.xml.stream.XMLInputFactory] {
    override def initialValue(): javax.xml.stream.XMLInputFactory = {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
      f
    }
  }

  def parseVocString(xml: String): Seq[VocObject] = {
    import javax.xml.stream.XMLStreamConstants._
    val r = staxFactory.get().createXMLStreamReader(new java.io.StringReader(xml))
    val out = scala.collection.mutable.ArrayBuffer.empty[VocObject]
    var inObject = false; var inBndbox = false
    var name = ""; var truncated = 0; var difficult = 0
    var xmin = 0; var ymin = 0; var xmax = 0; var ymax = 0
    def num(s: String): Int = s.trim.toDoubleOption.map(_.toInt).getOrElse(0)
    // consume everything up to the END_ELEMENT matching an already-read
    // START_ELEMENT: real PASCAL-VOC files nest <part>/<actions> subtrees
    // inside <object> with their OWN <name>/<bndbox>, which must not
    // overwrite the object's — ElementTree find() (the reference,
    // az_proc.py:791-819) reads direct children only, and so does this
    def skipSubtree(): Unit = {
      var d = 1
      while (d > 0) r.next() match {
        case START_ELEMENT => d += 1
        case END_ELEMENT => d -= 1
        case _ => ()
      }
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case START_ELEMENT =>
            r.getLocalName match {
              case "object" if !inObject =>
                inObject = true; inBndbox = false
                name = ""; truncated = 0; difficult = 0
                xmin = 0; ymin = 0; xmax = 0; ymax = 0
              case tag if inObject && !inBndbox => tag match {
                // direct children of <object> only
                case "name"      => name = r.getElementText.trim
                case "truncated" => truncated = num(r.getElementText)
                case "difficult" => difficult = num(r.getElementText)
                case "bndbox"    => inBndbox = true
                case _           => skipSubtree() // part/pose/actions/...
              }
              case tag if inObject => tag match {
                // direct children of the object's <bndbox> only
                case "xmin" => xmin = num(r.getElementText)
                case "ymin" => ymin = num(r.getElementText)
                case "xmax" => xmax = num(r.getElementText)
                case "ymax" => ymax = num(r.getElementText)
                case _      => skipSubtree()
              }
              case _ => ()
            }
          case END_ELEMENT =>
            r.getLocalName match {
              case "bndbox" if inBndbox => inBndbox = false
              case "object" if inObject =>
                inObject = false
                out += VocObject(name, truncated, difficult, xmin, ymin, xmax, ymax)
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** Minimal XML text escaping (labels/filenames are controlled vocabulary,
    * but a literal `&`/`<` must never corrupt the document). */
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def renderVocString(filename: String, width: Int, height: Int,
                      objects: Seq[VocObject]): String = {
    val objXml = objects.map { o =>
      s"""  <object>
         |    <name>${esc(o.name)}</name>
         |    <truncated>${o.truncated}</truncated>
         |    <difficult>${o.difficult}</difficult>
         |    <bndbox>
         |      <xmin>${o.xmin}</xmin>
         |      <ymin>${o.ymin}</ymin>
         |      <xmax>${o.xmax}</xmax>
         |      <ymax>${o.ymax}</ymax>
         |    </bndbox>
         |  </object>""".stripMargin
    }.mkString("\n")
    s"""<annotation>
       |  <filename>${esc(filename)}</filename>
       |  <size>
       |    <width>$width</width>
       |    <height>$height</height>
       |    <depth>3</depth>
       |  </size>
       |$objXml
       |</annotation>""".stripMargin
  }

  /** Column form: XML string -> array<struct<name,truncated,difficult,xmin,ymin,xmax,ymax>>. */
  val parseVoc: Column => Column = {
    val f = udf((xml: String) => parseVocString(xml))
    xml => f(xml)
  }

  /** Column form: (filename, width, height, objects) -> XML string. */
  val renderVoc: (Column, Column, Column, Column) => Column = {
    val f = udf((fn: String, w: Int, h: Int, objs: Seq[VocObject]) => renderVocString(fn, w, h, objs))
    (fn, w, h, o) => f(fn, w, h, o)
  }
}
