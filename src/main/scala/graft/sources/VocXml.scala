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

  def parseVocString(xml: String): Seq[VocObject] = {
    val root = scala.xml.XML.loadString(xml)
    (root \ "object").map { o =>
      def txt(tag: String): String = (o \ tag).text.trim
      def num(tag: String): Int = txt(tag).toDoubleOption.map(_.toInt).getOrElse(0)
      val bb = o \ "bndbox"
      def bnum(tag: String): Int = (bb \ tag).text.trim.toDoubleOption.map(_.toInt).getOrElse(0)
      VocObject(txt("name"), num("truncated"), num("difficult"),
        bnum("xmin"), bnum("ymin"), bnum("xmax"), bnum("ymax"))
    }
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
