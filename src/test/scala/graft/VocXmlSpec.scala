package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VocXml
import graft.sources.VocXml.VocObject

class VocXmlSpec extends AnyFunSuite {

  private val objs = Seq(
    VocObject("closed_roof_tank", 0, 1, 10, 20, 110, 140),
    VocObject("water_tower", 1, 0, 300, 310, 360, 390))

  test("render -> parse is the identity") {
    val xml = VocXml.renderVocString("tile_01_02.jpg", 512, 512, objs)
    assert(VocXml.parseVocString(xml) == objs)
  }

  test("parses a reference-shaped VOC file with extra metadata tags") {
    // shape as written by the reference's tile XML writer
    // (ref src/form_calcs.py:552-637): extra tags are ignored, floats in
    // bbox coords are tolerated (ref stores some as '12.0')
    val xml =
      """<annotation>
        |  <folder>chips_positive</folder>
        |  <filename>m_4109049_ne_15_060_20210906_18_13.jpg</filename>
        |  <source><database>Unknown</database></source>
        |  <size><width>512</width><height>512</height><depth>3</depth></size>
        |  <segmented>0</segmented>
        |  <object>
        |    <name>narrow_closed_roof_tank</name>
        |    <pose>Unspecified</pose>
        |    <truncated>1</truncated>
        |    <difficult>0</difficult>
        |    <bndbox>
        |      <xmin>12.0</xmin><ymin>0</ymin><xmax>51</xmax><ymax>38.0</ymax>
        |    </bndbox>
        |  </object>
        |</annotation>""".stripMargin
    val parsed = VocXml.parseVocString(xml)
    assert(parsed == Seq(VocObject("narrow_closed_roof_tank", 1, 0, 12, 0, 51, 38)))
  }

  test("file with no objects parses to empty (negative chip)") {
    val xml = VocXml.renderVocString("neg.jpg", 512, 512, Seq.empty)
    assert(VocXml.parseVocString(xml).isEmpty)
  }

  test("special characters in labels survive the round trip") {
    val odd = Seq(VocObject("tank & <vessel>", 0, 0, 1, 2, 3, 4))
    val xml = VocXml.renderVocString("a&b.jpg", 512, 512, odd)
    assert(VocXml.parseVocString(xml) == odd)
  }

  test("missing flags default to 0") {
    val xml =
      """<annotation><object><name>water_tower</name>
        |<bndbox><xmin>1</xmin><ymin>2</ymin><xmax>3</xmax><ymax>4</ymax></bndbox>
        |</object></annotation>""".stripMargin
    assert(VocXml.parseVocString(xml) == Seq(VocObject("water_tower", 0, 0, 1, 2, 3, 4)))
  }

  test("nested <part> subtrees do not overwrite the object's name or bndbox") {
    // genuine PASCAL-VOC shape: person objects carry <part> children with
    // their own <name> and <bndbox>; ElementTree find() reads direct
    // children only, and so must the pull parser
    val xml =
      """<annotation><object><name>person</name><pose>Left</pose>
        |<truncated>1</truncated><difficult>0</difficult>
        |<bndbox><xmin>10</xmin><ymin>20</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>
        |<part><name>head</name>
        |  <bndbox><xmin>1</xmin><ymin>2</ymin><xmax>3</xmax><ymax>4</ymax></bndbox></part>
        |<part><name>hand</name>
        |  <bndbox><xmin>5</xmin><ymin>6</ymin><xmax>7</xmax><ymax>8</ymax></bndbox></part>
        |<actions><jumping>0</jumping></actions>
        |</object><object><name>tank</name>
        |<bndbox><xmin>100</xmin><ymin>200</ymin><xmax>300</xmax><ymax>400</ymax></bndbox>
        |</object></annotation>""".stripMargin
    assert(VocXml.parseVocString(xml) == Seq(
      VocObject("person", 1, 0, 10, 20, 30, 40),
      VocObject("tank", 0, 0, 100, 200, 300, 400)))
  }
}
