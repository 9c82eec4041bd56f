package graft.news

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** A from-scratch minimal PDF 1.4 writer — enough surface for the daily
  * report (S13: dags/scripts/spark_daily_report.py:128-271 renders the
  * reference's PDF through matplotlib): text in Korean and Latin, vector
  * bar charts, scatter plots, and ruled tables.
  *
  * Korean text: no Hangul font file ships in this environment, so glyph
  * embedding is impossible. Instead text uses the standard NON-embedded
  * Adobe-Korea1 CID fonts (`HYSMyeongJo-Medium`, `HYGoThic-Medium`) with
  * the `UniKS-UCS2-H` CMap — the classic "Asian font pack" mechanism:
  * the file stays a fully valid PDF and viewers with CJK support (or
  * Acrobat's Korean pack / poppler-data) substitute the glyphs. Text is
  * written as UTF-16BE hex strings, so any Unicode BMP character keeps
  * its identity in the file.
  *
  * Streams are deliberately uncompressed: the artifact stays debuggable
  * and spec-checkable with plain string tools, at a size cost that is
  * irrelevant for a daily report.
  */
object Pdf {

  /** Width heuristic in em: Hangul/CJK are full-width, ASCII roughly
    * half — good enough to right-pad layouts and wrap lines. */
  private def textWidthEm(s: String): Double =
    s.map(c => if (c < 0x2E80) 0.52 else 1.0).sum

  private def hexUtf16(s: String): String =
    s.getBytes(StandardCharsets.UTF_16BE).map("%02X".format(_)).mkString

  /** Locale-independent decimal rendering — the `f` interpolator uses
    * the default locale, and a comma-decimal locale would emit invalid
    * PDF operands. */
  private def num(x: Double, dp: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(x))

  /** One page's content stream builder (origin bottom-left, pt). */
  final class Page(val width: Double = 595, val height: Double = 842) {
    private val ops = new StringBuilder
    private def n1(x: Double) = num(x, 1)
    private def n2(x: Double) = num(x, 2)
    private def n3(x: Double) = num(x, 3)

    /** serif text; `bold = true` switches to the gothic face. */
    def text(x: Double, y: Double, size: Double, s: String,
        bold: Boolean = false): Page = {
      val f = if (bold) "/F2" else "/F1"
      ops ++= s"BT $f ${n1(size)} Tf ${n1(x)} ${n1(y)} Td <${hexUtf16(s)}> Tj ET\n"
      this
    }

    def rect(x: Double, y: Double, w: Double, h: Double,
        rgb: (Double, Double, Double), fill: Boolean = true): Page = {
      val (r, g, b) = rgb
      ops ++= s"${n3(r)} ${n3(g)} ${n3(b)} ${if (fill) "rg" else "RG"} " +
        s"${n1(x)} ${n1(y)} ${n1(w)} ${n1(h)} re ${if (fill) "f" else "S"}\n"
      this
    }

    def line(x1: Double, y1: Double, x2: Double, y2: Double,
        rgb: (Double, Double, Double) = (0, 0, 0)): Page = {
      val (r, g, b) = rgb
      ops ++= s"${n3(r)} ${n3(g)} ${n3(b)} RG ${n1(x1)} ${n1(y1)} m ${n1(x2)} ${n1(y2)} l S\n"
      this
    }

    /** Filled circle via four Bézier quarter-arcs (k = 0.5523·r). */
    def dot(cx: Double, cy: Double, r: Double,
        rgb: (Double, Double, Double)): Page = {
      val k = 0.5523 * r
      val (cr, cg, cb) = rgb
      ops ++= s"${n3(cr)} ${n3(cg)} ${n3(cb)} rg ${n1(cx + r)} ${n1(cy)} m " +
        s"${n2(cx + r)} ${n2(cy + k)} ${n2(cx + k)} ${n2(cy + r)} ${n2(cx)} ${n2(cy + r)} c " +
        s"${n2(cx - k)} ${n2(cy + r)} ${n2(cx - r)} ${n2(cy + k)} ${n2(cx - r)} ${n2(cy)} c " +
        s"${n2(cx - r)} ${n2(cy - k)} ${n2(cx - k)} ${n2(cy - r)} ${n2(cx)} ${n2(cy - r)} c " +
        s"${n2(cx + k)} ${n2(cy - r)} ${n2(cx + r)} ${n2(cy - k)} ${n2(cx + r)} ${n2(cy)} c f\n"
      this
    }

    private[Pdf] def stream: Array[Byte] =
      ops.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** matplotlib tab10, the reference's chart palette. */
  val Tab10: IndexedSeq[(Double, Double, Double)] = IndexedSeq(
    (0.122, 0.467, 0.706), (1.0, 0.498, 0.055), (0.173, 0.627, 0.173),
    (0.839, 0.153, 0.157), (0.580, 0.404, 0.741), (0.549, 0.337, 0.294),
    (0.890, 0.467, 0.761), (0.498, 0.498, 0.498), (0.737, 0.741, 0.133),
    (0.090, 0.745, 0.812))

  /** Vertical bar chart with per-bar tab10 colors and value labels. */
  def barChart(p: Page, x0: Double, y0: Double, w: Double, h: Double,
      title: String, items: Seq[(String, Long)]): Page = {
    p.text(x0, y0 + h + 24, 14, title, bold = true)
    p.rect(x0, y0, w, h, (0.97, 0.97, 0.97))
    if (items.nonEmpty) {
      val maxV = math.max(1L, items.map(_._2).max)
      val bw = w / items.size
      items.zipWithIndex.foreach { case ((label, v), i) =>
        val bh = h * v.toDouble / maxV
        val bx = x0 + i * bw
        p.rect(bx + bw * 0.12, y0, bw * 0.76, bh, Tab10(i % Tab10.size))
        p.text(bx + bw * 0.5 - textWidthEm(v.toString) * 4, y0 + bh + 3, 8, v.toString)
        val lbl = if (label.length > 6) label.take(6) else label
        p.text(bx + bw * 0.5 - textWidthEm(lbl) * 3.5, y0 - 12, 7, lbl)
      }
    } else p.text(x0 + w / 2 - 80, y0 + h / 2, 12, "해당 날짜에 대한 데이터가 없습니다.")
    p.line(x0, y0, x0 + w, y0)
    p
  }

  /** Assemble pages into a complete PDF byte stream (xref included). */
  def document(pages: Seq[Page]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def write(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def obj(body: String): Int = {
      offsets += out.size()
      val id = offsets.size
      write(s"$id 0 obj\n$body\nendobj\n")
      id
    }
    write("%PDF-1.4\n%âãÏÓ\n")
    // Id allocation order: font descriptor/CID/Type0 triples first,
    // then content streams, page objects, the page tree, and the
    // catalog LAST — pages reference the tree via the computed
    // `pageTreeId` (asserted below), not a reserved low id.
    val nPages = pages.size
    // Font objects first so ids are known: F1 serif, F2 gothic. Each is
    // a Type0 wrapper + CIDFontType2 descendant + descriptor.
    def cidFont(base: String): String = {
      val desc = obj(s"<< /Type /FontDescriptor /FontName /$base /Flags 4 " +
        "/FontBBox [0 -148 1001 880] /ItalicAngle 0 /Ascent 880 " +
        "/Descent -148 /CapHeight 880 /StemV 90 >>")
      val cid = obj(s"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /$base " +
        s"/CIDSystemInfo << /Registry (Adobe) /Ordering (Korea1) /Supplement 2 >> " +
        s"/FontDescriptor $desc 0 R /DW 1000 /W [ 1 95 500 ] >>")
      s"<< /Type /Font /Subtype /Type0 /BaseFont /$base-UniKS-UCS2-H " +
        s"/Encoding /UniKS-UCS2-H /DescendantFonts [ $cid 0 R ] >>"
    }
    val f1 = obj(cidFont("HYSMyeongJo-Medium"))
    val f2 = obj(cidFont("HYGoThic-Medium"))
    val contentIds = pages.map { p =>
      val s = p.stream
      offsets += out.size()
      val id = offsets.size
      write(s"$id 0 obj\n<< /Length ${s.length} >>\nstream\n")
      out.write(s)
      write("\nendstream\nendobj\n")
      id
    }
    val pageTreeId = offsets.size + nPages + 1 // page objs next, then tree
    val pageIds = pages.zip(contentIds).map { case (p, cid) =>
      obj(s"<< /Type /Page /Parent $pageTreeId 0 R " +
        s"/MediaBox [0 0 ${num(p.width, 0)} ${num(p.height, 0)}] " +
        s"/Resources << /Font << /F1 $f1 0 R /F2 $f2 0 R >> >> " +
        s"/Contents $cid 0 R >>")
    }
    val treeId = obj(s"<< /Type /Pages /Kids [ ${pageIds.map(i => s"$i 0 R").mkString(" ")} ] " +
      s"/Count $nPages >>")
    assert(treeId == pageTreeId, s"page tree id drift: $treeId != $pageTreeId")
    val catalogId = obj(s"<< /Type /Catalog /Pages $treeId 0 R >>")
    val xrefPos = out.size()
    write(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => write(f"$o%010d 00000 n \n"))
    write(s"trailer\n<< /Size ${offsets.size + 1} /Root $catalogId 0 R >>\n" +
      s"startxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
