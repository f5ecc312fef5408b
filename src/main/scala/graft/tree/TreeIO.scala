package graft.tree

import java.nio.file.{Files, Paths}

/** Tree-model persistence (SURVEY §2.1 S3 — the reference joblib-dumps its
  * model package). Self-contained JSON, no library dependencies.
  */
object TreeIO {

  private def nodeJson(n: TreeNode): String = n match {
    case TreeLeaf(label, cnt, counts) =>
      s"""{"leaf":{"label":$label,"n":$cnt,"counts":[${counts.mkString(",")}]}}"""
    case TreeSplit(f, t, l, r) =>
      s"""{"split":{"feature":"$f","threshold":$t,""" +
        s""""left":${nodeJson(l)},"right":${nodeJson(r)}}}"""
  }

  def toJson(m: TreeModel): String =
    s"""{"features":[${m.features.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""labels":[${m.labels.mkString(",")}],""" +
      s""""maxDepth":${m.params.maxDepth},""" +
      s""""criterion":"${m.params.criterion}",""" +
      s""""root":${nodeJson(m.root)}}"""

  def save(m: TreeModel, path: String): Unit =
    Files.writeString(Paths.get(path), toJson(m))

  // --- minimal recursive-descent parser (no deps) ---
  private final class P(val s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); require(s(i) == c, s"at $i: want $c got ${s(i)}"); i += 1 }
    def str(): String = {
      expect('"'); val b = new StringBuilder
      while (s(i) != '"') { b += s(i); i += 1 }
      i += 1; b.result()
    }
    def num(): Double = {
      ws(); val st = i
      while (i < s.length && "+-.eE0123456789".contains(s(i))) i += 1
      s.substring(st, i).toDouble
    }
    def key(): String = { ws(); val k = str(); expect(':'); k }
  }

  private def parseNode(p: P): TreeNode = {
    p.expect('{')
    val k = p.key()
    p.expect('{')
    val n = k match {
      case "leaf" =>
        var label = 0L; var cnt = 0L; var counts = Seq.empty[Long]
        var more = true
        while (more) {
          p.key() match {
            case "label" => label = p.num().toLong
            case "n"     => cnt = p.num().toLong
            case "counts" =>
              p.expect('[')
              val b = Seq.newBuilder[Long]
              p.ws()
              if (p.s(p.i) != ']') {
                b += p.num().toLong
                while ({ p.ws(); p.s(p.i) == ',' }) { p.i += 1; b += p.num().toLong }
              }
              p.expect(']')
              counts = b.result()
          }
          p.ws()
          if (p.s(p.i) == ',') p.i += 1 else more = false
        }
        TreeLeaf(label, cnt, counts)
      case "split" =>
        var f = ""; var t = 0.0
        var l: TreeNode = null; var r: TreeNode = null
        var more = true
        while (more) {
          p.key() match {
            case "feature"   => f = p.str()
            case "threshold" => t = p.num()
            case "left"      => l = parseNode(p)
            case "right"     => r = parseNode(p)
          }
          p.ws()
          if (p.s(p.i) == ',') p.i += 1 else more = false
        }
        TreeSplit(f, t, l, r)
    }
    p.expect('}')
    p.expect('}')
    n
  }

  def fromJson(json: String): TreeModel = {
    val p = new P(json)
    p.expect('{')
    var features = Seq.empty[String]; var labels = Seq.empty[Long]
    var maxDepth = 5; var criterion = "entropy"; var root: TreeNode = null
    var more = true
    while (more) {
      p.key() match {
        case "features" =>
          p.expect('[')
          val b = Seq.newBuilder[String]
          p.ws()
          if (p.s(p.i) != ']') {
            b += p.str()
            while ({ p.ws(); p.s(p.i) == ',' }) { p.i += 1; p.ws(); b += p.str() }
          }
          p.expect(']'); features = b.result()
        case "labels" =>
          p.expect('[')
          val b = Seq.newBuilder[Long]
          p.ws()
          if (p.s(p.i) != ']') {
            b += p.num().toLong
            while ({ p.ws(); p.s(p.i) == ',' }) { p.i += 1; b += p.num().toLong }
          }
          p.expect(']'); labels = b.result()
        case "maxDepth"  => maxDepth = p.num().toInt
        case "criterion" => criterion = p.str()
        case "root"      => root = parseNode(p)
      }
      p.ws()
      if (p.s(p.i) == ',') p.i += 1 else more = false
    }
    TreeModel(root, features, labels,
      TreeParams(maxDepth = maxDepth, criterion = criterion))
  }

  def load(path: String): TreeModel =
    fromJson(Files.readString(Paths.get(path)))
}
