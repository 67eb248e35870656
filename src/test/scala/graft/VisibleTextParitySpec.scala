package graft

import org.apache.spark.sql.functions._
import graft.ops.WebText

/** Parity gate for the native visible-text kernel
  * ([[graft.functions.VisibleTextExpr]]) against the original
  * regexp_replace chain ([[WebText.visibleTextRegex]]) — the chain is
  * what every oracle splices into DuckDB SQL, so the kernel must be
  * BIT-IDENTICAL on every input, including the regex chain's own edge
  * semantics (unterminated spans, interleaved script/style, pathological
  * entity runs). */
class VisibleTextParitySpec extends SparkSpec {
  import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}

  private def assertParity(inputs: Seq[String]): Unit = {
    val diff = inputs.map(Tuple1(_)).toDF("h")
      .select(col("h"),
        WebText.visibleText(col("h")).as("native"),
        WebText.visibleTextRegex(col("h")).as("regex"))
      .filter(col("native") =!= col("regex"))
      .collect()
    assert(diff.isEmpty, "kernel/regex divergence on: " +
      diff.take(3).map(r => s"[${r.getString(0)}] native=[${r.getString(1)}]" +
        s" regex=[${r.getString(2)}]").mkString(" | "))
  }

  test("visible-text kernel == regex chain on the hand-built edge battery") {
    assertParity(Seq(
      "", " ", "plain text", "a  b\t\nc",
      // tags, nested, unterminated, empty, attribute '>' quirks
      "<p>a</p><div class='x'>b</div>", "a<b", "a<b>c", "<>", "a<>b",
      "x< y > z", "<p", "trailing<", "<<p>>", "a<p><q>b",
      // script/style: plain, case, attributes, unterminated, decoy names
      "<script>var a=1;</script>ok", "<SCRIPT>x</sCrIpT>ok",
      "<script src='u'>x</script>ok", "<script>no closer ok",
      "<scriptfoo>weird</script>ok", "<script>a<p>b</script>c",
      "<style>p{}</style>t", "<style>unterminated",
      // the pass-order case: script pass runs over the whole doc FIRST
      "<style>a<script>b</style>c</script>d",
      "<script>a<style>b</script>c</style>d",
      // comments: plain, multiline, unterminated, tight terminators
      "a<!-- c -->b", "a<!--\nmulti\nline-->b", "a<!--unterminated",
      "<!---->x", "<!----->x", "a<!-- <script>y</script> -->b",
      "<script><!--</script>-->tail",
      // entities: all six, doubles, overlaps, bare '&', unknown entity
      "&nbsp;&lt;&gt;&quot;&#39;&amp;", "&amp;lt;", "&amp;amp;lt;",
      "a&b", "&unknown;", "&lt&nbsp;;", "&", "&&amp;&",
      // whitespace classes and edges
      "\t a  b \f c \r\n d ", "   ", "\r\n",
      // non-ASCII passthrough (case folding must stay ASCII-only)
      "café <p>中文</p> Über",
      // a realistic page
      "<html><head><title>T</title><style>p{}</style></head><body>" +
        "<div id=nav><a href='/'>Home</a></div><p>Body &amp; soul</p>" +
        "<script>track()</script><!-- f --></body></html>"))
  }

  test("visible-text kernel == regex chain on seeded fuzz inputs") {
    val frags = Array(
      "a", " b ", "<p>", "</p>", "<script>", "</script>", "<style>",
      "</style>", "<!--", "-->", "&amp;", "&lt;", "&nbsp;", "&", ";",
      "<", ">", "text", "\t", "\n", "x=1", "'", "\"", "<scriptx>",
      "</scripty>", "café", "<SCRIPT>", "</Script>", "<!-", "--",
      "<a href='u'>", "</a>", "  ", "<div", "class='c'>", "&#39;")
    val rnd = new scala.util.Random(20260816L)
    val inputs = (1 to 400).map { _ =>
      val n = 1 + rnd.nextInt(24)
      (1 to n).map(_ => frags(rnd.nextInt(frags.length))).mkString
    }
    assertParity(inputs)
  }
}
