"""Generate tests/goldens/: HTML byte fixtures + frozen expected text.

Run once (python tests/make_goldens.py) to (re)freeze. The frozen .txt
bytes are the extraction oracle (SURVEY §5.1) — if /root/reference ever
mounts, regenerate from the reference's husker/cleaner instead.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sparkcrawl.extract import extract_text, extract_links

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

CASES = {
    "minimal": b"<html><body><p>Hello world</p></body></html>",
    "deep_nesting": b"<div><div><div><span>a<b>b</b>c</span></div><p>d</p></div>e</div>",
    "script_style_comment": (b"<head><style>p{x:1}</style><script>var a='<p>fake</p>';"
                             b"</script></head><body><!-- no --><p>real</p>"
                             b"<noscript>hidden</noscript></body>"),
    "entities": "<p>fish &amp; chips &lt;tag&gt; caf&eacute; &#8364;9 &euro; &nbsp;end</p>".encode(),
    "whitespace_collapse": b"<p>  a\t\t b\n\n   c  </p><p>   </p><div> d </div>",
    "block_vs_inline": (b"<h1>Title</h1>inline <b>bold</b> and <i>italic</i> run"
                        b"<ul><li>one</li><li>two</li></ul>after<br>line2<hr>line3"),
    "bad_utf8": b"<p>caf\xe9 latin-1 byte</p><p>ok</p>",
    "truncated": b"<html><body><p>cut off mid <a href='http://x.example/l",
    "empty": b"",
    "attr_only_links": (b'<a href="http://a.example/1">one</a>'
                        b'<a href="/rel">rel</a><a name="x">no href</a>'
                        b'<a href="http://a.example/1">dup</a>'),
    "nested_table": (b"<table><tr><td>r1c1</td><td>r1c2</td></tr>"
                     b"<tr><td>r2c1</td><td><table><tr><td>inner</td></tr></table>"
                     b"</td></tr></table>"),
    "pre_and_title": b"<title>The Title</title><pre>  spaced   text </pre>tail",
    "malformed": b"<div><b>unclosed bold <i>and italic</div><p>next</b></i> para",
    "unicode": "<p>日本語テキスト schön déjà vu — em—dash</p>".encode("utf-8"),
    "selfclosing": b'<p>a</p><img src="x.png"/><p>b</p><br/><input value="v">c',
    # charset-sniff cases (frozen spec step 1a-1d)
    "charset_latin1_meta":
        '<meta charset="iso-8859-1"><p>café crème — naïve</p>'
        .encode("windows-1252"),
    "charset_gbk_meta":
        ('<meta http-equiv="Content-Type" content="text/html; '
         'charset=gb2312"><p>中文网页内容</p>').encode("gbk"),
    "charset_sjis_meta":
        "<meta charset=shift_jis><p>日本語のページ</p>".encode("shift_jis"),
    "charset_utf16_bom": "<p>utf-16 content é€</p>".encode("utf-16"),
    "charset_utf8_bom": b"\xef\xbb\xbf<p>bom page</p>",
    "charset_unknown_label":
        '<meta charset="klingon-9"><p>fallback utf8 é</p>'.encode("utf-8"),
}

os.makedirs(HERE, exist_ok=True)
for name, html in CASES.items():
    with open(os.path.join(HERE, f"{name}.html"), "wb") as f:
        f.write(html)
    text = extract_text(html)
    with open(os.path.join(HERE, f"{name}.txt"), "wb") as f:
        f.write(text.encode("utf-8"))
    links = extract_links(html)
    with open(os.path.join(HERE, f"{name}.links"), "w") as f:
        f.write("\n".join(links))
print("wrote", len(CASES), "cases to", HERE)
