"""Audited acceptance tests on handcrafted realistic pages.

Unlike the synthetic fixtures (goldens by construction), these goldens were
derived by running the extractor and AUDITING the output by hand against
what a reader would call the main content: article body kept; nav, footer,
aside, byline, captions, comment threads, cross-sell links and the
HEADINGS of dropped boilerplate sections all excluded.
"""

from __future__ import annotations

import zlib

from pdf_extractor_spark.kernel.html_extract import extract_html
from pdf_extractor_spark.kernel.pdf_extract import extract_pdf

NEWS = b"""<!DOCTYPE html><html><head><title>Quarterly results beat expectations</title>
<meta charset="utf-8"><script src="/a.js"></script><style>.x{color:red}</style></head>
<body>
<header><div class="logo">The Daily Ledger</div>
<nav><ul><li><a href="/">Home</a></li><li><a href="/biz">Business</a></li><li><a href="/tech">Tech</a></li><li><a href="/sport">Sport</a></li></ul></nav></header>
<main><article>
<h1>Quarterly results beat expectations as revenue climbs</h1>
<p class="byline">By A. Reporter | March 4, 2024</p>
<p>The company reported quarterly revenue of $2.4 billion on Tuesday, comfortably ahead of analyst estimates, driven by strong demand in its cloud division.</p>
<figure><img src="/chart.png"><figcaption>Revenue by segment, Q1</figcaption></figure>
<p>Operating margin expanded to 31 percent, and management raised full-year guidance citing a robust order backlog and easing component costs.</p>
<div class="related"><h3>Related stories</h3><ul>
<li><a href="/s1">Rival cuts forecast</a></li><li><a href="/s2">Cloud wars heat up</a></li><li><a href="/s3">Chip costs fall</a></li></ul></div>
<p>Shares rose 6 percent in after-hours trading following the announcement.</p>
</article></main>
<aside><h4>Newsletter</h4><p>Sign up for our daily brief</p><form><input name="e"><button>Go</button></form></aside>
<footer><p>&copy; 2024 The Daily Ledger</p><ul><li><a href="/about">About</a></li><li><a href="/privacy">Privacy</a></li></ul></footer>
</body></html>"""

NEWS_EXPECTED = "\n".join([
    "Quarterly results beat expectations as revenue climbs",
    "The company reported quarterly revenue of $2.4 billion on Tuesday, comfortably ahead of analyst estimates, driven by strong demand in its cloud division.",
    "Operating margin expanded to 31 percent, and management raised full-year guidance citing a robust order backlog and easing component costs.",
    "Shares rose 6 percent in after-hours trading following the announcement.",
])

BLOG = b"""<html><head><meta charset="iso-8859-1"><title>On writing parsers</title></head><body>
<nav class="top"><a href="/">blog</a> &middot; <a href="/archive">archive</a> &middot; <a href="/about">about</a></nav>
<div id="content">
<h1>On writing parsers by hand</h1>
<p>Every few years I rewrite the same lesson: a hand-rolled recursive descent parser is almost always simpler than the grammar generator it replaces \x96 and far easier to debug.</p>
<p>The trick is to commit to a single canonical representation early, and to treat malformed input as data rather than as an exception path.</p>
<pre>def parse(tokens):
    return expr(tokens, 0)</pre>
<p>That's the whole core. Everything else is error recovery.</p>
</div>
<div class="comments"><h3>Comments</h3>
<div class="c"><a href="/u/1">jdoe</a> says: nice post</div>
<div class="c"><a href="/u/2">asmith</a> says: +1</div></div>
<footer><a href="/rss">rss</a> <a href="/license">license</a></footer>
</body></html>"""

BLOG_EXPECTED = "\n".join([
    "On writing parsers by hand",
    # \x96 under the WHATWG iso-8859-1→cp1252 rule is an en dash
    "Every few years I rewrite the same lesson: a hand-rolled recursive descent parser is almost always simpler than the grammar generator it replaces – and far easier to debug.",
    "The trick is to commit to a single canonical representation early, and to treat malformed input as data rather than as an exception path.",
    "def parse(tokens): return expr(tokens, 0)",
    "That's the whole core. Everything else is error recovery.",
])

PRODUCT = b"""<html><head><meta charset="utf-8"><title>UltraWidget 3000</title></head><body>
<header><nav><a href="/">Shop</a><a href="/cart">Cart (0)</a><a href="/account">Account</a></nav></header>
<main>
<h1>UltraWidget 3000 \xe2\x80\x94 Professional Grade</h1>
<p>The UltraWidget 3000 combines a machined aluminium body with a brushless drive, delivering twice the torque of its predecessor at half the noise level.</p>
<ul><li>Brushless motor rated for 10,000 hours of continuous duty</li><li>Tool-free chuck with automatic centering and locking</li><li>Two-year warranty with free lifetime calibration included</li></ul>
<p>Ships in recyclable packaging. Compatible with all standard 12mm accessories sold separately by any manufacturer worldwide.</p>
</main>
<div class="cross-sell"><h4>Customers also bought</h4>
<a href="/p/1">MiniWidget</a> <a href="/p/2">WidgetCase</a> <a href="/p/3">WidgetOil</a> <a href="/p/4">MegaWidget</a></div>
<footer><a href="/terms">Terms</a><a href="/returns">Returns</a><a href="/contact">Contact</a></footer>
</body></html>"""

PRODUCT_EXPECTED = "\n".join([
    "UltraWidget 3000 — Professional Grade",
    "The UltraWidget 3000 combines a machined aluminium body with a brushless drive, delivering twice the torque of its predecessor at half the noise level.",
    "Brushless motor rated for 10,000 hours of continuous duty",
    "Tool-free chuck with automatic centering and locking",
    "Two-year warranty with free lifetime calibration included",
    "Ships in recyclable packaging. Compatible with all standard 12mm accessories sold separately by any manufacturer worldwide.",
])


def test_news_article():
    text, spans = extract_html(NEWS)
    assert text == NEWS_EXPECTED
    assert len(spans) == 4


def test_blog_post_cp1252():
    text, _ = extract_html(BLOG)
    assert text == BLOG_EXPECTED


def test_product_page():
    text, _ = extract_html(PRODUCT)
    assert text == PRODUCT_EXPECTED


def test_boilerplate_section_headings_dropped():
    for payload, banned in (
        (NEWS, ["Related stories", "Newsletter", "Home", "About", "Revenue by segment"]),
        (BLOG, ["Comments", "jdoe", "rss", "archive"]),
        (PRODUCT, ["Customers also bought", "MiniWidget", "Cart", "Terms"]),
    ):
        text, _ = extract_html(payload)
        for phrase in banned:
            assert phrase not in text, phrase


def test_pdflatex_shaped_document():
    """A document with the full real-world skeleton — version header with
    binary comment line, Catalog/Pages/Page objects with /MediaBox and
    /Resources font dicts, compressed content stream using Td/TL/TJ/' and
    hex strings, xref table and trailer — parses to the text a reader sees.
    (pdflatex/ghostscript output shape; audited golden.)"""
    content = (
        b"BT\n"
        b"/F15 10.909 Tf 148.712 657.846 Td\n"
        b"[(Intro)-21(duction)-378(to)-378(distributed)-378"
        b"(extraction)]TJ\n"
        b"0 -21.818 TD\n"
        b"[(Pip)28(elines)-333(scale)-333(when)-333(shu)-13(\\262e)-333"
        b"(is)-333(explicit.)]TJ\n"
        b"14.102 TL\n"
        b"<486578206C696E6520686572652E> '\n"
        b"ET\n"
    )
    z = zlib.compress(content)
    pdf = (
        b"%PDF-1.5\n%\xd0\xd4\xc5\xd8\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]\n"
        b"   /Resources << /Font << /F15 5 0 R >> /ProcSet [/PDF /Text] >>\n"
        b"   /Contents 4 0 R >>\nendobj\n"
        + (b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z))
        + z
        + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /CMR10 >>\nendobj\n"
        b"xref\n0 6\n0000000000 65535 f \n0000000015 00000 n \n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n9\n%%EOF\n"
    )
    text, spans = extract_pdf(pdf)
    # TJ small kerns join chunks, large kerns are word gaps; ' shows the
    # hex line one leading below; \262 octal decodes via latin-1
    assert text == (
        "Introduction to distributed extraction\n"
        "Pipelines scale when shu\xb2e is explicit.\n"
        "Hex line here."
    )
    assert [s["page"] for s in spans] == [0, 0, 0]


def test_multifont_text_objects_and_negative_coords():
    """Two text objects per page, font switches mid-object, negative Td
    moves — line regrouping must still be by rounded y."""
    pdf = (
        b"%PDF-1.4\n"
        b"stream\n"
        b"BT /F1 12 Tf 1 0 0 1 300 700 Tm (right half) Tj ET\n"
        b"BT /F2 9 Tf 1 0 0 1 72 700 Tm (left half) Tj "
        b"/F1 14 Tf 1 0 0 1 72 650.4 Tm (second line) Tj ET\n"
        b"endstream\n%%EOF\n"
    )
    text, spans = extract_pdf(pdf)
    assert text == "left half right half\nsecond line"
    assert spans[0]["bbox"][1] == 700.0
    # font size carried per-run: 9pt for 'left half', 12 for 'right half'
    assert spans[1]["bbox"][3] - spans[1]["bbox"][1] == 12.0
