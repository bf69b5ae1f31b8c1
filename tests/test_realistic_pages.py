"""Audited acceptance tests on handcrafted realistic pages.

Unlike the synthetic fixtures (goldens by construction), these goldens were
derived by running the extractor and AUDITING the output by hand against
what a reader would call the main content: article body kept; nav, footer,
aside, byline, captions, comment threads, cross-sell links and the
HEADINGS of dropped boilerplate sections all excluded.
"""

from __future__ import annotations

from pdf_extractor_spark.kernel.html_extract import extract_html

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
