"""Array-encoded DOM node table: structural invariants + consistency with
the block-level extraction IR."""

from __future__ import annotations

from pdf_extractor_spark.kernel.dom import (
    KIND_ELEMENT,
    KIND_TEXT,
    build_node_table,
    dom_profile,
)
from pdf_extractor_spark.kernel.html_extract import _parse_blocks
from pdf_extractor_spark.synth import synth_row

SEED = 42


def _html_payloads(n):
    return [
        r["html"] for i in range(n) if (r := synth_row(SEED, i))["_kind"] == "html"
    ]


def test_node_table_structural_invariants():
    for raw in _html_payloads(300):
        t = build_node_table(raw)
        n = len(t["kind"])
        assert n >= 1 and t["parent"][0] == -1 and t["depth"][0] == 0
        for i in range(1, n):
            p = t["parent"][i]
            # parents precede children; depth is parent+1 for any node
            assert 0 <= p < i
            assert t["depth"][i] == t["depth"][p] + 1 or t["kind"][i] == KIND_TEXT
        # text offsets index the decoded doc exactly
        doc = t["doc"]
        text_mask = t["kind"] == KIND_TEXT
        for i in text_mask.nonzero()[0]:
            seg = doc[t["text_start"][i] : t["text_end"][i]]
            assert len(seg) > 0
        # element nodes carry no own text span
        for i in (t["kind"] == KIND_ELEMENT).nonzero()[0]:
            assert t["text_end"][i] == t["text_start"][i]


def test_subtree_rollup_is_exact():
    raw = (
        b"<html><body><div><p>four word text here</p>"
        b"<p>two <a href='/x'>anchor words</a></p></div>"
        b"<nav><a href='/y'>chrome link</a></nav></body></html>"
    )
    t = build_node_table(raw)
    # root subtree == sum of all text-node chars
    assert t["subtree_chars"][0] == t["n_chars"][t["kind"] == KIND_TEXT].sum()
    # anchor chars: 'anchorwords' (11) + 'chromelink' (10)
    assert t["subtree_anchor_chars"][0] == 21
    # the <nav> subtree owns exactly the chrome link chars
    import numpy as np

    nav_nodes = (t["in_chrome"]) & (t["kind"] == KIND_TEXT)
    assert t["n_chars"][nav_nodes].sum() == 10


def test_totals_agree_with_block_parser():
    """The node table counts text under EXACTLY the block parser's rules —
    document totals of the two IRs are equal on every fixture page."""
    for raw in _html_payloads(400):
        t = build_node_table(raw)
        blocks = _parse_blocks(raw)
        assert t["subtree_chars"][0] == sum(b.total_chars for b in blocks), raw[:80]


def test_chrome_anchor_counter_sync():
    """Mismatched closes must sync chrome/anchor state with what actually
    left the element stack (round-2 ADVICE): a stray chrome close is a
    no-op, an outer close that swallows an open chrome/anchor element ends
    it, and an anchor wrapping block children survives their closes."""
    import numpy as np

    def text_nodes(t):
        return (t["kind"] == KIND_TEXT).nonzero()[0]

    # stray </nav> with no open counterpart: nothing becomes chrome
    t = build_node_table(b"</nav><p>plain text here</p>")
    assert not t["in_chrome"][text_nodes(t)].any()

    # <div><nav></div>after — the div close implicitly closes the nav
    # (browser behavior), so 'after' is NOT chrome
    t = build_node_table(b"<div><nav></div>after text")
    assert not t["in_chrome"][text_nodes(t)[-1]]

    # <div><a>x</div>y — the anchor dies with its containing div
    t = build_node_table(b"<div><a>x</div>y")
    tn = text_nodes(t)
    assert t["anchor"][tn[0]] and not t["anchor"][tn[-1]]

    # <a><div>x</div>more</a>tail — anchor WRAPS block children
    # (HTML5-legal promo card): survives the inner close, ends at </a>
    t = build_node_table(b"<a><div>x</div>more</a>tail")
    tn = text_nodes(t)
    assert t["anchor"][tn[0]] and t["anchor"][tn[1]] and not t["anchor"][tn[2]]

    # <nav><a>l</a></nav>outside — leaving the chrome subtree ends it
    t = build_node_table(b"<nav><a>l</a></nav>outside text")
    tn = text_nodes(t)
    assert t["in_chrome"][tn[0]] and not t["in_chrome"][tn[-1]]
    assert int(np.sum(t["in_chrome"] & (t["kind"] == KIND_TEXT))) == 1


def test_malformed_never_raises():
    for raw in (
        b"<<<>>><p>&bogus; &amp;</p><b",
        b"<a><a><a>deep</a>",
        b"</div></div>text outside",
        b"\xff\xfe\x00g\x00a\x00r\x00b",
        b"",
    ):
        t = build_node_table(raw)
        assert len(t["kind"]) >= 1


def test_dom_profile_spark_surface(spark):
    from pdf_extractor_spark.synth import pages_df

    pages = pages_df(spark, 150, seed=SEED, num_partitions=2).filter(
        "length(html) > 0"
    )
    prof = dom_profile(pages)
    rows = {r.url: r for r in prof.collect()}
    assert len(rows) >= 100
    sample = next(iter(rows.values()))
    assert sample.n_nodes > 0 and 0.0 <= sample.link_density <= 1.0
    # oracle cross-check for one document
    sr = next(r for i in range(150) if (r := synth_row(SEED, i))["_kind"] == "html")
    t = build_node_table(sr["html"])
    got = rows[sr["url"]]
    assert got.n_nodes == len(t["kind"])
    assert got.n_chars == int(t["subtree_chars"][0])
