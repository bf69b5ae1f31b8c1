"""Array-encoded DOM node table: the analysis IR named by the north star.

The extraction classifier (html_extract.py) works on a flat BLOCK list —
the right granularity for Boilerpipe-style density decisions. This module
builds the finer-grained structure the north star describes — "a
lightweight DOM tree (array-encoded node table: tag-id, parent-idx,
text-offset spans)" — from the SAME tokenizer pass, for DOM analytics and
debugging: per-node parent/depth, text spans as offsets into the decoded
document, and bottom-up subtree char/anchor-char aggregation giving
per-subtree link density.

Everything is flat numpy arrays (structure-of-arrays, no per-node objects)
so whole-document aggregations are vectorized; the one inherently
sequential pass (child→parent subtree rollup) is a single reverse
O(n_nodes) loop over int arrays.

Consistency contract (tests/test_dom.py): the node table counts text with
EXACTLY the block parser's rules (entity unescape, NBSP normalization,
non-whitespace char counting), so the document-level totals of both IRs
agree on every input — the node table is a faithful refinement, not a
second opinion.
"""

from __future__ import annotations

import html as _htmlmod

import numpy as np

from pdf_extractor_spark.kernel.html_extract import (
    CHROME_TAGS,
    RAW_TEXT_TAGS,
    VOID_TAGS,
    _RAW_CLOSE_RES,
    _TOKEN_RE_S,
    sniff_encoding,
)

KIND_ELEMENT = 0
KIND_TEXT = 1

# interned tag vocabulary: stable ids for the tags the engine reasons about;
# anything else maps to OTHER_TAG_ID (crawl HTML has unbounded tag spellings)
TAG_VOCAB = {
    t: i
    for i, t in enumerate(
        (
            "#document #text a p div span article section main body html head "
            "h1 h2 h3 h4 h5 h6 li ul ol td th tr table dd dt pre blockquote "
            "figure figcaption br hr nav footer header aside form menu iframe "
            "select option button title img em strong b i u code"
        ).split()
    )
}
OTHER_TAG_ID = len(TAG_VOCAB)


def _count_text(txt: str) -> int:
    """Non-whitespace char count under the block parser's exact rules."""
    if "&" in txt:
        txt = _htmlmod.unescape(txt)
    if "\xa0" in txt:
        txt = txt.replace("\xa0", " ")
    if txt.isascii():
        return (
            len(txt) - txt.count(" ") - txt.count("\n") - txt.count("\t")
            - txt.count("\r") - txt.count("\x0c") - txt.count("\x0b")
        )
    return sum(map(len, txt.split()))


def build_node_table(raw: bytes) -> dict:
    """Decode + tokenize one document into the array-encoded node table.

    Returns a dict of equally-sized numpy arrays (index = node id):
      kind        int8   KIND_ELEMENT | KIND_TEXT
      tag_id      int16  TAG_VOCAB id (OTHER_TAG_ID for unknown tags;
                         #text for text nodes; node 0 is #document)
      parent      int32  parent node index (-1 for the root)
      depth       int16  root = 0
      text_start  int64  offsets into the DECODED document string
      text_end    int64  (0,0) for element nodes
      n_chars     int32  non-ws chars of the node's own text (text nodes)
      anchor      bool   text node lies inside an <a>
      in_chrome   bool   node lies inside a chrome subtree
      subtree_chars         int64  per-element rollup (includes self)
      subtree_anchor_chars  int64
    plus key "doc": the decoded document string the offsets index into.
    """
    enc = sniff_encoding(raw)
    try:
        doc = raw.decode(enc, "replace")
    except LookupError:
        doc = raw.decode("utf-8", "replace")

    kind: list[int] = [KIND_ELEMENT]
    tag_id: list[int] = [TAG_VOCAB["#document"]]
    parent: list[int] = [-1]
    depth: list[int] = [0]
    text_start: list[int] = [0]
    text_end: list[int] = [0]
    n_chars: list[int] = [0]
    anchor: list[bool] = [False]
    in_chrome: list[bool] = [False]

    stack: list[tuple[str, int]] = []  # (tag, node_idx) of open elements
    chrome_depth = 0
    anchor_depth = 0
    text_id = TAG_VOCAB["#text"]

    def add_node(k, t, s, e, nc, anc):
        p = stack[-1][1] if stack else 0
        kind.append(k)
        tag_id.append(t)
        parent.append(p)
        depth.append(len(stack) + 1)
        text_start.append(s)
        text_end.append(e)
        n_chars.append(nc)
        anchor.append(anc)
        in_chrome.append(chrome_depth > 0)
        return len(kind) - 1

    pos = 0
    n = len(doc)
    search = _TOKEN_RE_S.search
    while pos < n:
        m = search(doc, pos)
        start = m.start() if m else n
        if start > pos:
            seg = doc[pos:start]
            nc = _count_text(seg)
            add_node(KIND_TEXT, text_id, pos, start, nc, anchor_depth > 0)
        if m is None:
            break
        pos = m.end()
        li = m.lastindex
        if li is None:
            continue
        if li == 1:  # close tag
            tag = m.group(1).lower()
            # cap-at-1 nested-anchor semantics, same as html_extract: a
            # </a> ends the (single) open anchor
            if tag == "a" and anchor_depth > 0:
                anchor_depth -= 1
            # matching-pop ONLY: a stray close with no open counterpart
            # changes nothing (crawl HTML is ragged). When a mismatched
            # close removes elements above the match point, sync the
            # chrome/anchor counters with what actually left the stack —
            # e.g. <div><nav></div> must return chrome_depth to 0, and
            # <div><a>x</div>y must end the anchor (round-2 ADVICE; mirrors
            # html_extract's guarded chrome_stack / anchor_start_depth
            # logic, which this table must agree with).
            for i in range(len(stack) - 1, -1, -1):
                if stack[i][0] == tag:
                    for t, _ in stack[i:]:
                        if t in CHROME_TAGS and chrome_depth > 0:
                            chrome_depth -= 1
                        elif t == "a":
                            anchor_depth = 0
                    del stack[i:]
                    break
        else:  # open tag
            tag = m.group(2).lower()
            attrs = m.group(3) or ""
            self_closing = tag in VOID_TAGS or (
                bool(attrs) and attrs.rstrip().endswith("/")
            )
            if tag in RAW_TEXT_TAGS and not self_closing:
                mm = _RAW_CLOSE_RES[tag].search(doc, pos)
                pos = mm.end() if mm else n
                continue
            idx = add_node(KIND_ELEMENT, TAG_VOCAB.get(tag, OTHER_TAG_ID), 0, 0, 0, False)
            if not self_closing:
                stack.append((tag, idx))
                if tag in CHROME_TAGS:
                    chrome_depth += 1
                if tag == "a":
                    anchor_depth = 1  # browsers cap nested <a> at 1

    out = {
        "kind": np.asarray(kind, np.int8),
        "tag_id": np.asarray(tag_id, np.int16),
        "parent": np.asarray(parent, np.int32),
        "depth": np.asarray(depth, np.int16),
        "text_start": np.asarray(text_start, np.int64),
        "text_end": np.asarray(text_end, np.int64),
        "n_chars": np.asarray(n_chars, np.int32),
        "anchor": np.asarray(anchor, bool),
        "in_chrome": np.asarray(in_chrome, bool),
        "doc": doc,
    }
    # bottom-up rollup: children appear after parents, so one reverse pass
    # accumulates every subtree in O(n) over int arrays
    nn = len(kind)
    sub = out["n_chars"].astype(np.int64).copy()
    sub_a = np.where(out["anchor"], out["n_chars"], 0).astype(np.int64)
    par = out["parent"]
    for i in range(nn - 1, 0, -1):
        p = par[i]
        sub[p] += sub[i]
        sub_a[p] += sub_a[i]
    out["subtree_chars"] = sub
    out["subtree_anchor_chars"] = sub_a
    return out


def dom_profile(pages_df):
    """Spark surface: per-document DOM statistics from the node table.

    mapInPandas over (url, html) — the same projected-scan shape as the
    extraction kernel. One row per document: node/text-node counts, max
    depth, document link density, chrome share.
    """
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["html"]):
                try:
                    t = build_node_table(bytes(payload))
                except Exception:
                    continue  # undecodable payload: skip, never fail the task
                total = int(t["subtree_chars"][0])
                anchor_chars = int(t["subtree_anchor_chars"][0])
                chrome_chars = int(
                    t["n_chars"][(t["kind"] == KIND_TEXT) & t["in_chrome"]].sum()
                )
                rows.append(
                    {
                        "url": url,
                        "n_nodes": len(t["kind"]),
                        "n_text_nodes": int((t["kind"] == KIND_TEXT).sum()),
                        "max_depth": int(t["depth"].max()) if len(t["depth"]) else 0,
                        "n_chars": total,
                        "link_density": anchor_chars / total if total else 0.0,
                        "chrome_share": chrome_chars / total if total else 0.0,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return pages_df.select("url", "html").mapInPandas(
        kernel,
        schema=(
            "url string, n_nodes long, n_text_nodes long, max_depth int, "
            "n_chars long, link_density double, chrome_share double"
        ),
    )
