#!/usr/bin/env python
"""Generate tests/fixtures/extract_goldens.json — expected
(title, description, text) for an adversarial HTML battery, pinning the
engine extractor (text/extract.py) to the reference's
BeautifulSoup(html, 'html.parser') pipeline (crawler.py:333-361).

Provenance ladder:
  * run where real bs4 is importable  -> goldens ARE the reference
    pipeline's output (reference-identity); provenance records the bs4
    version.
  * run in this sandbox (no bs4)      -> goldens come from the
    independent mini-DOM oracle (tests/bs4_oracle.py), which models
    bs4>=4.9 html.parser tree semantics; provenance "mini-dom-oracle".
    Still a true differential check: the oracle shares no code or
    structure with the engine extractor.

Re-run under real bs4 whenever possible:  python scripts/gen_extract_goldens.py

Battery scope notes: duplicate attributes on a single tag and exotic
non-HTML5 void tags are deliberately excluded (bs4 policy knobs the
reference doesn't pin down).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# name -> adversarial html
FIXTURES = {
    "well_formed": (
        "<html><head><title>A Page</title>"
        '<meta name="description" content=" the desc ">'
        "</head><body><h1>Head</h1><p>para one</p>"
        "<script>var x = '<p>not text</p>';</script>"
        "<p>para two</p></body></html>"
    ),
    "implicit_close_via_parent_end": (
        # </div> pops the unclosed <nav> too: "outside" is KEPT
        "<body><div><nav>menu stuff</div>outside</body>"
    ),
    "implicit_close_pops_body": (
        # </html> pops the open <body>: "trailer" is outside body
        "<html><body>inside</html>trailer"
    ),
    "meta_inside_removed_subtree": (
        # the nav (and its meta) is decomposed before find(): no desc
        '<html><head></head><body><nav><meta name="description" '
        'content="hidden"></nav>visible</body></html>'
    ),
    "meta_first_without_content_wins": (
        # find() returns the FIRST matching meta; it has no content ->
        # description stays empty, the second one is never consulted
        '<head><meta name="description">'
        '<meta name="description" content="late"></head><body>x</body>'
    ),
    "no_body_fallback_includes_head": (
        "<html><head><title>The Title</title></head>"
        "<p>loose one</p><p>loose two</p></html>"
    ),
    "title_nested_tags_no_separator": (
        # get_text(strip=True) joins stripped strings with '' -> "ab"
        "<html><head><title>a <b>b</b></title></head><body>t</body></html>"
    ),
    "title_keeps_inner_whitespace": (
        # strip=True strips string ENDS only; inner runs survive
        "<html><head><title>  spaced   out  </title></head>"
        "<body>t</body></html>"
    ),
    "unclosed_title_swallows_document": (
        # everything becomes a descendant of <title>
        "<html><head><title>T<body>body text</body></html>"
    ),
    "second_sibling_body_ignored": (
        "<html><body>first</body><body>second</body></html>"
    ),
    "body_nested_in_body_included": (
        "<html><body>a<body>b</body>c</body></html>"
    ),
    "unmatched_end_tags_ignored": (
        "</div></p><body>kept</body></span>"
    ),
    "comments_are_not_text": (
        "<html><head><title>a<!-- no -->b</title></head>"
        "<body>x<!-- hidden comment -->y</body></html>"
    ),
    "script_with_markup_inside": (
        "<body>before<script>if (a<b) { document.write('<i>x</i>') }"
        "</script>after</body>"
    ),
    "style_and_all_removed_tags": (
        "<body><header>h</header><nav>n</nav><aside>s</aside>"
        "<style>p{color:red}</style>mid<footer>f</footer></body>"
    ),
    "nested_removed_tags": (
        "<body><nav>a<nav>b</nav>c</nav>kept</body>"
    ),
    "unclosed_removed_tag_eats_rest": (
        "<body>start<footer>gone one<p>gone two</body>"
    ),
    "removed_closed_by_parent_end": (
        "<body><div><aside>gone</div>back</body>"
    ),
    "entities_and_charrefs": (
        "<body>Fish &amp; chips &lt;cost&gt; &#163;5 &quot;really&quot;"
        "</body>"
    ),
    "entity_in_attribute": (
        '<head><meta name="description" content="a &amp; b"></head>'
        "<body>x</body>"
    ),
    "first_title_empty": (
        "<head><title></title><title>second</title></head><body>x</body>"
    ),
    "title_inside_removed_skipped": (
        "<html><nav><title>hidden</title></nav>"
        "<head><title>real</title></head><body>x</body></html>"
    ),
    "title_inside_body_counts_twice": (
        "<html><body>pre <title>mid</title> post</body></html>"
    ),
    "uppercase_tags_and_attrs": (
        '<HTML><HEAD><TITLE>Up</TITLE><META NAME="description" '
        'CONTENT="shout"></HEAD><BODY>LOUD text</BODY></HTML>'
    ),
    "self_closing_removed_tag": (
        "<body><nav/>kept after empty nav</body>"
    ),
    "body_inside_removed_means_no_body": (
        "<html><aside><body>gone</body></aside>outside</html>"
    ),
    "declarations_cdata_pi": (
        "<!DOCTYPE html><body>a<![CDATA[not text]]>b<?php echo 1 ?>c"
        "</body>"
    ),
    "whitespace_only_strings_dropped": (
        "<body>  \n\t  <p> a </p> \n <p>\n</p><p>b</p>  </body>"
    ),
    "bare_text_before_html": (
        "leading soup<html><body>real</body></html>"
    ),
    "deeply_misnested_inline": (
        "<body><b>one<i>two</b>three</i>four</body>"
    ),
    # charset / entity edge cases (convert_charrefs=True semantics,
    # shared by bs4-html.parser and the engine tokenizer)
    "numeric_and_hex_charrefs": (
        "<body>&#65;&#x42;&#x1F600; pound &#163; done</body>"
    ),
    "unknown_entity_kept_literal": (
        "<body>a &nosuchentity; b &fakeref c</body>"
    ),
    "known_entity_without_semicolon": (
        "<body>fish &amp chips &lt tag</body>"
    ),
    "entities_in_title_and_meta": (
        '<head><title>A &amp; B &#8212; C</title>'
        '<meta name="description" content="x &gt; y"></head><body>t</body>'
    ),
    "non_ascii_unicode_text": (
        "<html><head><title>Ümläut — café</title></head>"
        "<body>日本語 العربية "
        "emoji \U0001f680 end</body></html>"
    ),
    "charref_splits_no_string_break": (
        # convert_charrefs merges data around refs into ONE string:
        # strip applies to the merged run, not per-fragment
        "<body>  &#32;lead&amp;tail&#32;  </body>"
    ),
}


def _bs4_reference_extract(html):
    """Verbatim reference semantics via real bs4 (crawler.py:333-361)."""
    from bs4 import BeautifulSoup

    soup = BeautifulSoup(html, "html.parser")
    for element in soup(["script", "style", "nav", "footer", "header",
                         "aside"]):
        element.decompose()
    title_tag = soup.find("title")
    title = title_tag.get_text(strip=True) if title_tag else ""
    description = ""
    meta_desc = soup.find("meta", attrs={"name": "description"})
    if meta_desc and meta_desc.get("content"):
        description = meta_desc["content"].strip()
    body = soup.find("body")
    scope = body if body else soup
    text = re.sub(r"\s+", " ", scope.get_text(separator=" ", strip=True))
    return title, description, text[:50_000]


def main():
    try:
        import bs4

        extract = _bs4_reference_extract
        provenance = f"bs4-{bs4.__version__}-html.parser"
    except ImportError:
        from bs4_oracle import oracle_extract as extract

        provenance = "mini-dom-oracle"

    out = {"provenance": provenance, "cases": {}}
    for name, html in FIXTURES.items():
        title, description, text = extract(html)
        out["cases"][name] = {
            "html": html,
            "title": title,
            "description": description,
            "text": text,
        }
    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "extract_goldens.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
        f.write("\n")
    print(f"wrote {len(FIXTURES)} goldens ({provenance}) -> {path}")


if __name__ == "__main__":
    main()
