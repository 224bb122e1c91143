"""Differential pinning of the HTML extractor against bs4 semantics.

Round-1 verdict: the extraction "byte-identity" test compared
extract.py against itself.  This battery fixes that in two independent
ways:

  1. committed goldens (tests/fixtures/extract_goldens.json) — expected
     (title, description, text) for 30 adversarial documents, generated
     by scripts/gen_extract_goldens.py.  Under real bs4 the generator
     runs the verbatim reference pipeline (crawler.py:333-361); in this
     sandbox it runs the independent mini-DOM oracle (tests/
     bs4_oracle.py).  Either way the goldens are produced by a DIFFERENT
     implementation than the engine's event-stream extractor.
  2. property fuzzing — hypothesis-composed tag soup (unbalanced tags,
     removed-tag nesting, comments, entities, stray end tags) compared
     node-for-node between extractor and oracle.

Tree behaviors exercised: _popToTag implicit closes, unmatched end
tags, decompose-before-find ordering, first-match meta/title/body
designation, whole-doc fallback, get_text strip/separator semantics,
comment/CDATA/declaration exclusion.
"""

import json
import os

import pytest
from hypothesis import given, settings, strategies as st

from search_engine_spark.text.extract import extract_content

from bs4_oracle import oracle_extract

GOLDENS = os.path.join(
    os.path.dirname(__file__), "fixtures", "extract_goldens.json"
)


def _load():
    with open(GOLDENS) as f:
        return json.load(f)


class TestGoldens:
    @pytest.mark.parametrize("name", sorted(_load()["cases"]))
    def test_matches_golden(self, name):
        case = _load()["cases"][name]
        got = extract_content(case["html"])
        assert got.title == case["title"], name
        assert got.description == case["description"], name
        assert got.text == case["text"], name

    def test_goldens_freshness(self):
        """The committed file must be exactly what the generator emits
        for the current fixture battery (catches silent drift)."""
        import scripts.gen_extract_goldens as gen

        data = _load()
        assert set(data["cases"]) == set(gen.FIXTURES)
        for name, case in data["cases"].items():
            assert case["html"] == gen.FIXTURES[name], name

    def test_oracle_agreement_on_goldens(self):
        """Even when goldens were regenerated under real bs4, the
        in-repo oracle must agree on the battery — three-way pin."""
        for name, case in _load()["cases"].items():
            t, d, x = oracle_extract(case["html"])
            assert (t, d, x) == (
                case["title"], case["description"], case["text"]
            ), name


# ---- property fuzzing: random tag soup, extractor vs oracle ----

_TAGS = ["div", "p", "span", "body", "title", "nav", "footer", "b",
         "html", "head", "aside", "section"]
_VOIDS = ["br", "img", "meta"]

_text = st.text(
    alphabet="ab c\t\n&<>;", min_size=0, max_size=12
)

_chunk = st.one_of(
    _text,
    st.sampled_from(_TAGS).map(lambda t: f"<{t}>"),
    st.sampled_from(_TAGS).map(lambda t: f"</{t}>"),
    st.sampled_from(_VOIDS).map(lambda t: f"<{t}>"),
    st.just('<meta name="description" content="d1">'),
    st.just('<meta name="description">'),
    st.just("<!-- comment -->"),
    st.just("<script>a < b</script>"),
    st.just("<script>unclosed"),
    st.just("&amp;"),
    st.just("<nav/>"),
)


@st.composite
def tag_soup(draw):
    return "".join(draw(st.lists(_chunk, min_size=0, max_size=30)))


class TestFuzzDifferential:
    @settings(max_examples=300, deadline=None)
    @given(tag_soup())
    def test_extractor_matches_oracle(self, html):
        got = extract_content(html)
        t, d, x = oracle_extract(html)
        assert got.title == t, html
        assert got.description == d, html
        assert got.text == x, html
