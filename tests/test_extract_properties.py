"""Property-based robustness tests for the HTML extractor (hypothesis):
never crashes, spans always tile the text, fully deterministic."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_ibm_models_spark.functions.html_extract import (
    extract_main_content,
    normalize_text,
)

html_fragments = st.lists(
    st.one_of(
        st.text(max_size=80),
        st.sampled_from(
            [
                "<p>", "</p>", "<div class='sidebar'>", "</div>", "<table>",
                "<tr>", "<td>", "</td>", "</tr>", "</table>", "<script>",
                "</script>", "<a href='x'>", "</a>", "<h1>", "</h1>",
                "<!-- c -->", "<br/>", "&amp;", "&lt;", "<ul><li>", "</li></ul>",
                "<pre>", "</pre>", "<td", " colspan='2'", ">",
            ]
        ),
    ),
    max_size=40,
)


@given(html_fragments)
@settings(max_examples=300, deadline=None)
def test_extractor_total_and_consistent(frags):
    html = "".join(frags)
    text, spans = extract_main_content(html)
    # determinism
    assert (text, spans) == extract_main_content(html)
    # spans tile the text with 2-char separators
    pos = 0
    for i, (s, e, label, idx) in enumerate(spans):
        assert s == pos
        assert e >= s
        assert idx == i
        assert isinstance(label, str) and label
        pos = e + 2
    if spans:
        assert spans[-1][1] == len(text)
    else:
        assert text == ""


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extractor_total_on_arbitrary_bytes(payload):
    text, spans = extract_main_content(payload)
    assert isinstance(text, str)
    assert (text, spans) == extract_main_content(payload)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once
    assert "  " not in once
    assert once == once.strip()
