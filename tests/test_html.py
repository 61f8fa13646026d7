"""HTML tokenizer semantics: rawtext skipping, attribute-quote traps,
comment handling, entity decoding, block/inline text assembly, and
framing strictness — the behaviors the closed-form oracle columns
depend on, exercised directly."""

import pytest

from unity_to_bigquery_spark.llm.html import (
    _decode_entities,
    extract_html,
    write_html,
)


def test_entity_decoding_rules():
    # named + decimal + hex decode; unknown names pass through verbatim
    assert _decode_entities("&amp;&lt;&#65;&#x42;") == ("&<AB", 4)
    assert _decode_entities("&bogus; &amp;") == ("&bogus; &", 1)
    # bare ampersand with no semicolon nearby is literal text
    assert _decode_entities("a & b")[0] == "a & b"
    # a semicolon more than 10 chars away does not start a reference
    assert _decode_entities("&" + "x" * 20 + ";")[0] == "&" + "x" * 20 + ";"


def test_tokenizer_traps():
    # '>' inside quoted attribute values must not terminate the tag
    m = extract_html("<p><span data-x=\"a>b\" title='c>d'>ok</span></p>")
    assert m["n_text_chars"] == 2 and m["first_word"] == "ok"
    # script/style rawtext hides fake tags and comparisons
    m = extract_html("<style>a>b{x}</style><script>if(a<b){'<p>no</p>'}</script><p>t</p>")
    assert m["first_word"] == "t" and m["n_blocks"] == 1
    assert m["skipped_chars"] == len("a>b{x}") + len("if(a<b){'<p>no</p>'}")
    # close tag matching is case-insensitive
    m = extract_html("<SCRIPT>x</ScRiPt><p>y</p>")
    assert m["first_word"] == "y" and m["skipped_chars"] == 1
    # comments swallow tag lookalikes and bare '>'
    m = extract_html("<!--<p>fake</p> > --><p>real</p>")
    assert m["n_comments"] == 1 and m["first_word"] == "real"
    # title is RCDATA, reported separately, not part of body text
    m = extract_html("<title>T &amp; U</title><p>body</p>")
    assert m["title"] == "T & U" and m["n_text_chars"] == 4
    # entities decode inside href attributes (dedup-poisoning bug trap)
    m = extract_html('<p><a href="http://h.example/?a=1&amp;b=2">z</a></p>')
    assert m["n_href_chars"] == len("http://h.example/?a=1&b=2")
    assert m["first_link_host"] == "h.example"
    # <br> inserts a newline inside the block, not a block break
    m = extract_html("<p>a<br>b</p>")
    assert m["n_blocks"] == 1 and m["n_words"] == 2 and m["n_text_chars"] == 3


def test_block_vs_inline_assembly():
    m = extract_html("<div>a <b>bold</b> c</div><p>next</p>")
    assert m["n_blocks"] == 2
    # blocks join with one newline: "a bold c\nnext"
    assert m["n_text_chars"] == 13 and m["n_words"] == 4


def test_framing_strictness():
    with pytest.raises(ValueError, match="comment"):
        extract_html("<!-- never closed <p>x</p>")
    with pytest.raises(ValueError, match="unterminated tag"):
        extract_html("<p class='x'")
    with pytest.raises(ValueError, match="attribute"):
        extract_html("<p class='x>text</p>")
    with pytest.raises(ValueError, match="<script>"):
        extract_html("<script>var x = 1;")
    with pytest.raises(ValueError, match="malformed tag"):
        extract_html("< p>x</p>")


def test_fixture_grid_matches_closed_form():
    """The same arithmetic the DuckDB oracle runs, in Python, across a
    fixture grid — guards the synthesis/oracle contract itself."""
    for doc_id in range(12):
        for n_chars in (48, 100, 251, 553):
            m = extract_html(write_html(doc_id, n_chars))
            np_ = doc_id % 4 + 2
            nw = n_chars % 5 + 3
            nl = doc_id % 3 + 1
            para = sum(
                1 + len(str((31 * doc_id + 7 * p + i) % 100))
                for p in range(np_)
                for i in range(nw)
            ) + np_ * (nw - 1)
            assert m["n_text_chars"] == para + 5 + 5 * nl + 4 + np_ + nl
            assert m["n_words"] == np_ * nw + 2 + nl
            assert m["n_hosts"] == len({(doc_id + 3 * l) % 4 for l in range(nl)})
            assert m["skipped_chars"] == 51 + len(str(doc_id)) + len(str(n_chars))
            assert m["n_entities"] == 4
