"""Markup extractors (llm/markup.py): hand-built adversarial cases
beyond the closed-form fixtures the oracled queries verify."""

from __future__ import annotations

from unity_to_bigquery_spark.llm.markup import (
    extract_docx,
    extract_latex,
    extract_markdown,
    write_docx,
)


def test_markdown_rules():
    m = extract_markdown(
        "## Two-hash header\n"
        "> quoted line\n"
        "1. ordered item\n"
        "* star bullet\n"
        "nested ***very* bold** emphasis\n"
        "![alt text](img.png) and [a](u) twice\n"
        "```python\nignored()\n```\n"
        "plain `x = 1` tail\n"
    )
    assert m["text"] == (
        "Two-hash header quoted line ordered item star bullet "
        "nested very bold emphasis alt text and a twice plain x = 1 tail"
    )
    assert m["n_headers"] == 1
    assert m["n_links"] == 2  # image counts: it carries a URL
    assert m["n_fences"] == 1
    assert m["n_code_chars"] == len("ignored()") + len("x = 1")
    # unterminated fence swallows the rest, counted not emitted
    m2 = extract_markdown("a\n```\nb\nc")
    assert m2["text"] == "a" and m2["n_code_chars"] == 2
    # empty doc
    assert extract_markdown("")["n_text_chars"] == 0


def test_latex_rules():
    t = extract_latex(
        "\\usepackage[utf8]{inputenc}\n"
        "100\\% literal? no: comment cut\n"  # % cuts even after \\
        "$a+b$ $c$ two inline\n"
        "$$ d $$ one display\n"
        "\\emph{kept} \\unknowncmd{dropped} \\bare\n"
        "group {braces} erased~here\n"
    )
    # NB: the scanner treats every % as a comment (TeX's \% escape is
    # out of subset — documented simplification)
    assert t["n_comments"] == 1
    assert t["n_math"] == 3
    assert t["text"] == (
        "100\\ two inline one display kept group braces erased here"
    )
    # verbatim spanning multiple lines
    t2 = extract_latex(
        "before\n\\begin{verbatim}\nxx\nyyy\n\\end{verbatim}\nafter\n"
    )
    assert t2["text"] == "before after"
    assert t2["n_verbatim_chars"] == 5


def test_docx_entities_and_shape():
    d = extract_docx(write_docx(7, 10))
    np_ = 10 % 3 + 2
    assert d["n_paragraphs"] == np_ and d["n_runs"] == 2 * np_
    assert "B&7<ok>" in d["text"]  # entities decoded
    # double-escaped ampersand decodes once only
    import io
    import zipfile

    xml = (
        '<?xml version="1.0"?><w:document><w:body>'
        "<w:p><w:r><w:t>&amp;amp;</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", xml)
    assert extract_docx(buf.getvalue())["text"] == "&amp;"
