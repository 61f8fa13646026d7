"""Document-markup text extraction — Markdown, LaTeX, and DOCX
(OOXML) — the step-zero converters a real training-data pipeline runs
over README/wiki corpora, arXiv sources, and office documents, joining
the existing HTML/PDF/EML extractors (llm/html.py, llm/pdf.py,
llm/email_mime.py).

All three are from-scratch line/byte scanners (stdlib only), each with
a deliberately SIMPLE, DOCUMENTED whitespace discipline so the
extracted text is closed-form constructible — which is what lets the
declared queries hash-verify extraction end to end against DuckDB
oracles (the same verification pattern as the codec suite).

Whitespace contract shared by markdown/latex: input is processed line
by line; each line yields zero or one extracted-text fragments; the
document's text is the non-empty fragments joined with ONE space.
DOCX: run texts concatenate within a paragraph; paragraphs join with
one space.

Reference scope: corpus-prep text extraction over the documents table
(SURVEY §2D / build-brief text-analysis family); the reference repo
(263-LoC export ETL) has no extraction at all.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# ---- Markdown -------------------------------------------------------------

_MD_LINK = re.compile(r"!?\[([^\]]*)\]\(([^)]*)\)")
_MD_CODE_SPAN = re.compile(r"`([^`]*)`")
_MD_EMPH = re.compile(r"(\*\*|__|\*|_)(.+?)\1")


def extract_markdown(text: str) -> dict:
    """CommonMark-ish visible-text extraction with counts.

    Rules (deliberately explicit — the oracle mirrors them):
    - fenced code blocks (``` delimiter lines): the fence lines emit
      nothing; interior lines are DROPPED from text but their chars
      count in ``n_code_chars`` (plus inline code spans' content).
    - ATX headers: strip the leading ``#``+ and one space; count.
    - blockquote ``> `` and list bullets ``- ``/``* ``/``1. ``: strip
      the marker, keep the content.
    - links/images ``[t](u)`` / ``![t](u)``: keep ``t``, count links
      (images count as links too — they carry a URL).
    - emphasis ``**x**``/``__x__``/``*x*``/``_x_``: keep ``x``.
    - inline code ``…``: keep the content (it IS visible text), count
      its chars in ``n_code_chars``.
    """
    lines = text.split("\n")
    frags: list[str] = []
    n_headers = n_links = n_fences = n_code_chars = 0
    in_fence = False
    for line in lines:
        stripped = line.strip()
        if stripped.startswith("```"):
            if not in_fence:
                n_fences += 1
            in_fence = not in_fence
            continue
        if in_fence:
            n_code_chars += len(line)
            continue
        m = re.match(r"(#{1,6}) (.*)$", stripped)
        if m:
            n_headers += 1
            stripped = m.group(2)
        elif stripped.startswith("> "):
            stripped = stripped[2:]
        elif stripped.startswith(("- ", "* ")):
            stripped = stripped[2:]
        else:
            m = re.match(r"\d+\. (.*)$", stripped)
            if m:
                stripped = m.group(1)
        n_links += len(_MD_LINK.findall(stripped))
        stripped = _MD_LINK.sub(lambda mm: mm.group(1), stripped)
        for mm in _MD_CODE_SPAN.finditer(stripped):
            n_code_chars += len(mm.group(1))
        stripped = _MD_CODE_SPAN.sub(lambda mm: mm.group(1), stripped)
        # innermost-out emphasis peeling (bounded: nesting depth)
        while _MD_EMPH.search(stripped):
            stripped = _MD_EMPH.sub(lambda mm: mm.group(2), stripped)
        if stripped:
            frags.append(stripped)
    out = " ".join(frags)
    return {
        "text": out,
        "n_text_chars": len(out),
        "n_words": len(out.split()),
        "n_headers": n_headers,
        "n_links": n_links,
        "n_fences": n_fences,
        "n_code_chars": n_code_chars,
    }


# ---- LaTeX ----------------------------------------------------------------

# text-bearing single-argument commands whose argument stays visible
_TEX_KEEP = re.compile(
    r"\\(?:textbf|textit|emph|section|subsection|title|caption)\{([^{}]*)\}"
)
# any remaining \command[opt]{arg} or bare \command: drops entirely
_TEX_CMD = re.compile(r"\\[a-zA-Z]+(?:\[[^\]]*\])?(?:\{[^{}]*\})?")


def extract_latex(text: str) -> dict:
    """De-TeX visible-text extraction with counts.

    Rules: ``%`` comments drop to end of line (a line that BEGINS with
    % emits nothing); display ``$$…$$`` then inline ``$…$`` math spans
    are dropped and counted (per line — the fixtures never split math
    across lines); ``verbatim`` environments drop their body into
    ``n_verbatim_chars``; text-bearing commands (_TEX_KEEP) keep their
    argument; every other ``\\cmd[opt]{arg}`` drops entirely; ``~``
    becomes a space; ``{``/``}`` group braces are erased."""
    lines = text.split("\n")
    frags: list[str] = []
    n_comments = n_math = n_verbatim_chars = 0
    in_verbatim = False
    for line in lines:
        if in_verbatim:
            if "\\end{verbatim}" in line:
                in_verbatim = False
            else:
                n_verbatim_chars += len(line)
            continue
        if "\\begin{verbatim}" in line:
            in_verbatim = True
            continue
        if "%" in line:
            cut = line.index("%")
            n_comments += 1
            line = line[:cut]
        disp = re.findall(r"\$\$[^$]*\$\$", line)
        n_math += len(disp)
        line = re.sub(r"\$\$[^$]*\$\$", " ", line)
        inl = re.findall(r"\$[^$]*\$", line)
        n_math += len(inl)
        line = re.sub(r"\$[^$]*\$", " ", line)
        line = _TEX_KEEP.sub(lambda m: m.group(1), line)
        line = _TEX_CMD.sub("", line)
        line = line.replace("~", " ").replace("{", "").replace("}", "")
        line = " ".join(line.split())
        if line:
            frags.append(line)
    out = " ".join(frags)
    return {
        "text": out,
        "n_text_chars": len(out),
        "n_words": len(out.split()),
        "n_comments": n_comments,
        "n_math": n_math,
        "n_verbatim_chars": n_verbatim_chars,
    }


# ---- DOCX (OOXML) ----------------------------------------------------------

_XML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&amp;", "&"),  # LAST: decoding it first would double-decode
)


def _xml_unescape(s: str) -> str:
    for ent, ch in _XML_ENTITIES:
        s = s.replace(ent, ch)
    return s


def extract_docx(payload: bytes) -> dict:
    """OOXML text extraction: central-directory zip walk (CRC-checked
    by zipfile), then a from-scratch scan of ``word/document.xml`` —
    ``<w:p>`` elements are paragraphs, ``<w:t…>…</w:t>`` runs carry
    the text (XML entities decoded). Run texts concatenate within a
    paragraph; paragraphs join with one space. No DOM, no namespace
    machinery — the subset real .docx bodies use."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        xml = zf.read("word/document.xml").decode("utf-8")
    paragraphs: list[str] = []
    n_runs = 0
    for p_body in re.findall(r"<w:p(?:\s[^>]*)?>(.*?)</w:p>", xml, re.S):
        runs = re.findall(r"<w:t(?:\s[^>]*)?>(.*?)</w:t>", p_body, re.S)
        n_runs += len(runs)
        paragraphs.append("".join(_xml_unescape(r) for r in runs))
    out = " ".join(p for p in paragraphs if p)
    return {
        "text": out,
        "n_text_chars": len(out),
        "n_words": len(out.split()),
        "n_paragraphs": xml.count("<w:p>") + xml.count("<w:p "),
        "n_runs": n_runs,
    }


# ---- deterministic fixtures -------------------------------------------------

def write_markdown(doc_id: int, n_chars: int) -> str:
    """Closed-form markdown doc: 1 header, 1 link, 1 inline code span,
    1 fenced block, a bullet pair, and an ``r = n_chars%5 + 2``-times
    repeated tail word — every rule of :func:`extract_markdown`
    exercised, extraction SQL-constructible."""
    g, r = doc_id, n_chars % 5 + 2
    return (
        f"# Title {g}\n"
        f"Intro with **bold{g}** and a [link text {g}](http://x{g % 7}.example) plus `code{g}`.\n"
        f"- item one {g}\n"
        f"- item two\n"
        f"```\n"
        f"code line {g}\n"
        f"```\n"
        + (f"tail{g % 100} " * r).rstrip()
    )


def write_latex(doc_id: int, n_chars: int) -> str:
    """Closed-form LaTeX doc exercising every extract_latex rule."""
    g, r = doc_id, n_chars % 5 + 2
    return (
        "\\documentclass{article}\n"
        "% preamble comment\n"
        "\\begin{document}\n"
        f"\\section{{Heading {g}}}\n"
        f"Plain \\textbf{{bold {g}}} and \\emph{{em}} text % note\n"
        f"math $x_{g % 9}$ inline and $$y^{g % 5}$$ display\n"
        "\\begin{verbatim}\n"
        f"raw {g}\n"
        "\\end{verbatim}\n"
        f"End~{('word%d ' % (g % 100)) * r}done\n"
        "\\end{document}\n"
    )


def write_docx(doc_id: int, n_chars: int) -> bytes:
    """Closed-form .docx: ``np = n_chars%3 + 2`` paragraphs; paragraph
    p carries two runs ("P{p} run A{g} " + "B&{g}<ok>") — the second
    XML-escaped, so entity decoding is on the verified path."""
    g = doc_id
    np_ = n_chars % 3 + 2
    paras = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">P{p} run A{g} </w:t></w:r>"
        f"<w:r><w:t>B&amp;{g}&lt;ok&gt;</w:t></w:r></w:p>"
        for p in range(np_)
    )
    xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>' + paras +
        "</w:body></w:document>"
    )
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/'
        'xml"/></Types>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in (
            ("[Content_Types].xml", ct),
            ("word/document.xml", xml),
        ):
            info = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()


# ---- DataFrame stages --------------------------------------------------------

MARKDOWN_STATS_SCHEMA = (
    "doc_id BIGINT, n_text_chars BIGINT, n_words BIGINT, n_headers INT, "
    "n_links INT, n_fences INT, n_code_chars BIGINT, text_md5 STRING"
)
LATEX_STATS_SCHEMA = (
    "doc_id BIGINT, n_text_chars BIGINT, n_words BIGINT, n_comments INT, "
    "n_math INT, n_verbatim_chars BIGINT, text_md5 STRING"
)
DOCX_STATS_SCHEMA = (
    "doc_id BIGINT, n_text_chars BIGINT, n_words BIGINT, "
    "n_paragraphs INT, n_runs INT, text_md5 STRING"
)


def _stats_stage(docs: DataFrame, writer, extractor, keys, schema) -> DataFrame:
    """Synthesize-then-extract in ONE Arrow stage (constant work per
    document, no payload shuffle — only the stats rows move)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for d, c in zip(pdf["doc_id"], pdf["n_chars"]):
                m = extractor(writer(int(d), int(c)))
                rows.append(
                    (int(d), m["n_text_chars"], m["n_words"])
                    + tuple(m[k] for k in keys)
                    + (hashlib.md5(m["text"].encode()).hexdigest(),)
                )
            yield pd.DataFrame(
                rows, columns=[f.split()[0] for f in schema.split(", ")]
            )

    return docs.select("doc_id", "n_chars").mapInPandas(batches, schema)


def markdown_extract_stats(docs: DataFrame) -> DataFrame:
    return _stats_stage(
        docs, write_markdown, extract_markdown,
        ("n_headers", "n_links", "n_fences", "n_code_chars"),
        MARKDOWN_STATS_SCHEMA,
    )


def latex_extract_stats(docs: DataFrame) -> DataFrame:
    return _stats_stage(
        docs, write_latex, extract_latex,
        ("n_comments", "n_math", "n_verbatim_chars"),
        LATEX_STATS_SCHEMA,
    )


def docx_extract_stats(docs: DataFrame) -> DataFrame:
    return _stats_stage(
        docs, write_docx, extract_docx,
        ("n_paragraphs", "n_runs"),
        DOCX_STATS_SCHEMA,
    )
