"""HTML text/link extraction — the first step of every web-crawl
training-data pipeline (reference analogue: the landing-zone payloads
of Unity_to_BigQuery.py:1-216 are API JSON; a crawl corpus lands as
HTML, and extraction is the step between the WARC scan and every
`t_*`/`d_*` text operator in this engine).

A real, from-scratch HTML5-ish tokenizer (public WHATWG spec
semantics, stdlib only — no bs4/lxml in this container):

- DATA / TAG / COMMENT / RAWTEXT states; `<script>`/`<style>` bodies
  are RAWTEXT (skipped until the matching case-insensitive close tag),
  `<title>` is RCDATA (captured, entity-decoded, reported separately);
- attribute scanner honors single- and double-quoted values, so a `>`
  inside a quoted attribute does NOT terminate the tag (the classic
  regex-stripper trap);
- comments scan to the literal `-->` and may contain `<p>` lookalikes
  and bare `>`;
- character references: the core named set + decimal `&#NN;` + hex
  `&#xHH;`, decoded in text AND attribute values (undecoded hrefs are
  a real-world dedup-poisoning bug); unknown names pass through
  verbatim per spec error-handling;
- block-level elements flush text blocks; inline elements (`<b>`,
  `<a>`, `<span>`) do not break words; `<br>` inserts a newline.

Spark-side: synthesis and extraction are each ONE mapInPandas stage
over Arrow batches; only fixed-width stats and short strings cross the
boundary, so the shuffle is stats-sized regardless of page size. At
100 TB the extractor runs where the WARC bytes live and nothing but
per-doc aggregates moves.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_NAMED_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": "\xa0",
}

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "section", "article", "table", "tr", "blockquote", "pre",
}

_VOID_TAGS = {"br", "img", "hr", "meta", "link", "input", "area", "col"}


def _decode_entities(s: str) -> tuple[str, int]:
    """Decode character references; return (text, n_decoded). Unknown
    named references are left verbatim (spec: not an error that drops
    text)."""
    if "&" not in s:
        return s, 0
    out: list[str] = []
    n = 0
    pos = 0
    while True:
        amp = s.find("&", pos)
        if amp < 0:
            out.append(s[pos:])
            break
        out.append(s[pos:amp])
        semi = s.find(";", amp + 1)
        if semi < 0 or semi - amp > 10:
            out.append("&")
            pos = amp + 1
            continue
        name = s[amp + 1 : semi]
        if name.startswith("#x") or name.startswith("#X"):
            try:
                out.append(chr(int(name[2:], 16)))
                n += 1
                pos = semi + 1
                continue
            except ValueError:
                pass
        elif name.startswith("#"):
            try:
                out.append(chr(int(name[1:])))
                n += 1
                pos = semi + 1
                continue
            except ValueError:
                pass
        elif name in _NAMED_ENTITIES:
            out.append(_NAMED_ENTITIES[name])
            n += 1
            pos = semi + 1
            continue
        out.append("&")
        pos = amp + 1
    return "".join(out), n


def _scan_tag(s: str, pos: int) -> tuple[str, dict, bool, int]:
    """Parse an opening tag starting at `pos` (just past '<'). Returns
    (name, attrs, self_closing, pos_after_gt). Quoted attribute values
    may contain '>'."""
    end = len(s)
    i = pos
    while i < end and (s[i].isalnum() or s[i] in "-_"):
        i += 1
    name = s[pos:i].lower()
    if not name:
        raise ValueError(f"malformed tag at byte {pos - 1}")
    attrs: dict[str, str] = {}
    self_closing = False
    while True:
        while i < end and s[i] in " \t\r\n":
            i += 1
        if i >= end:
            raise ValueError("unterminated tag")
        if s[i] == ">":
            return name, attrs, self_closing, i + 1
        if s[i] == "/":
            self_closing = True
            i += 1
            continue
        a0 = i
        while i < end and s[i] not in " \t\r\n=>/":
            i += 1
        aname = s[a0:i].lower()
        while i < end and s[i] in " \t\r\n":
            i += 1
        if i < end and s[i] == "=":
            i += 1
            while i < end and s[i] in " \t\r\n":
                i += 1
            if i < end and s[i] in "\"'":
                q = s[i]
                v1 = s.find(q, i + 1)
                if v1 < 0:
                    raise ValueError(f"unterminated {q} attribute value")
                raw = s[i + 1 : v1]
                i = v1 + 1
            else:
                v0 = i
                while i < end and s[i] not in " \t\r\n>":
                    i += 1
                raw = s[v0:i]
            attrs[aname], _ = _decode_entities(raw)
        else:
            attrs[aname] = ""


def _link_host(href: str) -> str:
    """Host component of an absolute URL (scheme://host[/...])."""
    sep = href.find("://")
    if sep < 0:
        return ""
    rest = href[sep + 3 :]
    for stop in "/?#":
        cut = rest.find(stop)
        if cut >= 0:
            rest = rest[:cut]
    return rest


def extract_html(payload: str) -> dict:
    """Tokenize an HTML document; return title, visible-text block
    stats, link/host facts, entity/comment counts, and the rawtext
    byte count skipped (script+style). Raises on unterminated
    comments, tags, quotes, or rawtext elements."""
    s = payload
    end = len(s)
    pos = 0
    blocks: list[str] = []
    buf: list[str] = []
    title = ""
    n_entities = 0
    n_comments = 0
    skipped = 0
    links: list[str] = []

    def flush() -> None:
        text = "".join(buf)
        buf.clear()
        if text:
            blocks.append(text)

    while pos < end:
        lt = s.find("<", pos)
        if lt < 0:
            seg, n = _decode_entities(s[pos:end])
            buf.append(seg)
            n_entities += n
            break
        if lt > pos:
            seg, n = _decode_entities(s[pos:lt])
            buf.append(seg)
            n_entities += n
        if s.startswith("<!--", lt):
            close = s.find("-->", lt + 4)
            if close < 0:
                raise ValueError("unterminated comment")
            n_comments += 1
            pos = close + 3
            continue
        if s.startswith("<!", lt):  # doctype
            gt = s.find(">", lt)
            if gt < 0:
                raise ValueError("unterminated doctype")
            pos = gt + 1
            continue
        if s.startswith("</", lt):
            gt = s.find(">", lt)
            if gt < 0:
                raise ValueError("unterminated close tag")
            cname = s[lt + 2 : gt].strip().lower()
            if cname in _BLOCK_TAGS:
                flush()
            pos = gt + 1
            continue
        name, attrs, self_closing, pos = _scan_tag(s, lt + 1)
        if name in ("script", "style", "title") and not self_closing:
            close_pat = "</" + name
            low = s.lower()
            cpos = low.find(close_pat, pos)
            if cpos < 0:
                raise ValueError(f"unterminated <{name}> element")
            raw = s[pos:cpos]
            gt = s.find(">", cpos)
            if gt < 0:
                raise ValueError(f"unterminated </{name}> tag")
            if name == "title":
                title, _ = _decode_entities(raw)
            else:
                skipped += len(raw)
            pos = gt + 1
            continue
        if name == "a" and "href" in attrs:
            links.append(attrs["href"])
        if name == "br":
            buf.append("\n")
        if name in _BLOCK_TAGS:
            flush()

    flush()
    text = "\n".join(blocks)
    hosts = [_link_host(h) for h in links]
    return {
        "title": title,
        "n_blocks": len(blocks),
        "n_text_chars": len(text),
        "n_words": len(text.split()),
        "n_links": len(links),
        "n_hosts": len(set(hosts)),
        "first_link_host": hosts[0] if hosts else "",
        "n_href_chars": sum(len(h) for h in links),
        "n_entities": n_entities,
        "n_comments": n_comments,
        "skipped_chars": skipped,
        "first_word": text.split()[0] if text.split() else "",
    }


def write_html(doc_id: int, n_chars: int) -> str:
    """Deterministic-but-real HTML page exercising every tokenizer
    state: np = doc_id%4+2 paragraphs of nw = n_chars%5+3 words
    w{(31*id+7p+i)%100} (word 1 bolded inline; paragraph 0 carries the
    entity suffix ' &amp;&lt;&#65;&#x42;'; the last paragraph has a
    <br> instead of its first space and a void <img>); nl = doc_id%3+1
    link paragraphs with &amp;-encoded hrefs; nc = doc_id%2+1 comments
    containing fake tags and bare '>'; a quoted-'>' attribute trap
    span; script/style rawtext with '<' and fake tags inside."""
    np_ = doc_id % 4 + 2
    nw = n_chars % 5 + 3
    nl = doc_id % 3 + 1
    nc = doc_id % 2 + 1

    out = [
        "<!doctype HTML>",
        f"<html><head><title>Doc {doc_id}</title>",
        "<style>p{color:#000;}/*>*/</style>",
        f"<script>var x_{doc_id}={n_chars};if(1<2){{p('<i>not</i>')}}</script>",
        "</head><body>",
    ]
    comment = f"<!--hidden {doc_id} <p>x</p> > -->"
    for p in range(np_):
        words = [f"w{(31 * doc_id + 7 * p + i) % 100}" for i in range(nw)]
        words[1] = f"<b>{words[1]}</b>"
        body = " ".join(words)
        if p == 0:
            body += " &amp;&lt;&#65;&#x42;"
        if p == np_ - 1:
            body = body.replace(" ", "<br>", 1) + '<img src="x.png" alt="pic">'
        out.append(f'<p class="c{p}">{body}</p>')
        if p < nc:
            out.append(comment)
    for l in range(nl):
        host = (doc_id + 3 * l) % 4
        out.append(
            f'<p><a href="https://site{host}.example/p{l}?q=1&amp;r=2">link{l}</a></p>'
        )
    out.append("<div><span data-x=\"a>b\" title='c>d'>trap</span></div>")
    out.append("</body></html>")
    return "".join(out)


HTML_MEDIA_SCHEMA = "doc_id BIGINT, fmt STRING, payload STRING"

HTML_STATS_SCHEMA = (
    "doc_id BIGINT, title STRING, n_blocks INT, n_text_chars BIGINT, "
    "n_words BIGINT, n_links INT, n_hosts INT, first_link_host STRING, "
    "n_href_chars BIGINT, n_entities INT, n_comments INT, "
    "skipped_chars BIGINT, first_word STRING"
)


def synthesize_html_media(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars) -> (doc_id, fmt, payload): real HTML pages."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": "html",
                    "payload": [
                        write_html(int(d), int(c))
                        for d, c in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(batches, HTML_MEDIA_SCHEMA)


def html_extract_stats(media: DataFrame) -> DataFrame:
    """Tokenize + extract in ONE mapInPandas stage; only stats and
    short strings cross the Arrow boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id"] + [
            f.split()[0] for f in HTML_STATS_SCHEMA.split(", ")[1:]
        ]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = extract_html(payload)
                rows.append((int(doc_id),) + tuple(m[c] for c in cols[1:]))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, HTML_STATS_SCHEMA)
