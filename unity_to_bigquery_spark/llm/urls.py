"""URL canonicalization — crawl dedup's prerequisite: the same
resource arrives under dozens of spellings, and a frontier/dedup that
compares raw strings both refetches and double-counts. From-scratch
against RFC 3986 section 6 (normalization) plus the standard crawler
conventions:

- scheme and host lowercased; default ports (:80 http, :443 https)
  removed; trailing root '/' ensured for empty paths;
- percent-encoding normalization: %XX of UNRESERVED characters
  (ALPHA / DIGIT / - . _ ~) decoded, everything else kept encoded
  with UPPERCASE hex digits (%3a -> %3A);
- dot-segment removal — the real RFC 3986 5.2.4 algorithm ('.', '..',
  leading '..' clamped at root);
- query canonicalization: parameters split on '&', stably SORTED by
  key (the crawler convention), empty parameters dropped, known
  tracking parameters (utm_*) stripped;
- fragment removal.

Everything is pure string algebra — at scale this runs as one
mapInPandas stage (or column expressions) over the frontier; here the
per-doc fixture URLs are messy spellings whose canonical forms are
closed-form, so the oracle hashes every normalization clause.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _norm_percent(s: str) -> str:
    """Decode %XX of unreserved chars; uppercase surviving hex."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%":
            if i + 3 > len(s):
                raise ValueError(f"truncated percent escape in {s!r}")
            hx = s[i + 1 : i + 3]
            try:
                b = int(hx, 16)
            except ValueError:
                raise ValueError(f"malformed percent escape %{hx} in {s!r}")
            ch = chr(b)
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hx.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 section 5.2.4, literally."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            cut = inp.find("/", 1)
            if cut < 0:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:cut])
                inp = inp[cut:]
    return "".join(out)


_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Full canonicalization; raises on URLs without scheme://host."""
    frag = url.find("#")
    if frag >= 0:
        url = url[:frag]
    sep = url.find("://")
    if sep < 0:
        raise ValueError(f"not an absolute URL: {url!r}")
    scheme = url[:sep].lower()
    rest = url[sep + 3 :]
    slash = len(rest)
    for stop in "/?":
        cut = rest.find(stop)
        if 0 <= cut < slash:
            slash = cut
    authority, tail = rest[:slash], rest[slash:]
    host, _, port = authority.partition(":")
    host = host.lower()
    if not host:
        raise ValueError(f"empty host in {url!r}")
    if port and port != _DEFAULT_PORTS.get(scheme):
        host = f"{host}:{port}"
    q = tail.find("?")
    path, query = (tail[:q], tail[q + 1 :]) if q >= 0 else (tail, "")
    path = remove_dot_segments(_norm_percent(path)) or "/"
    out = f"{scheme}://{host}{path}"
    if query:
        params = [
            p
            for p in (_norm_percent(x) for x in query.split("&"))
            if p and not p.lower().startswith("utm_")
        ]
        params.sort(key=lambda p: p.partition("=")[0])
        if params:
            out += "?" + "&".join(params)
    return out


def write_messy_url(doc_id: int, u: int) -> str:
    """Messy spelling u (class u%6) of a canonical target on host
    h{doc_id%5}.example — each class exercises one clause."""
    h = doc_id % 5
    c = u % 6
    if c == 0:  # case + default port
        return f"HTTP://H{h}.Example:80/a{u}/b"
    if c == 1:  # dot segments
        return f"http://h{h}.example/a{u}/x/../b/./c"
    if c == 2:  # unreserved percent-escapes decode; others uppercase
        return f"http://h{h}.example/%61{u}/%7Eu%3a"
    if c == 3:  # query sort + utm strip + empty params
        return f"http://h{h}.example/q{u}?zz=1&utm_source=x&aa=2&&bb=3"
    if c == 4:  # fragment removal + https default port
        return f"HTTPS://h{h}.example:443/f{u}#section-2"
    return f"http://h{h}.example:8080/p{u}"  # explicit non-default port


def canonical_expected(doc_id: int, u: int) -> str:
    h = doc_id % 5
    c = u % 6
    if c == 0:
        return f"http://h{h}.example/a{u}/b"
    if c == 1:
        return f"http://h{h}.example/a{u}/b/c"
    if c == 2:
        return f"http://h{h}.example/a{u}/~u%3A"
    if c == 3:
        return f"http://h{h}.example/q{u}?aa=2&bb=3&zz=1"
    if c == 4:
        return f"https://h{h}.example/f{u}"
    return f"http://h{h}.example:8080/p{u}"


URL_STATS_SCHEMA = (
    "doc_id BIGINT, n_urls INT, n_changed INT, canon_len_sum BIGINT, "
    "raw_len_sum BIGINT, n_hosts INT, first_canon STRING"
)


def url_canonicalize_stats(docs: DataFrame) -> DataFrame:
    """Canonicalize nu = n_chars%6+5 messy URLs per doc in ONE
    mapInPandas stage; per-doc aggregates hash every clause."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split()[0] for f in URL_STATS_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nu = int(n_chars) % 6 + 5
                raw = [write_messy_url(int(doc_id), u) for u in range(nu)]
                canon = [canonicalize_url(x) for x in raw]
                hosts = {c.split("://", 1)[1].split("/", 1)[0] for c in canon}
                rows.append(
                    (
                        int(doc_id), nu,
                        sum(1 for r, c in zip(raw, canon) if r != c),
                        sum(len(c) for c in canon),
                        sum(len(r) for r in raw),
                        len(hosts),
                        canon[0],
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "n_chars").mapInPandas(batches, URL_STATS_SCHEMA)
