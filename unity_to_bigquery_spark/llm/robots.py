"""robots.txt parsing + URL admission — the crawl-frontier filter
that decides which URLs a pipeline may fetch at all (upstream of the
WARC/HTML stages). From-scratch against the public Robots Exclusion
Protocol (RFC 9309 + the de-facto Google extensions it standardized):

- line grammar: `field: value`, case-insensitive field names, `#`
  comments (inline and whole-line), blank-line tolerance, CRLF, an
  optional UTF-8 BOM, unknown directives (crawl-delay) skipped;
- GROUPS: consecutive user-agent lines share the following rules; the
  evaluator picks the group whose agent token is the LONGEST
  case-insensitive prefix of the product token, falling back to `*`;
- rule patterns: `*` wildcards and the `$` end anchor;
- precedence: the LONGEST matching pattern wins (octet length of the
  pattern); on a tie, Allow beats Disallow; no match means allowed.

The fixtures exercise every clause: a decoy group that must NOT be
picked, multi-user-agent groups, mixed-case field names, wildcard+
anchor rules beating shorter literal rules, a longer Allow beating a
shorter Disallow, an exact Allow/Disallow tie resolved to Allow, and
hosts with no agent-specific group falling back to `*`.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """Parse robots.txt into groups: ([agent tokens], [(is_allow,
    pattern), ...]). Consecutive user-agent lines open ONE group;
    rules before any user-agent line are ignored per RFC."""
    if text.startswith("\ufeff"):
        text = text[1:]
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    collecting_agents = False

    def flush() -> None:
        nonlocal agents, rules
        if agents:
            groups.append((agents, rules))
        agents, rules = [], []

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not collecting_agents:
                flush()
                collecting_agents = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            collecting_agents = False
            if agents:  # rules outside any group are ignored
                rules.append((field == "allow", value))
        else:  # crawl-delay, sitemap, unknown directives
            collecting_agents = False
    flush()
    return groups


def select_group(
    groups: list[tuple[list[str], list[tuple[bool, str]]]], agent: str
) -> tuple[str, list[tuple[bool, str]]]:
    """Longest case-insensitive agent-token prefix match; '*' is the
    fallback. Returns (winning token, rules)."""
    product = agent.split("/", 1)[0].lower()
    best: tuple[int, str, list] | None = None
    star: list | None = None
    star_seen = False
    for agents, rules in groups:
        for tok in agents:
            if tok == "*":
                if not star_seen:
                    star, star_seen = rules, True
            elif product.startswith(tok) and (best is None or len(tok) > best[0]):
                best = (len(tok), tok, rules)
    if best is not None:
        return best[1], best[2]
    if star_seen:
        return "*", star
    return "", []


def _pattern_matches(pattern: str, path: str) -> bool:
    rx = "^"
    body, anchored = (pattern[:-1], True) if pattern.endswith("$") else (pattern, False)
    for ch in body:
        rx += ".*" if ch == "*" else re.escape(ch)
    if anchored:
        rx += "$"
    return re.match(rx, path) is not None


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """RFC 9309 precedence: longest matching pattern wins; ties go to
    Allow; empty-pattern rules and no-match default to allowed."""
    best_len = -1
    best_allow = True
    for is_allow, pattern in rules:
        if not pattern:
            continue  # 'Disallow:' (empty) allows everything
        if _pattern_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and is_allow and not best_allow):
                best_len, best_allow = plen, is_allow
    return best_allow


def write_robots(host_variant: int) -> str:
    """Four deterministic robots.txt variants (host = doc_id%4):
    0: multi-UA group for graftbot (5 rules incl. wildcard+$ and the
       /t tie), decoy 'other' group, '*' group, BOM, comments;
    1: MIXED-CASE graftbot group with an extra 'Disallow: /r/' (6);
    2: no graftbot group -> '*' fallback (1 rule);
    3: '*' fallback with an added wildcard Disallow (2 rules)."""
    star_extra = "Disallow: /p/*/x$\r\n" if host_variant == 3 else ""
    if host_variant == 0:
        return (
            "\ufeff# robots for host-0\r\n"
            "User-agent: other\r\n"
            "Disallow: /\r\n"
            "\r\n"
            "User-agent: foo\r\n"
            "User-agent: graftbot\r\n"
            "Allow: /p/*/x$\r\n"
            "Disallow: /p/  # trailing comment\r\n"
            "Allow: /p/0\r\n"
            "Allow: /t\r\n"
            "Disallow: /t\r\n"
            "Crawl-delay: 10\r\n"
            "\r\n"
            "User-agent: *\r\n"
            "Disallow: /q\r\n"
        )
    if host_variant == 1:
        return (
            "USER-AGENT: other\r\n"
            "Disallow: /\r\n"
            "User-Agent: GRAFTBOT\r\n"
            "ALLOW: /p/*/x$\r\n"
            "DISALLOW: /p/\r\n"
            "Allow: /p/0\r\n"
            "Allow: /t\r\n"
            "Disallow: /t\r\n"
            "Disallow: /r/\r\n"
            "User-agent: *\r\n"
            "Disallow: /q\r\n"
        )
    if host_variant == 2:
        return (
            "User-agent: other\r\n"
            "Disallow: /\r\n"
            "User-agent: *\r\n"
            "Disallow: /q\r\n"
        )
    return (
        "User-agent: other\r\n"
        "Disallow: /\r\n"
        "User-agent: *\r\n"
        "Disallow: /q\r\n" + star_extra
    )


_AGENT = "GraftBot/1.0"


def crawl_paths(doc_id: int, n_chars: int) -> list[str]:
    """nu = n_chars%6+4 URLs per doc; class u%5 exercises a distinct
    precedence clause: 0 longer-Allow-beats-Disallow, 1 plain
    Disallow, 2 wildcard+anchor Allow, 3 untouched prefix, 4 exact
    Allow/Disallow tie."""
    nu = n_chars % 6 + 4
    out = []
    for u in range(nu):
        c = u % 5
        if c == 0:
            out.append(f"/p/0{u}")
        elif c == 1:
            out.append(f"/p/{u}")
        elif c == 2:
            out.append(f"/p/{u}/x")
        elif c == 3:
            out.append(f"/r/{u}")
        else:
            out.append("/t")
    return out


ROBOTS_STATS_SCHEMA = (
    "doc_id BIGINT, host_variant INT, picked_group STRING, "
    "n_rules INT, n_urls INT, n_allowed INT, n_denied INT"
)


def robots_filter_stats(docs: DataFrame) -> DataFrame:
    """Parse + group-select + per-URL admission in ONE mapInPandas
    stage (each task holds the 4 tiny robots variants; per doc only
    counters cross the Arrow boundary). At crawl scale the same
    evaluator broadcast-joins a robots dimension against the frontier."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parsed = {
            v: select_group(parse_robots(write_robots(v)), _AGENT)
            for v in range(4)
        }
        cols = [f.split()[0] for f in ROBOTS_STATS_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                v = int(doc_id) % 4
                tok, rules = parsed[v]
                paths = crawl_paths(int(doc_id), int(n_chars))
                allowed = sum(robots_allowed(rules, p) for p in paths)
                rows.append(
                    (
                        int(doc_id), v, tok, len(rules), len(paths),
                        allowed, len(paths) - allowed,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, ROBOTS_STATS_SCHEMA
    )
