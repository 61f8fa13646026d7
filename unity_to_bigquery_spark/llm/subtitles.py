"""Timed-text parsing (SRT + WebVTT) — caption corpora are the
supervision source for ASR/translation training sets, and the two
formats cover essentially all of them. From-scratch against the
public grammars:

- SRT: numbered blocks separated by blank lines, COMMA-millisecond
  timestamps `HH:MM:SS,mmm --> HH:MM:SS,mmm`;
- WebVTT: the `WEBVTT` magic, NOTE comment blocks, optional cue
  identifiers, DOT-millisecond timestamps with OPTIONAL hours
  (`MM:SS.mmm` is legal), cue settings after the arrow
  (`position:50%`) that are not text, `<v Speaker>` voice spans, and
  `<b>/<i>/<c>` markup stripped from text;
- strict time parsing (field ranges checked, end > start enforced).

Per-file outputs are exact integers (cue counts, summed spans in ms,
stripped text lengths, distinct speakers), so the whole grammar is
closed-form oracle-able. One mapInPandas stage."""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_TS_SRT = re.compile(r"^(\d{2}):(\d{2}):(\d{2}),(\d{3})$")
_TS_VTT = re.compile(r"^(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})$")
_TAG = re.compile(r"<[^>]*>")
_VOICE = re.compile(r"<v\s+([^>]+)>")


def _parse_ts(tok: str, vtt: bool) -> int:
    m = (_TS_VTT if vtt else _TS_SRT).match(tok)
    if not m:
        raise ValueError(f"malformed {'WebVTT' if vtt else 'SRT'} timestamp {tok!r}")
    h, mi, s, ms = (int(g) if g is not None else 0 for g in m.groups())
    if mi > 59 or s > 59:
        raise ValueError(f"timestamp field out of range in {tok!r}")
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def parse_timed_text(payload: str) -> dict:
    """Dispatch on the WEBVTT magic; parse cues; strip markup."""
    vtt = payload.startswith("WEBVTT")
    lines = payload.split("\n")
    i = 0
    if vtt:
        i = 1  # header line (may carry a label)
    cues: list[tuple[int, int, str]] = []
    speakers: set[str] = set()
    n_notes = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        if vtt and line.startswith("NOTE"):
            n_notes += 1
            while i < len(lines) and lines[i].strip():
                i += 1
            continue
        # optional SRT index / VTT cue id line
        if "-->" not in line:
            i += 1
            if i >= len(lines) or "-->" not in lines[i]:
                raise ValueError(f"cue id line not followed by timings: {line!r}")
            line = lines[i].strip()
        parts = line.split("-->")
        if len(parts) != 2:
            raise ValueError(f"malformed timing line {line!r}")
        start = _parse_ts(parts[0].strip(), vtt)
        tail = parts[1].strip().split()
        if not tail:
            raise ValueError(f"missing end timestamp in {line!r}")
        end = _parse_ts(tail[0], vtt)
        # tail[1:] are cue settings (position:, line:, align:) — not text
        if end <= start:
            raise ValueError(f"cue end {end} <= start {start}")
        i += 1
        text_lines = []
        while i < len(lines) and lines[i].strip():
            text_lines.append(lines[i].strip())
            i += 1
        raw = "\n".join(text_lines)
        for sp in _VOICE.findall(raw):
            speakers.add(sp.strip())
        cues.append((start, end, _TAG.sub("", raw)))
    if not cues:
        raise ValueError("no cues found")
    text = "\n".join(c[2] for c in cues)
    return {
        "fmt": "vtt" if vtt else "srt",
        "n_cues": len(cues),
        "span_ms_sum": sum(e - s for s, e, _ in cues),
        "text_chars": sum(len(c[2]) for c in cues),
        "n_words": len(text.split()),
        "first_start_ms": cues[0][0],
        "last_end_ms": cues[-1][1],
        "n_speakers": len(speakers),
        "n_notes": n_notes,
    }


def _fmt_ts(ms: int, vtt: bool, short: bool = False) -> str:
    h, rem = divmod(ms, 3600000)
    mi, rem = divmod(rem, 60000)
    s, ms_ = divmod(rem, 1000)
    sep = "." if vtt else ","
    if vtt and short and h == 0:
        return f"{mi:02d}:{s:02d}{sep}{ms_:03d}"
    return f"{h:02d}:{mi:02d}:{s:02d}{sep}{ms_:03d}"


def write_timed_text(doc_id: int, n_chars: int) -> str:
    """Deterministic caption file: fmt = srt (even doc_id) / vtt (odd).
    nc = n_chars%5+3 cues; cue k spans [base*k, base*k + 900+100*(k%4))
    with base = 2000*(doc_id%3+2); text 'c{k} w{(13*doc_id+k)%100}'.
    VTT adds a NOTE block, voice spans <v S{k%2}>, <b> markup, a cue
    id line on even k, SHORT MM:SS.mmm stamps while under an hour, and
    a position setting; SRT adds <i> markup (stripped) and indexes."""
    vtt = doc_id % 2 == 1
    nc = n_chars % 5 + 3
    base = 2000 * (doc_id % 3 + 2)
    out = []
    if vtt:
        out.append("WEBVTT - doc captions")
        out.append("")
        out.append("NOTE")
        out.append(f"synthetic fixture {doc_id}")
        out.append("")
    for k in range(nc):
        start, end = base * k, base * k + 900 + 100 * (k % 4)
        word = f"w{(13 * doc_id + k) % 100}"
        if vtt:
            if k % 2 == 0:
                out.append(f"cue-{k}")
            out.append(
                f"{_fmt_ts(start, True, short=True)} --> "
                f"{_fmt_ts(end, True, short=True)} position:50% align:center"
            )
            out.append(f"<v S{k % 2}>c{k} <b>{word}</b>")
        else:
            out.append(str(k + 1))
            out.append(f"{_fmt_ts(start, False)} --> {_fmt_ts(end, False)}")
            out.append(f"c{k} <i>{word}</i>")
        out.append("")
    return "\n".join(out)


SUBS_STATS_SCHEMA = (
    "doc_id BIGINT, fmt STRING, n_cues INT, span_ms_sum BIGINT, "
    "text_chars BIGINT, n_words INT, first_start_ms BIGINT, "
    "last_end_ms BIGINT, n_speakers INT, n_notes INT"
)


def timed_text_stats(docs: DataFrame) -> DataFrame:
    """Synthesize + parse in ONE mapInPandas stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id"] + [
            f.split()[0] for f in SUBS_STATS_SCHEMA.split(", ")[1:]
        ]
        for pdf in it:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                m = parse_timed_text(write_timed_text(int(doc_id), int(n_chars)))
                rows.append((int(doc_id),) + tuple(m[c] for c in cols[1:]))
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "n_chars").mapInPandas(batches, SUBS_STATS_SCHEMA)
