"""License-header detection — the compliance gate of every CODE
training-data pipeline (the StarCoder/The-Stack recipe: detect the
license, keep permissive, drop copyleft, always strip PII/attribution
correctly). Public technique, public texts:

- comment-syntax stripping for the three dominant styles
  (`// ...`, `# ...`, `/* * ... */`);
- normalization: lowercase, every non-alphanumeric run collapsed to
  one space (defeats wrapping, punctuation, and spacing variance);
- EXACT detection: each license's canonical key phrase (from the
  published SPDX texts) searched in the normalized header;
- FUZZY detection: token 5-gram CONTAINMENT of the phrase's shingles
  in the header's shingles (>= 0.6), which survives inserted words
  and light paraphrase — the standard shingle trick reused from the
  dedup family;
- copyright attribution: `Copyright (c) YYYY Holder` extraction.

Fixtures plant each license under each comment style plus a
word-inserted MIT variant (exact MUST fail, fuzzy MUST catch it) and
a no-license class, so the oracle hashes the whole decision table.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# canonical key phrases from the published license texts
LICENSE_PHRASES = {
    "MIT": (
        "permission is hereby granted free of charge to any person "
        "obtaining a copy of this software"
    ),
    "Apache-2.0": (
        "licensed under the apache license version 2 0 you may not use "
        "this file except in compliance with the license"
    ),
    "GPL-3.0": (
        "this program is free software you can redistribute it and or "
        "modify it under the terms of the gnu general public license"
    ),
    "BSD-3-Clause": (
        "redistribution and use in source and binary forms with or "
        "without modification are permitted provided that the following "
        "conditions are met"
    ),
}

_COPYRIGHT = re.compile(r"copyright \(c\) (\d{4}) ([A-Za-z][A-Za-z0-9]*)", re.I)
_NONWORD = re.compile(r"[^a-z0-9]+")


def strip_comment_markers(line: str) -> str:
    s = line.strip()
    for marker in ("/*", "*/", "//"):
        s = s.replace(marker, " ")
    if s.startswith("#"):
        s = s[1:]
    elif s.startswith("*"):
        s = s[1:]
    return s.strip()


def normalize(text: str) -> str:
    return _NONWORD.sub(" ", text.lower()).strip()


def _shingles(tokens: list[str], k: int = 5) -> set[tuple[str, ...]]:
    return {tuple(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def detect_license(source: str, header_lines: int = 40) -> dict:
    """Detect a license in the leading comment header. Returns
    {license, match_kind (exact/fuzzy/none), copyright_year, holder}."""
    head = source.split("\n")[:header_lines]
    stripped = " ".join(strip_comment_markers(ln) for ln in head)
    norm = normalize(stripped)
    for name, phrase in LICENSE_PHRASES.items():
        if phrase in norm:
            lic, kind = name, "exact"
            break
    else:
        header_sh = _shingles(norm.split())
        best, best_c = "none", 0.0
        for name, phrase in LICENSE_PHRASES.items():
            ph = _shingles(phrase.split())
            c = len(ph & header_sh) / len(ph)
            if c > best_c:
                best, best_c = name, c
        lic, kind = (best, "fuzzy") if best_c >= 0.6 else ("none", "none")
    m = _COPYRIGHT.search(stripped)
    return {
        "license": lic,
        "match_kind": kind,
        "copyright_year": int(m.group(1)) if m else 0,
        "holder": m.group(2) if m else "",
    }


_CANON_TEXT = {
    "MIT": (
        "Permission is hereby granted, free of charge, to any person "
        "obtaining a copy of this software and associated documentation "
        "files."
    ),
    "Apache-2.0": (
        "Licensed under the Apache License, Version 2.0; you may not "
        "use this file except in compliance with the License."
    ),
    "GPL-3.0": (
        "This program is free software: you can redistribute it and/or "
        "modify it under the terms of the GNU General Public License."
    ),
    "BSD-3-Clause": (
        "Redistribution and use in source and binary forms, with or "
        "without modification, are permitted provided that the "
        "following conditions are met."
    ),
}

# word-inserted MIT variant: exact must fail, 5-gram containment must
# still clear 0.6 (insertion after token 1 leaves a long intact run)
_MIT_FUZZY = (
    "Permission is (absolutely) hereby granted, free of charge, to any "
    "person obtaining a copy of this software and associated "
    "documentation files."
)

_CLASSES = ["MIT", "Apache-2.0", "GPL-3.0", "BSD-3-Clause", "MIT_FUZZY", "NONE"]


def write_source_file(doc_id: int, n_chars: int) -> str:
    """Deterministic source file: license class doc_id%6 (four exact,
    one fuzzy-MIT, one none), comment style doc_id%3 (//, #, /* */),
    'Copyright (c) {2000+doc_id%25} Holder{doc_id%10}' when licensed,
    then n_chars%7+3 code lines."""
    cls = _CLASSES[doc_id % 6]
    style = doc_id % 3
    ncode = n_chars % 7 + 3

    header: list[str] = []
    if cls != "NONE":
        text = _MIT_FUZZY if cls == "MIT_FUZZY" else _CANON_TEXT[cls]
        year = 2000 + doc_id % 25
        wrapped: list[str] = []
        cur = ""
        for w in text.split():
            if len(cur) + len(w) + 1 > 60 and cur:
                wrapped.append(cur)
                cur = w
            else:
                cur = f"{cur} {w}".strip()
        if cur:
            wrapped.append(cur)
        lines = [f"Copyright (c) {year} Holder{doc_id % 10}", ""] + wrapped
        if style == 0:
            header = ["// " + ln for ln in lines]
        elif style == 1:
            header = ["# " + ln for ln in lines]
        else:
            header = ["/*"] + [" * " + ln for ln in lines] + [" */"]
    code = [f"def f{doc_id}_{i}(): return {i}" for i in range(ncode)]
    return "\n".join(header + code)


LICENSE_STATS_SCHEMA = (
    "doc_id BIGINT, license STRING, match_kind STRING, "
    "copyright_year INT, holder STRING, n_lines INT"
)


def license_detect_stats(docs: DataFrame) -> DataFrame:
    """Synthesize + detect in ONE mapInPandas stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split()[0] for f in LICENSE_STATS_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                src = write_source_file(int(doc_id), int(n_chars))
                m = detect_license(src)
                rows.append(
                    (
                        int(doc_id), m["license"], m["match_kind"],
                        m["copyright_year"], m["holder"],
                        src.count("\n") + 1,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, LICENSE_STATS_SCHEMA
    )
