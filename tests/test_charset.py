"""Charset sniff/transcode semantics: the from-scratch UTF-8 validator
is fuzz-equivalent to the stdlib codec, UTF-16 surrogate handling is
exact, the 1252 fallback triggers on the almost-valid fixtures, and
every overlong/surrogate/ceiling guard actually fires."""

import random

import pytest

from unity_to_bigquery_spark.llm.charset import (
    sniff_decode,
    utf8_scan,
    utf16_decode,
    w1252_decode,
    write_encoded,
)


def test_utf8_scanner_fuzz_equivalent_to_codec():
    random.seed(1234)
    for _ in range(5000):
        data = bytes(random.randrange(256) for _ in range(random.randrange(24)))
        cps, errs = utf8_scan(data)
        try:
            ref = data.decode("utf-8")
            assert errs == 0 and cps == [ord(c) for c in ref]
        except UnicodeDecodeError:
            assert errs > 0


def test_utf8_guards():
    # overlongs: C0 80 (2-byte NUL), E0 80 80, F0 80 80 80
    for bad in (b"\xc0\x80", b"\xc1\xbf", b"\xe0\x9f\xbf", b"\xf0\x8f\xbf\xbf"):
        assert utf8_scan(bad)[1] > 0, bad
    # shortest legal forms at each width boundary decode exactly
    assert utf8_scan(b"\xc2\x80") == ([0x80], 0)
    assert utf8_scan(b"\xe0\xa0\x80") == ([0x800], 0)
    assert utf8_scan(b"\xf0\x90\x80\x80") == ([0x10000], 0)
    # surrogate range ED A0 80 (U+D800) is invalid; ED 9F BF (U+D7FF) fine
    assert utf8_scan(b"\xed\xa0\x80")[1] > 0
    assert utf8_scan(b"\xed\x9f\xbf") == ([0xD7FF], 0)
    # ceiling: F4 8F BF BF = U+10FFFF ok, F4 90 80 80 invalid
    assert utf8_scan(b"\xf4\x8f\xbf\xbf") == ([0x10FFFF], 0)
    assert utf8_scan(b"\xf4\x90\x80\x80")[1] > 0
    # truncation mid-sequence: error at E4, resync hits the lone B8
    assert utf8_scan(b"\xe4\xb8") == ([], 2)


def test_utf16_surrogates():
    # 😀 U+1F600 = D83D DE00
    assert utf16_decode(b"\x3d\xd8\x00\xde", little=True) == [0x1F600]
    assert utf16_decode(b"\xd8\x3d\xde\x00", little=False) == [0x1F600]
    with pytest.raises(ValueError, match="lone high"):
        utf16_decode(b"\x3d\xd8\x41\x00", little=True)
    with pytest.raises(ValueError, match="lone low"):
        utf16_decode(b"\x00\xde", little=True)
    with pytest.raises(ValueError, match="odd"):
        utf16_decode(b"\x41", little=True)


def test_w1252_remap_and_fallback():
    # remapped points vs latin-1 passthrough
    assert w1252_decode(b"\x80\x93\x94\xe9") == [0x20AC, 0x201C, 0x201D, 0xE9]
    assert w1252_decode(b"\xa0\xff") == [0xA0, 0xFF]
    # the 1252 fixture is ALMOST-valid UTF-8: E9 80 93 parses as one
    # spurious CJK codepoint, the lone 94 trips the fallback
    m = sniff_decode(write_encoded(4, 100))  # enc = 4%5 = 4
    assert m["encoding"] == "windows-1252" and m["n_utf8_errors"] == 1
    # BOMs win
    assert sniff_decode(write_encoded(1, 100))["encoding"] == "utf-8-bom"
    assert sniff_decode(write_encoded(2, 100))["encoding"] == "utf-16le"
    assert sniff_decode(write_encoded(3, 100))["encoding"] == "utf-16be"
    assert sniff_decode(write_encoded(0, 100))["encoding"] == "utf-8"
    # all unicode encodings of the same text agree on codepoint stats
    ms = [sniff_decode(write_encoded(e * 5 + 10, 100)) for e in range(4)]
    assert len({(m["n_codepoints"], m["n_astral"]) for m in ms}) == 1


def test_robots_grammar_and_precedence():
    """RFC 9309 mechanics exercised directly: group selection, rule
    precedence, wildcard/anchor matching, and grammar tolerance."""
    from unity_to_bigquery_spark.llm.robots import (
        parse_robots,
        robots_allowed,
        select_group,
        write_robots,
    )

    # longest agent token wins over shorter and over '*'
    txt = (
        "User-agent: graft\nDisallow: /a\n"
        "User-agent: graftbot\nDisallow: /b\n"
        "User-agent: *\nDisallow: /c\n"
    )
    tok, rules = select_group(parse_robots(txt), "GraftBot/2.1")
    assert tok == "graftbot" and rules == [(False, "/b")]
    # agent with no matching group falls back to '*'
    tok, rules = select_group(parse_robots(txt), "Other/1.0")
    assert tok == "*" and rules == [(False, "/c")]

    # precedence: longest pattern wins; tie -> Allow; empty Disallow
    rules = [(False, "/p/"), (True, "/p/0")]
    assert robots_allowed(rules, "/p/05")
    assert not robots_allowed(rules, "/p/15")
    assert robots_allowed([(True, "/t"), (False, "/t")], "/t")
    assert robots_allowed([(False, "")], "/anything")
    # wildcard + anchor: matches exactly-/x-terminated paths only
    r = [(True, "/p/*/x$"), (False, "/p/")]
    assert robots_allowed(r, "/p/7/x")
    assert not robots_allowed(r, "/p/7/xy")
    # '$' not at pattern end is literal-ish; '*' spans segments
    assert robots_allowed([(False, "/a*z")], "/azz") is False
    assert robots_allowed([(False, "/a*z")], "/a/b/c/z") is False
    assert robots_allowed([(False, "/a*z")], "/a/b") is True

    # grammar: BOM, CRLF, comments, mixed case, multi-UA groups,
    # unknown directives, rules before any group ignored
    groups = parse_robots(write_robots(0))
    assert groups[0][0] == ["other"]
    assert groups[1][0] == ["foo", "graftbot"] and len(groups[1][1]) == 5
    assert parse_robots("Disallow: /orphan\nUser-agent: a\nDisallow: /x\n") == [
        (["a"], [(False, "/x")])
    ]


def test_url_canonicalization_clauses():
    """RFC 3986 normalization mechanics exercised directly."""
    import pytest

    from unity_to_bigquery_spark.llm.urls import (
        canonicalize_url,
        remove_dot_segments,
    )

    # the RFC's own 5.2.4 walk-throughs
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
    # leading .. clamps at root; trailing '.' keeps the slash
    assert remove_dot_segments("/../../x") == "/x"
    assert remove_dot_segments("/a/.") == "/a/"

    assert canonicalize_url("HTTP://ExAmPle.COM:80/") == "http://example.com/"
    assert canonicalize_url("https://example.com:443/a") == "https://example.com/a"
    # non-default ports survive; empty path becomes /
    assert canonicalize_url("http://example.com:8080") == "http://example.com:8080/"
    # unreserved escapes decode, others uppercase
    assert (
        canonicalize_url("http://e.com/%7Euser/%61%2Fb")
        == "http://e.com/~user/a%2Fb"
    )
    # query: sort, drop empties, strip utm_*, keep duplicates stably
    assert (
        canonicalize_url("http://e.com/p?b=2&utm_campaign=z&a=1&&a=0")
        == "http://e.com/p?a=1&a=0&b=2"
    )
    # all-utm query disappears entirely
    assert canonicalize_url("http://e.com/p?utm_source=x") == "http://e.com/p"
    # fragment removal
    assert canonicalize_url("http://e.com/p#frag?fake=1") == "http://e.com/p"

    with pytest.raises(ValueError, match="absolute"):
        canonicalize_url("/relative/only")
    with pytest.raises(ValueError, match="percent"):
        canonicalize_url("http://e.com/%zz")
    with pytest.raises(ValueError, match="percent"):
        canonicalize_url("http://e.com/broken%2")


def test_timed_text_grammar():
    """SRT/WebVTT mechanics: timestamp forms, strictness, markup
    stripping, settings exclusion, hour-rollover formatting."""
    import pytest

    from unity_to_bigquery_spark.llm.subtitles import (
        _fmt_ts,
        _parse_ts,
        parse_timed_text,
    )

    assert _parse_ts("01:02:03,456", vtt=False) == 3723456
    assert _parse_ts("01:02:03.456", vtt=True) == 3723456
    assert _parse_ts("02:03.456", vtt=True) == 123456  # optional hours
    assert _parse_ts("100:00:00.000", vtt=True) == 360000000  # >2-digit hours
    with pytest.raises(ValueError, match="timestamp"):
        _parse_ts("01:02:03.456", vtt=False)  # dot in SRT
    with pytest.raises(ValueError, match="range"):
        _parse_ts("00:99:00,000", vtt=False)
    # round trip through the formatter, incl. the >1h long form
    assert _fmt_ts(3723456, vtt=True) == "01:02:03.456"
    assert _parse_ts(_fmt_ts(5400000, vtt=True), vtt=True) == 5400000

    vtt = (
        "WEBVTT\n\nNOTE\nmeta\n\n"
        "id-1\n00:01.000 --> 01:01:02.500 position:10% align:start\n"
        "<v Alice>hi <b>there</b>\n\n"
        "00:02.000 --> 00:03.000\n<v Bob>yo\n"
    )
    m = parse_timed_text(vtt)
    assert m["fmt"] == "vtt" and m["n_cues"] == 2 and m["n_notes"] == 1
    assert m["n_speakers"] == 2
    assert m["text_chars"] == len("hi there") + len("yo")
    assert m["last_end_ms"] == 3000 and m["span_ms_sum"] == 3661500 + 1000

    with pytest.raises(ValueError, match="end"):
        parse_timed_text("1\n00:00:02,000 --> 00:00:01,000\nx\n")
    with pytest.raises(ValueError, match="no cues"):
        parse_timed_text("WEBVTT\n\n")
    with pytest.raises(ValueError, match="cue id"):
        parse_timed_text("WEBVTT\n\norphan line\nanother\n")


def test_license_detection_mechanics():
    """Exact phrase matching across comment styles, fuzzy containment
    behavior, and attribution extraction."""
    from unity_to_bigquery_spark.llm.licenses import (
        detect_license,
        normalize,
        strip_comment_markers,
    )

    assert strip_comment_markers("// hello") == "hello"
    assert strip_comment_markers(" * wrapped line") == "wrapped line"
    assert strip_comment_markers("/* block */") == "block"
    assert normalize("Version 2.0, (c)!") == "version 2 0 c"

    mit = (
        "# Copyright (c) 2019 Acme\n#\n# Permission is hereby granted, "
        "free of charge, to any person\n# obtaining a copy of this "
        "software and associated documentation\n# files.\nprint(1)\n"
    )
    m = detect_license(mit)
    assert (m["license"], m["match_kind"]) == ("MIT", "exact")
    assert (m["copyright_year"], m["holder"]) == (2019, "Acme")

    # a word insertion defeats exact but not 5-gram containment
    fuzzy = mit.replace("Permission is hereby", "Permission is (totally) hereby")
    m = detect_license(fuzzy)
    assert (m["license"], m["match_kind"]) == ("MIT", "fuzzy")

    # unrelated prose is not a license; attribution still extracted
    m = detect_license("// Copyright (c) 2021 Zed\n// just a util\nx = 1\n")
    assert (m["license"], m["match_kind"]) == ("none", "none")
    assert m["holder"] == "Zed"

    # the license must be in the HEADER — body mentions don't count
    body = "\n".join(["x = %d" % i for i in range(60)]) + (
        "\n# Permission is hereby granted, free of charge, to any "
        "person obtaining a copy of this software"
    )
    assert detect_license(body)["license"] == "none"


def test_eml_mime_mechanics():
    """MIME decoders and header grammar, plus the stdlib-email
    differential on the full fixture."""
    import email
    import email.policy

    import pytest

    from unity_to_bigquery_spark.llm.email_mime import (
        b64_decode,
        b64_encode,
        decode_header_value,
        parse_eml,
        qp_decode,
        write_eml,
    )

    # base64: round trips at all pad lengths; malformed padding loud
    for raw in (b"", b"a", b"ab", b"abc", b"abcd", bytes(range(255))):
        assert b64_decode(b64_encode(raw)) == raw
    with pytest.raises(ValueError, match="padding"):
        b64_decode("a=bc")
    with pytest.raises(ValueError, match="multiple of 4"):
        b64_decode("abcde")
    with pytest.raises(ValueError, match="invalid base64"):
        b64_decode("ab!d")

    # quoted-printable: multibyte escapes, soft breaks, self-escape
    assert qp_decode("caf=C3=A9=\r\nok x=3Dy") == "caféok x=y"
    with pytest.raises(ValueError, match="quoted-printable"):
        qp_decode("bad =zz escape")

    # RFC 2047: B and Q forms, underscore-space, passthrough text
    assert decode_header_value("=?utf-8?B?U8O8YmplY3Q=?=") == "Sübject"
    assert decode_header_value("=?utf-8?Q?a_b=C3=A9?=") == "a bé"
    assert decode_header_value("plain stays") == "plain stays"

    # differential vs the stdlib email package over a doc grid
    for d in range(8):
        raw = write_eml(d, 100 + d)
        msg = email.message_from_string(raw, policy=email.policy.default)
        ours = parse_eml(raw)
        assert str(msg["subject"]) == ours["subject"]
        assert msg["from"] == ours["from_addr"]
        assert len(list(msg.walk())) - 1 == ours["n_parts"]

    # strictness: missing terminal boundary / missing boundary param
    raw = write_eml(2, 100)
    with pytest.raises(ValueError, match="terminal"):
        parse_eml(raw.replace("--bnd2--", "--bnd2"))
    with pytest.raises(ValueError, match="boundary"):
        parse_eml(raw.replace(' boundary="bnd2"', ""))


def test_punycode_bootstring():
    """RFC 3492 vectors + stdlib differential + strictness."""
    import codecs
    import random

    import pytest

    from unity_to_bigquery_spark.llm.idn import (
        idna_decode_host,
        idna_encode_host,
        punycode_decode,
        punycode_encode,
    )

    # the RFC's own section-7.1 samples (German, and Japanese sample A)
    assert punycode_encode("bücher") == "bcher-kva"
    assert punycode_decode("bcher-kva") == "bücher"
    ja = "3年B組金八先生"
    assert punycode_encode(ja) == codecs.encode(ja, "punycode").decode()
    assert punycode_decode(punycode_encode(ja)) == ja

    random.seed(7)
    for _ in range(1500):
        label = "".join(
            random.choice("abz09üéß日本中文अ한") for _ in range(random.randrange(1, 12))
        )
        ref = codecs.encode(label, "punycode").decode()
        assert punycode_encode(label) == ref
        assert punycode_decode(ref) == label

    assert idna_encode_host("bücher.example") == "xn--bcher-kva.example"
    assert idna_decode_host("xn--bcher-kva.example") == "bücher.example"
    # mixed-label hosts: only xn-- labels decode
    assert idna_decode_host("www.xn--caf-dma.org") == "www.café.org"

    with pytest.raises(ValueError, match="digit"):
        punycode_decode("abc-!!")
    with pytest.raises(ValueError, match="truncated"):
        punycode_decode("abc-kv" + "z" * 0 + "")  # dangling vint
