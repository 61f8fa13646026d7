"""Punycode / IDNA host decoding — internationalized domains reach a
crawler as `xn--` ACE labels, and URL canonicalization / host-level
dedup must treat the Unicode and ACE spellings as one host. The
bootstring algorithm implemented here is RFC 3492 verbatim (both
directions): the generalized variable-length integers with
bias ADAPTATION (damp 700, skew 38, tmin/tmax 1/26), the basic/
extended split at the last hyphen-minus, and the insertion-sort
decoding of code points. The unit test differentials both directions
against the stdlib 'punycode' codec over fixtures AND random Unicode
labels.
"""

from __future__ import annotations

_BASE = 36
_TMIN, _TMAX = 1, 26
_SKEW, _DAMP = 38, 700
_INITIAL_BIAS = 72
_INITIAL_N = 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + ((_BASE - _TMIN + 1) * delta) // (delta + _SKEW)


def _digit_char(d: int) -> str:
    return chr(d + 22 + 75 * (d < 26))  # a-z then 0-9


def _digit_val(c: str) -> int:
    if "a" <= c <= "z":
        return ord(c) - ord("a")
    if "A" <= c <= "Z":
        return ord(c) - ord("A")
    if "0" <= c <= "9":
        return ord(c) - ord("0") + 26
    raise ValueError(f"invalid punycode digit {c!r}")


def punycode_encode(label: str) -> str:
    basic = [c for c in label if ord(c) < 128]
    out = list(basic)
    if basic:
        out.append("-")
    n, delta, bias = _INITIAL_N, 0, _INITIAL_BIAS
    h = b = len(basic)
    while h < len(label):
        m = min(ord(c) for c in label if ord(c) >= n)
        delta += (m - n) * (h + 1)
        n = m
        for c in label:
            cp = ord(c)
            if cp < n:
                delta += 1
            elif cp == n:
                q = delta
                k = _BASE
                while True:
                    t = max(_TMIN, min(_TMAX, k - bias))
                    if q < t:
                        break
                    out.append(_digit_char(t + (q - t) % (_BASE - t)))
                    q = (q - t) // (_BASE - t)
                    k += _BASE
                out.append(_digit_char(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def punycode_decode(s: str) -> str:
    cut = s.rfind("-")
    output = list(s[:cut]) if cut > 0 else []
    if any(ord(c) >= 128 for c in output):
        raise ValueError("punycode basic part must be ASCII")
    i, n, bias = 0, _INITIAL_N, _INITIAL_BIAS
    pos = cut + 1 if cut > 0 else 0
    while pos < len(s):
        oldi = i
        w = 1
        k = _BASE
        while True:
            if pos >= len(s):
                raise ValueError("truncated punycode variable integer")
            d = _digit_val(s[pos])
            pos += 1
            i += d * w
            t = max(_TMIN, min(_TMAX, k - bias))
            if d < t:
                break
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        if n > 0x10FFFF:
            raise ValueError("punycode code point out of range")
        i %= len(output) + 1
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def idna_decode_host(host: str) -> str:
    """Decode each xn-- label of a hostname; ASCII labels pass."""
    out = []
    for label in host.split("."):
        if label.lower().startswith("xn--"):
            out.append(punycode_decode(label[4:]))
        else:
            out.append(label)
    return ".".join(out)


def idna_encode_host(host: str) -> str:
    out = []
    for label in host.split("."):
        if any(ord(c) >= 128 for c in label):
            out.append("xn--" + punycode_encode(label))
        else:
            out.append(label)
    return ".".join(out)
