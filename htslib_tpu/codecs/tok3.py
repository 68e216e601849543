"""Name tokeniser (reference call sites cram/cram_io.c:1737,1891
tok3_encode_names/tok3_decode_names; implementation in the htscodecs
submodule — EMPTY in this snapshot — tokenise_name3.c).

Read names split into digit/non-digit token columns; each column codes
per-name as MATCH (same as previous name's token), DELTA (numeric
difference from the previous name, the big win for instrument:run:x:y
style names), literal DIGITS (with zero-padded width) or literal STRING.
Column streams concatenate and compress with rANS Nx16 order-1.
Self-consistent wire format (cross-validation impossible here).

The CRAM-facing payload is NUL-separated names, matching the RN data
series' byte_array_stop framing.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

from htslib_tpu.codecs import rans4x16
from htslib_tpu.codecs.rans4x16 import u7_get, u7_put

T_END = 0      # no token in this column
T_MATCH = 1    # identical to previous name's token
T_DELTA = 2    # numeric, value = prev + delta (0..255)
T_DIGITS = 3   # numeric literal (value + zero-padded width)
T_STRING = 4   # string literal (NUL-terminated)

_TOKEN_RE = re.compile(rb"\d+|\D+")


def _tokenize(name: bytes) -> List[bytes]:
    return _TOKEN_RE.findall(name)


def encode_names(names: List[bytes]) -> bytes:
    cols: List[bytearray] = []
    prev_toks: List[bytes] = []
    out = bytearray()
    u7_put(out, len(names))
    for name in names:
        toks = _tokenize(name)
        while len(cols) < len(toks) + 1:
            cols.append(bytearray())
        for ci, tok in enumerate(toks):
            col = cols[ci]
            prev = prev_toks[ci] if ci < len(prev_toks) else None
            if tok == prev:
                col.append(T_MATCH)
            elif tok.isdigit():
                v = int(tok)
                pv = int(prev) if prev is not None and prev.isdigit() else None
                if (pv is not None and 0 <= v - pv <= 255
                        and len(tok) == len(prev)):
                    col.append(T_DELTA)
                    col.append(v - pv)
                else:
                    col.append(T_DIGITS)
                    col.append(len(tok))   # zero-padded width
                    u7_put(col, v)
            else:
                col.append(T_STRING)
                col += tok + b"\0"
        cols[len(toks)].append(T_END)
        prev_toks = toks
    u7_put(out, len(cols))
    blob = bytearray()
    for col in cols:
        u7_put(out, len(col))
        blob += col
    comp = rans4x16.compress(bytes(blob), rans4x16.O_ORDER1)
    u7_put(out, len(comp))
    out += comp
    return bytes(out)


def decode_names(buf: bytes) -> bytes:
    """Returns NUL-separated names (the RN series payload)."""
    n_names, p = u7_get(buf, 0)
    n_cols, p = u7_get(buf, p)
    col_lens = []
    for _ in range(n_cols):
        v, p = u7_get(buf, p)
        col_lens.append(v)
    clen, p = u7_get(buf, p)
    blob = rans4x16.uncompress(buf[p:p + clen])
    cols = []
    q = 0
    for ln in col_lens:
        cols.append([memoryview(blob)[q:q + ln], 0])
        q += ln

    def col_byte(ci: int) -> int:
        mv, pos = cols[ci]
        cols[ci][1] = pos + 1
        return mv[pos]

    def col_u7(ci: int) -> int:
        mv, pos = cols[ci]
        v, np_ = u7_get(mv, pos)
        cols[ci][1] = np_
        return v

    def col_str(ci: int) -> bytes:
        mv, pos = cols[ci]
        e = pos
        while mv[e]:
            e += 1
        cols[ci][1] = e + 1
        return bytes(mv[pos:e])

    out = bytearray()
    prev_toks: List[bytes] = []
    for _ in range(n_names):
        toks: List[bytes] = []
        ci = 0
        while True:
            t = col_byte(ci)
            if t == T_END:
                break
            if t == T_MATCH:
                toks.append(prev_toks[ci])
            elif t == T_DELTA:
                d = col_byte(ci)
                prev = prev_toks[ci]
                v = int(prev) + d
                toks.append(str(v).zfill(len(prev)).encode())
            elif t == T_DIGITS:
                width = col_byte(ci)
                v = col_u7(ci)
                toks.append(str(v).zfill(width).encode())
            elif t == T_STRING:
                toks.append(col_str(ci))
            else:
                raise ValueError(f"tok3: bad token type {t}")
            ci += 1
        out += b"".join(toks) + b"\0"
        prev_toks = toks
    return bytes(out)
