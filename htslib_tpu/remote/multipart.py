"""Multipart hFILE over an htsget JSON ticket (reference multipart.c,
plus the htsget redirect handling in hfile_libcurl.c).

An htsget server answers a query with a small JSON "ticket" listing URL
parts (https or inline ``data:`` URIs, each with optional headers); the
payload is the concatenation of all parts.  ``MultipartFile`` streams
that concatenation, opening parts lazily; ``htsget://host/...`` and
``htsget+http://host/...`` schemes fetch the ticket and return the
multipart stream.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

from htslib_tpu.hfile import HFile, add_scheme_handler, hopen

Part = Tuple[str, Optional[Dict[str, str]]]


def parse_ticket(data: bytes) -> List[Part]:
    """Parse an htsget JSON ticket into (url, headers) parts
    (multipart.c:45-51 hFILE_multipart fields)."""
    doc = json.loads(data.decode("utf-8"))
    body = doc.get("htsget", doc)
    if "urls" not in body:
        raise IOError("htsget ticket has no urls list")
    parts: List[Part] = []
    for u in body["urls"]:
        if isinstance(u, str):
            parts.append((u, None))
        else:
            parts.append((u["url"], u.get("headers")))
    return parts


def _open_part(url: str, headers: Optional[Dict[str, str]]) -> HFile:
    if headers and url.startswith(("http://", "https://")):
        from htslib_tpu.remote import HttpFile
        return HttpFile(url, headers=headers)
    return hopen(url, "rb")


class MultipartFile(HFile):
    """Sequential reader over concatenated ticket parts.

    Parts open lazily on first read (multipart_read's part advance).
    Seeking is supported backwards by reopening from the first part and
    forwards by skipping — part sizes are generally unknown until read.
    """

    def __init__(self, parts: List[Part], name: str = "multipart:"):
        self.parts = parts
        self.name = name
        self.mode = "rb"
        self.at_eof = False
        self._idx = -1
        self._cur: Optional[HFile] = None
        self._pos = 0

    def _next_part(self) -> bool:
        if self._cur is not None:
            self._cur.close()
            self._cur = None
        self._idx += 1
        if self._idx >= len(self.parts):
            return False
        url, headers = self.parts[self._idx]
        self._cur = _open_part(url, headers)
        return True

    def read(self, n: int = -1) -> bytes:
        out = bytearray()
        while n < 0 or len(out) < n:
            if self._cur is None and not self._next_part():
                break
            want = -1 if n < 0 else n - len(out)
            chunk = self._cur.read(want) if want != 0 else b""
            if not chunk:
                if not self._next_part():
                    break
                continue
            out += chunk
        self._pos += len(out)
        if n >= 0 and len(out) < n:
            self.at_eof = True
        return bytes(out)

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)

    def peek(self, n: int) -> bytes:
        # buffered single-part peek; crossing a part boundary falls back
        # to read-and-rewind via the part list restart
        if self._cur is None:
            if not self._next_part():
                return b""
        data = self._cur.peek(n)
        if len(data) >= n or self._idx + 1 >= len(self.parts):
            return data[:n]
        pos = self._pos
        out = self.read(n)
        self.seek(pos)
        return out

    def readline(self) -> bytes:
        out = bytearray()
        while True:
            c = self.read(1)
            if not c:
                break
            out += c
            if c == b"\n":
                break
        return bytes(out)

    def seek(self, offset: int, whence: int = os.SEEK_SET) -> int:
        if whence == os.SEEK_CUR:
            offset += self._pos
        elif whence == os.SEEK_END:
            raise OSError("multipart streams have unknown total size")
        if offset < 0:
            raise OSError("negative seek")
        if offset < self._pos:
            # restart from the beginning
            if self._cur is not None:
                self._cur.close()
            self._cur = None
            self._idx = -1
            self._pos = 0
        while self._pos < offset:
            if not self.read(min(1 << 16, offset - self._pos)):
                break
        self.at_eof = False
        return self._pos

    def tell(self) -> int:
        return self._pos

    def seekable(self) -> bool:
        return True

    def size(self) -> Optional[int]:
        return None

    def write(self, data) -> int:
        raise OSError("multipart streams are read-only")

    def flush(self) -> None:
        pass

    def close(self) -> None:
        if self._cur is not None:
            self._cur.close()
            self._cur = None

    def has_multiple_parts(self) -> bool:
        return True


def open_htsget(url: str, mode: str = "rb") -> MultipartFile:
    """Fetch an htsget ticket and open its parts
    (hfile_libcurl.c htsget:// rewrite to https + JSON sniff)."""
    if url.startswith("htsget+http://"):
        ticket_url = "http://" + url[len("htsget+http://"):]
    elif url.startswith("htsget://"):
        ticket_url = "https://" + url[len("htsget://"):]
    else:
        ticket_url = url
    with hopen(ticket_url, "rb") as f:
        data = f.read(-1)
    return MultipartFile(parse_ticket(data), name=url)


add_scheme_handler("htsget", open_htsget)
add_scheme_handler("htsget+http", open_htsget)
