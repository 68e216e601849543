"""Remote byte-stream backends (reference hfile_libcurl.c, hfile_s3.c,
hfile_gcs.c, multipart.c).

http/https handlers use stdlib urllib with HTTP Range requests for
seeking (the hfile_libcurl model of restarting the transfer at an
offset); s3:// and gs:// rewrite to signed https URLs.  Registered into
the hfile scheme registry on import (hfile.c:1054 model).
"""
from __future__ import annotations

import io
import os
import urllib.request
from typing import Optional

from htslib_tpu.hfile import HFile, add_scheme_handler


# per-request header injection + auth callbacks (the hfile_libcurl
# CURLOPT_HTTPHEADER "httphdr" option and auth-callback machinery,
# hfile_libcurl.c): callbacks run before EVERY request so expiring
# credentials can refresh (hfile_s3.c CREDENTIAL_LIFETIME model)
_auth_callbacks: list = []


def register_auth_callback(fn) -> None:
    """Register fn(url) -> dict of extra headers (or None), evaluated
    before every http(s) request.  Multiple callbacks merge in
    registration order."""
    _auth_callbacks.append(fn)


def clear_auth_callbacks() -> None:
    _auth_callbacks.clear()


def _auth_headers(url: str) -> dict:
    out: dict = {}
    for fn in _auth_callbacks:
        extra = fn(url)
        if extra:
            out.update(extra)
    return out


class HttpFile(HFile):
    """Seekable HTTP reader via Range requests; buffers sequentially."""

    def __init__(self, url: str, headers: Optional[dict] = None,
                 headers_fn=None):
        self.url = url
        self.headers = dict(headers or {})
        # re-evaluated before every request: signature refresh hook
        # (hfile_s3.c AUTH_LIFETIME regeneration)
        self.headers_fn = headers_fn
        self._pos = 0
        self._resp = None
        self._size: Optional[int] = None
        self.name = url
        self.mode = "r"
        self.at_eof = False

    def _open_at(self, offset: int):
        hdrs = dict(self.headers_fn() if self.headers_fn is not None
                    else self.headers)
        hdrs.update(_auth_headers(self.url))
        req = urllib.request.Request(self.url, headers=hdrs)
        if offset:
            req.add_header("Range", f"bytes={offset}-")
        self._resp = urllib.request.urlopen(req, timeout=60)
        clen = self._resp.headers.get("Content-Length")
        if clen is not None and self._size is None:
            self._size = offset + int(clen)
        self._pos = offset

    def read(self, n: int = -1) -> bytes:
        if self._resp is None:
            self._open_at(self._pos)
        data = self._resp.read() if n < 0 else self._resp.read(n)
        self._pos += len(data)
        if n >= 0 and len(data) < n:
            self.at_eof = True
        return data

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[:len(data)] = data
        return len(data)

    def peek(self, n: int) -> bytes:
        pos = self._pos
        data = self.read(n)
        self.seek(pos)
        return data

    def readline(self) -> bytes:
        out = bytearray()
        while True:
            c = self.read(1)
            if not c:
                return bytes(out)
            out += c
            if c == b"\n":
                return bytes(out)

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 1:
            offset += self._pos
        elif whence == 2:
            if self._size is None:
                self._open_at(0)
                if self._size is None:
                    raise OSError("cannot SEEK_END without Content-Length")
                self._resp = None
            offset += self._size
        if self._resp is not None:
            self._resp.close()
            self._resp = None
        self._pos = offset
        self.at_eof = False
        return offset

    def tell(self) -> int:
        return self._pos

    def seekable(self) -> bool:
        return True

    def size(self) -> Optional[int]:
        if self._size is None:
            pos = self._pos
            self.seek(0, 2)
            self.seek(pos)
        return self._size

    def write(self, data) -> int:
        raise OSError("http streams are read-only")

    def flush(self) -> None:
        pass

    def close(self) -> None:
        if self._resp is not None:
            self._resp.close()
            self._resp = None


def _open_http(url: str, mode: str) -> HFile:
    if "r" not in mode:
        raise OSError("remote URLs are read-only")
    return HttpFile(url)


class FtpFile(HFile):
    """Seekable FTP reader: RETR with REST offsets — the
    hfile_libcurl ftp path's seek-by-restart (CURLOPT_RESUME_FROM)."""

    def __init__(self, url: str):
        import ftplib
        from urllib.parse import urlparse
        u = urlparse(url)
        self.name = url
        self.mode = "r"
        self.at_eof = False
        self._path = u.path
        self._ftp = ftplib.FTP()
        self._ftp.connect(u.hostname, u.port or 21, timeout=60)
        self._ftp.login(u.username or "anonymous", u.password or "hts@")
        self._ftp.voidcmd("TYPE I")
        try:
            self._size = self._ftp.size(self._path)
        except Exception:
            self._size = None
        self._pos = 0
        self._conn = None

    def _open_at(self, offset: int):
        if self._conn is not None:
            try:
                self._conn.close()
                self._ftp.voidresp()
            except Exception:
                pass
        self._conn = self._ftp.transfercmd(f"RETR {self._path}",
                                           rest=offset or None)
        self._pos = offset

    def read(self, n: int = -1) -> bytes:
        if self._conn is None:
            self._open_at(self._pos)
        if n < 0:
            chunks = []
            while True:
                c = self._conn.recv(1 << 16)
                if not c:
                    break
                chunks.append(c)
            data = b"".join(chunks)
        else:
            out = bytearray()
            while len(out) < n:
                c = self._conn.recv(min(1 << 16, n - len(out)))
                if not c:
                    self.at_eof = True
                    break
                out += c
            data = bytes(out)
        self._pos += len(data)
        return data

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[:len(data)] = data
        return len(data)

    def peek(self, n: int) -> bytes:
        pos = self._pos
        data = self.read(n)
        self.seek(pos)
        return data

    def readline(self) -> bytes:
        out = bytearray()
        while True:
            c = self.read(1)
            if not c:
                return bytes(out)
            out += c
            if c == b"\n":
                return bytes(out)

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 1:
            offset += self._pos
        elif whence == 2:
            if self._size is None:
                raise OSError("FTP server did not report SIZE")
            offset += self._size
        if self._conn is not None:
            try:
                self._conn.close()
            except Exception:
                pass
            self._conn = None
            try:
                self._ftp.voidresp()
            except Exception:
                pass
        self._pos = offset
        self.at_eof = False
        return offset

    def tell(self) -> int:
        return self._pos

    def seekable(self) -> bool:
        return True

    def size(self) -> Optional[int]:
        return self._size

    def write(self, data) -> int:
        raise OSError("ftp streams are read-only")

    def flush(self) -> None:
        pass

    def close(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
                self._ftp.voidresp()
            except Exception:
                pass
            self._conn = None
        try:
            self._ftp.quit()
        except Exception:
            pass


def _open_ftp(url: str, mode: str) -> HFile:
    if "r" not in mode:
        raise OSError("remote URLs are read-only")
    return FtpFile(url)


def _open_s3(url: str, mode: str) -> HFile:
    from htslib_tpu.remote.s3 import s3_open
    return s3_open(url, mode)


def _open_gcs(url: str, mode: str) -> HFile:
    from htslib_tpu.remote.gcs import gcs_open
    return gcs_open(url, mode)


add_scheme_handler("http", _open_http)
add_scheme_handler("https", _open_http)
add_scheme_handler("ftp", _open_ftp)
add_scheme_handler("s3", _open_s3)
add_scheme_handler("s3+http", _open_s3)
add_scheme_handler("s3+https", _open_s3)
add_scheme_handler("gs", _open_gcs)
add_scheme_handler("gs+http", _open_gcs)
add_scheme_handler("gs+https", _open_gcs)

# htsget multipart streams (reference multipart.c + hfile_libcurl htsget)
from htslib_tpu.remote import multipart as _multipart  # noqa: E402,F401
