"""hfile — buffered byte-stream abstraction with pluggable backends.

Equivalent of the reference's hFILE layer (hfile.c:1-1465,
hfile_internal.h:66-92): a unified open/read/write/seek/peek interface over
scheme-dispatched backends.  Built-ins here: local files, in-memory buffers
(``mem:``), ``data:`` URIs, and ``preload:`` (slurp the underlying stream
into memory, reference hfile.c:929-1016).  A scheme registry
(``add_scheme_handler``, reference hfile.c:1054) lets plugins add remote
backends (http/s3/gcs are host-side and optional — see
htslib_tpu.remote).

Design note (TPU-first): this layer is intentionally *host-only* and thin.
The device pipeline consumes large contiguous byte ranges (whole BGZF block
batches) via ``readinto``/``pread``-style bulk calls, so per-call overhead
here is off the hot path.
"""
from __future__ import annotations

import io
import os
import base64
import urllib.parse
from typing import Callable, Dict, Optional

from htslib_tpu.util.log import log_error, log_warning

__all__ = [
    "hopen", "HFile", "add_scheme_handler", "hfile_scheme",
]


class HFile:
    """A buffered binary stream.

    Wraps an underlying ``io.RawIOBase``-like object and exposes the hFILE
    verbs: read/readinto/peek/seek/tell/write/flush/close, plus
    ``has_multiple_parts`` for multipart streams (reference multipart.c).
    """

    def __init__(self, raw, mode: str, name: str = "?"):
        self.name = name
        self.mode = mode
        self._raw = raw
        writable = any(c in mode for c in "wa+") and "r" not in mode.replace("r+", "+")
        if "r" in mode and "+" not in mode:
            self._buf = io.BufferedReader(raw) if isinstance(raw, io.RawIOBase) else raw
        elif writable and isinstance(raw, io.RawIOBase):
            self._buf = io.BufferedWriter(raw)
        else:
            self._buf = raw
        self.at_eof = False

    # -- reading ---------------------------------------------------------
    def read(self, n: int = -1) -> bytes:
        data = self._buf.read(n)
        if n is not None and n >= 0 and len(data) < n:
            self.at_eof = True
        return data

    def readinto(self, b) -> int:
        return self._buf.readinto(b)

    def peek(self, n: int) -> bytes:
        """Return up to n bytes without consuming them (hpeek, hfile.c:298)."""
        if hasattr(self._buf, "peek"):
            return self._buf.peek(n)[:n]
        pos = self.tell()
        data = self._buf.read(n)
        self._buf.seek(pos)
        return data

    def readline(self) -> bytes:
        return self._buf.readline()

    # -- writing ---------------------------------------------------------
    def write(self, data) -> int:
        return self._buf.write(data)

    def flush(self) -> None:
        self._buf.flush()

    # -- positioning -----------------------------------------------------
    def seek(self, offset: int, whence: int = os.SEEK_SET) -> int:
        self.at_eof = False
        return self._buf.seek(offset, whence)

    def tell(self) -> int:
        return self._buf.tell()

    def seekable(self) -> bool:
        try:
            return self._buf.seekable()
        except Exception:
            return False

    def size(self) -> Optional[int]:
        """Total stream size if cheaply knowable, else None."""
        if not self.seekable():
            return None
        pos = self.tell()
        end = self._buf.seek(0, os.SEEK_END)
        self._buf.seek(pos)
        return end

    def close(self) -> None:
        self._buf.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def has_multiple_parts(self) -> bool:
        return False


class MemFile(HFile):
    """``mem:`` backend — reference hfile.c:835-926."""

    def __init__(self, data: bytes = b"", mode: str = "r", name: str = "mem:"):
        raw = io.BytesIO(data)
        super().__init__(raw, mode, name)

    def getvalue(self) -> bytes:
        return self._buf.getvalue()


# ---------------------------------------------------------------------------
# Scheme registry (reference hfile.c:1018-1100)
# ---------------------------------------------------------------------------

_SchemeOpener = Callable[[str, str], HFile]
_scheme_handlers: Dict[str, _SchemeOpener] = {}


def add_scheme_handler(scheme: str, opener: _SchemeOpener) -> None:
    _scheme_handlers[scheme.lower()] = opener


def hfile_scheme(fname: str) -> Optional[str]:
    """Extract a URL scheme per RFC3986 (reference find_scheme_string,
    hfile.c:1124-1141): [A-Za-z][A-Za-z0-9+.-]* followed by ':'.
    One-letter schemes are treated as Windows-style drive letters (paths).
    """
    i = 0
    n = len(fname)
    while i < n and (fname[i].isalnum() or fname[i] in "+.-"):
        i += 1
    if i >= 2 and i < n and fname[i] == ":" and fname[0].isalpha():
        return fname[:i].lower()
    return None


def _open_data_uri(url: str, mode: str) -> HFile:
    """``data:`` URI backend (reference hopen's data: support, hfile.c:1203)."""
    rest = url[len("data:"):]
    if "," not in rest:
        raise FileNotFoundError(f"malformed data: URL {url!r}")
    meta, payload = rest.split(",", 1)
    if meta.endswith(";base64"):
        data = base64.b64decode(payload)
    else:
        data = urllib.parse.unquote_to_bytes(payload)
    return MemFile(data, "r", name=url)


def _open_preload(url: str, mode: str) -> HFile:
    """``preload:`` — slurp underlying URL fully into memory
    (reference hpreload, hfile.c:929-1016)."""
    inner = url[len("preload:"):]
    with hopen(inner, "rb") as fp:
        data = fp.read(-1)
    return MemFile(data, "r", name=url)


def _open_mem(url: str, mode: str) -> HFile:
    # mem:<path> reads a local file into a memory stream
    path = url[len("mem:"):]
    if "r" in mode:
        with open(path, "rb") as f:
            return MemFile(f.read(), mode, name=url)
    return MemFile(b"", mode, name=url)


def _open_file(fname: str, mode: str) -> HFile:
    pymode = mode if "b" in mode else mode + "b"
    if fname == "-":
        import sys
        stream = sys.stdin.buffer if "r" in mode else sys.stdout.buffer
        return HFile(stream, mode, name="-")
    raw = open(fname, pymode, buffering=0)
    return HFile(raw, mode, name=fname)


add_scheme_handler("data", _open_data_uri)
add_scheme_handler("preload", _open_preload)
add_scheme_handler("mem", _open_mem)
add_scheme_handler("file", lambda u, m: _open_file(u[len("file://"):] if u.startswith("file://") else u[len("file:"):], m))


def _load_remote_handlers() -> None:
    """Lazily register http/https/ftp/s3/gcs handlers (reference: plugin
    loading hfile.c:1111-1166). Import is deferred and failure-tolerant —
    remote access is optional in restricted environments."""
    try:
        from htslib_tpu import remote  # noqa: F401  (registers its schemes)
    except Exception:
        pass
    _load_hfile_plugins()


def _load_hfile_plugins() -> None:
    """HTS_PATH plugin loading (reference load_hfile_plugins hfile.c:1111
    + plugin.c): each colon-separated directory is scanned for
    hfile_*.py, which is loaded and its hfile_plugin_init(add) entry
    called with the scheme-registry hook.  An empty path element means
    the built-ins only (reference: '' = default path)."""
    path = os.environ.get("HTS_PATH")
    if not path:
        return
    import glob as _glob
    import importlib.util
    for d in path.split(":"):
        if not d:
            continue
        for py in sorted(_glob.glob(os.path.join(d, "hfile_*.py"))):
            name = "htslib_tpu._plugin_" + os.path.basename(py)[:-3]
            try:
                spec = importlib.util.spec_from_file_location(name, py)
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
                init = getattr(mod, "hfile_plugin_init", None)
                if init is None:
                    log_warning("plugin %s has no hfile_plugin_init", py)
                    continue
                init(add_scheme_handler)
            except Exception as e:
                log_warning("failed to load plugin %s (%s)", py, e)


_remote_loaded = False


def hopen(fname: str, mode: str = "r") -> HFile:
    """Open a byte stream by name, dispatching on URL scheme
    (reference hopen, hfile.c:1176-1232)."""
    scheme = hfile_scheme(fname)
    if scheme is None:
        return _open_file(fname, mode)
    handler = _scheme_handlers.get(scheme)
    if handler is None:
        global _remote_loaded
        if not _remote_loaded:
            _remote_loaded = True
            _load_remote_handlers()
            handler = _scheme_handlers.get(scheme)
    if handler is None:
        log_error("unknown URL scheme %r", scheme)
        raise FileNotFoundError(f"unsupported URL scheme: {fname}")
    return handler(fname, mode)
