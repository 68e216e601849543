"""Reference-sequence cache server (reference ref_cache/: a standalone
HTTP proxy that caches CRAM reference sequences keyed by MD5 for
REF_PATH clients, ref_cache/ref-cache.1).

``RefCacheServer`` serves GET/HEAD /<md5> from a local cache
directory, fetching misses from an upstream URL template (the EBI ENA
CRAM reference registry by default, as the reference daemon does) and
storing them for subsequent hits.  Range requests are honoured so CRAM
decoders can fetch reference windows.  Daemon behaviours modeled on
ref_cache/server.c: a threaded request loop (concurrent hits),
per-MD5 in-flight locks so a burst of misses triggers ONE upstream
fetch (transaction.c coalescing), chunked streamed responses
(sendfile-equivalent; the file is never slurped), and a size-rotated
access log.

Usage:
    python -m htslib_tpu.refcache -d /path/cache -p 8080
then point clients at REF_PATH=http://localhost:8080/%s
"""
from __future__ import annotations

import argparse
import hashlib
import http.server
import os
import re
import sys
import threading
import urllib.request
from typing import Optional

DEFAULT_UPSTREAM = "https://www.ebi.ac.uk/ena/cram/md5/%s"
_MD5_RE = re.compile(r"^[0-9a-f]{32}$")


class RefCacheServer:
    CHUNK = 1 << 16

    def __init__(self, cache_dir: str, port: int = 0,
                 upstream: Optional[str] = DEFAULT_UPSTREAM,
                 verify_md5: bool = True, log_path: Optional[str] = None,
                 log_rotate_bytes: int = 10 << 20):
        self.cache_dir = cache_dir
        self.upstream = upstream
        self.verify_md5 = verify_md5
        self.log_path = log_path
        self.log_rotate_bytes = log_rotate_bytes
        self._log_lock = threading.Lock()
        self._inflight: dict = {}
        self._inflight_lock = threading.Lock()
        self.upstream_fetches = 0      # observability: distinct fetches
        os.makedirs(cache_dir, exist_ok=True)
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_HEAD(self):
                self.do_GET(head=True)

            def do_GET(self, head=False):
                md5 = self.path.strip("/").split("/")[-1].lower()
                if not _MD5_RE.match(md5):
                    outer.access_log(self.path, 404)
                    self.send_error(404, "not an MD5")
                    return
                path = outer.lookup(md5)
                if path is None:
                    outer.access_log(self.path, 404)
                    self.send_error(404, "reference not found")
                    return
                outer.access_log(self.path, 200)
                size = os.path.getsize(path)
                start, end = 0, size - 1
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    b, _, e = rng[6:].partition("-")
                    if b:
                        start = int(b)
                    if e:
                        end = min(int(e), size - 1)
                    if start > end or start >= size:
                        self.send_error(416, "range not satisfiable")
                        return
                    self.send_response(206)
                    self.send_header("Content-Range",
                                     f"bytes {start}-{end}/{size}")
                else:
                    self.send_response(200)
                length = end - start + 1
                self.send_header("Content-Length", str(length))
                self.send_header("Accept-Ranges", "bytes")
                self.send_header("Content-Type",
                                 "application/octet-stream")
                self.end_headers()
                if head:
                    return
                # sendfile-equivalent: stream in chunks, never slurp
                with open(path, "rb") as f:
                    f.seek(start)
                    left = length
                    while left > 0:
                        chunk = f.read(min(left, RefCacheServer.CHUNK))
                        if not chunk:
                            break
                        try:
                            self.wfile.write(chunk)
                        except (BrokenPipeError, ConnectionResetError):
                            return
                        left -= len(chunk)

        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", port),
                                                     Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------------
    def access_log(self, path: str, status: int) -> None:
        """Size-rotated access log (ref_cache log-rotation role)."""
        if not self.log_path:
            return
        import time
        line = f"{time.strftime('%Y-%m-%dT%H:%M:%S')} {status} {path}\n"
        with self._log_lock:
            try:
                if (os.path.exists(self.log_path)
                        and os.path.getsize(self.log_path)
                        >= self.log_rotate_bytes):
                    os.replace(self.log_path, self.log_path + ".1")
                with open(self.log_path, "a") as fh:
                    fh.write(line)
            except OSError:
                pass

    def lookup(self, md5: str) -> Optional[str]:
        """Cache path for an MD5, fetching from upstream on miss; a
        burst of concurrent misses for one MD5 performs a single
        upstream fetch (the transaction.c coalescing model)."""
        path = os.path.join(self.cache_dir, md5)
        if os.path.exists(path):
            return path
        if not self.upstream:
            return None
        with self._inflight_lock:
            lock = self._inflight.setdefault(md5, threading.Lock())
        with lock:
            if os.path.exists(path):       # fetched while we waited
                return path
            return self._fetch_upstream(md5, path)

    def _fetch_upstream(self, md5: str, path: str) -> Optional[str]:
        self.upstream_fetches += 1
        url = self.upstream % md5 if "%s" in self.upstream \
            else self.upstream.rstrip("/") + "/" + md5
        assert url
        try:
            with urllib.request.urlopen(url, timeout=60) as resp:
                data = resp.read()
        except Exception:
            return None
        if self.verify_md5 and hashlib.md5(data).hexdigest() != md5:
            return None
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return path

    def put(self, seq: bytes) -> str:
        """Populate the cache directly (REF_CACHE writer role)."""
        md5 = hashlib.md5(seq).hexdigest()
        path = os.path.join(self.cache_dir, md5)
        if not os.path.exists(path):
            with open(path, "wb") as f:
                f.write(seq)
        return md5

    # ------------------------------------------------------------------
    def start(self) -> None:
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self.httpd.shutdown()

    @property
    def url_template(self) -> str:
        return f"http://127.0.0.1:{self.port}/%s"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ref-cache", description=__doc__)
    p.add_argument("-d", "--cache-dir", required=True)
    p.add_argument("-p", "--port", type=int, default=8080)
    p.add_argument("-u", "--upstream", default=DEFAULT_UPSTREAM)
    p.add_argument("--no-upstream", action="store_true")
    a = p.parse_args(argv)
    srv = RefCacheServer(a.cache_dir, a.port,
                         None if a.no_upstream else a.upstream)
    print(f"ref-cache serving on port {srv.port}, cache {a.cache_dir}",
          file=sys.stderr)
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
