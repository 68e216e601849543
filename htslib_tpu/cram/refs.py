"""CRAM reference-sequence registry (reference cram/cram_io.c:2541-3409).

Resolution order mirrors cram_populate_ref (cram_io.c:2977):
  1. an explicitly supplied FASTA (+ .fai) — the `ref=` option
  2. the @SQ UR: field (local paths)
  3. REF_CACHE / REF_PATH by M5 checksum
Sequences are cached whole per contig (the batch pipeline wants
HBM-resident references anyway).
"""
from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional

from htslib_tpu.faidx import Faidx
from htslib_tpu.sam.header import SamHeader
from htslib_tpu.util.log import log_warning


class RefRegistry:
    def __init__(self, header: SamHeader, fasta: Optional[str] = None,
                 ignore_md5: bool = False):
        self.header = header
        self.fai: Optional[Faidx] = None
        self.ignore_md5 = ignore_md5
        self._cache: Dict[int, bytes] = {}
        if fasta:
            self.fai = Faidx.load(fasta)

    @staticmethod
    def _tokenise_ref_path(searchpath: str):
        """REF_PATH tokeniser (cram/open_trace_file.c:108
        tokenise_search_path): split on ':' with '::' escaping, keeping
        http:/https:/ftp: URL elements (scheme + //host[:port] + path)
        intact."""
        out = []
        cur = []
        i, n = 0, len(searchpath)
        while i < n:
            if i + 1 < n and searchpath[i] == ":" and                     searchpath[i + 1] == ":":
                cur.append(":")
                i += 2
                continue
            at_start = not cur
            if at_start and (searchpath.startswith(("http:", "https:",
                                                    "ftp:"), i)):
                # scheme
                while i < n and searchpath[i] != ":":
                    cur.append(searchpath[i])
                    i += 1
                cur.append(":")
                i += 1
                for _ in range(2):          # '//'
                    if i < n and searchpath[i] == "/":
                        cur.append("/")
                        i += 1
                # host[:port]
                while i < n and searchpath[i] not in ":/":
                    cur.append(searchpath[i])
                    i += 1
                if i < n:
                    cur.append(searchpath[i])
                    i += 1
                    if i < n and searchpath[i] == ":":
                        i += 1
                continue
            if searchpath[i] == ":":
                if cur:
                    out.append("".join(cur))
                    cur = []
                i += 1
                continue
            cur.append(searchpath[i])
            i += 1
        if cur:
            out.append("".join(cur))
        return out

    def _fetch_url(self, url: str) -> Optional[bytes]:
        """Fetch a REF_PATH URL element through the hfile layer (the
        find_file_url role, cram/open_trace_file.c:182)."""
        try:
            from htslib_tpu.hfile import hopen
            with hopen(url, "rb") as f:
                chunks = []
                while True:
                    c = f.read(1 << 20)
                    if not c:
                        break
                    chunks.append(bytes(c))
            return b"".join(chunks)
        except Exception:
            return None

    def _md5_lookup(self, md5: str):
        """-> (path | None, bytes | None): REF_CACHE first, then every
        REF_PATH element — local files directly, URL elements fetched
        over the hfile layer and written back into REF_CACHE when set
        (cram_populate_ref, cram_io.c:2977-3130)."""
        cache = os.environ.get("REF_CACHE")
        cpath = None
        if cache:
            cpath = cache % md5 if "%s" in cache                 else os.path.join(cache, md5)
            if os.path.exists(cpath):
                return cpath, None
        path = os.environ.get("REF_PATH")
        if path:
            for tmpl in self._tokenise_ref_path(path):
                if tmpl.startswith(("http:", "https:", "ftp:")):
                    url = tmpl.replace("%s", md5) if "%s" in tmpl                         else tmpl.rstrip("/") + "/" + md5
                    data = self._fetch_url(url)
                    if data is not None:
                        if cpath:
                            try:
                                os.makedirs(os.path.dirname(cpath),
                                            exist_ok=True)
                                tmp = cpath + ".tmp.%d" % os.getpid()
                                with open(tmp, "wb") as f:
                                    f.write(data)
                                os.replace(tmp, cpath)
                            except OSError:
                                pass
                        return None, data
                    continue
                p = tmpl.replace("%s", md5) if "%s" in tmpl                     else os.path.join(tmpl, md5)
                if os.path.exists(p):
                    return p, None
        return None, None

    def _md5_path(self, md5: str) -> Optional[str]:
        p, _ = self._md5_lookup(md5)
        return p

    def _load_full(self, tid: int) -> bytes:
        if tid in self._cache:
            return self._cache[tid]
        name = self.header.tid2name(tid)
        seq: Optional[bytes] = None
        if self.fai is not None and self.fai.has_seq(name):
            seq = self.fai.fetch_seq(name).encode().upper()
        if seq is None:
            sq = self.header.find_line_id("SQ", "SN", name)
            if sq is not None:
                ur = sq.get("UR")
                if ur and not ur.startswith(("http:", "https:", "ftp:")) \
                        and os.path.isfile(ur):
                    fai = Faidx.load(ur)
                    if fai.has_seq(name):
                        seq = fai.fetch_seq(name).encode().upper()
                if seq is None:
                    m5 = sq.get("M5")
                    if m5:
                        p, data = self._md5_lookup(m5)
                        if p:
                            with open(p, "rb") as f:
                                seq = f.read().upper()
                        elif data is not None:
                            seq = data.upper()
        if seq is None:
            raise IOError(f"unable to load reference for {name!r}; pass "
                          "ref=FILE or set REF_PATH/REF_CACHE")
        if not self.ignore_md5:
            sq = self.header.find_line_id("SQ", "SN", name)
            m5 = sq.get("M5") if sq is not None else None
            if m5:
                got = hashlib.md5(seq).hexdigest()
                if got != m5:
                    log_warning("reference MD5 mismatch for %s: %s != %s",
                                name, got, m5)
        self._cache[tid] = seq
        return seq

    def get(self, tid: int, start: int, end: int) -> bytes:
        """1-based inclusive range; end=-1 means whole sequence
        (cram_get_ref, cram_io.c:3409)."""
        seq = self._load_full(tid)
        if end == -1:
            return seq if start <= 1 else seq[start - 1:]
        return seq[start - 1:end]
