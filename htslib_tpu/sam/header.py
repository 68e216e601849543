"""SAM header model (reference header.c:1-3174, htslib/sam.h:483-843).

Full @HD/@SQ/@RG/@PG/@CO model: typed lines with ordered tags, hash lookup
by (type, ID), reference-name<->tid maps with AN altname support, PG chain
linking, and lazy text rebuild — the original header text is preserved
verbatim until a modification dirties it (header.c sam_hdr_rebuild:1604).
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from htslib_tpu.util.log import log_error, log_warning

_ID_TAG = {"SQ": "SN", "RG": "ID", "PG": "ID"}
# unique line types: at most one @HD (header.c hl_HD handling)
_UNIQUE = {"HD"}


class HeaderLine:
    """One @-line: a type plus ordered (tag, value) pairs, or comment text."""

    __slots__ = ("type", "tags", "comment")

    def __init__(self, type_: str, tags: Optional[List[Tuple[str, str]]] = None,
                 comment: Optional[str] = None):
        self.type = type_
        self.tags = tags if tags is not None else []
        self.comment = comment

    @classmethod
    def parse(cls, line: str) -> "HeaderLine":
        if not line.startswith("@") or len(line) < 3:
            raise ValueError(f"invalid header line {line!r}")
        type_ = line[1:3]
        if type_ == "CO":
            return cls("CO", comment=line[4:] if len(line) > 3 else "")
        tags: List[Tuple[str, str]] = []
        for field in line[3:].split("\t"):
            if not field:
                continue
            if len(field) >= 3 and field[2] == ":":
                tags.append((field[:2], field[3:]))
            else:
                # malformed tag — keep raw to round-trip (header.c is lenient
                # outside strict mode)
                tags.append((field, None))  # type: ignore[arg-type]
        return cls(type_, tags)

    def get(self, tag: str) -> Optional[str]:
        for k, v in self.tags:
            if k == tag:
                return v
        return None

    def set(self, tag: str, value: Optional[str]) -> None:
        for i, (k, _) in enumerate(self.tags):
            if k == tag:
                if value is None:
                    del self.tags[i]
                else:
                    self.tags[i] = (tag, value)
                return
        if value is not None:
            self.tags.append((tag, value))

    def format(self) -> str:
        if self.type == "CO":
            return f"@CO\t{self.comment}"
        parts = [f"@{self.type}"]
        for k, v in self.tags:
            parts.append(k if v is None else f"{k}:{v}")
        return "\t".join(parts)


class SamHeader:
    """sam_hdr_t equivalent: text + parsed lines + ref dictionary."""

    def __init__(self, text: str = "", refs: Optional[List[Tuple[str, int]]] = None):
        self._text: Optional[str] = text
        self.lines: List[HeaderLine] = []
        self._index: Dict[Tuple[str, str], HeaderLine] = {}
        self.ref_names: List[str] = []
        self.ref_lens: List[int] = []
        self._name2tid: Dict[str, int] = {}
        self._dirty = False
        if text:
            self._parse_text(text)
        if refs is not None:
            self._merge_binary_refs(refs)

    # ------------------------------------------------------------------
    def _parse_text(self, text: str) -> None:
        for raw in text.split("\n"):
            if not raw:
                continue
            if not raw.startswith("@"):
                log_warning("ignoring non-header line in header text")
                continue
            try:
                line = HeaderLine.parse(raw.rstrip("\r"))
            except ValueError as e:
                log_error("%s", e)
                continue
            self._add_parsed(line)

    def _add_parsed(self, line: HeaderLine) -> None:
        self.lines.append(line)
        idtag = _ID_TAG.get(line.type)
        if idtag:
            key = line.get(idtag)
            if key is not None:
                self._index[(line.type, key)] = line
        if line.type == "SQ":
            sn, ln = line.get("SN"), line.get("LN")
            if sn is not None:
                tid = len(self.ref_names)
                self.ref_names.append(sn)
                try:
                    self.ref_lens.append(int(ln) if ln is not None else 0)
                except ValueError:
                    self.ref_lens.append(0)
                self._name2tid[sn] = tid
                an = line.get("AN")
                if an:
                    for alt in an.split(","):
                        self._name2tid.setdefault(alt, tid)

    def _merge_binary_refs(self, refs: List[Tuple[str, int]]) -> None:
        """Reconcile binary (BAM/BCF) target arrays with text @SQ lines
        (header.c sam_hdr_update_target_arrays behavior)."""
        if not self.ref_names:
            self.ref_names = [n for n, _ in refs]
            self.ref_lens = [l for _, l in refs]
            self._name2tid = {n: i for i, (n, _) in enumerate(refs)}
        elif [n for n, _ in refs] != self.ref_names:
            # Binary list wins for tid mapping (bam_hdr_read semantics)
            log_warning("header text @SQ lines disagree with binary list; "
                        "using binary reference order")
            self.ref_names = [n for n, _ in refs]
            self.ref_lens = [l for _, l in refs]
            self._name2tid = {n: i for i, (n, _) in enumerate(refs)}

    # -- reference dictionary ------------------------------------------
    @property
    def nref(self) -> int:
        return len(self.ref_names)

    def name2tid(self, name: str) -> int:
        """sam_hdr_name2tid (header.c:1771): -1 unknown. Supports the
        '*' => -1 convention."""
        if name == "*":
            return -1
        return self._name2tid.get(name, -1)

    def tid2name(self, tid: int) -> str:
        return self.ref_names[tid] if 0 <= tid < len(self.ref_names) else "*"

    def tid2len(self, tid: int) -> int:
        return self.ref_lens[tid] if 0 <= tid < len(self.ref_lens) else 0

    def add_ref(self, name: str, length: int) -> int:
        """Register a reference not described in the text (used by SAM parse
        in non-strict mode; sam_hdr_add_line @SQ path)."""
        if name in self._name2tid:
            return self._name2tid[name]
        tid = len(self.ref_names)
        self.ref_names.append(name)
        self.ref_lens.append(length)
        self._name2tid[name] = tid
        line = HeaderLine("SQ", [("SN", name), ("LN", str(length))])
        self._add_line_obj(line)
        return tid

    # -- text ----------------------------------------------------------
    @property
    def text(self) -> str:
        """Current header text (sam_hdr_str; rebuilt lazily when dirty)."""
        if self._dirty or self._text is None:
            self._text = self._rebuild()
            self._dirty = False
        return self._text

    def _rebuild(self) -> str:
        out = []
        for line in self.lines:
            out.append(line.format())
        return "\n".join(out) + ("\n" if out else "")

    def full_text_with_refs(self) -> str:
        """Header text guaranteed to contain an @SQ line for every binary
        reference (what sam_hdr_rebuild produces after fill_hrecs,
        header.c:1289)."""
        have = {l.get("SN") for l in self.lines if l.type == "SQ"}
        missing = [i for i, n in enumerate(self.ref_names) if n not in have]
        if not missing:
            return self.text
        base = self.text
        extra = "".join(f"@SQ\tSN:{self.ref_names[i]}\tLN:{self.ref_lens[i]}\n"
                        for i in missing)
        # insert after @HD if it is the first line (header.c keeps @HD first)
        if base.startswith("@HD"):
            nl = base.index("\n") + 1
            return base[:nl] + extra + base[nl:]
        return extra + base

    # -- line CRUD (sam_hdr_add_line etc., htslib/sam.h:551-720) --------
    def _add_line_obj(self, line: HeaderLine) -> None:
        if line.type == "HD" and any(l.type == "HD" for l in self.lines):
            log_warning("duplicate @HD line ignored")
            return
        if line.type == "HD":
            self.lines.insert(0, line)
        else:
            self.lines.append(line)
        idtag = _ID_TAG.get(line.type)
        if idtag and line.get(idtag) is not None:
            self._index[(line.type, line.get(idtag))] = line
        self._dirty = True

    def add_line(self, type_: str, *tagvals: str) -> None:
        tags = [(tagvals[i], tagvals[i + 1]) for i in range(0, len(tagvals), 2)]
        if type_ == "SQ":
            sn = dict(tags).get("SN")
            ln = dict(tags).get("LN", "0")
            if sn and sn not in self._name2tid:
                self._name2tid[sn] = len(self.ref_names)
                self.ref_names.append(sn)
                self.ref_lens.append(int(ln))
        self._add_line_obj(HeaderLine(type_, tags))

    def add_lines(self, text: str) -> None:
        for raw in text.split("\n"):
            if raw:
                line = HeaderLine.parse(raw)
                if line.type == "SQ":
                    sn, ln = line.get("SN"), line.get("LN") or "0"
                    if sn and sn not in self._name2tid:
                        self._name2tid[sn] = len(self.ref_names)
                        self.ref_names.append(sn)
                        self.ref_lens.append(int(ln))
                self._add_line_obj(line)

    def find_line_id(self, type_: str, id_key: str, id_val: str) -> Optional[HeaderLine]:
        idtag = _ID_TAG.get(type_)
        if idtag == id_key:
            return self._index.get((type_, id_val))
        for line in self.lines:
            if line.type == type_ and line.get(id_key) == id_val:
                return line
        return None

    def find_line_pos(self, type_: str, pos: int) -> Optional[HeaderLine]:
        i = 0
        for line in self.lines:
            if line.type == type_:
                if i == pos:
                    return line
                i += 1
        return None

    def count_lines(self, type_: str) -> int:
        return sum(1 for l in self.lines if l.type == type_)

    def find_tag_id(self, type_: str, id_key: str, id_val: str, tag: str) -> Optional[str]:
        line = self.find_line_id(type_, id_key, id_val)
        return line.get(tag) if line else None

    def find_tag_pos(self, type_: str, pos: int, tag: str) -> Optional[str]:
        line = self.find_line_pos(type_, pos)
        return line.get(tag) if line else None

    def remove_line_id(self, type_: str, id_key: str, id_val: str) -> bool:
        line = self.find_line_id(type_, id_key, id_val)
        if line is None:
            return False
        self.lines.remove(line)
        idtag = _ID_TAG.get(type_)
        if idtag and line.get(idtag) is not None:
            self._index.pop((type_, line.get(idtag)), None)
        self._dirty = True
        return True

    def remove_except(self, type_: str, id_key: Optional[str] = None,
                      id_val: Optional[str] = None) -> None:
        """sam_hdr_remove_except (htslib/sam.h:640)."""
        keep = None
        if id_key is not None:
            keep = self.find_line_id(type_, id_key, id_val)
        self.lines = [l for l in self.lines if l.type != type_ or l is keep]
        self._index = {k: v for k, v in self._index.items()
                       if k[0] != type_ or v is keep}
        self._dirty = True

    def update_line(self, type_: str, id_key: str, id_val: str,
                    *tagvals: Optional[str]) -> bool:
        line = self.find_line_id(type_, id_key, id_val)
        if line is None:
            return False
        for i in range(0, len(tagvals), 2):
            line.set(tagvals[i], tagvals[i + 1])
        self._dirty = True
        return True

    # -- PG chain (sam_hdr_add_pg, header.c:2228) -----------------------
    def add_pg(self, name: str, **tags: str) -> None:
        pg_ids = [l.get("ID") for l in self.lines if l.type == "PG"]
        # chain: new PG's PP points at PGs that are not a PP of any other
        pps = {l.get("PP") for l in self.lines if l.type == "PG"}
        leaves = [i for i in pg_ids if i not in pps and i is not None]
        uid = name
        n = 0
        while uid in pg_ids:
            n += 1
            uid = f"{name}.{n}"
        tlist: List[Tuple[str, str]] = [("ID", uid), ("PN", name)]
        if leaves:
            tlist.append(("PP", leaves[-1]))
        for k, v in tags.items():
            tlist.append((k, v))
        self._add_line_obj(HeaderLine("PG", tlist))

    # -- misc -----------------------------------------------------------
    def copy(self) -> "SamHeader":
        h = SamHeader(self.text)
        if not h.ref_names and self.ref_names:
            h.ref_names = list(self.ref_names)
            h.ref_lens = list(self.ref_lens)
            h._name2tid = dict(self._name2tid)
        return h

    @property
    def version(self) -> Optional[str]:
        for l in self.lines:
            if l.type == "HD":
                return l.get("VN")
        return None

    def __eq__(self, other) -> bool:
        return isinstance(other, SamHeader) and self.text == other.text
