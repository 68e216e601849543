"""Stable introspection/manipulation API over CRAM internals
(reference cram/cram_external.c: the public accessor layer of
htslib/cram.h:826, including cram_transcode_rg).

The Python object model already exposes container/slice/block fields as
attributes; this module adds the file-level walkers and the read-group
transcoder built on them.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

from htslib_tpu.cram import CRAM_EOF_START, CramReader, CramWriter
from htslib_tpu.cram.io import CramContainer, CramIO, read_file_definition
from htslib_tpu.hfile import hopen
from htslib_tpu.sam.header import SamHeader


def containers(path: str) -> Iterator[Tuple[int, CramContainer]]:
    """Walk (file_offset, container_header) pairs, EOF container
    excluded (cram_container_num_containers / cram_num_containers,
    cram_index.c:851)."""
    with hopen(path, "rb") as fp:
        version, _ = read_file_definition(fp)
        io = CramIO(fp, version)
        first = True
        while True:
            off = fp.tell()
            c = io.read_container_header()
            if c is None:
                return
            if c.ref_seq_id == -1 and c.ref_seq_start == CRAM_EOF_START:
                return
            if not first:  # first container carries the SAM header
                yield off, c
            first = False
            io.skip_container_data(c)


def num_containers(path: str) -> int:
    """cram_num_containers (cram_external.c)."""
    return sum(1 for _ in containers(path))


def container_stats(path: str) -> List[Dict[str, int]]:
    """Per-container summary: offset, ref, start, span, records, bases,
    blocks (the cram_container_get_* accessor family)."""
    out = []
    for off, c in containers(path):
        out.append({
            "offset": off, "ref_seq_id": c.ref_seq_id,
            "ref_seq_start": c.ref_seq_start, "ref_seq_span": c.ref_seq_span,
            "num_records": c.num_records, "num_blocks": c.num_blocks,
            "length": c.length,
        })
    return out


def transcode_rg(src: str, dst: str, rg_map: Dict[str, str],
                 ref: Optional[str] = None) -> int:
    """Rewrite read-group assignments while copying a CRAM file
    (cram_transcode_rg, cram_external.c; `samtools cat -r`).  Returns
    the number of records written.  Header @RG IDs are renamed per
    rg_map and every record's RG tag follows."""
    with CramReader(src, ref=ref, decode_md=False) as r:
        hdr_text = []
        for line in r.header.text.rstrip("\n").split("\n"):
            if line.startswith("@RG"):
                fields = line.split("\t")
                for i, f in enumerate(fields):
                    if f.startswith("ID:") and f[3:] in rg_map:
                        fields[i] = "ID:" + rg_map[f[3:]]
                line = "\t".join(fields)
            hdr_text.append(line)
        new_hdr = SamHeader("\n".join(hdr_text) + "\n")
        n = 0
        with CramWriter(dst, new_hdr, ref=ref) as w:
            for rec in r:
                rg = rec.get_aux("RG")
                if rg is not None and rg in rg_map:
                    rec.set_aux("RG", "Z", rg_map[rg])
                w.write(rec)
                n += 1
    return n
