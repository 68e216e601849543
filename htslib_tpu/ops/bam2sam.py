"""Chained device BAM->SAM pipeline (SURVEY §7 stage 3; VERDICT round-1
item 2): record-boundary scan -> core-field unpack -> nibble2base ->
qual+33 -> vectorised int->decimal -> full line assembly, all as one
jitted XLA program over a batch of records.

Pairs with ops/inflate.py for the BGZF stage: device inflate produces
the uncompressed payload, this module turns it into SAM text.  Two
host-side boundaries remain by design, both documented in
docs/DEVICE_LIMITS.md: aux-field text (C `%g` float formatting is not
reproducible in integer XLA ops; the host renders aux tails, the device
splices them), and the final device->host copy of the text itself
(tunnel-bound on this rig).

Reference hot path being replaced: bam_read1 field extraction
(sam.c:809-822), sam_format1_append (sam.c:4324), nibble2base
(simd.c:121).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from htslib_tpu.ops.seqfmt import (itoa_fixed, nibble_to_base,
                                   qual_to_ascii, unpack_core_fields)

CIG_CHARS = np.frombuffer(b"MIDNSHP=XB??????", np.uint8)


@functools.partial(jax.jit, static_argnums=(1,))
def device_record_scan(payload: jax.Array, max_records: int) -> Tuple[
        jax.Array, jax.Array, jax.Array]:
    """Record-boundary walk over a u32-length-prefixed BAM record stream
    (the bam_read1 framing, sam.c:784): offsets[k+1] = offsets[k] + 4 +
    block_len.  Returns (offsets [max_records], sizes, n_records)."""
    U = payload.shape[0]

    def u32_at(p):
        p = jnp.clip(p, 0, U - 4)
        return (payload[p].astype(jnp.int32)
                | (payload[p + 1].astype(jnp.int32) << 8)
                | (payload[p + 2].astype(jnp.int32) << 16)
                | (payload[p + 3].astype(jnp.int32) << 24))

    def body(k, carry):
        pos, offs, sizes, n = carry
        ok = pos + 4 <= U
        bsz = jnp.where(ok, u32_at(pos), 0)
        offs = offs.at[k].set(jnp.where(ok, pos, -1))
        sizes = sizes.at[k].set(bsz)
        n = n + ok.astype(jnp.int32)
        pos = jnp.where(ok, pos + 4 + bsz, pos)
        return pos, offs, sizes, n

    offs = jnp.full(max_records, -1, jnp.int32)
    sizes = jnp.zeros(max_records, jnp.int32)
    _, offs, sizes, n = jax.lax.fori_loop(
        0, max_records, body, (jnp.int32(0), offs, sizes, jnp.int32(0)))
    return offs, sizes, n


def _gather_rows(payload, starts, width):
    """[N] start offsets -> [N, width] byte rows (clamped gathers)."""
    U = payload.shape[0]
    idx = starts[:, None] + jnp.arange(width)[None, :]
    return payload[jnp.clip(idx, 0, U - 1)]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def device_format_records(payload, names_tbl, max_records, max_qname,
                          max_ops, max_len, name_w, out_w):
    """The full device chain: scan -> unpack -> per-column text ->
    assembled SAM line prefixes (everything before the aux tail).

    names_tbl: uint8 [n_ref+1, name_w] padded reference names with
    length in the last column trick avoided — lengths derived from
    NUL padding.  Returns (line [max_records, out_w] bytes,
    line_len [max_records], n_records)."""
    offs, sizes, n = device_record_scan(payload, max_records)
    valid = offs >= 0
    base = jnp.where(valid, offs + 4, 0)
    cores = _gather_rows(payload, base, 32)
    f = unpack_core_fields(cores)
    tid, pos, mapq = f["tid"], f["pos"], f["mapq"]
    l_qname = f["l_qname"].astype(jnp.int32)
    n_cigar, flag = f["n_cigar"], f["flag"]
    l_qseq, mtid, mpos, tlen = f["l_qseq"], f["mtid"], f["mpos"], f["tlen"]

    qname = _gather_rows(payload, base + 32, max_qname)
    cig_raw = _gather_rows(payload, base + 32 + l_qname, 4 * max_ops)
    cig = (cig_raw[:, 0::4].astype(jnp.uint32)
           | (cig_raw[:, 1::4].astype(jnp.uint32) << 8)
           | (cig_raw[:, 2::4].astype(jnp.uint32) << 16)
           | (cig_raw[:, 3::4].astype(jnp.uint32) << 24))
    seq_off = base + 32 + l_qname + 4 * n_cigar
    packed = _gather_rows(payload, seq_off, (max_len + 1) // 2)
    bases = nibble_to_base(packed)[:, :max_len]
    qual_off = seq_off + (l_qseq + 1) // 2
    quals = _gather_rows(payload, qual_off, max_len)

    N = max_records
    li = jnp.arange(out_w)[None, :]

    # ---- per-column text + lengths ----------------------------------
    from htslib_tpu.ops.seqfmt import dec_len_device

    def col_from_itoa(v):
        # itoa_fixed: right-aligned, zero-padded; length = digits+sign
        return itoa_fixed(v), dec_len_device(v)

    flag_t, flag_l = col_from_itoa(flag)
    pos_t, pos_l = col_from_itoa(pos + 1)
    mapq_t, mapq_l = col_from_itoa(mapq)
    mpos_t, mpos_l = col_from_itoa(mpos + 1)
    tlen_t, tlen_l = col_from_itoa(tlen)

    # reference names: gather row tid (clamped; -1 -> '*' row at index
    # n_ref, prepared host-side)
    n_ref = names_tbl.shape[0] - 1
    rname = names_tbl[jnp.clip(jnp.where(tid < 0, n_ref, tid), 0, n_ref)]
    rname_l = jnp.sum(rname != 0, axis=1)
    # RNEXT: '=' when mtid == tid (and mapped), else name or '*'
    mt_row = names_tbl[jnp.clip(jnp.where(mtid < 0, n_ref, mtid), 0, n_ref)]
    mt_l = jnp.sum(mt_row != 0, axis=1)
    same = (mtid == tid) & (mtid >= 0)
    eq_row = jnp.zeros_like(mt_row).at[:, 0].set(ord("="))
    rnext = jnp.where(same[:, None], eq_row, mt_row)
    rnext_l = jnp.where(same, 1, mt_l)

    # CIGAR text: per-op digits + op char, assembled into [N, cig_w]
    ops = (cig & 0xF).astype(jnp.int32)
    lens = (cig >> 4).astype(jnp.int32)
    op_valid = jnp.arange(max_ops)[None, :] < n_cigar[:, None]
    op_txt = itoa_fixed(lens.reshape(-1)).reshape(N, max_ops, -1)
    dig_w = op_txt.shape[2]
    op_dig = dec_len_device(lens.reshape(-1)).reshape(N, max_ops)
    op_len = jnp.where(op_valid, op_dig + 1, 0)
    cig_w = max_ops * (dig_w + 1)
    op_start = jnp.cumsum(op_len, axis=1) - op_len
    cig_txt = jnp.zeros((N, cig_w), jnp.uint8)
    rows3 = jnp.arange(N)[:, None, None]
    within = jnp.arange(dig_w + 1)[None, None, :]
    src = jnp.concatenate(
        [op_txt, jnp.asarray(CIG_CHARS)[ops][:, :, None]], axis=2)
    # select only the used tail of each op's digits + the op char
    keep = within >= (dig_w - op_dig)[:, :, None]
    tgt = op_start[:, :, None] + within - (dig_w - op_dig)[:, :, None]
    tgt = jnp.where(keep & op_valid[:, :, None], tgt, cig_w)
    cig_txt = cig_txt.at[rows3, jnp.minimum(tgt, cig_w - 1)].max(
        jnp.where(tgt < cig_w, src, 0), mode="drop")
    cig_len = jnp.sum(op_len, axis=1)
    star = n_cigar == 0
    cig_txt = jnp.where(star[:, None],
                        jnp.zeros_like(cig_txt).at[:, 0].set(ord("*")),
                        cig_txt)
    cig_len = jnp.where(star, 1, cig_len)

    # SEQ/QUAL text with '*' for empty
    seq_l = jnp.where(l_qseq > 0, l_qseq, 1)
    no_seq = l_qseq == 0
    seq_txt = jnp.where(no_seq[:, None],
                        jnp.zeros_like(bases).at[:, 0].set(ord("*")), bases)
    qmask = jnp.arange(max_len)[None, :] < l_qseq[:, None]
    first_q = quals[:, 0]
    no_qual = no_seq | (first_q == 0xFF)
    qual_txt = qual_to_ascii(quals, qmask)
    qual_txt = jnp.where(no_qual[:, None],
                         jnp.zeros_like(qual_txt).at[:, 0].set(ord("*")),
                         qual_txt)
    qual_l = jnp.where(no_qual, 1, l_qseq)

    # ---- line assembly: scatter each column at its cumsum offset ----
    qn_l = l_qname - 1
    cols = [
        (qname, qn_l, False), (flag_t, flag_l, True),
        (rname, rname_l, False), (pos_t, pos_l, True),
        (mapq_t, mapq_l, True), (cig_txt, cig_len, False),
        (rnext, rnext_l, False), (mpos_t, mpos_l, True),
        (tlen_t, tlen_l, True), (seq_txt, seq_l, False),
        (qual_txt, qual_l, False),
    ]
    total = jnp.zeros(N, jnp.int32)
    for _, ln, _r in cols:
        total = total + ln + 1          # content + tab
    total = total - 1                   # no tab after the last column
    out = jnp.zeros((N, out_w), jnp.uint8)
    rows2 = jnp.arange(N)[:, None]
    cur = jnp.zeros(N, jnp.int32)
    for ci, (txt, ln, right) in enumerate(cols):
        w = txt.shape[1]
        within2 = jnp.arange(w)[None, :]
        start_in = (w - ln)[:, None] if right \
            else jnp.zeros((N, 1), jnp.int32)
        keep2 = (within2 >= start_in) & (within2 < start_in + ln[:, None])
        tgt2 = cur[:, None] + within2 - start_in
        tgt2 = jnp.where(keep2, tgt2, out_w)
        out = out.at[rows2, jnp.minimum(tgt2, out_w - 1)].max(
            jnp.where(tgt2 < out_w, txt, 0), mode="drop")
        cur = cur + ln
        if ci < len(cols) - 1:
            out = out.at[rows2[:, 0], jnp.minimum(cur, out_w - 1)].max(
                jnp.where(cur < out_w, ord("\t"), 0), mode="drop")
            cur = cur + 1
    return out, total, n, sizes


def bam_payload_to_sam_device(payload: bytes, header,
                              aux_texts=None) -> bytes:
    """Host wrapper: run the device chain over a u32-framed BAM record
    stream and splice host-rendered aux tails (see module docstring for
    the boundary rationale).  Byte-exact vs the host formatter."""
    import numpy as np
    pl_arr = np.frombuffer(payload, np.uint8)
    # host-side maxima for static shapes
    offs = []
    p, U = 0, len(payload)
    while p + 4 <= U:
        bsz = int.from_bytes(payload[p:p + 4], "little")
        offs.append((p, bsz))
        p += 4 + bsz
    if p != U:
        raise IOError("truncated BAM record stream")
    N = len(offs)
    if N == 0:
        return b""
    max_qname = max(payload[o + 4 + 8] for o, _ in offs)
    max_ops = max(1, max(int.from_bytes(payload[o + 4 + 12:o + 4 + 14],
                                        "little") for o, _ in offs))
    max_len = max(1, max(int.from_bytes(payload[o + 4 + 16:o + 4 + 20],
                                        "little") for o, _ in offs))
    names = [n.encode() for n in header.ref_names]
    name_w = max([len(n) for n in names] + [1])
    tbl = np.zeros((len(names) + 1, name_w), np.uint8)
    for i, nm in enumerate(names):
        tbl[i, :len(nm)] = np.frombuffer(nm, np.uint8)
    tbl[len(names), 0] = ord("*")
    dig_w = 11
    out_w = (max_qname + 11 * 4 + name_w * 2 + max_ops * (dig_w + 1)
             + max_len * 2 + 16)
    line, line_len, n, sizes = device_format_records(
        jnp.asarray(pl_arr), jnp.asarray(tbl), N, max_qname, max_ops,
        max_len, name_w, out_w)
    line = np.asarray(line)
    line_len = np.asarray(line_len)
    # aux tails rendered host-side (the %g boundary)
    if aux_texts is None:
        from htslib_tpu.sam.record import BamRecord
        aux_texts = []
        mv = memoryview(payload)
        for o, bsz in offs:
            rec = BamRecord.from_bam_buffer(mv, o + 4, bsz)
            full = rec.to_sam(header).rstrip("\n")
            cut = 0
            for _ in range(11):
                cut = full.index("\t", cut) + 1 if "\t" in full[cut:] \
                    else len(full)
            # everything after the 11th column
            parts = full.split("\t")
            aux_texts.append(("\t" + "\t".join(parts[11:]))
                             if len(parts) > 11 else "")
    out = bytearray()
    for i in range(N):
        out += line[i, :line_len[i]].tobytes()
        out += aux_texts[i].encode()
        out += b"\n"
    return bytes(out)
