"""On-device end-to-end workload: compressed rANS Nx16 streams ->
wire-exact Pallas decode -> on-device statistics reduction, with only
the compressed input crossing host->device (once) and a few-KB result
coming back.  This is the decode->reduce->small-output shape the
33 MB/s axon tunnel cannot cap (VERDICT r3 task #2): the samtools
stats-style per-quality histogram over CRAM quality data series
(reference analogue: the QUAL distribution pass of samtools stats over
cram_decode.c output).

Pipeline (one jitted step per SEG rounds, all device-resident):
  rANS Nx16 O0 32-way decode (`ops/rans_pallas._seg_kernel`, the
  gatherless VMEM-table kernel, byte-exact vs codecs/rans4x16.py)
  -> masked per-lane one-hot histogram accumulate ([QBINS, 128] i32)
The decoded symbols never leave the device; the final histogram
(QBINS x 4 streams, ~1 KB) is the only download.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

QBINS = 64        # quality alphabet (phred 0..63)


def _prepare_group(group: List[bytes]):
    """Parse headers of up to BLOCKS streams -> device-ready arrays
    (mirrors ops/rans_pallas.decode_nx16_o0_batch's front end)."""
    from htslib_tpu.codecs.rans4x16 import _read_freq_table, u7_get
    from htslib_tpu.ops.rans_pallas import (BLOCKS, NWAY, RANS16_L, TOTFREQ,
                                            _WINR, pack_tables)

    freqs = np.zeros((BLOCKS, 256), np.int64)
    states = np.zeros((BLOCKS, NWAY), np.int64)
    payloads: List[np.ndarray] = []
    out_szs = [0] * BLOCKS
    for gi, data in enumerate(group):
        flags = data[0]
        if flags & ~0x04 or not (flags & 0x04):
            raise ValueError("device qualstats: plain 32-way O0 only")
        p = 1
        ulen, p = u7_get(data, p)
        out_szs[gi] = ulen
        f, p = _read_freq_table(data, p)
        if f.sum() != TOTFREQ:
            raise ValueError("unnormalised frequency table")
        freqs[gi] = f
        for j in range(NWAY):
            states[gi, j] = int.from_bytes(data[p:p + 4], "little")
            p += 4
        payloads.append(np.frombuffer(data, np.uint8, len(data) - p, p))
    for gi in range(len(group), BLOCKS):
        freqs[gi, 0] = TOTFREQ
        states[gi, :] = RANS16_L
        payloads.append(np.zeros(0, np.uint8))

    a_max = max(int((freqs[gi] > 0).sum()) for gi in range(BLOCKS))
    a_pad = 8
    while a_pad < a_max:
        a_pad <<= 1
    lo_b, dfc_b = pack_tables(freqs, a_pad)
    L = BLOCKS * NWAY
    # state-major lanes (lane j*BLOCKS + b): tables tile, states
    # transpose (matches _seg_kernel's pltpu.repeat window expansion)
    lo = np.tile(lo_b, (1, NWAY))
    dfc = np.tile(dfc_b, (1, NWAY))
    x = np.broadcast_to(states.T.reshape(1, L), (8, L)) \
        .astype(np.uint32).view(np.int32).copy()
    max_rows = max((len(pl_) + 3) // 4 for pl_ in payloads)
    W = max_rows + 2 * _WINR
    # two LE u16 refill words per i32 row (the kernel's packed window
    # layout; same 2 bytes/word tunnel density as the old u16 rows)
    data_w = np.zeros((W, BLOCKS), np.int32)
    for gi, pl_ in enumerate(payloads):
        pad = np.zeros(((len(pl_) + 3) // 4) * 4, np.uint8)
        pad[:len(pl_)] = pl_
        data_w[:len(pad) // 4, gi] = pad.view("<u4").view(np.int32)
    return data_w, lo, dfc, x, out_szs, a_pad, W


@functools.lru_cache(maxsize=None)
def _stats_run(a_pad: int, interpret: bool = False, qbins: int = QBINS):
    """Jitted whole-stream run: fori_loop over SEG-round Pallas decode
    segments + on-device masked histogram accumulate.  One dispatch per
    stream group (the ~5 ms tunnel dispatch floor amortises over every
    segment); decoded symbols never leave the device."""
    import jax
    import jax.numpy as jnp

    from htslib_tpu.ops.rans_pallas import (BLOCKS, NWAY, SEG, _WINR,
                                            _compiled_seg_hist)
    L = BLOCKS * NWAY
    # per-seg window: the kernel's VMEM input is lane-padded [.,4]->128,
    # so the full stream cannot live in VMEM — each iteration slices a
    # bounded window per block out of HBM instead (i32 rows packing two
    # u16 words).  Typical consumption is <= 1 word/state/round; 1.25x
    # slack covers refill bursts (the exactness check in callers guards
    # the pathological 2x case).
    S = SEG * NWAY // 2 + SEG * 4 + 2 * _WINR
    run_seg = _compiled_seg_hist(a_pad, qbins, interpret)

    @jax.jit
    def run(data, lo, dfc, x, cur, ulen8, n_segs, off8):
        # while_loop, not fori_loop: a static trip count lets XLA unroll
        # the kernel calls and multiply their VMEM input allocations
        def cond(carry):
            return carry[0] < n_segs

        def body(carry):
            si, x_c, cur_abs, hist = carry
            # cur_abs is in WORD units; slice at the packed row and pass
            # the intra-row parity through the kernel's cursor input
            cols = [jax.lax.dynamic_slice(
                        data, (cur_abs[0, b] // 2, b), (S, 1))
                    for b in range(BLOCKS)]
            win = jnp.concatenate(cols, axis=1)
            hseg, x2, cur_rel = run_seg(
                win, lo, dfc, x_c, cur_abs % 2, ulen8, off8,
                jnp.full((1, 1), si * SEG, jnp.int32))
            return (si + 1, x2, cur_abs - cur_abs % 2 + cur_rel,
                    hist + hseg)

        hist0 = jnp.zeros((qbins, L), jnp.int32)
        carry = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x, cur, hist0))
        return carry[3]

    return run


def qualstats_device(blocks: List[bytes], interpret: bool = False,
                     reps: int = 1, offsets: List[int] = None,
                     qbins: int = QBINS) -> Tuple[np.ndarray, dict]:
    """Per-stream symbol histograms for rANS Nx16 O0 32-way streams,
    decoded AND reduced on device.  `offsets[i]` is subtracted from
    stream i's symbols before binning (e.g. 33 for ASCII base series).
    Returns (hist [n_blocks, QBINS], timing dict with resident-input
    steady-state rates)."""
    import time

    import jax.numpy as jnp

    from htslib_tpu.ops.rans_pallas import BLOCKS, NWAY, SEG

    L = BLOCKS * NWAY
    hists = []
    timing = {"uncompressed_bytes": 0, "compressed_bytes": 0,
              "decode_s": 0.0}
    # PIPELINED dispatch: prepare+upload+launch every group first (JAX
    # dispatch is async, so group k+1's host framing and upload overlap
    # group k's on-chip decode), then collect the tiny histograms
    pending = []
    for gbase in range(0, len(blocks), BLOCKS):
        group = blocks[gbase:gbase + BLOCKS]
        data_w, lo, dfc, x0, out_szs, a_pad, W = _prepare_group(group)
        from htslib_tpu.ops.rans_pallas import _WINR
        S = SEG * NWAY // 2 + SEG * 4 + 2 * _WINR
        # upload ONLY the used columns (packed i32 rows = 2 bytes per
        # refill word, the entropy floor) and pad rows+columns on the
        # device: the h2d tunnel is the file-level lane's binding
        # constraint, so the transfer must carry no zeros
        g_cols = len(group)
        data_j = jnp.asarray(data_w[:, :g_cols])
        # quantise the padded height so arbitrary stream sizes reuse
        # one compiled shape (every new shape is a multi-second
        # recompile through the tunnel)
        H = ((data_w.shape[0] + S) // 16384 + 1) * 16384
        data_j = jnp.pad(
            data_j, ((0, H - data_w.shape[0]), (0, BLOCKS - g_cols)))
        ulen_lane = np.zeros((8, L), np.int32)
        off_lane = np.zeros((8, L), np.int32)
        for b in range(BLOCKS):
            ulen_lane[:, b::BLOCKS] = out_szs[b]     # state-major lanes
            if offsets is not None and gbase + b < len(offsets):
                off_lane[:, b::BLOCKS] = offsets[gbase + b]
        rounds_needed = max(1, (max(out_szs) + NWAY - 1) // NWAY)
        n_segs = (rounds_needed + SEG - 1) // SEG
        run = _stats_run(a_pad, interpret, qbins)
        # upload COMPACT [A, BLOCKS] tables and tile on device: the
        # host-tiled [A, L] copies were 32x redundant tunnel bytes
        args = (data_j, jnp.tile(jnp.asarray(lo[:, :BLOCKS]), (1, NWAY)),
                jnp.tile(jnp.asarray(dfc[:, :BLOCKS]), (1, NWAY)),
                jnp.asarray(x0),
                jnp.asarray(np.zeros((1, BLOCKS), np.int32)),
                jnp.asarray(ulen_lane), jnp.int32(n_segs),
                jnp.asarray(off_lane))
        # dispatch now (async): the next group's framing and upload
        # overlap this group's decode
        pending.append((run, args, run(*args), len(group), out_szs,
                        sum(len(b) for b in group)))

    t0 = time.time()
    for run, args, hist, g_len, out_szs, comp_bytes in pending:
        np_h = np.asarray(hist)          # sync (tiny download)
        timing["uncompressed_bytes"] += sum(out_szs[:g_len])
        timing["compressed_bytes"] += comp_bytes
        for b in range(g_len):
            hists.append(np_h[:, b::BLOCKS].sum(axis=1))
    timing["decode_s"] = time.time() - t0
    # steady-state re-measure with warm, device-resident inputs
    if reps > 1:
        # best-of-reps: per-rep wall includes host dispatch of the
        # while_loop chain, which stalls under host load — the min is
        # the reproducible device-resident number
        best = None
        for _ in range(reps):
            t0 = time.time()
            for run, args, *_m in pending:
                h = run(*args)
            np.asarray(h)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timing["decode_s"] = best
    if timing["decode_s"] > 0:
        # only the reps>1 re-measure is a true device-resident rate;
        # the reps=1 path timed just the collect phase of an already
        # async-dispatched pipeline (would overstate multi-group runs)
        key = ("MBps_uncompressed_resident" if reps > 1
               else "MBps_uncompressed_collect_wall")
        timing[key] = round(
            timing["uncompressed_bytes"] / timing["decode_s"] / 1e6, 2)
    return np.stack(hists), timing


@functools.lru_cache(maxsize=None)
def _stats_run4(a2_pad: int, a_pad: int, o1: bool,
                interpret: bool = False, qbins: int = QBINS):
    """4x8 variant of _stats_run: vanilla CRAM 3.0 rANS blocks —
    order-0 OR order-1 — decoded and histogram-reduced entirely inside
    the Pallas kernel (streams in HBM, bounded per-segment windows)."""
    import jax
    import jax.numpy as jnp

    from htslib_tpu.ops.rans4x8_pallas import (BLOCKS4, NWAY4, SEG4,
                                               _WINR4,
                                               _compiled_seg4_hist)
    L = BLOCKS4 * NWAY4
    S = SEG4 * NWAY4 * 2 // 4 + 2 * _WINR4
    run_seg = _compiled_seg4_hist(a2_pad, a_pad, o1, qbins, interpret)

    @jax.jit
    def run(data, lo, dfc, ad, x, cur, ctx, cnt_lane, n_segs):
        def cond(carry):
            return carry[0] < n_segs

        def body(carry):
            si, x_c, cur_abs, ctx_c, hist = carry
            # cur_abs in BYTE units: slice at the packed row, parity
            # through the kernel's cursor input
            cols = [jax.lax.dynamic_slice(
                        data, (cur_abs[0, b] // 4, b), (S, 1))
                    for b in range(BLOCKS4)]
            win = jnp.concatenate(cols, axis=1)
            cnt_seg = jnp.maximum(cnt_lane - si * SEG4, 0)
            cnt8 = jnp.broadcast_to(cnt_seg[None, :], (8, L))
            hseg, x2, cur_rel, ctx2 = run_seg(
                win, lo, dfc, ad, x_c, cur_abs % 4, ctx_c, cnt8)
            return (si + 1, x2, cur_abs - cur_abs % 4 + cur_rel, ctx2,
                    hist + hseg)

        hist0 = jnp.zeros((qbins, L), jnp.int32)
        carry = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x, cur, jnp.zeros((8, L),
                                                         jnp.int32),
                         hist0))
        return carry[4], carry[1], carry[2], carry[3]

    return run


def _parse_4x8_o1(data: bytes):
    """Parse a 4x8 ORDER-1 stream: returns (out_sz, F [256,256],
    states [4], payload_offset)."""
    import struct

    from htslib_tpu.codecs.rans4x8 import _read_freqs_o1
    if data[0] != 1:
        raise ValueError("not a 4x8 order-1 stream")
    comp_sz, out_sz = struct.unpack_from("<II", data, 1)
    F, p = _read_freqs_o1(data, 9)
    states = np.zeros(4, np.int64)
    for j in range(4):
        states[j] = int.from_bytes(data[p + 4 * j:p + 4 * j + 4],
                                   "little")
    return out_sz, F, states, p + 16


def qualstats_device_4x8(blocks: List[bytes], interpret: bool = False,
                         reps: int = 1, qbins: int = QBINS,
                         o1: bool = False) -> Tuple[np.ndarray, dict]:
    """Per-stream histograms for rANS 4x8 streams (the CRAM 3.0 wire —
    vanilla files, no write profile needed), ORDER-0 or ORDER-1
    (`o1`), decoded AND reduced on device.  The <=3 odd tail symbols
    per stream are finished on the host from the returned state (and,
    for order-1, the returned final context)."""
    import time

    import jax.numpy as jnp

    from htslib_tpu.codecs.rans4x8 import _read_freqs
    from htslib_tpu.ops.rans4x8_pallas import (BLOCKS4, NWAY4, RANS8_L,
                                               SEG4, _WINR4,
                                               _prepare_group4,
                                               build_o1_tables_4x8)
    from htslib_tpu.ops.rans_o1_pallas import A2_MAX

    L = BLOCKS4 * NWAY4
    S = SEG4 * NWAY4 * 2 // 4 + 2 * _WINR4
    hists = []
    timing = {"uncompressed_bytes": 0, "compressed_bytes": 0,
              "decode_s": 0.0}

    if o1:
        parsed = [_parse_4x8_o1(d) for d in blocks]
        a2_pad = a_pad = 8
        for out_sz, F, states, poff in parsed:
            used_ctx = np.nonzero(F.sum(axis=1))[0]
            syms = np.nonzero(F.sum(axis=0))[0]
            A = len(np.union1d(used_ctx, syms))
            while a_pad < A:
                a_pad <<= 1
            nrows = int((F > 0).sum())
            while a2_pad < nrows:
                a2_pad <<= 1
        if a2_pad > A2_MAX:
            raise ValueError("alphabet too large for the device O1 "
                             "kernel")
    else:
        a2_pad = a_pad = None   # set per group by _prepare_group4

    pending = []
    for gbase in range(0, len(blocks), BLOCKS4):
        group = blocks[gbase:gbase + BLOCKS4]
        if o1:
            g_parsed = parsed[gbase:gbase + BLOCKS4]
            out_szs = [0] * BLOCKS4
            lo = np.zeros((a2_pad, BLOCKS4), np.int32)
            dfc = np.zeros((a2_pad, BLOCKS4), np.int32)
            ad_c = np.zeros((a_pad, BLOCKS4), np.int32)
            states_all = np.zeros((BLOCKS4, NWAY4), np.int64)
            payloads = []
            maps = []
            for gi in range(BLOCKS4):
                if gi < len(g_parsed):
                    out_sz, F, states, poff = g_parsed[gi]
                    l2, dd2, add, densemap, alphabet =                         build_o1_tables_4x8(F, a2_pad, a_pad)
                    lo[:, gi] = l2
                    dfc[:, gi] = dd2
                    ad_c[:, gi] = add
                    out_szs[gi] = out_sz
                    states_all[gi] = states
                    d = group[gi]
                    payloads.append(
                        np.frombuffer(d, np.uint8, len(d) - poff, poff))
                    maps.append((densemap, alphabet))
                else:
                    lo[0, gi] = 0
                    dfc[0, gi] = TOTFREQ_8 - 1
                    lo[1:, gi] = 1 << 30
                    states_all[gi] = RANS8_L
                    payloads.append(np.zeros(0, np.uint8))
                    maps.append((None, np.zeros(1, np.int64)))
            lo_t = np.tile(lo, (1, NWAY4))
            dfc_t = np.tile(dfc, (1, NWAY4))
            ad_t = np.tile(ad_c, (1, NWAY4))
            x0 = np.broadcast_to(states_all.T.reshape(1, L), (8, L)) \
                .astype(np.uint32).view(np.int32).copy()
            max_rows = max((len(p_) + 3) // 4 for p_ in payloads)
            W = max_rows + 2 * _WINR4
            data_w = np.zeros((W, BLOCKS4), np.int32)
            for gi, p_ in enumerate(payloads):
                pad = np.zeros(((len(p_) + 3) // 4) * 4, np.uint8)
                pad[:len(p_)] = p_
                data_w[:len(pad) // 4, gi] = pad.view("<u4").view(
                    np.int32)
            grp_pads = (a2_pad, a_pad)
            extra = (payloads, maps)
        else:
            data_w, lo_t, dfc_t, x0, out_szs, a_pad_g, W =                 _prepare_group4(group)
            ad_t = np.zeros((8, L), np.int32)
            grp_pads = (a_pad_g, 8)
            extra = (None, None)
        g_cols = len(group)
        data_j = jnp.asarray(data_w[:, :g_cols])
        H = ((data_w.shape[0] + S) // 16384 + 1) * 16384
        data_j = jnp.pad(
            data_j, ((0, H - data_w.shape[0]), (0, BLOCKS4 - g_cols)))
        cnt_lane = np.zeros(L, np.int32)
        for b in range(BLOCKS4):
            cnt_lane[b::BLOCKS4] = out_szs[b] // NWAY4
        rounds_needed = max(1, max(out_szs) // NWAY4)
        n_segs = (rounds_needed + SEG4 - 1) // SEG4
        run = _stats_run4(grp_pads[0], grp_pads[1], o1, interpret,
                          qbins)
        args = (data_j,
                jnp.tile(jnp.asarray(lo_t[:, :BLOCKS4]), (1, NWAY4)),
                jnp.tile(jnp.asarray(dfc_t[:, :BLOCKS4]), (1, NWAY4)),
                (jnp.tile(jnp.asarray(ad_t[:, :BLOCKS4]), (1, NWAY4))
                 if ad_t.shape[1] >= BLOCKS4 * NWAY4
                 else jnp.asarray(ad_t)),
                jnp.asarray(x0),
                jnp.asarray(np.zeros((1, BLOCKS4), np.int32)),
                jnp.asarray(np.zeros((8, L), np.int32)),
                jnp.asarray(cnt_lane), jnp.int32(n_segs))
        pending.append((run, args, run(*args), group, out_szs, extra,
                        gbase))

    t0 = time.time()
    for run, args, res, group, out_szs, extra, gbase in pending:
        hist, x_f, cur_f, ctx_f = res
        np_h = np.asarray(hist)
        x_fin = np.asarray(x_f)[0].astype(np.int64) & 0xFFFFFFFF
        cur_fin = np.asarray(cur_f)[0]
        ctx_fin = np.asarray(ctx_f)[0]
        timing["uncompressed_bytes"] += sum(out_szs[:len(group)])
        timing["compressed_bytes"] += sum(len(b) for b in group)
        for gi in range(len(group)):
            h = np_h[:, gi::BLOCKS4].sum(axis=1).astype(np.int64)
            n = out_szs[gi]
            nmain = n // NWAY4
            if n - nmain * NWAY4:
                data = group[gi]
                if o1:
                    payloads, maps = extra
                    out_sz, F, states, poff =                         _parse_4x8_o1(data)
                    C = np.zeros((256, 257), np.int64)
                    np.cumsum(F, axis=1, out=C[:, 1:])
                    _dm, alphabet = maps[gi]
                    payload = payloads[gi]
                    xs = int(x_fin[3 * BLOCKS4 + gi]) if nmain \
                        else int(states[3])
                    ptr = int(cur_fin[gi]) if nmain else 0
                    ctx = int(alphabet[int(ctx_fin[3 * BLOCKS4 + gi])])\
                        if nmain else 0
                    for k in range(nmain * NWAY4, n):
                        m = xs & (TOTFREQ_8 - 1)
                        s = int(np.searchsorted(C[ctx], m,
                                                "right")) - 1
                        h[min(s, qbins - 1)] += 1
                        xs = (int(F[ctx, s]) * (xs >> 12)
                              + m - int(C[ctx, s]))
                        while xs < RANS8_L and ptr < len(payload):
                            xs = (xs << 8) | int(payload[ptr])
                            ptr += 1
                        ctx = s
                else:
                    f, p0 = _read_freqs(data, 9)
                    cum = np.zeros(257, np.int64)
                    np.cumsum(f, out=cum[1:])
                    D = np.repeat(np.arange(256, dtype=np.uint8), f)
                    if len(D) < TOTFREQ_8:
                        D = np.concatenate(
                            [D, np.zeros(TOTFREQ_8 - len(D),
                                         np.uint8)])
                    arr = np.frombuffer(data, np.uint8)
                    ptr = p0 + 16 + int(cur_fin[gi])
                    xs = x_fin[gi::BLOCKS4].copy()
                    for k in range(n - nmain * NWAY4):
                        m = int(xs[k]) & (TOTFREQ_8 - 1)
                        sym = int(D[m])
                        h[min(sym, qbins - 1)] += 1
                        xs[k] = (int(f[sym]) * (int(xs[k]) >> 12)
                                 + m - int(cum[sym]))
                        while xs[k] < RANS8_L and ptr < len(arr):
                            xs[k] = (int(xs[k]) << 8) | int(arr[ptr])
                            ptr += 1
            hists.append(h)
    timing["decode_s"] = time.time() - t0
    if reps > 1:
        best = None
        for _ in range(reps):
            t0 = time.time()
            for run, args, *_m in pending:
                res = run(*args)
            np.asarray(res[0])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timing["decode_s"] = best
    if timing["decode_s"] > 0:
        # only the reps>1 re-measure is a true device-resident rate;
        # the reps=1 path timed just the collect phase of an already
        # async-dispatched pipeline (would overstate multi-group runs)
        key = ("MBps_uncompressed_resident" if reps > 1
               else "MBps_uncompressed_collect_wall")
        timing[key] = round(
            timing["uncompressed_bytes"] / timing["decode_s"] / 1e6, 2)
    return np.stack(hists), timing



TOTFREQ_8 = 4096


@functools.lru_cache(maxsize=None)
def _stats_run_o1(a2_pad: int, a_pad: int, blocks: int,
                  interpret: bool = False, qbins: int = QBINS):
    """O1 variant of _stats_run: rANS Nx16 ORDER-1 32-way streams
    (ops/rans_o1_pallas) decoded and histogram-reduced on device."""
    import jax
    import jax.numpy as jnp

    from htslib_tpu.ops.rans_o1_pallas import (NWAY, SEG1, _WINR1,
                                               _compiled_seg1_hist)
    L = blocks * NWAY
    S = SEG1 * NWAY // 2 + SEG1 * 4 + 2 * _WINR1
    run_seg = _compiled_seg1_hist(a2_pad, a_pad, blocks, qbins,
                                  interpret)

    @jax.jit
    def run(data, lo2, d2, ad, x, cur, ctx, cnt_lane, n_segs):
        def cond(carry):
            return carry[0] < n_segs

        def body(carry):
            si, x_c, cur_abs, ctx_c, hist = carry
            cols = [jax.lax.dynamic_slice(
                        data, (cur_abs[0, b] // 2, b), (S, 1))
                    for b in range(blocks)]
            win = jnp.concatenate(cols, axis=1)
            cnt_seg = jnp.maximum(cnt_lane - si * SEG1, 0)
            cnt8 = jnp.broadcast_to(cnt_seg[None, :], (8, L))
            hseg, x2, cur_rel, ctx2 = run_seg(
                win, lo2, d2, ad, x_c, cur_abs % 2, ctx_c, cnt8)
            return (si + 1, x2, cur_abs - cur_abs % 2 + cur_rel, ctx2,
                    hist + hseg)

        hist0 = jnp.zeros((qbins, L), jnp.int32)
        carry = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x, cur, ctx, hist0))
        return carry[4], carry[1], carry[2], carry[3]

    return run


def qualstats_device_o1(blocks_in: List[bytes], interpret: bool = False,
                        reps: int = 1,
                        qbins: int = QBINS) -> Tuple[np.ndarray, dict]:
    """Per-stream histograms for rANS Nx16 ORDER-1 32-way streams,
    decoded AND reduced on device; the <=31-byte tail continues on the
    host from the returned state and final contexts."""
    import time

    import jax.numpy as jnp

    from htslib_tpu.ops.rans_o1_pallas import (NWAY, RANS16_L, SEG1,
                                               TF_SHIFT, TOTFREQ, _WINR1,
                                               _parse_o1_header,
                                               _prepare_group_o1, o1_pads,
                                               pick_width)

    all_parsed = [_parse_o1_header(d) for d in blocks_in]
    a2_pad, a_pad = o1_pads(all_parsed)
    blocks = pick_width(a2_pad)
    L = blocks * NWAY
    hists = []
    timing = {"uncompressed_bytes": 0, "compressed_bytes": 0,
              "decode_s": 0.0}
    S = SEG1 * NWAY // 2 + SEG1 * 4 + 2 * _WINR1
    run = _stats_run_o1(a2_pad, a_pad, blocks, interpret, qbins)
    for gbase in range(0, len(blocks_in), blocks):
        group = blocks_in[gbase:gbase + blocks]
        (data_w, lo2, d2, ad, x0, out_szs, W, maps,
         parsed) = _prepare_group_o1(
            group, blocks, a2_pad, a_pad,
            all_parsed[gbase:gbase + blocks])
        # used columns only + device-side padding, height quantised so
        # one compiled shape serves arbitrary stream sizes
        g_cols = len(group)
        data_j = jnp.asarray(data_w[:, :g_cols])
        H = ((data_w.shape[0] + S) // 16384 + 1) * 16384
        data_j = jnp.pad(
            data_j, ((0, H - data_w.shape[0]), (0, blocks - g_cols)))
        segs_rounds = [n // NWAY for n in out_szs]
        cnt_lane = np.zeros(L, np.int32)
        for b in range(blocks):
            cnt_lane[b::blocks] = segs_rounds[b]
        rounds_needed = max(1, max(segs_rounds))
        n_segs = (rounds_needed + SEG1 - 1) // SEG1
        args = (data_j,
                jnp.tile(jnp.asarray(lo2[:, :blocks]), (1, NWAY)),
                jnp.tile(jnp.asarray(d2[:, :blocks]), (1, NWAY)),
                jnp.tile(jnp.asarray(ad[:, :blocks]), (1, NWAY)),
                jnp.asarray(x0),
                jnp.asarray(np.zeros((1, blocks), np.int32)),
                jnp.asarray(np.zeros((8, L), np.int32)),
                jnp.asarray(cnt_lane), jnp.int32(n_segs))
        hist, x_f, cur_f, ctx_f = run(*args)
        np_h = np.asarray(hist)
        x_fin = np.asarray(x_f)[0].astype(np.int64) & 0xFFFFFFFF
        cur_fin = np.asarray(cur_f)[0]
        ctx_fin = np.asarray(ctx_f)[0]
        # best-of-reps: per-rep wall includes host dispatch, which
        # stalls under host load — the min is the reproducible number
        best = None
        for _ in range(max(reps, 1)):
            t0 = time.time()
            hist, x_f, cur_f, ctx_f = run(*args)
            np_h = np.asarray(hist)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timing["decode_s"] += best
        timing["uncompressed_bytes"] += sum(out_szs[:len(group)])
        timing["compressed_bytes"] += sum(len(b) for b in group)
        for gi in range(len(group)):
            h = np_h[:, gi::blocks].sum(axis=1).astype(np.int64)
            n = out_szs[gi]
            seg = n // NWAY
            if n - NWAY * seg:
                # host tail on the LAST state; ctx byte comes from the
                # kernel's final dense context via the union alphabet
                ulen, F, states, payload = parsed[gi]
                densemap, alphabet = maps[gi]
                C = np.zeros((256, 257), np.int64)
                for ctx in range(256):
                    C[ctx, 1:] = np.cumsum(F[ctx])
                xs = int(x_fin[(NWAY - 1) * blocks + gi]) if seg \
                    else int(states[NWAY - 1])
                ptr = int(cur_fin[gi]) * 2 if seg else 0
                ctx = int(alphabet[int(ctx_fin[(NWAY - 1) * blocks
                                               + gi])]) if seg else 0
                for i in range(NWAY * seg, n):
                    m = xs & (TOTFREQ - 1)
                    s = int(np.searchsorted(C[ctx], m, "right")) - 1
                    h[min(s, qbins - 1)] += 1
                    xs = (int(F[ctx, s]) * (xs >> TF_SHIFT)
                          + m - int(C[ctx, s]))
                    while xs < RANS16_L and ptr + 2 <= len(payload):
                        xs = ((xs << 16) | int(payload[ptr])
                              | (int(payload[ptr + 1]) << 8))
                        ptr += 2
                    ctx = s
            hists.append(h)
    if timing["decode_s"] > 0:
        # only the reps>1 re-measure is a true device-resident rate;
        # the reps=1 path timed just the collect phase of an already
        # async-dispatched pipeline (would overstate multi-group runs)
        key = ("MBps_uncompressed_resident" if reps > 1
               else "MBps_uncompressed_collect_wall")
        timing[key] = round(
            timing["uncompressed_bytes"] / timing["decode_s"] / 1e6, 2)
    return np.stack(hists), timing


def _stripe_rewrap(raw: bytes):
    """Split a STRIPE-transformed Nx16 stream (flags & 0x08) into its
    N sub-streams, each rewrapped as a PLAIN stream (sub-streams are
    coded with flags&(O1|N32)|NOSZ over every N-th byte, so a synthetic
    header of the same flags + the known sub-length makes each one a
    standalone device-decodable stream).  A histogram is
    stripe-order-independent, so the per-sub histograms just sum.
    Returns a list of (sub_stream, is_o1); raises ValueError when a
    sub-stream is not a plain 32-way wire."""
    from htslib_tpu.codecs.rans4x16 import u7_get, u7_put
    flags = raw[0]
    if not (flags & 0x08) or flags & 0xF0:  # no NOSZ/CAT/RLE/PACK outer
        raise ValueError("not a plain stripe stream")
    p = 1
    ulen, p = u7_get(raw, p)
    N = raw[p]
    p += 1
    lens = []
    for _ in range(N):
        v, p = u7_get(raw, p)
        lens.append(v)
    subs = []
    for j in range(N):
        body = bytes(raw[p:p + lens[j]])
        p += lens[j]
        want = (ulen - j + N - 1) // N
        if not body or body[0] & ~0x15 or not (body[0] & 0x04):
            raise ValueError("stripe sub-stream not device-decodable")
        hdr = bytearray([body[0] & 0x05])     # drop NOSZ, keep O1|X32
        u7_put(hdr, want)
        subs.append((bytes(hdr) + body[1:], bool(body[0] & 0x01)))
    return subs


def _pack_rewrap(raw: bytes):
    """Split a PACK-transformed Nx16 stream (flags & 0x80) into its
    pack map and a synthetic PLAIN stream for the core coder (the wire
    after the pack meta is exactly a plain stream body: freq table +
    states + payload), so the device kernels decode the packed bytes
    and the histogram is remapped on the host.  Returns
    (syms, width_bits, ulen, plen, core_stream)."""
    from htslib_tpu.codecs.rans4x16 import u7_get, u7_put
    flags = raw[0]
    if flags & 0x78:        # STRIPE/NOSZ/CAT/RLE not handled here
        raise ValueError("unsupported pack combination")
    p = 1
    ulen, p = u7_get(raw, p)
    P = raw[p]
    p += 1
    syms = bytes(raw[p:p + P])
    p += P
    plen, p = u7_get(raw, p)
    if P <= 1:
        raise ValueError("constant pack: no core stream")
    if P <= 2:
        w = 1
    elif P <= 4:
        w = 2
    elif P <= 16:
        w = 4
    else:
        raise ValueError("pack width > 4 bits")
    core = bytearray([flags & 0x05])
    u7_put(core, plen)
    core += raw[p:]
    return syms, w, ulen, plen, bytes(core)


def _pack_hist_remap(core_hist: np.ndarray, syms: bytes, w: int,
                     ulen: int, plen: int, qbins: int) -> np.ndarray:
    """Histogram of packed core bytes [256] -> histogram of unpacked
    symbols [qbins] (pad slots decode as syms[0] and are subtracted)."""
    per = 8 // w
    mask = (1 << w) - 1
    out = np.zeros(qbins, np.int64)
    for v in range(256):
        c = int(core_hist[v])
        if not c:
            continue
        for slot in range(per):
            sub = (v >> (slot * w)) & mask
            if sub < len(syms):
                out[min(syms[sub], qbins - 1)] += c
    pad = plen * per - ulen
    if pad > 0:
        out[min(syms[0], qbins - 1)] -= pad
    return out


def cram_qual_hist(path: str, interpret: bool = False,
                   stats: dict = None) -> np.ndarray:
    """Whole-file quality histogram for a CRAM: QS data-series blocks
    stream straight from the containers into the on-chip decode->reduce
    pipelines.  Device-decodable wires: rANS Nx16 32-way order-0 AND
    order-1 (CramWriter(device_profile=True) pins QS to whichever is
    smaller; foreign 3.1 files with X32 streams also qualify), their
    PACK-transformed variants (core decoded on chip, histogram remapped
    on the host), and VANILLA rANS 4x8 order-0 (the standard CRAM 3.0
    qual coding — no write profile needed).  Anything else decodes on
    the host.  Returns one [QBINS] histogram (the samtools stats QUAL
    pass)."""
    from htslib_tpu.cram import CRAM_EOF_START, CramReader
    from htslib_tpu.cram.encode import SERIES
    from htslib_tpu.cram.structs import CT_EXTERNAL, RANS, RANSPR

    qs_id = SERIES["QS"]
    dev16: List[bytes] = []
    dev16_o1: List[bytes] = []
    dev8: List[bytes] = []
    dev8_o1: List[bytes] = []
    pack16: List[tuple] = []      # (core, syms, w, ulen, plen, is_o1)
    host_hist = np.zeros(QBINS, np.int64)
    n_dev = n_host = 0
    with CramReader(path) as r:
        while True:
            c = r.io.read_container_header()
            if c is None:
                break
            if c.ref_seq_id == -1 and c.ref_seq_start == CRAM_EOF_START:
                break
            end = c.data_offset + c.length
            while r.fp.tell() < end:
                blk = r.io.read_block()
                if (blk.content_type != CT_EXTERNAL
                        or blk.content_id != qs_id):
                    continue
                raw = bytes(blk.data)
                routed = False
                if blk.method == RANSPR and len(raw) > 1:
                    f = raw[0]
                    if f == 0x04:
                        dev16.append(raw)
                        routed = True
                    elif f == 0x05:
                        try:
                            from htslib_tpu.ops.rans_o1_pallas import (
                                _parse_o1_header, o1_pads)
                            o1_pads([_parse_o1_header(raw)])
                            dev16_o1.append(raw)
                            routed = True
                        except ValueError:
                            pass
                    elif f & 0x08 and not f & 0xF0:
                        # STRIPE: sub-streams are standalone plain
                        # streams; histograms sum over sub-streams
                        try:
                            from htslib_tpu.ops.rans_o1_pallas import (
                                _parse_o1_header, o1_pads)
                            subs = _stripe_rewrap(raw)
                            for sub, is_o1 in subs:
                                if is_o1:
                                    o1_pads([_parse_o1_header(sub)])
                            for sub, is_o1 in subs:
                                (dev16_o1 if is_o1 else dev16).append(sub)
                            routed = True
                        except ValueError:
                            pass
                    elif f in (0x84, 0x85):
                        try:
                            syms, w, ulen, plen, core = _pack_rewrap(raw)
                            if f == 0x85:
                                from htslib_tpu.ops.rans_o1_pallas import (
                                    _parse_o1_header, o1_pads)
                                o1_pads([_parse_o1_header(core)])
                            pack16.append((core, syms, w, ulen, plen,
                                           f == 0x85))
                            routed = True
                        except ValueError:
                            pass
                elif (blk.method == RANS and len(raw) > 9
                        and raw[0] == 0):
                    dev8.append(raw)
                    routed = True
                elif (blk.method == RANS and len(raw) > 9
                        and raw[0] == 1):
                    try:
                        from htslib_tpu.ops.rans_o1_pallas import A2_MAX
                        out_sz, F, _st, _po = _parse_4x8_o1(raw)
                        nrows = int((F > 0).sum())
                        a2 = 8
                        while a2 < nrows:
                            a2 <<= 1
                        if a2 > A2_MAX:
                            raise ValueError("too dense")
                        dev8_o1.append(raw)
                        routed = True
                    except ValueError:
                        pass
                if routed:
                    n_dev += 1
                else:
                    q = np.minimum(
                        np.frombuffer(blk.uncompress(), np.uint8),
                        QBINS - 1)
                    host_hist += np.bincount(q, minlength=QBINS)[:QBINS]
                    n_host += 1
    if dev16:
        dh, _ = qualstats_device(dev16, interpret=interpret)
        host_hist += dh.sum(axis=0)
    if dev16_o1:
        dh, _ = qualstats_device_o1(dev16_o1, interpret=interpret)
        host_hist += dh.sum(axis=0)
    if dev8:
        dh, _ = qualstats_device_4x8(dev8, interpret=interpret)
        host_hist += dh.sum(axis=0)
    if dev8_o1:
        dh, _ = qualstats_device_4x8(dev8_o1, interpret=interpret,
                                     o1=True)
        host_hist += dh.sum(axis=0)
    if pack16:
        o0_cores = [p for p in pack16 if not p[5]]
        o1_cores = [p for p in pack16 if p[5]]
        for cores, runner in ((o0_cores, qualstats_device),
                              (o1_cores, qualstats_device_o1)):
            if not cores:
                continue
            ch, _ = runner([p[0] for p in cores], interpret=interpret,
                           qbins=256)
            for (core, syms, w, ulen, plen, _o1), h in zip(cores, ch):
                host_hist += _pack_hist_remap(h, syms, w, ulen, plen,
                                              QBINS)
    if stats is not None:
        stats["device_blocks"] = n_dev
        stats["host_blocks"] = n_host
    return host_hist


def qualstats_host(datas: List[bytes]) -> np.ndarray:
    """Reference histograms (numpy) with the same QBINS clipping."""
    out = []
    for d in datas:
        a = np.minimum(np.frombuffer(d, np.uint8), QBINS - 1)
        out.append(np.bincount(a, minlength=QBINS)[:QBINS])
    return np.stack(out).astype(np.int64)
