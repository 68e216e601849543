"""Batched banded glocal-HMM alignment on device (reference probaln.c:77
probaln_glocal) — the BAQ hot kernel reformulated TPU-first.

The reference runs one read at a time with three nested scalar loops.
Here a whole batch of reads runs at once: the query axis is a lax.scan
(the true sequential dependency), the band axis (~2*bw+1 cells) and the
batch axis are vectorized.  The only intra-row serial dependency — the
deletion-state chain f_D[k] = m2*f_M[k-1] + m8*f_D[k-1] — is a
first-order linear recurrence handled by a short scan along the band
with the batch axis vectorized.

Outputs mirror probaln_glocal(want_map=True): per-read phred score Pr,
per-base MAP states ((k-1)<<2 | state) and BAQ qualities.  The reference
computes in C doubles; run under float64 (CPU x64) the results are
bit-compatible, under float32 (TPU) they agree to +/-1 phred in the
tails.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

EI = 0.25
EM = 0.33333333333


def _shift_right(a):
    """a[..., j-1] with 0 fill (band axis last)."""
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(1, 0)])[..., :-1]


def _shift_left(a):
    """a[..., j+1] with 0 fill."""
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 1)])[..., 1:]


def _sel_shift(a, sh):
    """a[..., j-1+sh] for per-read sh in {0,1}: sh==1 -> a, else a>>1."""
    return jnp.where(sh[:, None] == 1, a, _shift_right(a))


def _sel_shift_l(a, sh):
    """a[..., j+sh]: sh==0 -> a, sh==1 -> a<<1."""
    return jnp.where(sh[:, None] == 1, _shift_left(a), a)


@partial(jax.jit, static_argnames=("J",))
def probaln_batch(ref, rlen, query, qlen, qprob, bw, J: int,
                  d=0.001, e=0.1):
    """Forward/backward/MAP over a padded batch.

    ref:   [B, R] uint8 translated bases (0..3, >=4 ambiguous)
    rlen:  [B] int32 actual reference window lengths (>=1)
    query: [B, Q] uint8 translated read bases
    qlen:  [B] int32 actual read lengths (>=1)
    qprob: [B, Q] float error probabilities (10^(-q/10))
    bw:    [B] int32 per-read band width (already max'd with |lr-lq|)
    J:     static band cell count, >= 2*max(bw)+2

    Returns (Pr [B] int32, state [B, Q] int32, q [B, Q] uint8); entries
    past qlen are zero.
    """
    B, R = ref.shape
    Q = query.shape[1]
    dt = qprob.dtype
    ref = ref.astype(jnp.int32)
    query = query.astype(jnp.int32)
    lr = rlen.astype(jnp.int32)
    lq = qlen.astype(jnp.int32)
    bw = bw.astype(jnp.int32)
    jj = jnp.arange(J, dtype=jnp.int32)

    # transition matrix (probaln.c:118-131)
    lqf = lq.astype(dt)
    sM = 1.0 / (2.0 * lqf + 2.0)            # [B]
    sI = sM
    m0 = (1 - d - d) * (1 - sM)
    m1 = d * (1 - sM)
    m2 = m1
    m3 = (1 - e) * (1 - sI)
    m4 = e * (1 - sI)
    m6 = jnp.full_like(sM, 1 - e)
    m8 = jnp.full_like(sM, e)
    lrf = lr.astype(dt)
    bM = (1 - d) / lrf
    bI = d / lrf

    def row_geom(i):
        """x offset, active-cell mask, ref chars and e-table indices for
        band row i (set_u geometry, probaln.c:86-97)."""
        x = jnp.maximum(i - bw, 0)                       # [B]
        beg = jnp.maximum(1, i - bw)
        end = jnp.minimum(lr, i + bw)
        j_beg = beg - x + 1
        j_end = end - x + 1
        act = (jj[None, :] >= j_beg[:, None]) & (jj[None, :] <= j_end[:, None])
        k0 = x[:, None] + jj[None, :] - 2                # 0-based ref index k-1
        rc = jnp.take_along_axis(ref, jnp.clip(k0, 0, R - 1), axis=1)
        rc = jnp.where((k0 >= 0) & (k0 < lr[:, None]), rc, 4)
        return x, act, rc

    def emis(i_char, i_prob, rc):
        """E[(amb)*2 + (match)] with E = [q*EM, 1-q, 1, 1]."""
        amb = (rc > 3) | (i_char[:, None] > 3)
        match = rc == i_char[:, None]
        return jnp.where(amb, jnp.asarray(1.0, dt),
                         jnp.where(match, 1.0 - i_prob[:, None],
                                   i_prob[:, None] * EM))

    # ---- forward row 1 (probaln.c:141-150) ----
    x1, act1, rc1 = row_geom(jnp.int32(1))
    e1 = emis(query[:, 0], qprob[:, 0], rc1)
    fM = jnp.where(act1, e1 * bM[:, None], 0.0).astype(dt)
    fI = jnp.where(act1, (EI * bI)[:, None], 0.0).astype(dt)
    fD = jnp.zeros((B, J), dt)
    s1 = (fM + fI).sum(axis=1)

    def d_chain(fM_row, act, m2v, m8v):
        """f_D[j] = m2*f_M[j-1] + m8*f_D[j-1] along the band."""
        fM_shift = _shift_right(fM_row)

        def step(Dprev, inp):
            fm1, a = inp
            Dj = (m2v * fm1 + m8v * Dprev) * a
            return Dj, Dj
        _, Ds = jax.lax.scan(
            step, jnp.zeros((B,), dt),
            (fM_shift.T, act.T.astype(dt)))
        return Ds.T

    def fwd_step(carry, i):
        fM_p, fI_p, fD_p, s_p = carry
        x, act, rc = row_geom(i)
        x_prev = jnp.maximum(i - 1 - bw, 0)
        sh = x - x_prev                                   # {0,1} [B]
        qc = jnp.take_along_axis(query, jnp.full((B, 1), i - 1), 1)[:, 0]
        qp = jnp.take_along_axis(qprob, jnp.full((B, 1), i - 1), 1)[:, 0]
        ev = emis(qc, qp, rc)
        Minv = 1.0 / s_p
        v11M = _sel_shift(fM_p, sh)
        v11I = _sel_shift(fI_p, sh)
        v11D = _sel_shift(fD_p, sh)
        v10M = _sel_shift_l(fM_p, sh)
        v10I = _sel_shift_l(fI_p, sh)
        fM_n = ev * (m0[:, None] * Minv[:, None] * v11M
                     + m3[:, None] * Minv[:, None] * v11I
                     + m6[:, None] * Minv[:, None] * v11D)
        fI_n = EI * (m1[:, None] * Minv[:, None] * v10M
                     + m4[:, None] * Minv[:, None] * v10I)
        fM_n = jnp.where(act, fM_n, 0.0)
        fI_n = jnp.where(act, fI_n, 0.0)
        fD_n = d_chain(fM_n, act, m2, m8)
        s_n = (fM_n + fI_n + fD_n).sum(axis=1)
        live = (i <= lq)
        fM_o = jnp.where(live[:, None], fM_n, fM_p)
        fI_o = jnp.where(live[:, None], fI_n, fI_p)
        fD_o = jnp.where(live[:, None], fD_n, fD_p)
        s_o = jnp.where(live, s_n, 1.0)
        return (fM_o, fI_o, fD_o, jnp.where(live, s_n, s_p)), \
            (fM_o, fI_o, fD_o, s_o)

    if Q >= 2:
        (_, _, _, s_last), (fMs, fIs, fDs, ss) = jax.lax.scan(
            fwd_step, (fM, fI, fD, s1), jnp.arange(2, Q + 1))
        fMs = jnp.concatenate([fM[None], fMs], 0)        # rows 1..Q
        fIs = jnp.concatenate([fI[None], fIs], 0)
        fDs = jnp.concatenate([fD[None], fDs], 0)
        ss = jnp.concatenate([s1[None], ss], 0)          # s[1..Q]
    else:
        fMs, fIs, fDs, ss = fM[None], fI[None], fD[None], s1[None]
        s_last = s1

    # s[lq] per read; the frozen carry rows ARE row lq for each read
    s_lq = jnp.take_along_axis(ss, (lq - 1)[None, :], axis=0)[0]
    idxJ = jnp.broadcast_to((lq - 1)[None, :, None], (1, B, J))
    fM_lq = jnp.take_along_axis(fMs, idxJ, axis=0)[0]
    fI_lq = jnp.take_along_axis(fIs, idxJ, axis=0)[0]
    # s[lq+1] (probaln.c:171-177)
    s_end = ((fM_lq * sM[:, None] + fI_lq * sI[:, None]).sum(axis=1)
             / s_lq)

    # likelihood Pr (probaln.c:179-186): -4.343*sum(log s) over s[0..lq+1]
    live_rows = (jnp.arange(1, Q + 1)[:, None] <= lq[None, :])
    log_s = jnp.where(live_rows, jnp.log(jnp.maximum(ss, 1e-300)), 0.0)
    Pr1 = -4.343 * (log_s.sum(axis=0) + jnp.log(s_end)
                    + jnp.log(lrf * lqf))
    Pr = (Pr1 + 0.499).astype(jnp.int32)

    # ---- backward + MAP (probaln.c:192-261) ----
    init_scale = sM / (s_lq * s_end)                     # [B]
    initI_scale = sI / (s_lq * s_end)

    def bwd_step(carry, i):
        bM_n, bI_n, bD_n = carry                         # row i+1 (scaled)
        x, act, _rc = row_geom(i)
        # init at i == lq: b[lq] over all active cells
        bM_init = jnp.where(act, init_scale[:, None], 0.0).astype(dt)
        bI_init = jnp.where(act, initI_scale[:, None], 0.0).astype(dt)
        # transition from row i+1 (uses emission of row i+1 at k+1)
        x_next = jnp.maximum(i + 1 - bw, 0)
        sh = x_next - x
        qc = jnp.take_along_axis(query, jnp.full((B, 1),
                                                 jnp.minimum(i, Q - 1)), 1)[:, 0]
        qp = jnp.take_along_axis(qprob, jnp.full((B, 1),
                                                 jnp.minimum(i, Q - 1)), 1)[:, 0]
        k = x[:, None] + jj[None, :] - 1                 # 0-based index of ref[k]
        rc_next = jnp.take_along_axis(ref, jnp.clip(k, 0, R - 1), axis=1)
        valid_k = (k >= 0) & (k < lr[:, None])
        ev = emis(qc, qp, jnp.where(valid_k, rc_next, 4))
        ev = jnp.where(valid_k, ev, 0.0)
        # j' for (i+1, k+1) is j + 1 - sh; for (i+1, k) it's j - sh
        bM_v11 = jnp.where(sh[:, None] == 1, bM_n, _shift_left(bM_n))
        bI_v10 = jnp.where(sh[:, None] == 1, _shift_right(bI_n), bI_n)
        ee = ev * bM_v11
        y = (i > 1).astype(dt)

        # reverse D chain: b_D[j] = (e[j]*m6 + m8*b_D[j+1]) * y
        def dstep(Dnext, inp):
            e_j, a = inp
            Dj = (e_j * m6 + m8 * Dnext) * y * a
            return Dj, Dj
        _, Ds = jax.lax.scan(dstep, jnp.zeros((B,), dt),
                             ((ee * 1.0).T[::-1], act.T.astype(dt)[::-1]))
        bD_t = Ds[::-1].T
        bD_right = _shift_left(bD_t)                     # b_D(i, k+1)
        bM_t = ee * m0[:, None] + EI * m1[:, None] * bI_v10 \
            + m2[:, None] * bD_right
        bI_t = ee * m3[:, None] + EI * m4[:, None] * bI_v10
        bM_t = jnp.where(act, bM_t, 0.0)
        bI_t = jnp.where(act, bI_t, 0.0)
        # scale rows 1..lq-1 by 1/s[i] (probaln.c:220-224)
        s_i = jax.lax.dynamic_index_in_dim(ss, i - 1, 0, keepdims=False)
        yscale = 1.0 / s_i
        bM_t = bM_t * yscale[:, None]
        bI_t = bI_t * yscale[:, None]
        bD_t = bD_t * yscale[:, None]

        at_init = (i == lq)
        in_body = (i < lq)
        bM_row = jnp.where(at_init[:, None], bM_init,
                           jnp.where(in_body[:, None], bM_t, 0.0))
        bI_row = jnp.where(at_init[:, None], bI_init,
                           jnp.where(in_body[:, None], bI_t, 0.0))
        bD_row = jnp.where(in_body[:, None], bD_t, 0.0)

        # MAP for row i (probaln.c:230-261)
        fM_i = jax.lax.dynamic_index_in_dim(fMs, i - 1, 0, keepdims=False)
        fI_i = jax.lax.dynamic_index_in_dim(fIs, i - 1, 0, keepdims=False)
        Minv = 1.0 / s_i
        zM = Minv[:, None] * fM_i * bM_row
        zI = Minv[:, None] * fI_i * bI_row
        z2 = jnp.stack([zM, zI], axis=2).reshape(B, J * 2)
        ssum = z2.sum(axis=1)
        arg = jnp.argmax(z2, axis=1)
        mx = jnp.take_along_axis(z2, arg[:, None], 1)[:, 0]
        j_of = (arg // 2).astype(jnp.int32)
        st_bit = (arg % 2).astype(jnp.int32)
        k_of = x + j_of - 1                                 # 1-based k
        state = ((k_of - 1) << 2 | st_bit).astype(jnp.int32)
        # 1 - mx/ssum catastrophically cancels in f32 for confident
        # bases; sum the non-max mass directly instead (same value as
        # the reference's log(1-mx) in exact arithmetic, probaln.c:258)
        rest = jnp.where(
            jnp.arange(J * 2)[None, :] == arg[:, None], 0.0, z2).sum(axis=1)
        frac = rest / jnp.maximum(ssum, 1e-300)
        kk = (-4.343 * jnp.log(jnp.maximum(frac, 1e-30))
              + 0.499).astype(jnp.int32)
        qv = jnp.where(kk > 100, 99, kk).astype(jnp.int32)
        live = (i <= lq) & (i >= 1)
        state = jnp.where(live, state, 0)
        qv = jnp.where(live, qv, 0)
        return (bM_row, bI_row, bD_row), (state, qv)

    zero = jnp.zeros((B, J), dt)
    _, (states, qs) = jax.lax.scan(bwd_step, (zero, zero, zero),
                                   jnp.arange(Q, 0, -1))
    states = states[::-1].transpose(1, 0)                # [B, Q]
    qs = qs[::-1].transpose(1, 0).astype(jnp.uint8)
    return Pr, states, qs


_NT16_INT = np.full(16, 4, np.uint8)
_NT16_INT[[1, 2, 4, 8]] = [0, 1, 2, 3]
_QUAL2PROB = np.power(10.0, -np.arange(256) / 10.0)


def probaln_batch_host(refs, queries, iquals, bw_param=10, d=0.001, e=0.1,
                       dtype=np.float64, bws=None):
    """Host convenience wrapper: pads a list of (ref, query, qual) byte
    triples (already translated to 0..4 codes) and runs the device batch.
    `bws` optionally gives the per-read c.bw parameter (sam_prob_realn
    computes its own); otherwise bw_param is used for every read.
    Returns lists of (Pr, state, q) matching probaln_glocal outputs."""
    B = len(refs)
    R = max(len(r) for r in refs)
    Q = max(len(q) for q in queries)
    ref = np.full((B, R), 4, np.uint8)
    qry = np.full((B, Q), 4, np.uint8)
    qpr = np.full((B, Q), _QUAL2PROB[30], dtype)
    rlen = np.zeros(B, np.int32)
    qlen = np.zeros(B, np.int32)
    bw = np.zeros(B, np.int32)
    for i, (r, q, iq) in enumerate(zip(refs, queries, iquals)):
        ref[i, :len(r)] = np.frombuffer(r, np.uint8)
        qry[i, :len(q)] = np.frombuffer(q, np.uint8)
        rlen[i], qlen[i] = len(r), len(q)
        if iq is not None:
            qpr[i, :len(q)] = _QUAL2PROB[np.frombuffer(iq, np.uint8)]
        cap = bws[i] if bws is not None else bw_param
        b = min(max(len(r), len(q)), cap)
        b = max(b, abs(len(r) - len(q)))
        bw[i] = b
    J = int(2 * bw.max() + 2)
    Pr, st, qq = probaln_batch(jnp.asarray(ref), jnp.asarray(rlen),
                               jnp.asarray(qry), jnp.asarray(qlen),
                               jnp.asarray(qpr.astype(dtype)),
                               jnp.asarray(bw), J, d=d, e=e)
    Pr = np.asarray(Pr)
    st = np.asarray(st)
    qq = np.asarray(qq)
    out = []
    for i in range(B):
        n = int(qlen[i])
        out.append((int(Pr[i]), list(st[i, :n]), bytes(qq[i, :n])))
    return out
