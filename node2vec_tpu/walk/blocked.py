"""Blocked-CSR walk engine: the TPU-native heavy-tail fast path (v2).

The dense engine (walk/dense.py) is one row-gather per walker-step but pads
every vertex to the graph's max degree — unusable for heavy-tail graphs
(max_deg 10k ⇒ 128KB rows).  Profiling on the real chip
(experiments/gather_bench.py, experiments/heavytail_bench.py) fixed the cost
model this engine is built around:

  * a gather OP over 131k walker lanes costs ~3-4ms wall regardless of row
    width up to ~1KB (≈22ns/row issue overhead), and goes bandwidth-bound at
    ~50GB/s beyond — so the design currency is (gather ops) × (iterations),
    and every byte in a fetched row must earn its place;
  * dependent gathers pipeline as well as independent ones;
  * synchronous rejection loops pay max-over-lanes trials; asynchronous
    per-walker step counters pay the mean.

Design:

1. **Two-table adjacency.**  Light vertices (deg <= P) are one `[4P]` row:
   sorted ids | weights | rev± | pfx (see 3).  Heavy vertices reuse the same
   row as a header (block pointer, degree, total weight, per-block min ids,
   per-block cumulative-mass CDF) and store neighbors in fixed `[2C]`
   (ids|weights) blocks; a third table holds per-edge (rev±, pfx) pairs
   packed 64-per-row so the chosen edge's pair is one 512B fetch.
2. **Exact hierarchical inverse-CDF proposals** — no alias tables, no
   rejection for the ∝weight draw: the meta CDF picks the block, the SAME
   uniform's residual picks the slot.
3. **Per-edge reverse metadata** rides along with every sampled edge:
   `rev_w` (weight of the reverse edge → next step's 1/p back-mass),
   `pfx` (CDF prefix of the reverse vertex in the new row → next step
   excludes the return edge from proposals EXACTLY, in registers), and a
   `has_shared` triangle bit in the rev sign.  Prev-exclusion kills the
   round-1 pathology where a degree-1 walker spun rejecting its only
   neighbor, and the triangle bit drops the rejection bound to 1/q — i.e.
   acceptance 1 — whenever the arrival edge closes no triangle.
4. **Asynchronous step advancement** with per-walker trial caps; capped
   lanes take a plain ∝weight draw and are COUNTED (`fallback_count`).
5. **Counter-based per-walker RNG** (ops/hashrng.py): walks are bit-invariant
   to chunking and sharding layout.
6. **Shared-list 3-atom sampler (v3, round 3)**: the builder enumerates each
   edge's shared neighbors (up to SL_K=8 (slot, weight) entries per edge,
   one parallel C++ merge pass, 64B/edge in the `slq` table).  At q != 1 a
   lane whose arrival edge has a complete list samples an EXACT mixture of
   back-atom (w_back/p), shared-atom (Σ w_shared, picked by inverse-CDF over
   the stored entries — bias-1 candidates never reject), and ∝w-atom
   ((wtot−w_back)/q) whose only rejection is a proposal landing on a stored
   slot: per-attempt rejection drops from (1−1/q)(1−s)-shaped to w_S/(q·M)
   (measured 2.33 → 1.03 attempts/step at q=4 on an ER graph).  Edges with
   more than SL_K shared neighbors overflow and keep the rejection-bound
   path per-lane; both paths are exact (chi-square-tested, including an
   overflow hub-hub edge).  The arrival edge's global CSR id rides in the
   walker state (light rows reserve an ebase lane — default P=31 keeps the
   row in one 128-lane tile; a return hop reuses the stored reverse-edge
   id), so the slq fetch is one extra row gather per accepted step.

Sampling semantics match the reference per-step alias tables
(``/root/reference/node2vec/randomwalk.py:218-231``): step 0 first-order
(``randomwalk.py:320-321``), back/shared/other bias classes {1/p, 1, 1/q},
sink death; validated by chi-square transition tests with heavy vertices in
every role (tests/test_blocked.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from node2vec_tpu.ops.hashrng import hash_uniform
from node2vec_tpu.ops.sampling import prefix_sums

PAD_ID = np.int32(np.iinfo(np.int32).max)  # sorts above any real id
SIGN = np.int32(np.uint32(0x80000000))  # has_shared flag bit in rev_enc
MAG = np.int32(0x7FFFFFFF)
QUADS_PER_ROW = 64  # (rev, pfx) pairs per 128-lane BRP row

# shared-list (slq) table layout: per edge 16 int32 lanes, 8 edges per
# 128-lane row (must match native/graph_core.cpp n2v_edge_shared_list):
#   [0:4]   up to K=8 shared-neighbor positions within the sorted destination
#           row, packed 2 x uint16 per lane (0xFFFF pad)
#   [4:12]  f32 weight bits of those entries (0.0 pad)
#   [12]    global CSR index of the reverse edge (-1 absent)
#   [13]    flags: bit0 = overflow (more than K shared entries — lane falls
#           back to the rejection-bound sampler)
SL_K = 8
SL_LANES = 16
SL_EDGES_PER_ROW = 8
SL_PAD_SLOT = 0xFFFF


def _max_blocks(light_width: int) -> int:
    """Heavy-header capacity: 5 scalars + mins[MAXB] + cum[MAXB] in 4P lanes."""
    return (4 * light_width - 5) // 2


def _light_row_width(light_width: int, ebase: bool = False) -> int:
    """Physical light-row lanes: 4P data lanes (+ 1 ebase lane when the
    shared-list sampler needs it), rounded up to the 128-lane tile.  The
    default P=31 makes 4P+1 exactly 128 — the ebase lane rides in what would
    otherwise be physical tile padding — but explicit P with 4P % 128 == 0
    (e.g. P=32) must NOT pay a whole extra tile for a lane only the
    shared-list kernel reads (round-3 advisor finding)."""
    return -(-(4 * light_width + (1 if ebase else 0)) // 128) * 128


class BlockedGraph(NamedTuple):
    """Device arrays for the blocked engine (see build_blocked_graph)."""

    light: jnp.ndarray  # [V, RW] int32 light rows / heavy headers (+ ebase)
    biw: jnp.ndarray  # [NB, 2C] int32 heavy blocks: ids | w bits
    bids: jnp.ndarray  # [NB, C] int32 heavy block ids (membership fetches)
    brp: jnp.ndarray  # [NB*C/64, 128] int32 per-slot (rev_enc, pfx) pairs
    light_width: int  # P
    block_width: int  # C
    has_heavy: bool
    # per-edge shared-neighbor lists for the exact 3-atom mixture
    # ([ceil(E/8), 128] int32, SL_* layout), or None when unavailable
    slq: jnp.ndarray | None = None
    # weight fraction of overflow edges (> SL_K shared entries) — the
    # traversal-mass proxy the engine's auto policy uses: high ω means most
    # steps fall back anyway and the extra slq gather is a net loss
    sl_ovf_wfrac: float = 1.0

    @property
    def n_vertices(self) -> int:
        return self.light.shape[0]

    @property
    def shared_lists(self) -> bool:
        return self.slq is not None

    @property
    def sl_exhaustive(self) -> bool:
        """True when NO edge overflowed: every q != 1 lane runs the 3-atom
        sampler, so the kernel can skip the membership gather entirely."""
        return self.slq is not None and self.sl_ovf_wfrac == 0.0


def _edge_has_shared(
    indptr: np.ndarray, indices: np.ndarray, deg: np.ndarray
) -> np.ndarray:
    """Per-edge triangle bit; conservative all-ones when too big for the
    fallback and the native core is unavailable (correct, just slower)."""
    from node2vec_tpu import native

    if native.available():
        return native.edge_has_shared(indptr, indices).astype(bool)
    n_e = len(indices)
    src_rep = np.repeat(np.arange(len(deg)), deg)
    merge_cost = np.minimum(deg[src_rep], deg[indices]).sum()
    if merge_cost > 5e7:
        return np.ones(n_e, dtype=bool)
    rows = [
        set(indices[indptr[v] : indptr[v + 1]].tolist())
        for v in range(len(deg))
    ]
    out = np.zeros(n_e, dtype=bool)
    for e in range(n_e):
        out[e] = bool(rows[src_rep[e]] & rows[indices[e]])
    return out


def _edge_metadata(
    indptr: np.ndarray, indices: np.ndarray, weights: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-edge reverse metadata over the FULL graph: (rev_enc, pfx).

    rev_enc[e] = f32 bits of w(dst->src) (0 if absent) with the has_shared
    triangle bit in the sign; pfx[e] = weight-CDF prefix of src within
    N(dst).  Must be computed globally even for a partitioned build — the
    reverse edge of a shard's edge may live on another shard.
    """
    from node2vec_tpu import native

    if native.available():
        # parallel C++ single pass (the numpy chain below is the fallback)
        return native.edge_metadata(indptr, indices, weights)
    n_v = len(indptr) - 1
    n_e = len(indices)
    deg = np.diff(indptr)
    src_rep = np.repeat(np.arange(n_v, dtype=np.int64), deg)
    keys = src_rep * n_v + indices
    rkeys = indices.astype(np.int64) * n_v + src_rep
    pos = np.searchsorted(keys, rkeys)
    pos_c = np.minimum(pos, max(n_e - 1, 0))
    found = (pos < n_e) & (keys[pos_c] == rkeys) if n_e else np.zeros(0, bool)
    rev_w = np.where(found, weights[pos_c], np.float32(0.0)).astype(np.float32)
    cw = np.concatenate([[0.0], np.cumsum(weights, dtype=np.float64)])
    pfx = np.where(
        found, (cw[pos_c] - cw[indptr[indices]]).astype(np.float32), 0.0
    ).astype(np.float32)
    shared = _edge_has_shared(indptr, indices, deg)
    rev_enc = np.where(
        shared, rev_w.view(np.int32) | SIGN, rev_w.view(np.int32)
    ).astype(np.int32)
    return rev_enc, pfx.astype(np.float32)


def _concat_rows(
    indptr_local: np.ndarray, indices: np.ndarray, u_local: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(lens, elems): concatenated CSR rows of ``u_local`` (local vertex
    indices) — vectorized variable-length gather, no per-row python loop."""
    lens = (indptr_local[u_local + 1] - indptr_local[u_local]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return lens, np.zeros(0, np.int64)
    starts = indptr_local[u_local].astype(np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])
    idx = (
        np.repeat(starts, lens)
        + np.arange(total, dtype=np.int64)
        - np.repeat(off[:-1], lens)
    )
    return lens, indices[idx].astype(np.int64)


def _membership_encode(
    qu: np.ndarray,
    qv: np.ndarray,
    indptr_local: np.ndarray,
    indices_local: np.ndarray,
    lo: int,
) -> np.ndarray:
    """Encode membership queries for one peer as a flat int64 payload:
    ``[n_q, n_rows, n_elems | (u, v) pairs | (u, deg_u) pairs | N(u) ids]``.
    Each distinct querying vertex ships its (local, complete) row ONCE per
    peer; the per-peer traffic is sum(min-side degrees) + query pairs."""
    uu = np.unique(qu)
    lens, elems = _concat_rows(
        indptr_local, indices_local, (uu - lo).astype(np.int64)
    )
    parts = [np.array([len(qu), len(uu), len(elems)], np.int64)]
    if len(qu):
        parts.append(np.stack([qu, qv], axis=1).reshape(-1))
        parts.append(np.stack([uu, lens], axis=1).reshape(-1))
        parts.append(elems)
    return np.concatenate(parts).reshape(-1, 1)


def _membership_answer(
    flat: np.ndarray, keys_local: np.ndarray, n_vertices: int
) -> np.ndarray:
    """Answer one peer's membership payload against this range's sorted edge
    keys (``src * n_vertices + dst``): returns int64 [n_q, 3] rows
    ``(u, v, bit)`` where bit = 1 iff any shipped ``w ∈ N(u)`` satisfies
    ``(v -> w)`` locally — i.e. ``N(u) ∩ N(v) != ∅``, the exact reference
    triangle test (randomwalk.py:226 semantics over full rows)."""
    flat = np.asarray(flat, np.int64).reshape(-1)
    n_q, n_rows, n_el = int(flat[0]), int(flat[1]), int(flat[2])
    if n_q == 0:
        return np.zeros((0, 3), np.int64)
    qs = flat[3 : 3 + 2 * n_q].reshape(n_q, 2)
    rows = flat[3 + 2 * n_q : 3 + 2 * n_q + 2 * n_rows].reshape(n_rows, 2)
    elems = flat[3 + 2 * n_q + 2 * n_rows :]
    ru, rl = rows[:, 0], rows[:, 1]
    roff = np.concatenate([[0], np.cumsum(rl)])
    qi = np.searchsorted(ru, qs[:, 0])  # exact: sender ships every queried u
    rep = rl[qi]
    tot = int(rep.sum())
    qoff = np.concatenate([[0], np.cumsum(rep)])
    bits = np.zeros(n_q, np.int64)
    if tot and len(keys_local):
        pos = (
            np.repeat(roff[qi], rep)
            + np.arange(tot, dtype=np.int64)
            - np.repeat(qoff[:-1], rep)
        )
        w_el = elems[pos]
        v_rep = np.repeat(qs[:, 1], rep)
        tkeys = v_rep * n_vertices + w_el
        p = np.searchsorted(keys_local, tkeys)
        p_c = np.minimum(p, len(keys_local) - 1)
        hit = ((p < len(keys_local)) & (keys_local[p_c] == tkeys)).astype(
            np.int64
        )
        nz = rep > 0
        if nz.any():
            bits[nz] = np.maximum.reduceat(hit, qoff[:-1][nz])
    return np.stack([qs[:, 0], qs[:, 1], bits], axis=1)


def _propagate_dup_bits(keys: np.ndarray, upd: np.ndarray) -> np.ndarray:
    """OR each bit across runs of equal (sorted) keys — parallel edges of a
    directed multigraph share one (src, dst) key but searchsorted lands on
    the first copy only."""
    if len(keys) < 2:
        return upd
    dup = keys[1:] == keys[:-1]
    if not dup.any():
        return upd
    gid = np.cumsum(np.concatenate([[True], ~dup])) - 1
    gmax = np.zeros(int(gid[-1]) + 1, bool)
    np.logical_or.at(gmax, gid, upd)
    return gmax[gid]


def _edge_metadata_ranged(
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    n_ranges: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-edge (rev_enc, pfx) via RANGE-EXCHANGE passes — the multi-host
    metadata algorithm (ROADMAP item 5: distributed ``_edge_metadata``).

    The global pass needs the whole CSR resident to find each edge's reverse.
    This variant only ever holds one vertex-range's rows at a time plus the
    record traffic between two ranges — exactly the shape of a multi-host
    all-to-all over DCN:

    * producer pass: the owner of vertex ``v`` derives, for each of ITS edges
      ``(v -> u)``, the reverse metadata OF the mirrored edge ``(u -> v)``
      — ``rev_w = w(v->u)``, ``pfx`` = weight-CDF prefix of ``u`` within
      ``N(v)``, and ``deg(v)`` — from purely local rows, and emits a record
      keyed by ``owner(u)``;
    * consumer pass: the owner of ``u`` binary-searches each incoming
      ``(u, v)`` record into its sorted rows and writes the fields;
    * membership pass (round-4 VERDICT item 5 — previously conservative
      all-ones): for each edge ``(u -> v)`` whose endpoint degrees put it on
      the MIN side ((deg(u), u) < (deg(v), v); always when the reverse edge
      is absent), the owner of ``u`` ships ``N(u)`` once per peer plus the
      query pairs to ``owner(v)``, which tests ``N(u) ∩ N(v)`` against its
      sorted keys — total traffic sum(min(deg(u), deg(v))) like the
      single-host merge — and the answered bit is MIRRORED to the reverse
      edge in one more record round.  Triangle bits are therefore EXACT:
      graph-sharded biased walks pay 1/q (not max(1, 1/q)) on non-triangle
      arrivals, matching the monolithic engine's attempts/step.
    """
    n_v = len(indptr) - 1
    n_e = len(indices)
    rev_w = np.zeros(n_e, np.float32)
    pfx = np.zeros(n_e, np.float32)
    if n_e == 0 or n_v == 0:
        return rev_w.view(np.int32), pfx
    v_p = -(-n_v // n_ranges)
    big = np.int64(np.iinfo(np.int64).max)
    deg_dst = np.full(n_e, big, np.int64)  # deg(v) of edge (u->v); big = no rev
    has_bit = np.zeros(n_e, bool)

    def bounds_of(r):
        lo, hi = r * v_p, min((r + 1) * v_p, n_v)
        return lo, hi, int(indptr[lo]), int(indptr[hi])

    def local_keys(r):
        lo, hi, e_lo, e_hi = bounds_of(r)
        deg = np.diff(indptr[lo : hi + 1])
        src_rep = np.repeat(np.arange(lo, hi, dtype=np.int64), deg)
        return src_rep * n_v + indices[e_lo:e_hi]  # sorted (CSR row order)

    # producer pass: per range, records (u, v, rev_w, pfx, deg_v) -> owner(u)
    rec = [[] for _ in range(n_ranges)]
    for r in range(n_ranges):
        lo, hi, e_lo, e_hi = bounds_of(r)
        if e_hi == e_lo:
            continue
        deg = np.diff(indptr[lo : hi + 1])
        v_ids = np.repeat(np.arange(lo, hi, dtype=np.int64), deg)
        deg_v = np.repeat(deg.astype(np.int64), deg)
        u_ids = indices[e_lo:e_hi].astype(np.int64)
        w_loc = weights[e_lo:e_hi]
        cw = np.concatenate([[0.0], np.cumsum(w_loc, dtype=np.float64)])
        row_base = cw[np.repeat(indptr[lo:hi] - e_lo, deg)]
        pfx_loc = (cw[:-1] - row_base).astype(np.float32)
        payload = np.stack(
            [
                u_ids,
                v_ids,
                w_loc.view(np.int32).astype(np.int64),
                pfx_loc.view(np.int32).astype(np.int64),
                deg_v,
            ],
            axis=1,
        )
        owner = np.minimum(u_ids // v_p, n_ranges - 1)
        order = np.argsort(owner, kind="stable")
        bnd = np.searchsorted(owner[order], np.arange(n_ranges + 1))
        for t in range(n_ranges):
            if bnd[t + 1] > bnd[t]:
                rec[t].append(payload[order[bnd[t] : bnd[t + 1]]])

    # consumer pass: owner of u matches records to its sorted (u, v) edges
    for r in range(n_ranges):
        if not rec[r]:
            continue
        rr = np.concatenate(rec[r])
        lo, hi, e_lo, e_hi = bounds_of(r)
        keys = local_keys(r)
        rkeys = rr[:, 0] * n_v + rr[:, 1]
        pos = np.searchsorted(keys, rkeys)
        pos_c = np.minimum(pos, max(e_hi - e_lo - 1, 0))
        found = (pos < e_hi - e_lo) & (keys[pos_c] == rkeys)
        rev_w[e_lo + pos_c[found]] = (
            rr[found, 2].astype(np.int32).view(np.float32)
        )
        pfx[e_lo + pos_c[found]] = (
            rr[found, 3].astype(np.int32).view(np.float32)
        )
        deg_dst[e_lo + pos_c[found]] = rr[found, 4]

    # membership pass: min-side owners query owner(v) with N(u) shipped once
    # per peer; queries[r][t] = encoded payload from range r to range t
    queries = [[None] * n_ranges for _ in range(n_ranges)]
    for r in range(n_ranges):
        lo, hi, e_lo, e_hi = bounds_of(r)
        if e_hi == e_lo:
            continue
        deg = np.diff(indptr[lo : hi + 1]).astype(np.int64)
        u_ids = np.repeat(np.arange(lo, hi, dtype=np.int64), deg)
        v_ids = indices[e_lo:e_hi].astype(np.int64)
        d_u = np.repeat(deg, deg)
        d_v = deg_dst[e_lo:e_hi]
        selfe = u_ids == v_ids
        has_bit[e_lo:e_hi] |= selfe  # N(u) ∩ N(u) = N(u), nonempty (deg >= 1)
        min_side = (d_u < d_v) | ((d_u == d_v) & (u_ids < v_ids))
        qm = ~selfe & min_side
        q_owner = np.minimum(v_ids // v_p, n_ranges - 1)
        for t in range(n_ranges):
            sel = qm & (q_owner == t)
            queries[r][t] = _membership_encode(
                u_ids[sel], v_ids[sel],
                indptr[lo : hi + 1] - e_lo, indices[e_lo:e_hi], lo,
            )

    # answer pass + write-back + mirror records
    mirror = [[] for _ in range(n_ranges)]
    for t in range(n_ranges):
        keys_t = local_keys(t)
        for r in range(n_ranges):
            if queries[r][t] is None:
                continue
            ans = _membership_answer(queries[r][t], keys_t, n_v)
            if not len(ans):
                continue
            # write bits on the querying range's (u -> v) edges
            lo, hi, e_lo, e_hi = bounds_of(r)
            keys_r = local_keys(r)
            akeys = ans[:, 0] * n_v + ans[:, 1]
            pos = np.searchsorted(keys_r, akeys)  # exact: r owns these edges
            upd = np.zeros(e_hi - e_lo, bool)
            np.logical_or.at(upd, pos, ans[:, 2] != 0)
            has_bit[e_lo:e_hi] |= _propagate_dup_bits(keys_r, upd)
            # mirror to the reverse edge (v -> u) at owner(v)
            m_owner = np.minimum(ans[:, 1] // v_p, n_ranges - 1)
            order = np.argsort(m_owner, kind="stable")
            bnd = np.searchsorted(m_owner[order], np.arange(n_ranges + 1))
            for t2 in range(n_ranges):
                if bnd[t2 + 1] > bnd[t2]:
                    mirror[t2].append(ans[order[bnd[t2] : bnd[t2 + 1]]])

    for r in range(n_ranges):
        if not mirror[r]:
            continue
        mm = np.concatenate(mirror[r])
        lo, hi, e_lo, e_hi = bounds_of(r)
        keys = local_keys(r)
        mkeys = mm[:, 1] * n_v + mm[:, 0]  # reverse edge (v -> u)
        pos = np.searchsorted(keys, mkeys)
        pos_c = np.minimum(pos, max(e_hi - e_lo - 1, 0))
        found = (pos < e_hi - e_lo) & (keys[pos_c] == mkeys)
        upd = np.zeros(e_hi - e_lo, bool)
        np.logical_or.at(upd, pos_c[found], mm[found, 2] != 0)
        has_bit[e_lo:e_hi] |= _propagate_dup_bits(keys, upd)

    rev_bits = rev_w.view(np.int32)
    rev_enc = np.where(has_bit, rev_bits | SIGN, rev_bits).astype(np.int32)
    return rev_enc, pfx


def _pack_range(
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    rev_enc: np.ndarray,
    pfx: np.ndarray,
    lo: int,
    hi: int,
    p_l: int,
    c: int,
    ebase: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pack vertices [lo, hi) into (light, biw, bids, brp) host arrays.

    Heavy-header row layout ([4P] int32 lanes):
      [0] = -2 (heavy marker)  [1] block_start (LOCAL to this range's tables)
      [2] n_blocks  [3] wtot (f32 bits)  [4] degree
      [5 : 5+MAXB]        per-block minimum neighbor id (INT32_MAX padded)
      [5+MAXB : 5+2*MAXB] inclusive block-mass CDF (f32 bits; padded w/ wtot)

    Dispatches to the threaded C++ packer when available (the numpy chain
    below was the north-star preprocessing bottleneck: 168s at 127M edges,
    round-4 VERDICT weak item 3).  The two paths differ only in heavy-block
    CDF rounding (row-local double accumulation vs global-prefix
    difference — last-f32-ulp, both exact samplers).
    """
    from node2vec_tpu import native

    if native.available():
        deg_r = np.diff(indptr[lo : hi + 1])
        nb_r = np.where(deg_r > p_l, -(-deg_r // c), 0)
        bs_r = np.concatenate([[0], np.cumsum(nb_r)])
        return native.pack_blocked(
            indptr, indices, weights, rev_enc, pfx, lo, hi, p_l, c,
            _light_row_width(p_l, ebase), bs_r[:-1], int(bs_r[-1]),
            ebase and indptr[hi] <= np.iinfo(np.int32).max,
        )
    maxb = _max_blocks(p_l)
    n_range = hi - lo
    e_lo, e_hi = int(indptr[lo]), int(indptr[hi])
    deg = np.diff(indptr[lo : hi + 1])
    heavy = deg > p_l
    n_heavy = int(heavy.sum())
    zero_bits = np.float32(0.0).view(np.int32)

    src_rep = np.repeat(np.arange(n_range, dtype=np.int64), deg)
    col = np.arange(e_lo, e_hi, dtype=np.int64) - np.repeat(
        indptr[lo:hi], deg
    )
    r_indices = indices[e_lo:e_hi]
    r_weights = weights[e_lo:e_hi]
    r_rev = rev_enc[e_lo:e_hi]
    r_pfx = pfx[e_lo:e_hi]

    light = np.empty((n_range, _light_row_width(p_l, ebase)), dtype=np.int32)
    light[:, :p_l] = PAD_ID
    light[:, p_l:] = zero_bits
    # lane 4P (shared-list builds only): this row's global CSR edge base
    # (indptr[v]) — lets the kernel turn an accepted slot into a global edge
    # id for the slq fetch without a separate [W] gather.  Graphs beyond
    # int32 edge counts disable slq.
    if ebase and indptr[hi] <= np.iinfo(np.int32).max:
        light[:, 4 * p_l] = indptr[lo:hi].astype(np.int32)
    e_light = np.repeat(~heavy, deg)
    lr = src_rep[e_light]
    lc = col[e_light]
    light[lr, lc] = r_indices[e_light]
    light[lr, p_l + lc] = r_weights[e_light].view(np.int32)
    light[lr, 2 * p_l + lc] = r_rev[e_light]
    light[lr, 3 * p_l + lc] = r_pfx[e_light].view(np.int32)

    hv = np.flatnonzero(heavy)
    nb = -(-deg[hv] // c) if n_heavy else np.zeros(0, np.int64)
    block_start = np.concatenate([[0], np.cumsum(nb)])
    n_blocks = max(int(block_start[-1]), 1)
    biw = np.empty((n_blocks, 2 * c), dtype=np.int32)
    biw[:, :c] = PAD_ID
    biw[:, c:] = zero_bits
    bids = np.full((n_blocks, c), PAD_ID, dtype=np.int32)
    brp = np.zeros((n_blocks * c // QUADS_PER_ROW, 128), dtype=np.int32)
    if n_heavy:
        rank = np.cumsum(heavy) - 1
        e_heavy = np.repeat(heavy, deg)
        hr = block_start[rank[src_rep[e_heavy]]] + col[e_heavy] // c
        hc = col[e_heavy] % c
        biw[hr, hc] = r_indices[e_heavy]
        biw[hr, c + hc] = r_weights[e_heavy].view(np.int32)
        bids[hr, hc] = r_indices[e_heavy]
        gslot = hr * c + hc
        brp[gslot // QUADS_PER_ROW, 2 * (gslot % QUADS_PER_ROW)] = r_rev[e_heavy]
        brp[gslot // QUADS_PER_ROW, 2 * (gslot % QUADS_PER_ROW) + 1] = r_pfx[
            e_heavy
        ].view(np.int32)

        cw = np.concatenate([[0.0], np.cumsum(r_weights, dtype=np.float64)])
        starts = indptr[lo:hi][hv] - e_lo
        ends = indptr[lo + 1 : hi + 1][hv] - e_lo
        bpos = np.minimum(
            starts[:, None] + np.arange(maxb + 1, dtype=np.int64) * c,
            ends[:, None],
        )
        cum = (cw[bpos[:, 1:]] - cw[starts, None]).astype(np.float32)
        light[hv, 0] = -2
        light[hv, 1] = block_start[:-1]
        light[hv, 2] = nb
        light[hv, 3] = cum[:, -1].view(np.int32)  # wtot == final CDF, exactly
        light[hv, 4] = deg[hv]
        valid = bpos[:, :maxb] < ends[:, None]
        mins = r_indices[np.minimum(bpos[:, :maxb], max(e_hi - e_lo - 1, 0))]
        light[hv[:, None], 5 + np.arange(maxb)[None, :]] = np.where(
            valid, mins, PAD_ID
        )
        light[hv[:, None], 5 + maxb + np.arange(maxb)[None, :]] = cum.view(
            np.int32
        )
    return light, biw, bids, brp


def _check_capacity(max_deg: int, p_l: int, c: int) -> None:
    maxb = _max_blocks(p_l)
    if c % QUADS_PER_ROW:
        raise ValueError(f"block_width must be a multiple of {QUADS_PER_ROW}")
    if max_deg > maxb * c:
        raise ValueError(
            f"max degree {max_deg} exceeds the blocked engine's "
            f"{maxb}x{c} capacity; trim hotspots (max_out_degree) or raise "
            f"block_width/light_width"
        )


def _edge_shared_list(
    indptr: np.ndarray, indices: np.ndarray, weights: np.ndarray
) -> "np.ndarray | None":
    """Per-edge [E, SL_LANES] shared lists (SL_* layout); None when neither
    the native core nor the (small-graph-only) numpy fallback applies."""
    from node2vec_tpu import native

    if native.available():
        return native.edge_shared_list(indptr, indices, weights)
    n_e = len(indices)
    if n_e > 200_000:  # the per-edge python loop below is host-prohibitive
        return None
    n_v = len(indptr) - 1
    out = np.zeros((n_e, SL_LANES), dtype=np.int32)
    src_rep = np.repeat(np.arange(n_v), np.diff(indptr))
    rows = [indices[indptr[v] : indptr[v + 1]] for v in range(n_v)]
    sets = [set(r.tolist()) for r in rows]
    for e in range(n_e):
        u, v = int(src_rep[e]), int(indices[e])
        nv = rows[v]
        su = sets[u]
        slots = [
            j for j, x in enumerate(nv.tolist()) if x in su and x != u
        ]
        ovf = len(slots) > SL_K or (slots and slots[-1] >= SL_PAD_SLOT)
        packed = np.full(SL_K, SL_PAD_SLOT, np.uint32)
        ws = np.zeros(SL_K, np.float32)
        if not ovf:
            packed[: len(slots)] = slots
            ws[: len(slots)] = weights[indptr[v] + np.asarray(slots, int)]
        out[e, : SL_K // 2] = (
            packed[0::2] | (packed[1::2] << np.uint32(16))
        ).view(np.int32)
        out[e, SL_K // 2 : SL_K // 2 + SL_K] = ws.view(np.int32)
        pos = indptr[v] + np.searchsorted(nv, u)
        has_rev = pos < indptr[v + 1] and indices[pos] == u
        out[e, 12] = int(pos) if has_rev else -1
        out[e, 13] = 1 if ovf else 0
    return out


def build_blocked_graph(
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    light_width: int | None = None,
    block_width: int | None = None,
    shared_lists: bool = False,
) -> BlockedGraph:
    """Host-side packing of a sorted CSR graph into the blocked layout.

    ``shared_lists`` (default OFF): also build the per-edge shared-neighbor
    (slot, weight) lists that drive the exact 3-atom biased sampler.  Opt-in
    because it is a measured NET LOSS in the blocked engine's own regime:
    heavy-tail graphs concentrate traversal on hub-hub edges whose shared
    counts overflow any practical SL_K (RMAT 43% / zipf 62% of edge weight),
    so attempts only drop ~25% while the slq fetch adds a 5th gather to
    every loop iteration (measured 0.92-0.94x, experiments/
    shared_list_bench.py).  It wins where most traversal mass has <= SL_K
    shared neighbors (attempts 2.33 -> 1.03 on a clustered 500-vertex
    graph) — typically graphs the dense engine serves anyway.  Costs 64B
    per edge of device memory + one C++ merge pass (~15s per 8M edges).
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    weights = np.asarray(weights, dtype=np.float32)
    n_v = len(indptr) - 1
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if n_v else 0

    rev_enc, pfx = _edge_metadata(indptr, indices, weights)
    # default P = 31, not 32: 4P+1 = 125 lanes rounds up to exactly one
    # 128-lane tile, so the ebase lane (and the light/heavy split at deg 31
    # instead of 32) costs zero physical row bytes
    p_l = 31 if light_width is None else light_width
    maxb = _max_blocks(p_l)
    n_heavy = int((deg > p_l).sum())
    if block_width is None:
        need = -(-max_deg // maxb) if n_heavy else 1
        block_width = max(256, 1 << int(np.ceil(np.log2(max(need, 1)))))
    c = block_width
    _check_capacity(max_deg, p_l, c)

    light, biw, bids, brp = _pack_range(
        indptr, indices, weights, rev_enc, pfx, 0, n_v, p_l, c,
        ebase=shared_lists,
    )
    slq = None
    ovf_wfrac = 1.0
    if shared_lists:
        if len(indices) > np.iinfo(np.int32).max:
            raise ValueError(
                "shared_lists=True requires edge ids to fit int32 "
                f"(graph has {len(indices)} edges)"
            )
        sl = _edge_shared_list(indptr, indices, weights)
        if sl is None:
            raise ValueError(
                "shared_lists=True requires the native graph core "
                "(or a graph small enough for the numpy fallback)"
            )
        n_rows = -(-len(indices) // SL_EDGES_PER_ROW)
        slq_host = np.zeros((max(n_rows, 1), 128), dtype=np.int32)
        slq_host.reshape(-1)[: sl.size] = sl.reshape(-1)
        slq = jnp.asarray(slq_host)
        ovf = (sl[:, 13] & 1).astype(bool)
        if ovf.any():
            # sl_exhaustive must key on "NO edge overflowed" — clamp the
            # weight fraction away from exactly 0 so zero-weight overflow
            # edges (or degenerate all-zero weights) cannot enable the
            # membership-free kernel while overflow rows exist
            wtot_all = float(weights.sum())
            frac = float(weights[ovf].sum()) / wtot_all if wtot_all > 0 else 1.0
            ovf_wfrac = max(frac, np.finfo(np.float32).tiny)
        else:
            ovf_wfrac = 0.0
    return BlockedGraph(
        light=jnp.asarray(light),
        biw=jnp.asarray(biw),
        bids=jnp.asarray(bids),
        brp=jnp.asarray(brp),
        light_width=p_l,
        block_width=c,
        has_heavy=bool(n_heavy),
        slq=slq,
        sl_ovf_wfrac=ovf_wfrac,
    )


def blocked_walk_chunk_impl(
    light: jax.Array,
    biw: jax.Array,
    bids: jax.Array,
    brp: jax.Array,
    slq: jax.Array,  # [*, 128] shared-list rows (dummy when shared_lists off)
    starts: jax.Array,  # [W] int32, negative = dead padding lane
    gids: jax.Array,  # [W] int32 global walker ids (chunk-invariant RNG)
    seed: jax.Array,  # uint32 scalar
    *,
    walk_length: int,
    return_param: float,
    inout_param: float,
    max_trials: int,
    light_width: int,
    block_width: int,
    has_heavy: bool,
    shared_lists: bool = False,
    sl_exhaustive: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Async blocked walks: (paths [W, L+1] int32, n_fallback, n_attempts).

    ``shared_lists=True`` (requires the builder's slq table) switches q != 1
    lanes to the EXACT 3-atom mixture: the arrival edge's enumerated shared
    neighbors form their own bias-1 atom (picked by inverse-CDF over the
    stored (slot, weight) list, no rejection) and the ∝w atom's only
    rejection is a proposal landing on a stored slot — per-attempt rejection
    probability drops from (1-s)(1-1/q)-shaped to w_S/(q·M).  Edges whose
    shared count overflows SL_K fall back per-lane to the rejection-bound
    sampler; both paths are exact (chi-square-tested).
    """
    p_l = light_width
    c = block_width
    maxb = _max_blocks(p_l)
    n_w = starts.shape[0]
    el = walk_length
    inv_p = jnp.float32(1.0 / return_param)
    inv_q = jnp.float32(1.0 / inout_param)
    uniform_bias = return_param == 1.0 and inout_param == 1.0
    need_membership = inout_param != 1.0
    use_sl = shared_lists and need_membership
    # exhaustive shared lists: every edge's list is complete, so no lane can
    # fall back — the membership machinery (prev_mem carry + bids gather)
    # drops out of the compiled program entirely
    sl_total = use_sl and sl_exhaustive
    need_mem_rows = need_membership and not sl_total
    prev_keep = max(p_l, 5 + maxb)

    alive0 = starts >= 0
    paths0 = jnp.full((n_w, el + 1), -1, dtype=jnp.int32)
    paths0 = paths0.at[:, 0].set(jnp.where(alive0, starts, -1))

    def select(row, iota, idx):
        """One-hot row select (take_along_axis lowers poorly on TPU)."""
        return jnp.sum(jnp.where(iota == idx[:, None], row, 0), axis=1)

    def bc_f32(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    def body(carry):
        (paths, t, cur, prev, w_fwd, fwd_pfx, w_back, back_pfx, back_shared,
         cur_row, prev_mem, alive, trials, need_entry, gidsu, n_fb, att,
         it, aedge, sl_row) = carry
        # the body is LANE-COUNT polymorphic (shapes read off the carry) so
        # the tail-compaction cascade below can reuse it on smaller buffers
        n_w = alive.shape[0]
        light_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, p_l), 1)
        block_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, c), 1)
        cdf_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, maxb), 1)
        quad_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, 128), 1)
        path_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, el + 1), 1)

        # --- entry: (re)gather the frontier vertex's row -------------------
        entry = need_entry & alive
        lr = light[jnp.where(entry, cur, 0)]
        cur_row = jnp.where(entry[:, None], lr, cur_row)
        if use_sl:
            # one slq row per accepted step: the ARRIVAL edge's shared list
            fetch = entry & (aedge >= 0)
            srow = slq[jnp.where(fetch, aedge // SL_EDGES_PER_ROW, 0)]
            grp = jnp.maximum(aedge, 0) % SL_EDGES_PER_ROW
            sub = srow[:, :SL_LANES]
            for g in range(1, SL_EDGES_PER_ROW):
                sub = jnp.where(
                    (grp == g)[:, None],
                    srow[:, g * SL_LANES : (g + 1) * SL_LANES],
                    sub,
                )
            sl_row = jnp.where(fetch[:, None], sub, sl_row)
            ebase_cur = cur_row[:, 4 * p_l]
            # decode: K slots (2 x uint16 per lane, 0xFFFF pad) + K f32 w
            packed_sl = sl_row[:, : SL_K // 2]
            slot_even = packed_sl & 0xFFFF
            slot_odd = (packed_sl >> 16) & 0xFFFF
            slot_k = jnp.stack([slot_even, slot_odd], axis=2).reshape(
                n_w, SL_K
            )
            valid_k = slot_k != SL_PAD_SLOT
            w_k = bc_f32(sl_row[:, SL_K // 2 : SL_K // 2 + SL_K])
            w_sh = jnp.sum(w_k, axis=1)
            sl_valid = (aedge >= 0) & ((sl_row[:, 13] & 1) == 0)
        ids = cur_row[:, :p_l]
        w_light = bc_f32(cur_row[:, p_l : 2 * p_l])
        if has_heavy:
            is_heavy = cur_row[:, 0] < -1
            h_bs = cur_row[:, 1]
            h_nb = cur_row[:, 2]
            h_cum = bc_f32(cur_row[:, 5 + maxb : 5 + 2 * maxb])
            degree = jnp.where(
                is_heavy,
                cur_row[:, 4],
                jnp.sum((ids != PAD_ID) & (ids >= 0), axis=1),
            )
            wtot = jnp.where(
                is_heavy, bc_f32(cur_row[:, 3]), jnp.sum(w_light, axis=1)
            )
        else:
            is_heavy = jnp.zeros((n_w,), bool)
            degree = jnp.sum(ids != PAD_ID, axis=1)
            wtot = jnp.sum(w_light, axis=1)
        alive = alive & ~(entry & (degree == 0))  # sink death
        attempted = alive  # every lane alive past sink death draws this iter

        first_order = t == 0
        # RNG counter = per-walker ATTEMPT number (not the global iteration):
        # engines that schedule attempts differently (edge-partitioned
        # deferral) replay the identical draw sequence — walks bit-match
        # across layouts
        ctr = att * jnp.uint32(4)
        u_branch = hash_uniform(seed, gidsu, ctr)
        u_prop = hash_uniform(seed, gidsu, ctr + jnp.uint32(1))
        u_acc = hash_uniform(seed, gidsu, ctr + jnp.uint32(2))

        # --- mixture: back-edge atom vs prev-excluded ∝w -------------------
        if uniform_bias:
            take_back = jnp.zeros((n_w,), bool)
            target = u_prop * wtot
            rest = wtot
        else:
            # per-lane rejection bound: when the arrival edge closes no
            # triangle, no shared-class (bias 1) candidate can appear, so the
            # bound drops to 1/q — acceptance 1 for q>1.  For q<1 both cases
            # give 1/q.  Exactness holds for ANY alpha2 >= max candidate bias.
            alpha2 = jnp.where(
                back_shared,
                jnp.float32(max(1.0, 1.0 / inout_param)),
                inv_q,
            )
            m1 = w_back * inv_p  # w_back == 0 at step 0
            rest = jnp.maximum(wtot - w_back, 0.0)
            if use_sl:
                # exact 3-atom mixture on slist-valid lanes: shared mass is
                # its own atom, so the ∝w atom needs no bias headroom
                alpha2 = jnp.where(sl_valid, inv_q, alpha2)
                msh = jnp.where(sl_valid, w_sh, 0.0)
                m2 = rest * alpha2
                ub = u_branch * (m1 + msh + m2)
                take_back = ub < m1
                take_sh = sl_valid & ~take_back & (ub < m1 + msh)
                # shared-atom pick: inverse-CDF over the stored K weights
                cdf_sh = prefix_sums(w_k)
                n_sh = jnp.sum(valid_k.astype(jnp.int32), axis=1)
                k_idx = jnp.minimum(
                    jnp.sum(
                        (cdf_sh < (u_prop * w_sh)[:, None]).astype(jnp.int32),
                        axis=1,
                    ),
                    jnp.maximum(n_sh - 1, 0),
                )
                k_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, SL_K), 1)
                sh_slot = jnp.sum(
                    jnp.where(k_iota == k_idx[:, None], slot_k, 0), axis=1
                )
            else:
                m2 = rest * alpha2
                take_back = u_branch < m1 / jnp.maximum(m1 + m2, 1e-30)
            # prev-exclusion: u2 ∈ [0, wtot - w_back) skips prev's interval
            u2 = u_prop * rest
            target = jnp.where(u2 < back_pfx, u2, u2 + w_back)

        # --- proposal: two-level exact inverse-CDF -------------------------
        cdf_l = prefix_sums(w_light)
        slot_l = jnp.sum((cdf_l < target[:, None]).astype(jnp.int32), axis=1)
        slot_l = jnp.minimum(slot_l, jnp.maximum(degree - 1, 0))
        if use_sl:
            # a shared-atom pick overrides the ∝w slot; everything downstream
            # (id/weight/prefix/rev metadata selects) flows off the slot
            slot_l = jnp.where(take_sh, sh_slot, slot_l)
        cand_l = select(ids, light_iota, slot_l)
        w_l = bc_f32(select(cur_row[:, p_l : 2 * p_l], light_iota, slot_l))
        ppfx_l = jnp.where(
            slot_l > 0, select(cdf_l, light_iota.astype(jnp.int32), slot_l - 1), 0.0
        )
        if not uniform_bias:
            rev_l = select(cur_row[:, 2 * p_l : 3 * p_l], light_iota, slot_l)
            pfx_l = bc_f32(
                select(cur_row[:, 3 * p_l : 4 * p_l], light_iota, slot_l)
            )

        if has_heavy:
            blk = jnp.sum((h_cum < target[:, None]).astype(jnp.int32), axis=1)
            blk = jnp.minimum(blk, jnp.maximum(h_nb - 1, 0))
            if use_sl:
                # forced BEFORE the block gather: the pick's block must be
                # the one fetched
                blk = jnp.where(take_sh, sh_slot // c, blk)
            base = jnp.where(
                blk > 0,
                bc_f32(
                    select(cur_row[:, 5 + maxb : 5 + 2 * maxb], cdf_iota, blk - 1)
                ),
                0.0,
            )
            resid = target - base
            brow = biw[jnp.where(alive & is_heavy, h_bs + blk, 0)]
            bw = bc_f32(brow[:, c:])
            nvalid = jnp.sum(brow[:, :c] != PAD_ID, axis=1)
            cdf_b = prefix_sums(bw)
            slot_b = jnp.sum((cdf_b < resid[:, None]).astype(jnp.int32), axis=1)
            slot_b = jnp.minimum(slot_b, jnp.maximum(nvalid - 1, 0))
            if use_sl:
                slot_b = jnp.where(take_sh, sh_slot % c, slot_b)
            cand_h = select(brow[:, :c], block_iota, slot_b)
            w_h = bc_f32(select(brow[:, c:], block_iota, slot_b))
            ppfx_h = base + jnp.where(
                slot_b > 0, select(cdf_b, block_iota.astype(jnp.int32), slot_b - 1), 0.0
            )
            cand = jnp.where(is_heavy, cand_h, cand_l)
            w_cand = jnp.where(is_heavy, w_h, w_l)
            ppfx_cand = jnp.where(is_heavy, ppfx_h, ppfx_l)
            if not uniform_bias:
                gslot = (h_bs + blk) * c + slot_b
                qrow = brp[
                    jnp.where(alive & is_heavy, gslot // QUADS_PER_ROW, 0)
                ]
                qpos = 2 * (gslot % QUADS_PER_ROW)
                rev_h = select(qrow, quad_iota, qpos)
                pfx_h = bc_f32(select(qrow, quad_iota, qpos + 1))
                rev_enc_c = jnp.where(is_heavy, rev_h, rev_l)
                pfx_c = jnp.where(is_heavy, pfx_h, pfx_l)
        else:
            cand, w_cand, ppfx_cand = cand_l, w_l, ppfx_l
            if not uniform_bias:
                rev_enc_c, pfx_c = rev_l, pfx_l

        # --- acceptance ----------------------------------------------------
        if uniform_bias:
            accept = jnp.ones((n_w,), bool)
        elif not need_membership:
            # q == 1: all non-return biases are 1 and prev is excluded
            accept = take_back | first_order | (cand != prev)
        elif sl_total:
            # exhaustive shared lists: no fallback lane exists — membership
            # against N(prev) is never consulted, so the bids gather and the
            # prev_mem carry vanish from the loop (one fewer gather per
            # iteration on top of the attempt reduction)
            if has_heavy:
                row_slot = jnp.where(is_heavy, blk * c + slot_b, slot_l)
            else:
                row_slot = slot_l
            hit = jnp.any(valid_k & (slot_k == row_slot[:, None]), axis=1)
            accept = first_order | take_back | take_sh | (
                (cand != prev) & ~hit
            )
        else:
            if has_heavy:
                prev_is_heavy = prev_mem[:, 0] < -1
                shared_light = jnp.any(
                    prev_mem[:, :p_l] == cand[:, None], axis=1
                )
                p_bs = prev_mem[:, 1]
                p_nb = prev_mem[:, 2]
                mins = prev_mem[:, 5 : 5 + maxb]
                jm = (
                    jnp.sum((mins <= cand[:, None]).astype(jnp.int32), axis=1)
                    - 1
                )
                jm = jnp.clip(jm, 0, jnp.maximum(p_nb - 1, 0))
                mrow = bids[
                    jnp.where(alive & prev_is_heavy, p_bs + jm, 0)
                ]
                shared_heavy = jnp.any(mrow == cand[:, None], axis=1)
                shared = jnp.where(prev_is_heavy, shared_heavy, shared_light)
            else:
                shared = jnp.any(prev_mem[:, :p_l] == cand[:, None], axis=1)
            bias2 = jnp.where(shared, 1.0, inv_q)
            accept = take_back | first_order | (
                (cand != prev) & (u_acc * alpha2 <= bias2)
            )
            if use_sl:
                # slist-valid lanes: exact — the only ∝w-atom rejection is a
                # proposal landing on an enumerated shared slot (it belongs
                # to the shared atom); no u_acc coin, no membership fetch
                # consumed (the fetch above still issues for fallback lanes)
                if has_heavy:
                    row_slot = jnp.where(
                        is_heavy, blk * c + slot_b, slot_l
                    )
                else:
                    row_slot = slot_l
                hit = jnp.any(
                    valid_k & (slot_k == row_slot[:, None]), axis=1
                )
                accept_sl = take_back | take_sh | (
                    (cand != prev) & ~hit
                )
                accept = jnp.where(sl_valid, accept_sl, accept)

        # --- trial cap: bounded-bias ∝weight fallback, counted -------------
        trials = jnp.where(accept, 0, trials + 1)
        force = alive & (trials >= max_trials)
        n_fb = n_fb + jnp.sum(force & ~accept, dtype=jnp.int32)
        accept = accept | force

        # --- advance accepted lanes ----------------------------------------
        adv = alive & accept
        take = take_back & ~force
        nxt = jnp.where(take, prev, cand)
        paths = jnp.where(
            adv[:, None] & (path_iota == (t + 1)[:, None]), nxt[:, None], paths
        )
        if not uniform_bias:
            # arrival-edge metadata for the next step; a return hop traverses
            # the known (cur->prev) edge, so its fields are swaps of carries
            nw_fwd = jnp.where(take, w_back, w_cand)
            nf_pfx = jnp.where(take, back_pfx, ppfx_cand)
            nw_back = jnp.where(take, w_fwd, bc_f32(rev_enc_c & MAG))
            nb_pfx = jnp.where(take, fwd_pfx, pfx_c)
            nb_shared = jnp.where(take, back_shared, rev_enc_c < 0)
            w_fwd = jnp.where(adv, nw_fwd, w_fwd)
            fwd_pfx = jnp.where(adv, nf_pfx, fwd_pfx)
            w_back = jnp.where(adv, nw_back, w_back)
            back_pfx = jnp.where(adv, nb_pfx, back_pfx)
            back_shared = jnp.where(adv, nb_shared, back_shared)
        if need_mem_rows:
            prev_mem = jnp.where(
                adv[:, None], cur_row[:, :prev_keep], prev_mem
            )
        if use_sl:
            # arrival edge of the accepted hop: a return hop traverses the
            # known reverse edge (its global id is stored on the arrival
            # edge's slist row); otherwise ebase[cur] + accepted row slot
            new_ae = jnp.where(take, sl_row[:, 12], ebase_cur + row_slot)
            aedge = jnp.where(adv, new_ae, aedge)
        prev = jnp.where(adv, cur, prev)
        cur = jnp.where(adv, nxt, cur)
        t = jnp.where(adv, t + 1, t)
        trials = jnp.where(adv, 0, trials)
        need_entry = adv
        alive = alive & (t < el)

        # count the attempt for every lane that drew — including one whose
        # FINAL accepted attempt just finished its walk (alive is now false);
        # counting post-kill undercounted exactly 1 attempt per completed
        # walker (bench read 0.95 attempts/step at walk_length 20).  The
        # extra counter tick on finished lanes never feeds a draw, so walks
        # are bit-identical; this only makes the reported attempts/step (and
        # the roofline floor built on it) exact, matching the EP engine.
        att = jnp.where(attempted, att + jnp.uint32(1), att)
        return (paths, t, cur, prev, w_fwd, fwd_pfx, w_back, back_pfx,
                back_shared, cur_row, prev_mem, alive, trials, need_entry,
                gidsu, n_fb, att, it + jnp.uint32(1), aedge, sl_row)

    ALIVE, GIDS, NFB, ATT, IT = 11, 14, 15, 16, 17  # carry slots
    it_bound = jnp.uint32(el * (max_trials + 2))

    zeros_f = jnp.zeros((n_w,), jnp.float32)
    state = (
        paths0,
        jnp.zeros((n_w,), jnp.int32),  # t
        jnp.where(alive0, starts, 0),  # cur
        jnp.full((n_w,), -1, jnp.int32),  # prev
        zeros_f,  # w_fwd
        zeros_f,  # fwd_pfx
        zeros_f,  # w_back
        zeros_f,  # back_pfx
        jnp.zeros((n_w,), bool),  # back_shared
        jnp.full((n_w, light.shape[1]), PAD_ID, jnp.int32),  # cur_row
        jnp.full(
            (n_w, prev_keep if need_mem_rows else 1), PAD_ID, jnp.int32
        ),  # prev_mem
        alive0,
        jnp.zeros((n_w,), jnp.int32),  # trials
        jnp.ones((n_w,), bool),  # need_entry
        gids.astype(jnp.uint32),
        jnp.int32(0),  # n_fallback
        jnp.zeros((n_w,), jnp.uint32),  # att (per-walker attempt counter)
        jnp.uint32(0),  # it
        jnp.full((n_w,), -1, jnp.int32),  # aedge (arrival edge CSR id)
        jnp.zeros((n_w, SL_LANES if use_sl else 1), jnp.int32),  # sl_row
    )

    # --- straggler-tail compaction cascade ---------------------------------
    # The async loop runs until the LAST walker finishes; with rejection (q>1)
    # the straggler tail is several times the mean attempt count, and every
    # iteration pays full-chunk gathers (profiled: 206 iterations for el=40 at
    # 131k lanes).  So: run at full width only while >1/8 of lanes are live,
    # then gather the unfinished walkers into an 8x smaller buffer and keep
    # going (twice).  Draws are keyed on (seed, gid, attempt) and att rides
    # along, so compacted walks are BIT-IDENTICAL to the uncompacted engine.
    sizes = [n_w]
    while sizes[-1] >= 4 * 2048:
        sizes.append(sizes[-1] // 4)

    scatter_stack = []  # (parent_paths, scatter_idx) per compaction
    att_acc = jnp.uint32(0)  # attempts of walkers left behind by compaction
    for li, size in enumerate(sizes):
        last = li == len(sizes) - 1
        if last:
            def cond(carry):
                return jnp.any(carry[ALIVE]) & (carry[IT] < it_bound)
        else:
            nxt = sizes[li + 1]

            def cond(carry, nxt=nxt):
                live = jnp.sum(carry[ALIVE], dtype=jnp.int32)
                return (live > nxt) & (carry[IT] < it_bound)

        state = jax.lax.while_loop(cond, body, state)
        if last:
            break
        nxt = sizes[li + 1]
        order = jnp.argsort(~state[ALIVE])  # stable: live lanes first
        idx = order[:nxt]
        sel_alive = state[ALIVE][idx]
        # dead slots scatter out of bounds -> dropped at writeback
        scatter_idx = jnp.where(sel_alive, idx, size)
        scatter_stack.append((state[0], scatter_idx))
        att_acc = att_acc + jnp.sum(state[ATT]) - jnp.sum(state[ATT][idx])
        state = tuple(
            v if i in (NFB, IT) else v[idx] for i, v in enumerate(state)
        )

    paths, n_fb = state[0], state[NFB]
    n_att = att_acc + jnp.sum(state[ATT])
    for parent_paths, scatter_idx in reversed(scatter_stack):
        paths = parent_paths.at[scatter_idx].set(paths, mode="drop")
    return paths, n_fb, n_att


blocked_walk_chunk = jax.jit(
    blocked_walk_chunk_impl,
    static_argnames=(
        "walk_length",
        "return_param",
        "inout_param",
        "max_trials",
        "light_width",
        "block_width",
        "has_heavy",
        "shared_lists",
        "sl_exhaustive",
    ),
)


def slq_or_dummy(bg: BlockedGraph) -> jnp.ndarray:
    """The slq operand for blocked_walk_chunk: the real table, or a 1-row
    dummy when the graph was built without shared lists (the kernel is
    compiled with shared_lists=False and never touches it)."""
    if bg.slq is not None:
        return bg.slq
    return jnp.zeros((1, 128), jnp.int32)
