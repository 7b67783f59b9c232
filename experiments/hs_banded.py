"""Banded (context-evaluated) HS tail vs the production per-offset loop.

Profiling (experiments/hs_profile.py + jax.profiler trace, round 3): the HS
epoch spends ~46% in window-loop fusions over [B, L1, CLT, D] bf16 tensors —
window_shift materializes a ~99MB shifted copy of the tail path tensor per
offset (10x), twice (logit read + g_th accumulate).  Evaluating every pair at
the CONTEXT position instead makes the path tensor offset-invariant: only
the [B, L1, D] center embeddings are shifted (im2col into [B, L1, 2w, D]),
and the tail becomes three einsums with the path tensor read/written once:

  logits = einsum("bljd,blcd->bljc", xcol, th)       # D-contraction (MXU)
  g_th   = einsum("bljc,bljd->blcd", g, xcol)        # one write
  gx     = einsum("bljc,blcd->bljd", g, th)          # then 2w small shifts

Run on the chip: python experiments/hs_banded.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from node2vec_tpu.models.hsoftmax import (
    build_huffman,
    cap_code_length,
    head_level_offsets,
)
from node2vec_tpu.models.skipgram import _log_sigmoid, window_shift
from node2vec_tpu.models.vocab import build_vocab

V = 131072
DIM = 128
WINDOW = 5
B, L1 = 2048, 21
rng = np.random.default_rng(0)
walks_np = rng.integers(0, V, (B, L1)).astype(np.int32)
vocab = build_vocab(walks_np, V, min_count=1)
tree = cap_code_length(build_huffman(vocab.counts), vocab.counts)
head = head_level_offsets(tree)
CL = tree.points.shape[1]
N_HEAD = len(head) - 1
CLT = CL - N_HEAD
print(f"CL={CL} head_levels={N_HEAD} CLT={CLT}", flush=True)


def tail_grads_loop(emb_in, theta, walks, b_sh, hs_points, hs_codes, hs_len,
                    vocab_mask):
    """The production tail computation (per-offset shifted copies),
    extracted: returns (g_in, g_th, loss, n_pairs)."""
    n_walks, length = walks.shape
    cl = hs_points.shape[1]
    walks_safe = jnp.where(walks >= 0, walks, 0)
    valid_pos = (walks >= 0) & vocab_mask[walks_safe]
    x_bf = emb_in[walks_safe].astype(jnp.bfloat16)
    pts = hs_points[walks_safe]
    cds = hs_codes[walks_safe].astype(jnp.float32)
    plen = hs_len[walks_safe]
    pmask = (
        jax.lax.broadcasted_iota(jnp.int32, (n_walks, length, cl), 2)
        < plen[..., None]
    ).astype(jnp.float32)
    sgn = 1.0 - 2.0 * cds
    theta_bf = theta.astype(jnp.bfloat16)
    pts_t = pts[:, :, N_HEAD:]
    th = theta_bf[pts_t]

    def shift(x, d, fill=0):
        return window_shift(x, d, WINDOW, length, fill)

    offsets = [d for d in range(-WINDOW, WINDOW + 1) if d != 0]
    g_in = jnp.zeros((n_walks, length, DIM), jnp.float32)
    g_th = jnp.zeros_like(th)
    loss = jnp.float32(0.0)
    n_pairs = jnp.float32(0.0)
    for d in offsets:
        sgn_c = shift(sgn, d)
        pm_c = shift(pmask, d)
        pv = (valid_pos & shift(valid_pos, d) & (abs(d) <= b_sh)).astype(
            jnp.float32
        )
        n_pairs = n_pairs + jnp.sum(pv)
        m = pv[..., None] * pm_c
        th_c = shift(th, d)
        logit = jnp.einsum(
            "bld,blcd->blc", x_bf, th_c, preferred_element_type=jnp.float32
        )
        sgn_t = sgn_c[:, :, N_HEAD:]
        m_t = m[:, :, N_HEAD:]
        loss = loss - jnp.sum(_log_sigmoid(sgn_t * logit) * m_t)
        g = (jax.nn.sigmoid(logit) - (1.0 + sgn_t) / 2.0) * m_t
        g_bf = g.astype(jnp.bfloat16)
        g_in = g_in + jnp.einsum(
            "blc,blcd->bld", g_bf, th_c, preferred_element_type=jnp.float32
        )
        g_th = g_th + shift(
            jnp.einsum("blc,bld->blcd", g_bf, x_bf,
                       preferred_element_type=jnp.bfloat16),
            -d,
        )
    return g_in, g_th, loss, n_pairs


def tail_grads_banded(emb_in, theta, walks, b_sh, hs_points, hs_codes,
                      hs_len, vocab_mask):
    """Context-evaluated banded tail: path tensor read/written ONCE."""
    n_walks, length = walks.shape
    cl = hs_points.shape[1]
    walks_safe = jnp.where(walks >= 0, walks, 0)
    valid_pos = (walks >= 0) & vocab_mask[walks_safe]
    x_bf = emb_in[walks_safe].astype(jnp.bfloat16)
    pts = hs_points[walks_safe]
    cds = hs_codes[walks_safe].astype(jnp.float32)
    plen = hs_len[walks_safe]
    sgn_t = (1.0 - 2.0 * cds)[:, :, N_HEAD:]  # context position: NO shift
    pm_t = (
        jax.lax.broadcasted_iota(jnp.int32, (n_walks, length, cl), 2)
        < plen[..., None]
    ).astype(jnp.float32)[:, :, N_HEAD:]
    theta_bf = theta.astype(jnp.bfloat16)
    th = theta_bf[pts[:, :, N_HEAD:]]  # [B, L, CLT, D] — fetched once

    def shift(x, d, fill=0):
        return window_shift(x, d, WINDOW, length, fill)

    offsets = [d for d in range(-WINDOW, WINDOW + 1) if d != 0]
    # im2col of the small tensors only: center embedding + pair validity
    xcol = jnp.stack([shift(x_bf, -d) for d in offsets], axis=2)  # [B,L,2w,D]
    pv = jnp.stack(
        [
            (valid_pos & shift(valid_pos, -d)
             & shift(abs(d) <= b_sh, -d, fill=False)).astype(jnp.float32)
            for d in offsets
        ],
        axis=2,
    )  # [B, L, 2w] — pair (center l-d, context l)
    n_pairs = jnp.sum(pv)
    logits = jnp.einsum(
        "bljd,blcd->bljc", xcol, th, preferred_element_type=jnp.float32
    )
    m = pv[..., None] * pm_t[:, :, None, :]
    s = sgn_t[:, :, None, :]
    loss = -jnp.sum(_log_sigmoid(s * logits) * m)
    g = (jax.nn.sigmoid(logits) - (1.0 + s) / 2.0) * m  # [B, L, 2w, CLT]
    g_bf = g.astype(jnp.bfloat16)
    g_th = jnp.einsum(
        "bljc,bljd->blcd", g_bf, xcol, preferred_element_type=jnp.bfloat16
    )
    gx = jnp.einsum(
        "bljc,blcd->bljd", g_bf, th, preferred_element_type=jnp.float32
    )
    g_in = jnp.zeros((n_walks, length, DIM), jnp.float32)
    for j, d in enumerate(offsets):
        g_in = g_in + shift(gx[:, :, j, :], d)  # back to the center position
    return g_in, g_th, loss, n_pairs


def sync(t):
    return float(jnp.sum(t[0])) + float(t[2])


emb_in = jax.random.uniform(
    jax.random.PRNGKey(1), (V, DIM), jnp.float32, -0.5 / DIM, 0.5 / DIM
)
theta = jax.random.normal(jax.random.PRNGKey(2), (tree.n_inner, DIM)) * 0.01
walks = jnp.asarray(walks_np)
b_sh = jax.random.randint(jax.random.PRNGKey(3), (B, L1), 1, WINDOW + 1)
args = (emb_in, theta, walks, b_sh, jnp.asarray(tree.points),
        jnp.asarray(tree.codes), jnp.asarray(tree.lengths),
        jnp.asarray(vocab.mask))

fns = {"loop": jax.jit(tail_grads_loop), "banded": jax.jit(tail_grads_banded)}
outs = {}
for name, fn in fns.items():
    t0 = time.time()
    outs[name] = fn(*args)
    sync(outs[name])
    print(f"compile {name}: {time.time()-t0:.1f}s", flush=True)

a, b = outs["loop"], outs["banded"]
print("n_pairs equal:", float(a[3]) == float(b[3]))
print("loss: loop", float(a[2]), "banded", float(b[2]),
      "rel", abs(float(a[2]) - float(b[2])) / abs(float(a[2])))
gin_rel = float(jnp.max(jnp.abs(a[0] - b[0])) / (jnp.max(jnp.abs(a[0])) + 1e-9))
gth_rel = float(jnp.max(jnp.abs((a[1] - b[1]).astype(jnp.float32)))
                / (float(jnp.max(jnp.abs(a[1].astype(jnp.float32)))) + 1e-9))
print(f"g_in max rel diff {gin_rel:.2e}; g_th max rel diff {gth_rel:.2e}")

for rnd in range(3):
    line = []
    for name, fn in fns.items():
        t0 = time.time()
        for _ in range(5):
            out = fn(*args)
        sync(out)
        dt = (time.time() - t0) / 5
        line.append(f"{name}={dt*1e3:6.2f}ms")
    print(f"round {rnd}: " + "  ".join(line), flush=True)
