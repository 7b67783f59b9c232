"""AOT memory analysis of the SGNS trainer programs at north-star scale.

``jit(...).lower(shapes).compile().memory_analysis()`` asks the TPU
compiler for a program's exact peak/temp HBM without allocating anything —
the tool that pinned the round-4 north-star streaming OOM (the axon
backend exposes no runtime memory_stats).

MEASURED (v5e remote compile, V=8,387,650 = scale-23 RMAT, batch 2048):

    dim 64 (epoch scan):   temp 8.37 GiB = ~4x table, peak 12.33 GiB
    dim 64 (single step):  temp 8.00 GiB = ~4x table, peak 12.13 GiB
    dim 64, V=4M..8M:      temp ~2x table
    dim 32:                temp 0.36 GiB (~0.4x),     peak  2.49 GiB
    dim 128:               temp 0.25 GiB (~0.06x),    peak  8.38 GiB

i.e. XLA's scatter-update chain runs IN PLACE at dim 32/128 (donated
tables alias outputs; temps negligible) but at dim 64 materializes ~2
physical copies per table — a half-tile (64-lane) layout pathology, not a
batch/optimizer/scan effect (batch 512 vs 2048 and adagrad vs sgd are
identical; the epoch scan adds nothing over a single step).  Consequence:
at the 8.4M-vertex north star the dim-64 trainer needs 12+ GiB on top of
the 7.13 GiB blocked tables and OOMs a 16 GiB chip, while the REFERENCE
DEFAULT dim 128 fits — bench.py's north-star block therefore trains dim
128 via the staged path and streams at dim 32; docs/scaling.md documents
the dim-64 anomaly.

Run: python experiments/sgns_memory_probe.py [V] [dim] [batch]
"""
import sys

import jax
import jax.numpy as jnp
from jax import ShapeDtypeStruct as S


def probe(V, D, B, opt="adagrad", scan_batches=0, preagg=False,
          packed=False):
    from node2vec_tpu.models.skipgram import sgns_corpus_step, sgns_epoch

    f32, i32 = jnp.float32, jnp.int32
    common = dict(window=5, negatives=5, shared_negatives=64,
                  shrink_window=True, optimizer=opt)
    # packed-pair layout (skipgram.pack_rows): [ceil(V/2), 2D] tables
    te = S(((V + 1) // 2, 2 * D), f32) if packed else S((V, D), f32)
    if scan_batches:
        lowered = sgns_epoch.lower(
            te, te, S((V,), f32), S((V,), f32),
            S((B * scan_batches, 21), i32), S((2,), jnp.uint32),
            S((), i32), S((), f32), S((), f32),
            S((V,), i32), S((V,), f32), S((V,), jnp.bool_),
            batch=B, n_batches=scan_batches, min_lr=1e-4, preagg=preagg,
            packed=packed,
            **common,
        )
        tag = (f"epoch scan x{scan_batches}"
               + (" preagg" if preagg else "")
               + (" packed" if packed else ""))
    else:
        lowered = sgns_corpus_step.lower(
            te, te, S((V,), f32), S((V,), f32),
            S((B * 4, 21), i32), S((), i32), S((2,), jnp.uint32), S((), f32),
            S((V,), i32), S((V,), f32), S((V,), jnp.bool_),
            batch=B, packed=packed, **common,
        )
        tag = "single step" + (" packed" if packed else "")
    ma = lowered.compile().memory_analysis()
    tb = V * D * 4 / 2**30
    print(
        f"{tag:18s} V={V:,} D={D} B={B} opt={opt}: table={tb:.2f} GiB  "
        f"temp={ma.temp_size_in_bytes / 2**30:.2f} "
        f"({ma.temp_size_in_bytes / 2**30 / tb:.2f}x table)  "
        f"peak={ma.peak_memory_in_bytes / 2**30:.2f} GiB",
        flush=True,
    )


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 8_387_650
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    if D:
        probe(V, D, B)
        return
    for dim in (32, 64, 128):
        probe(V, dim, B)
    probe(V, 64, B, scan_batches=16)
    # VERDICT round-4 item 7: does the manual apply (sort + segment-sum +
    # ONE scatter per table over unique rows — the preagg path) sidestep
    # the dim-64 multi-copy pathology?
    probe(V, 64, B, scan_batches=16, preagg=True)
    # ...and the FIX: the packed-pair [ceil(V/2), 128] layout gathers and
    # scatters in place (see skipgram.pack_rows; word2vec's SGNS fit paths
    # apply it automatically at dim 64)
    probe(V, 64, B, scan_batches=16, packed=True)


if __name__ == "__main__":
    main()
