"""Three-stage pipeline on a synthetic graph, mirroring the reference's
examples/native_spark.py driver shape (index | walk | embed stage dispatch
with artifact handoff between stages).

Run: python examples/er_pipeline.py [index|walk|embed|all]
"""

import os
import sys
import tempfile

import numpy as np

WORKDIR = os.path.join(tempfile.gettempdir(), "n2v_tpu_er_example")
EDGE_FILE = os.path.join(WORKDIR, "edges.txt")


def make_edges() -> None:
    os.makedirs(WORKDIR, exist_ok=True)
    rng = np.random.default_rng(0)
    n, e = 2000, 16000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = src != dst
    with open(EDGE_FILE, "w") as f:
        for s, d in zip(src[keep], dst[keep]):
            f.write(f"{s} {d}\n")
    print(f"wrote {keep.sum()} edges to {EDGE_FILE}")


def main() -> None:
    from node2vec_tpu import cli

    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("index", "all"):
        make_edges()
        cli.main(["index", "--input", EDGE_FILE, "--workdir", WORKDIR,
                  "--indexed", "--undirected"])
    if stage in ("walk", "all"):
        cli.main(["walk", "--workdir", WORKDIR, "--num-walks", "10",
                  "--walk-length", "20", "-p", "0.25", "-q", "4.0"])
    if stage in ("embed", "all"):
        cli.main(["embed", "--workdir", WORKDIR, "--dim", "64",
                  "--epochs", "5", "--min-count", "1"])
        cli.main(["eval", "--workdir", WORKDIR])


if __name__ == "__main__":
    main()
