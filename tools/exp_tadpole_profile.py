"""Round-5 tadpole phase profile (VERDICT r4 #7): measure the load
(spectrum build — shards=N sharded today) vs contig-walk (single-device
lockstep) split at assembly scale, to decide whether sharding the walk
is worth building or the load dominates.

Run on the target backend:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_tadpole_profile.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bbtools_tpu  # noqa: F401


def main():
    import jax

    from bbtools_tpu.models.tadpole import Tadpole, parse_args

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(3)
    # ~2 Mbp genome at 30x -> ~600k reads of 100 bp
    genome = rng.integers(0, 4, 2_000_000).astype(np.uint8)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    n_reads = 300_000
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "r.fq")
        with open(inp, "wb") as fh:
            parts = []
            for i in range(n_reads):
                p = int(rng.integers(0, len(genome) - 100))
                s = ACGT[genome[p : p + 100]].tobytes()
                parts.append(b"@r%d\n%s\n+\n%s\n" % (i, s, b"F" * 100))
                if len(parts) >= 20000:
                    fh.write(b"".join(parts))
                    parts = []
            fh.write(b"".join(parts))
        for k in (31, 62):
            tool = Tadpole(parse_args([f"in={inp}", f"k={k}"]))
            t0 = time.perf_counter()
            tool.load_kmers(inp)
            t_load = time.perf_counter() - t0
            t0 = time.perf_counter()
            tool.build_contigs()
            t_walk = time.perf_counter() - t0
            tot = t_load + t_walk
            print(
                f"k={k}: load {t_load:.2f}s ({100*t_load/tot:.0f}%), "
                f"contig walk {t_walk:.2f}s ({100*t_walk/tot:.0f}%), "
                f"{len(tool.contigs)} contigs, "
                f"{sum(len(c) for c in tool.contigs)} bases",
                flush=True,
            )


if __name__ == "__main__":
    main()
