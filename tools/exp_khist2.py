"""Round-4 khist re-measure: accumulate (raw-key direct merge) vs raw
count rate, slope-timed — the _merge_spectra pre-reduce removal."""
import json, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from bbtools_tpu.utils.chaintime import slope_time
from bbtools_tpu.ops.kmer_count import PAD, _merge_spectra, batch_kmers_jnp, sort_reduce

READ_LEN, reads = 151, 16384
rng = np.random.default_rng(42)
genome = rng.integers(0, 4, 1_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - READ_LEN, reads)
gbases = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
dl = jnp.asarray(np.full(reads, READ_LEN, np.int32))
dgb = jnp.asarray(gbases)
cap = 1 << 21
spec_k0 = jnp.full(cap, PAD, jnp.int64)
spec_c0 = jnp.zeros(cap, jnp.int64)
kk = batch_kmers_jnp(dgb, dl, 31)
spec_k0, spec_c0, _ = _merge_spectra(spec_k0, spec_c0, kk)
spec_k0, spec_c0 = spec_k0[:cap], spec_c0[:cap]

def raw_step(i):
    keys = batch_kmers_jnp(jnp.roll(dgb, i, axis=0), dl, 31)
    v, c, n = sort_reduce(keys)
    return v[:8], c[:8], n

def khist_step(i):
    keys = batch_kmers_jnp(jnp.roll(dgb, i + 1, axis=0), dl, 31)
    nk, nc, nr = _merge_spectra(spec_k0, spec_c0, keys)
    return nr

t_raw = slope_time(raw_step, 4, 12)
t_acc = slope_time(khist_step, 4, 12)
print(json.dumps({"raw_reads_per_sec": round(reads/t_raw, 1),
                  "acc_reads_per_sec": round(reads/t_acc, 1),
                  "ratio": round(t_acc/t_raw, 3)}))
