"""Specialization experiment: runtime-arg kernels vs trace-time-baked.

The reference's one research result is its generic-vs-specialized kernel
comparison: the same OpenCL kernels with constants passed as runtime
arguments vs JIT-compiled with every constant baked in via -D defines
(/root/reference/algorithms/MSV_spec_kernels.cl,
 /root/reference/algorithms/benchmark_MSV.cpp:40-41).

On TPU the claim has been that this axis collapses into `jax.jit` —
shapes and layout always fold at trace time, and the remaining
per-profile data (score matrix, transition scalars) is cheap to pass as
device arrays. This script MEASURES that claim (VERDICT r1 #5):

  arg    — production path: scores_t + tr_consts passed as device
           arrays (ops.pallas_msv._msv_pallas_padded, what MSVScanner
           runs)
  baked  — the same kernel traced with scores_t + tr_consts closed over
           as numpy constants: XLA embeds them in the executable, the
           TPU analogue of the reference's -D specialization

Run on the real chip: python tools/spec_lab.py [--batch 8192] [--m 1400]
Record the delta in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hmm_fasta_viterbi_tpu import MSVProfile, parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.ops.pallas_msv import (  # noqa: E402
    _msv_pallas_padded,
    _prepare_batch,
    prepare_scores_t,
)
from hmm_fasta_viterbi_tpu.ops.reference import msv_oracle_batch  # noqa: E402


def _time(fn, reps):
    np.asarray(fn())  # warmup + sync (block_until_ready unreliable on tunnel)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--m", type=int, default=1400)
    ap.add_argument("--seq-len", type=int, default=3500)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--l-chunk", type=int, default=256)
    args = ap.parse_args()

    profile = MSVProfile.from_profile(
        parse_hmm(REPO / "data" / "profile_HMMs" / f"{args.m}.hmm")
    )
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 20, size=(args.batch, args.seq_len)).astype(np.int32)
    lengths = np.full(args.batch, args.seq_len, dtype=np.int32)
    tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_batch(
        tokens, lengths, args.l_chunk
    )
    cells = int(lengths.astype(np.int64).sum()) * (profile.model_length - 1)

    scores_np = prepare_scores_t(profile)[None]  # [1, M_pad, 20]
    tr_np = np.array(
        [[profile.tr_B_Mk, profile.tr_E_C, profile.tr_E_J]], dtype=np.float32
    )
    tok_dev = jnp.asarray(tokens_t)
    len_dev = jnp.asarray(lengths_p)
    trr_dev = jnp.asarray(tr_rows)

    # --- arg variant: profile data as runtime device arrays (production)
    scores_dev = jnp.asarray(scores_np)
    tr_dev = jnp.asarray(tr_np)

    def run_arg():
        return _msv_pallas_padded(
            scores_dev, tok_dev, len_dev, trr_dev, tr_dev,
            l_chunk=l_chunk, interpret=False,
        )[0]

    # --- baked variant: profile data closed over as numpy constants ->
    # XLA embeds them in the executable (the -D analogue). The jit
    # wrapper takes only the database tensors.
    @jax.jit
    def run_baked_inner(tok, lens, trr):
        return _msv_pallas_padded(
            jnp.asarray(scores_np), tok, lens, trr, jnp.asarray(tr_np),
            l_chunk=l_chunk, interpret=False,
        )[0]

    def run_baked():
        return run_baked_inner(tok_dev, len_dev, trr_dev)

    # correctness first (small slice vs oracle)
    small = np.asarray(run_arg())[:4]
    want = msv_oracle_batch(profile, tokens[:4], lengths[:4])
    maxerr = float(np.abs(small - want).max())
    print(f"# arg-vs-oracle maxerr (4 rows): {maxerr:.2e}")
    assert maxerr < 1e-4
    np.testing.assert_allclose(
        np.asarray(run_baked()), np.asarray(run_arg()), atol=0, rtol=0
    )
    print("# baked == arg bit-exact")

    t_arg = _time(run_arg, args.reps)
    t_baked = _time(run_baked, args.reps)
    print(
        f"arg:   {cells / t_arg / 1e9:8.2f} GCUPS ({t_arg * 1e3:.1f} ms)\n"
        f"baked: {cells / t_baked / 1e9:8.2f} GCUPS ({t_baked * 1e3:.1f} ms)\n"
        f"delta: {100 * (t_arg - t_baked) / t_arg:+.2f}% "
        f"(positive = baking helps)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
