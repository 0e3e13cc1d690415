#!/usr/bin/env python
"""Posterior-decode kernel timing lab (round 3, VERDICT #3).

Times posterior_coverage_batch_pallas at the bench shape (batch 128 x
L 1024 x M 1400) across lane widths, plus the xla fallback for context.

Run: python tools/post_lab.py [--batch 128] [--seq-len 1024]
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

from hmm_fasta_viterbi_tpu import parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile  # noqa: E402
from hmm_fasta_viterbi_tpu.ops.pallas_posterior import (  # noqa: E402
    posterior_coverage_batch_pallas,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--m", default="1400")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--lanes", default="128,256")
    ap.add_argument("--xla", action="store_true")
    args = ap.parse_args()

    print(f"# devices: {jax.devices()}", flush=True)
    p7 = P7Profile.from_profile(
        parse_hmm(REPO / "data" / "profile_HMMs" / f"{args.m}.hmm")
    )
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 20, size=(args.batch, args.seq_len)).astype(np.int32)
    lengths = np.full(args.batch, args.seq_len, dtype=np.int32)
    cells = args.batch * args.seq_len * (p7.model_length - 1)

    for lanes in [int(x) for x in args.lanes.split(",") if x]:
        try:
            posterior_coverage_batch_pallas(p7, tokens, lengths, lanes=lanes)
            reps = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                posterior_coverage_batch_pallas(
                    p7, tokens, lengths, lanes=lanes
                )
                reps.append(time.perf_counter() - t0)
            best = min(reps)
            print(
                f"pallas lanes={lanes:4d}: {cells/best/1e9:7.2f} GCUPS "
                f"decode  {best*1e3:8.1f} ms  reps={[f'{x*1e3:.0f}' for x in reps]}",
                flush=True,
            )
        except Exception as e:
            print(f"pallas lanes={lanes}: FAILED {type(e).__name__}: {e}", flush=True)

    if args.xla:
        from hmm_fasta_viterbi_tpu.ops.p7_scan import posterior_coverage_batch_xla

        posterior_coverage_batch_xla(p7, tokens, lengths)
        t0 = time.perf_counter()
        posterior_coverage_batch_xla(p7, tokens, lengths)
        dt = time.perf_counter() - t0
        print(f"xla fallback:      {cells/dt/1e9:7.2f} GCUPS  {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
